from fcl_taco2_tpu.parallel.mesh import (batch_shardings, make_mesh,  # noqa: F401
                                         replicated)
