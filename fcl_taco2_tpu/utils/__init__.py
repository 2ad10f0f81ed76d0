from fcl_taco2_tpu.utils import initializers  # noqa: F401
