from fcl_taco2_tpu.models.config import (ModelConfig, student_config,  # noqa: F401
                                         teacher_config)
from fcl_taco2_tpu.models.taco2_sa import Batch, Tacotron2SA  # noqa: F401
