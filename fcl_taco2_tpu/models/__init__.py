from fcl_taco2_tpu.models.config import ModelConfig  # noqa: F401
