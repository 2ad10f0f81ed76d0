from fcl_taco2_tpu.ops.masking import (  # noqa: F401
    lengths_to_non_pad_mask,
    lengths_to_pad_mask,
    masked_mean,
)
