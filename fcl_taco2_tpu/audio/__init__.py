from fcl_taco2_tpu.audio.textgrid import read_textgrid  # noqa: F401
