from fcl_taco2_tpu.infer.ark import ArkScpWriter  # noqa: F401
from fcl_taco2_tpu.infer.stream import StreamTTS  # noqa: F401
from fcl_taco2_tpu.infer.synth import Synthesizer  # noqa: F401
