from fcl_taco2_tpu.data.manifest import load_manifest  # noqa: F401
from fcl_taco2_tpu.data.batchfy import make_batchset  # noqa: F401
from fcl_taco2_tpu.data.converter import BatchConverter  # noqa: F401
