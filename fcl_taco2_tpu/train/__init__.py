from fcl_taco2_tpu.train.optim import build_optimizer  # noqa: F401
from fcl_taco2_tpu.train.state import TrainState  # noqa: F401
from fcl_taco2_tpu.train.step import make_eval_step, make_train_step  # noqa: F401
