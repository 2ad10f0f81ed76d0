"""Train state pytree: params + mutable model state (BN) + optimizer + step."""

from typing import Any, NamedTuple


class TrainState(NamedTuple):
    params: Any
    model_state: Any   # BatchNorm running stats
    opt_state: Any
    step: Any          # int32 scalar
