"""Device/link warmup helpers.

On remote-attached TPUs (axon relay) the FIRST device->host readback in a
process lazily initializes the reverse transfer path and can stall for
minutes; every later readback is ~30ms.  Calling ``warmup_transfers()``
once at startup absorbs that cost outside any timed or user-visible
section.
"""

import numpy as np

_warmed = False


def warmup_transfers():
    global _warmed
    if _warmed:
        return
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda v: v + 1.0)(jnp.zeros((1,), jnp.float32))
    np.asarray(x)  # first D2H: slow once, never again
    _warmed = True
