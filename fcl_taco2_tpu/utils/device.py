"""Device/link warmup helpers.

On remote-attached TPUs (axon relay) the FIRST device->host readback in a
process lazily initializes the reverse transfer path and can stall for
minutes; every later readback is ~30ms.  Calling ``warmup_transfers()``
once at startup absorbs that cost outside any timed or user-visible
section.
"""

import numpy as np

_warmed = False


def device_put_via_jit(tree):
    """Transfer a host pytree via a jitted identity.

    Executable OUTPUT buffers take the fast path on remote-device links;
    raw jax.device_put literals can stall the relay for minutes (see
    warmup_transfers).  Use this for one-time transfers of params/state.
    """
    import jax

    return jax.jit(lambda t: jax.tree_util.tree_map(lambda x: x, t))(tree)


def zeros_like_shapes(fn, *args):
    """Host-numpy zero templates matching fn's output pytree (for
    flax.serialization.from_state_dict restore targets)."""
    import jax

    shapes = jax.eval_shape(fn, *args)
    return jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)


def warmup_transfers():
    global _warmed
    if _warmed:
        return
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda v: v + 1.0)(jnp.zeros((1,), jnp.float32))
    np.asarray(x)  # first D2H: slow once, never again
    _warmed = True
