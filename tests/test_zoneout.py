"""Zoneout semantics: train bernoulli keep-old, eval expectation blend
(reference decoder_sa.py:82-96)."""

import numpy as np
import jax
import jax.numpy as jnp

from fcl_taco2_tpu.ops.rnn import zoneout


def test_eval_blend_is_deterministic_expectation():
    old = jnp.ones((4, 8))
    new = jnp.zeros((4, 8))
    out = zoneout(old, new, 0.1, train=False)
    np.testing.assert_allclose(np.asarray(out), 0.1, atol=1e-7)


def test_train_mask_keeps_old_at_rate():
    rng = jax.random.PRNGKey(0)
    old = jnp.ones((400, 400))
    new = jnp.zeros((400, 400))
    out = np.asarray(zoneout(old, new, 0.1, train=True, rng=rng))
    # elements are exactly old (1.0) or new (0.0)
    assert set(np.unique(out)) <= {0.0, 1.0}
    frac_old = out.mean()
    assert abs(frac_old - 0.1) < 0.01  # 160k samples -> tight CI


def test_zero_rate_is_identity():
    old = jnp.ones((3, 3))
    new = jnp.full((3, 3), 2.0)
    out = zoneout(old, new, 0.0, train=True, rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), 2.0)
