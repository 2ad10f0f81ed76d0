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


def test_precomputed_keep_mask_is_used_verbatim():
    old = jnp.ones((2, 4))
    new = jnp.zeros((2, 4))
    keep = jnp.array([[True, False, True, False],
                      [False, False, True, True]])
    out = np.asarray(zoneout(old, new, 0.1, train=True, keep=keep))
    np.testing.assert_array_equal(out, np.asarray(keep, np.float32))


def test_batched_mask_generator_rate_both_impls():
    """decoder._zoneout_keep_masks draws all 2*dlayers step masks in one
    bits call; both the TPU-fast 'rbg' impl and the reproducible
    'threefry' impl must hit the bernoulli rate and be independent
    across layers."""
    from fcl_taco2_tpu.models.config import teacher_config
    from fcl_taco2_tpu.models.decoder import _zoneout_keep_masks

    for impl in ("rbg", "threefry"):
        cfg = teacher_config(idim=10, dunits=256, zoneout_rng=impl)
        key = jax.random.PRNGKey(3)
        zo_key = jax.random.key_data(jax.random.split(key, 5)[2])
        masks = np.asarray(_zoneout_keep_masks(zo_key, cfg, 400))
        assert masks.shape == (4, 400, 256) and masks.dtype == bool
        # per-mask rate: 102k samples -> tight CI
        rates = masks.reshape(4, -1).mean(axis=1)
        np.testing.assert_allclose(rates, 0.1, atol=0.01, err_msg=impl)
        # masks differ across the layer axis (independent draws)
        assert not np.array_equal(masks[0], masks[1]), impl
        # deterministic in the key
        again = np.asarray(_zoneout_keep_masks(zo_key, cfg, 400))
        np.testing.assert_array_equal(masks, again, err_msg=impl)


def test_zoneout_rng_config_validated():
    import pytest

    from fcl_taco2_tpu.models.config import teacher_config

    with pytest.raises(ValueError):
        teacher_config(idim=10, zoneout_rng="xorshift")
