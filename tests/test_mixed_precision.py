"""bf16 compute path: loss close to fp32, grads stay fp32, state fp32."""

import numpy as np
import jax
import jax.numpy as jnp

from fcl_taco2_tpu.models import Tacotron2SA

from helpers import synthetic_batch, tiny_config


def test_bf16_loss_close_to_fp32_and_grads_fp32():
    cfg32 = tiny_config(dropout_rate=0.0, zoneout_rate=0.0,
                        duration_predictor_dropout_rate=0.0,
                        pitch_predictor_dropout_rate=0.0,
                        energy_predictor_dropout_rate=0.0,
                        pitch_embed_dropout_rate=0.0,
                        energy_embed_dropout_rate=0.0)
    cfg16 = cfg32.replace(compute_dtype="bfloat16")
    m32, m16 = Tacotron2SA(cfg32), Tacotron2SA(cfg16)
    params, state = m32.init(jax.random.PRNGKey(0))
    batch = synthetic_batch(cfg32)

    l32, _ = m32.loss_fn(params, state, batch, jax.random.PRNGKey(1),
                         train=True)
    l16, (report, new_state, _) = m16.loss_fn(
        params, state, batch, jax.random.PRNGKey(1), train=True)
    assert report["loss"].dtype == jnp.float32
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05)

    grads = jax.grad(lambda p: m16.loss_fn(
        p, state, batch, jax.random.PRNGKey(1), train=True)[0])(params)
    for g in jax.tree_util.tree_leaves(grads):
        assert g.dtype == jnp.float32
    # BN state must remain fp32
    for s in jax.tree_util.tree_leaves(new_state):
        assert s.dtype == jnp.float32


def test_bf16_synthesize_runs_and_is_fp32_out():
    cfg = tiny_config(compute_dtype="bfloat16")
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    tokens = jnp.asarray(np.array([[1, 2, 3]], np.int32))
    out = model.synthesize(params, state, tokens,
                           jnp.asarray(np.array([3], np.int32)),
                           jax.random.PRNGKey(1), frame_budget=16,
                           durations=jnp.asarray(
                               np.array([[2, 2, 2]], np.int32)))
    assert out["mel"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out["mel"])).all()


def test_remat_decoder_matches_plain():
    """jax.checkpoint must not change values, only memory."""
    cfg = tiny_config(dropout_rate=0.0, zoneout_rate=0.0,
                      duration_predictor_dropout_rate=0.0,
                      pitch_predictor_dropout_rate=0.0,
                      energy_predictor_dropout_rate=0.0,
                      pitch_embed_dropout_rate=0.0,
                      energy_embed_dropout_rate=0.0)
    cfg_r = cfg.replace(remat_decoder=True)
    m, mr = Tacotron2SA(cfg), Tacotron2SA(cfg_r)
    params, state = m.init(jax.random.PRNGKey(0))
    batch = synthetic_batch(cfg)
    l1, _ = m.loss_fn(params, state, batch, jax.random.PRNGKey(1))
    l2, _ = mr.loss_fn(params, state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    g1 = jax.grad(lambda p: m.loss_fn(p, state, batch,
                                      jax.random.PRNGKey(1))[0])(params)
    g2 = jax.grad(lambda p: mr.loss_fn(p, state, batch,
                                       jax.random.PRNGKey(1))[0])(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
