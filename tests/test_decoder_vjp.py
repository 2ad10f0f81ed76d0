"""Custom-VJP decoder backward (ops/rnn_vjp.py) vs XLA autodiff.

The training hot path's hand-built backward ("strategy B" of results/
PALLAS_decoder.json train_kernel_roofline) must be loss-bit-identical
(the forward math is unchanged) and gradient-equal to autodiff up to
reduction order, across every decoder topology knob — on CPU in fp32 so
the 1e-5 tolerance is meaningful (TPU matmuls are bf16-ish internally).

Reference hot loop: /root/reference/nets/modules/decoder_sa.py:493-513
(torch autograd records its backward; ours is built to the HBM roofline).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import random

from fcl_taco2_tpu.models import Tacotron2SA, decoder as D

from helpers import synthetic_batch, tiny_config, with_duration_classes


def _max_rel_err(g0, g1):
    return max(
        float(jnp.max(jnp.abs(a - b)) / (1e-8 + jnp.max(jnp.abs(a))))
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)))


@pytest.mark.parametrize("variant", [
    {},
    {"append_position": False},
    {"use_concate": False},
    {"prenet_layers": 0},
    {"dlayers": 1},
    {"dlayers": 3},
    {"reduction_factor": 2, "max_dur": 6},
    {"zoneout_rate": 0.0},
    {"zoneout_rng": "rbg"},
    {"decoder_scan_unroll": 4},
])
def test_core_grads_match_autodiff(variant):
    cfg = tiny_config(postnet_layers=0, **variant)
    params, _ = D.decoder_init(random.PRNGKey(0), cfg)
    P, Dd = 5, cfg.max_dur
    enc = random.normal(random.PRNGKey(1), (P, cfg.dec_idim))
    tgt = random.normal(random.PRNGKey(2), (P, Dd, cfg.odim))
    pos = jnp.tile(jnp.linspace(0, 1, Dd)[None], (P, 1))
    rng = random.PRNGKey(3)

    def loss(params, use_vjp):
        c = cfg.replace(decoder_custom_vjp=use_vjp)
        seg_out, *_ = D._teacher_forced_core(params, c, enc, tgt, pos, rng,
                                             train=True)
        return jnp.sum(seg_out ** 2) + 0.1 * jnp.sum(jnp.abs(seg_out))

    l0, g0 = jax.value_and_grad(loss)(params, False)
    l1, g1 = jax.value_and_grad(loss)(params, True)
    assert float(l0) == float(l1), "forward must be bit-identical"
    assert _max_rel_err(g0, g1) < 1e-5


@pytest.mark.parametrize("train", [True, False])
def test_core_kd_capture_grads(train):
    """KD capture path: cotangents through z0s/z1s reach the right steps."""
    cfg = tiny_config(postnet_layers=0)
    params, _ = D.decoder_init(random.PRNGKey(0), cfg)
    P, Dd = 4, cfg.max_dur
    enc = random.normal(random.PRNGKey(1), (P, cfg.dec_idim))
    tgt = random.normal(random.PRNGKey(2), (P, Dd, cfg.odim))
    pos = jnp.tile(jnp.linspace(0, 1, Dd)[None], (P, 1))
    rng = random.PRNGKey(3)

    def loss(params, use_vjp):
        c = cfg.replace(decoder_custom_vjp=use_vjp)
        seg_out, _, z0s, z1s = D._teacher_forced_core(
            params, c, enc, tgt, pos, rng, train=train, capture_kd=True)
        return (jnp.sum(seg_out ** 2) + 0.3 * jnp.sum(z0s ** 2)
                + jnp.sum(jnp.sin(z1s)))

    l0, g0 = jax.value_and_grad(loss)(params, False)
    l1, g1 = jax.value_and_grad(loss)(params, True)
    assert float(l0) == float(l1)
    assert _max_rel_err(g0, g1) < 1e-5


@pytest.mark.parametrize("classed", [False, True])
def test_full_model_loss_and_grads(classed):
    """End-to-end loss_fn: grads through encoder/predictors/postnet compose
    with the custom scan VJP on both the single-class and classed paths."""
    cfg = tiny_config()
    if classed:
        cfg = cfg.replace(duration_classes=(3,))
    m0 = Tacotron2SA(cfg.replace(decoder_custom_vjp=False))
    m1 = Tacotron2SA(cfg.replace(decoder_custom_vjp=True))
    params, state = m0.init(random.PRNGKey(0))
    batch = synthetic_batch(cfg)
    if classed:
        batch = with_duration_classes(batch, (3, cfg.max_dur), cap_bucket=4)
    rng = random.PRNGKey(5)

    def loss(params, model):
        l, _ = model.loss_fn(params, state, batch, rng, train=True)
        return l

    l0, g0 = jax.value_and_grad(loss)(params, m0)
    l1, g1 = jax.value_and_grad(loss)(params, m1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=0, atol=0)
    assert _max_rel_err(g0, g1) < 1e-5
