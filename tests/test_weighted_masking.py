"""use_weighted_masking parity: every utterance contributes equally.

Reference semantics under test: Tacotron2Loss with use_weighted_masking
(/root/reference/nets/teacher_training/e2e_tts_tacotron2_sa.py:72-80) —
weights = mask / mask.sum(time), / (B * odim), weighted error summed.
The torch mirror below is written from that formula (not copied code).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fcl_taco2_tpu.models import Tacotron2SA
from fcl_taco2_tpu.ops.masking import (lengths_to_non_pad_mask, masked_l1,
                                       weighted_l1, weighted_mse)
from helpers import synthetic_batch, tiny_config


def _torch_weighted(pred, target, olens, kind):
    """Literal reference formula in numpy: reduction='none' elementwise
    loss, weights mask/olens/(B*odim), masked sum."""
    B, L, C = pred.shape
    mask = (np.arange(L)[None, :] < olens[:, None])[..., None]  # (B, L, 1)
    err = np.abs(pred - target) if kind == "l1" else (pred - target) ** 2
    weights = mask / np.maximum(mask.sum(axis=1, keepdims=True), 1)
    out_weights = weights / (B * C)
    return float((err * out_weights * mask).sum())


def test_weighted_mel_matches_reference_formula():
    rng = np.random.default_rng(0)
    B, L, C = 4, 17, 6
    pred = rng.normal(size=(B, L, C)).astype(np.float32)
    target = rng.normal(size=(B, L, C)).astype(np.float32)
    olens = np.array([17, 5, 12, 9], np.int32)
    mask = lengths_to_non_pad_mask(jnp.asarray(olens), L)[..., None]
    got_l1 = float(weighted_l1(jnp.asarray(pred), jnp.asarray(target),
                               mask, jnp.float32(B)))
    got_mse = float(weighted_mse(jnp.asarray(pred), jnp.asarray(target),
                                 mask, jnp.float32(B)))
    np.testing.assert_allclose(
        got_l1, _torch_weighted(pred, target, olens, "l1"), rtol=1e-6)
    np.testing.assert_allclose(
        got_mse, _torch_weighted(pred, target, olens, "mse"), rtol=1e-6)


def test_weighted_loss_utterances_count_equally():
    # the batch loss equals the mean of per-utterance losses: length-1024
    # and length-8 utterances contribute the same weight
    rng = np.random.default_rng(1)
    B, L, C = 3, 32, 4
    pred = rng.normal(size=(B, L, C)).astype(np.float32)
    target = rng.normal(size=(B, L, C)).astype(np.float32)
    olens = np.array([32, 8, 20], np.int32)
    mask = lengths_to_non_pad_mask(jnp.asarray(olens), L)[..., None]
    batch_loss = float(weighted_l1(jnp.asarray(pred), jnp.asarray(target),
                                   mask, jnp.float32(B)))
    per_utt = []
    for b in range(B):
        m = lengths_to_non_pad_mask(jnp.asarray(olens[b:b + 1]), L)[..., None]
        per_utt.append(float(weighted_l1(
            jnp.asarray(pred[b:b + 1]), jnp.asarray(target[b:b + 1]),
            m, jnp.float32(1))))
    np.testing.assert_allclose(batch_loss, np.mean(per_utt), rtol=1e-6)


def test_weighted_loss_ignores_ghost_rows():
    # static-B padding appends all-pad utterances (olens=0); n_valid
    # excludes them so the loss is invariant to padding the batch axis
    rng = np.random.default_rng(2)
    B, L, C = 2, 10, 3
    pred = rng.normal(size=(B, L, C)).astype(np.float32)
    target = rng.normal(size=(B, L, C)).astype(np.float32)
    olens = np.array([10, 6], np.int32)
    mask = lengths_to_non_pad_mask(jnp.asarray(olens), L)[..., None]
    base = float(weighted_l1(jnp.asarray(pred), jnp.asarray(target), mask,
                             jnp.float32(B)))
    pred_p = np.concatenate([pred, rng.normal(size=(2, L, C))
                             .astype(np.float32)])
    target_p = np.concatenate([target, np.zeros((2, L, C), np.float32)])
    olens_p = np.array([10, 6, 0, 0], np.int32)
    mask_p = lengths_to_non_pad_mask(jnp.asarray(olens_p), L)[..., None]
    padded = float(weighted_l1(jnp.asarray(pred_p), jnp.asarray(target_p),
                               mask_p, jnp.float32(2)))
    np.testing.assert_allclose(base, padded, rtol=1e-6)


def test_loss_fn_weighted_end_to_end():
    cfg = tiny_config(use_masking=False, use_weighted_masking=True)
    model = Tacotron2SA(cfg)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    batch = synthetic_batch(cfg, B=3)
    loss, (report, _, _) = model.loss_fn(params, state, batch,
                                         jax.random.PRNGKey(1), train=True)
    assert np.isfinite(float(loss))
    for k in ("l1_loss", "mse_loss", "dur_loss", "pitch_loss",
              "energy_loss"):
        assert np.isfinite(float(report[k])), k
    # grads flow and stay finite
    g = jax.grad(lambda p: model.loss_fn(p, state, batch,
                                         jax.random.PRNGKey(1),
                                         train=True)[0])(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # and it is a genuinely different reduction from the masked mean
    cfg_m = tiny_config(use_masking=True)
    model_m = Tacotron2SA(cfg_m)
    loss_m, _ = model_m.loss_fn(params, state, batch,
                                jax.random.PRNGKey(1), train=True)
    assert abs(float(loss) - float(loss_m)) > 1e-6


def test_kd_weighted_output_distill():
    # KD output-distill terms follow the student's use_weighted_masking
    # (Tacotron2Loss_kd weighted branch, …_kd_student.py:72-80)
    from fcl_taco2_tpu.models.kd import KDStudent
    t_cfg = tiny_config(use_masking=False, use_weighted_masking=True)
    s_cfg = tiny_config(use_masking=False, use_weighted_masking=True,
                        eunits=12, dunits=16, prenet_units=8)
    kd = KDStudent(s_cfg, t_cfg)
    t_model = Tacotron2SA(t_cfg)
    t_params, t_state = jax.jit(t_model.init)(jax.random.PRNGKey(0))
    params, state = jax.jit(kd.init)(jax.random.PRNGKey(1))
    batch = synthetic_batch(t_cfg, B=3)
    loss, (report, _, _) = kd.loss_fn(params, state, t_params, t_state, batch,
                                   jax.random.PRNGKey(2), train=True)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(report["output_l1_loss"]))


def test_weighted_equals_masked_on_equal_lengths():
    # when every utterance has the same length, per-utterance weighting
    # degenerates to the global masked mean — the two reductions agree
    rng = np.random.default_rng(3)
    B, L, C = 3, 12, 5
    pred = rng.normal(size=(B, L, C)).astype(np.float32)
    target = rng.normal(size=(B, L, C)).astype(np.float32)
    olens = np.full((B,), L, np.int32)
    mask = lengths_to_non_pad_mask(jnp.asarray(olens), L)[..., None]
    w = float(weighted_l1(jnp.asarray(pred), jnp.asarray(target), mask,
                          jnp.float32(B)))
    m = float(masked_l1(jnp.asarray(pred), jnp.asarray(target), mask))
    np.testing.assert_allclose(w, m, rtol=1e-6)
