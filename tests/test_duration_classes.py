"""Duration-classed decoder (SURVEY hard part #1 dual bucketing).

The classed plan partitions segments by duration so the teacher-forced
scan runs D_c steps per class instead of max_dur for everyone; per-segment
math is unchanged (independent recurrences; padding never read), so losses
and gradients must match the single-class path EXACTLY under a
deterministic config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcl_taco2_tpu.models import Tacotron2SA
from fcl_taco2_tpu.ops.regroup import (build_classed_plan, build_plan,
                                       duration_class_caps,
                                       gather_segments,
                                       scatter_frames_classed)

from helpers import synthetic_batch, tiny_config, with_duration_classes

CLASSES = (2, 4, 6)  # tiny_config max_dur = 6


def _det_cfg(**kw):
    return tiny_config(
        dropout_rate=0.0, zoneout_rate=0.0,
        duration_predictor_dropout_rate=0.0,
        pitch_predictor_dropout_rate=0.0,
        energy_predictor_dropout_rate=0.0,
        pitch_embed_dropout_rate=0.0, energy_embed_dropout_rate=0.0,
        **kw)


def test_classed_plan_roundtrip_reconstructs_mel():
    rng = np.random.default_rng(0)
    B, Tmax, max_dur = 4, 7, 6
    durations = rng.integers(0, max_dur + 1, (B, Tmax)).astype(np.int32)
    durations[:, 0] = np.maximum(durations[:, 0], 1)
    olens = durations.sum(1).astype(np.int32)
    Lmax = int(olens.max()) + 3
    mel = rng.normal(size=(B, Lmax, 5)).astype(np.float32)
    mel *= (np.arange(Lmax)[None, :, None] < olens[:, None, None])

    caps = duration_class_caps(list(durations), CLASSES, B, cap_bucket=4)
    plan = build_classed_plan(durations, olens, CLASSES, caps, Lmax)
    segs = [
        gather_segments(jnp.asarray(mel), jnp.asarray(c.seg_utt),
                        jnp.asarray(c.seg_start), jnp.asarray(c.frame_mask))
        for c in plan.classes
    ]
    back = scatter_frames_classed(segs, jnp.asarray(plan.utt_gather),
                                  jnp.asarray(plan.utt_mask))
    np.testing.assert_array_equal(np.asarray(back), mel)
    # every real segment sits in a class that fits it
    total = 0
    for c in plan.classes:
        assert c.seg_dur.max(initial=0) <= c.dur_cap
        total += int(c.seg_mask.sum())
    assert total == plan.n_segments == int((durations > 0).sum())


def test_classed_plan_agrees_with_single_plan_gather():
    """The combined utt_gather reproduces exactly the frames the
    single-class plan produces."""
    rng = np.random.default_rng(1)
    B, Tmax, max_dur = 3, 6, 6
    durations = rng.integers(1, max_dur + 1, (B, Tmax)).astype(np.int32)
    olens = durations.sum(1).astype(np.int32)
    Lmax = int(olens.max())
    mel = rng.normal(size=(B, Lmax, 4)).astype(np.float32)

    single = build_plan(durations, olens, max_dur, B * Tmax, Lmax)
    ref = gather_segments(jnp.asarray(mel), jnp.asarray(single.seg_utt),
                          jnp.asarray(single.seg_start),
                          jnp.asarray(single.frame_mask))
    from fcl_taco2_tpu.ops.regroup import scatter_frames
    ref_back = scatter_frames(ref, jnp.asarray(single.utt_gather),
                              jnp.asarray(single.utt_mask))

    caps = duration_class_caps(list(durations), CLASSES, B, cap_bucket=4)
    plan = build_classed_plan(durations, olens, CLASSES, caps, Lmax)
    segs = [gather_segments(jnp.asarray(mel), jnp.asarray(c.seg_utt),
                            jnp.asarray(c.seg_start),
                            jnp.asarray(c.frame_mask))
            for c in plan.classes]
    back = scatter_frames_classed(segs, jnp.asarray(plan.utt_gather),
                                  jnp.asarray(plan.utt_mask))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(ref_back))


def test_spill_to_longer_class_and_overflow_error():
    durations = np.array([[2, 2, 2, 2]], np.int32)
    olens = durations.sum(1).astype(np.int32)
    # class (2,) holds only 2 of the four dur-2 segments; the rest must
    # spill into the top class (cap 6) and still reconstruct exactly
    plan = build_classed_plan(durations, olens, (2, 6), (2, 4), 8)
    assert int(plan.classes[0].seg_mask.sum()) == 2
    assert int(plan.classes[1].seg_mask.sum()) == 2
    mel = np.arange(8 * 3, dtype=np.float32).reshape(1, 8, 3)
    mel[:, olens[0]:] = 0.0
    segs = [gather_segments(jnp.asarray(mel), jnp.asarray(c.seg_utt),
                            jnp.asarray(c.seg_start),
                            jnp.asarray(c.frame_mask))
            for c in plan.classes]
    back = scatter_frames_classed(segs, jnp.asarray(plan.utt_gather),
                                  jnp.asarray(plan.utt_mask))
    np.testing.assert_array_equal(np.asarray(back), mel)

    with pytest.raises(ValueError, match="overflow"):
        build_classed_plan(durations, olens, (2, 6), (2, 1), 8)


def test_caps_bound_any_batch():
    """fit-style caps (sum of batch_size largest per-utterance counts)
    admit every random batch without overflow."""
    rng = np.random.default_rng(2)
    corpus = [rng.integers(1, 7, rng.integers(3, 9)).astype(np.int32)
              for _ in range(30)]
    caps = duration_class_caps(corpus, CLASSES, batch_size=4, cap_bucket=4)
    for _ in range(20):
        pick = rng.choice(len(corpus), 4, replace=False)
        Tmax = max(len(corpus[i]) for i in pick)
        durations = np.zeros((4, Tmax), np.int32)
        for row, i in enumerate(pick):
            durations[row, :len(corpus[i])] = corpus[i]
        olens = durations.sum(1).astype(np.int32)
        build_classed_plan(durations, olens, CLASSES, caps,
                           int(olens.max()))  # must not raise


def test_classed_loss_and_grads_match_single_class_exactly():
    cfg = _det_cfg()
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = synthetic_batch(cfg, B=4, Tmax=6, n_seg=32)
    cbatch = with_duration_classes(batch, CLASSES)
    key = jax.random.PRNGKey(7)

    def loss_of(p, b):
        loss, (report, _, _) = model.loss_fn(p, state, b, key, train=True)
        return loss, report

    (l1, r1), g1 = jax.value_and_grad(loss_of, has_aux=True)(params, batch)
    (l2, r2), g2 = jax.value_and_grad(loss_of, has_aux=True)(params, cbatch)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for k in r1:
        np.testing.assert_array_equal(np.asarray(r1[k]), np.asarray(r2[k]),
                                      err_msg=k)
    for (p1, x), (p2, y) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2)):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6,
                                   err_msg=str(p1))


def test_classed_eval_and_kd_capture_match_single_class():
    cfg = _det_cfg()
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(1))
    batch = synthetic_batch(cfg, B=3, Tmax=5, n_seg=24)
    cbatch = with_duration_classes(batch, CLASSES)
    key = jax.random.PRNGKey(3)

    _, (_, _, know1) = model.loss_fn(params, state, batch, key, train=False,
                                     capture_kd=True)
    _, (_, _, know2) = model.loss_fn(params, state, cbatch, key,
                                     train=False, capture_kd=True)
    for (p1, x), (p2, y) in zip(
            jax.tree_util.tree_leaves_with_path(know1),
            jax.tree_util.tree_leaves_with_path(know2)):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6,
                                   err_msg=str(p1))


def test_classed_train_step_on_mesh_matches_single_device():
    from fcl_taco2_tpu.parallel.mesh import make_mesh, shard_batch
    from fcl_taco2_tpu.train.optim import build_optimizer
    from fcl_taco2_tpu.train.state import TrainState
    from fcl_taco2_tpu.train.step import make_train_step

    assert len(jax.devices()) >= 8
    cfg = _det_cfg()
    model = Tacotron2SA(cfg)
    batch = synthetic_batch(cfg, B=8, Tmax=5, n_seg=64)
    cbatch = with_duration_classes(batch, CLASSES, cap_bucket=8)
    losses = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        params, mstate = model.init(jax.random.PRNGKey(0))
        tx = build_optimizer(lr=1e-3, grad_clip=1.0)
        ts = TrainState(params, mstate, tx.init(params), np.int32(0))
        step = make_train_step(model, tx, mesh, donate=False)
        _, report = step(ts, shard_batch(mesh, cbatch),
                         jax.random.PRNGKey(5))
        losses[n_dev] = float(report["loss"])
    np.testing.assert_allclose(losses[1], losses[8], rtol=2e-5)


def test_config_validates_duration_classes():
    with pytest.raises(ValueError):
        tiny_config(duration_classes=(4, 2))
    with pytest.raises(ValueError):
        tiny_config(duration_classes=(0, 4))
    with pytest.raises(ValueError):
        tiny_config(duration_classes=(9,))  # > max_dur=6
    with pytest.raises(ValueError):
        tiny_config(duration_classes=(3,), reduction_factor=2)
    cfg = tiny_config(duration_classes=(2, 4))
    assert cfg.effective_duration_classes == (2, 4, 6)
    assert tiny_config().effective_duration_classes == ()
