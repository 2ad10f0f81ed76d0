"""Shared test fixtures: tiny configs and synthetic batches."""

import numpy as np
import jax.numpy as jnp

from fcl_taco2_tpu.models import Batch, ModelConfig
from fcl_taco2_tpu.ops.regroup import build_plan


def tiny_config(**kw):
    base = dict(
        idim=11, odim=8, embed_dim=16, eunits=16, econv_layers=2,
        econv_chans=16, econv_filts=5, dlayers=2, dunits=20,
        prenet_layers=2, prenet_units=12, postnet_layers=3, postnet_chans=10,
        postnet_filts=5, duration_predictor_chans=14,
        pitch_predictor_chans=14, energy_predictor_chans=14,
        max_dur=6, compute_dtype="float32",
    )
    base.update(kw)
    return ModelConfig(**base)


def synthetic_batch(cfg, B=3, Tmax=5, seed=0, n_seg=24, Lmax=None):
    rng = np.random.default_rng(seed)
    ilens = rng.integers(2, Tmax + 1, B).astype(np.int32)
    ilens[0] = Tmax
    durations = np.zeros((B, Tmax), np.int32)
    for b in range(B):
        durations[b, :ilens[b]] = rng.integers(0, cfg.max_dur + 1, ilens[b])
        if durations[b].sum() == 0:
            durations[b, 0] = 1
    tokens = np.zeros((B, Tmax), np.int32)
    for b in range(B):
        tokens[b, :ilens[b]] = rng.integers(1, cfg.idim, ilens[b])
    olens = durations.sum(1).astype(np.int32)
    if Lmax is None:
        Lmax = int(olens.max())
    mel = rng.normal(size=(B, Lmax, cfg.odim)).astype(np.float32)
    mel *= (np.arange(Lmax)[None, :, None] < olens[:, None, None])
    f0 = rng.normal(size=(B, Tmax, 1)).astype(np.float32)
    energy = rng.normal(size=(B, Tmax, 1)).astype(np.float32)
    plan = build_plan(durations, olens, cfg.max_dur, n_seg, Lmax)
    return Batch(
        tokens=jnp.asarray(tokens), ilens=jnp.asarray(ilens),
        mel=jnp.asarray(mel), olens=jnp.asarray(olens),
        durations=jnp.asarray(durations), f0=jnp.asarray(f0),
        energy=jnp.asarray(energy),
        seg_utt=jnp.asarray(plan.seg_utt), seg_tok=jnp.asarray(plan.seg_tok),
        seg_start=jnp.asarray(plan.seg_start),
        frame_mask=jnp.asarray(plan.frame_mask),
        position=jnp.asarray(plan.position),
        utt_gather=jnp.asarray(plan.utt_gather),
        utt_mask=jnp.asarray(plan.utt_mask),
    )


def with_duration_classes(batch, class_durs, caps=None, cap_bucket=8):
    """Re-plan an existing synthetic Batch with duration classes: same
    tokens/mel/targets, classed segment plan — for exact-equivalence
    tests against the single-class path."""
    from fcl_taco2_tpu.models.taco2_sa import SegClass
    from fcl_taco2_tpu.ops.regroup import (build_classed_plan,
                                           duration_class_caps)

    durations = np.asarray(batch.durations)
    olens = np.asarray(batch.olens)
    B = durations.shape[0]
    if caps is None:
        caps = duration_class_caps(list(durations), class_durs, B,
                                   cap_bucket=cap_bucket)
    plan = build_classed_plan(durations, olens, class_durs, caps,
                              batch.mel.shape[1])
    return batch._replace(
        seg_utt=None, seg_tok=None, seg_start=None, frame_mask=None,
        position=None,
        utt_gather=jnp.asarray(plan.utt_gather),
        utt_mask=jnp.asarray(plan.utt_mask),
        seg_classes=tuple(
            SegClass(jnp.asarray(c.seg_utt), jnp.asarray(c.seg_tok),
                     jnp.asarray(c.seg_start), jnp.asarray(c.frame_mask),
                     jnp.asarray(c.position))
            for c in plan.classes))
