"""Phoneme regrouping plan vs the reference's Python-loop semantics.

The oracle below re-implements the converter's slicing loop
(/root/reference/tts.py:243-263) and the decoder's output regrouping
(/root/reference/nets/modules/decoder_sa.py:516-523) directly in numpy, and
the gather-based plan must match it exactly.
"""

import numpy as np
import jax.numpy as jnp

from fcl_taco2_tpu.ops.regroup import (build_plan, gather_segments,
                                       gather_token_vectors, scatter_frames)


def make_case(seed=0, B=3, Tmax=6, odim=4, max_dur=7):
    rng = np.random.default_rng(seed)
    ilens = rng.integers(2, Tmax + 1, B)
    durations = np.zeros((B, Tmax), np.int32)
    for b in range(B):
        durations[b, :ilens[b]] = rng.integers(0, max_dur + 1, ilens[b])
        if durations[b].sum() == 0:
            durations[b, 0] = 1
    olens = durations.sum(1)
    Lmax = int(olens.max())
    ys = rng.normal(size=(B, Lmax, odim)).astype(np.float32)
    ys *= (np.arange(Lmax)[None, :, None] < olens[:, None, None])
    return durations, ilens, olens, ys


def oracle_segments(durations, ilens, ys, max_dur):
    """Reference converter loop: tts.py:243-263."""
    segs, seg_owner = [], []
    for b in range(durations.shape[0]):
        for t in range(ilens[b]):
            start = int(durations[b, :t].sum())
            end = int(durations[b, :t + 1].sum())
            if start != end:
                seg = np.zeros((max_dur, ys.shape[2]), np.float32)
                seg[:end - start] = ys[b, start:end]
                segs.append(seg)
                seg_owner.append((b, t))
    return np.stack(segs), seg_owner


def test_gather_segments_matches_reference_loop():
    durations, ilens, olens, ys = make_case()
    D = 7
    plan = build_plan(durations, olens, D, n_seg_padded=16,
                      max_olen=ys.shape[1])
    want, owners = oracle_segments(durations, ilens, ys, D)

    got = np.asarray(gather_segments(jnp.asarray(ys),
                                     jnp.asarray(plan.seg_utt),
                                     jnp.asarray(plan.seg_start),
                                     jnp.asarray(plan.frame_mask)))
    n = plan.n_segments
    assert n == len(owners)
    np.testing.assert_allclose(got[:n], want, atol=0)
    # pad segments must be exactly zero
    np.testing.assert_array_equal(got[n:], 0)
    # segment ownership order is utterance-major then token order
    assert [(int(u), int(t)) for u, t in
            zip(plan.seg_utt[:n], plan.seg_tok[:n])] == owners


def test_scatter_frames_inverts_gather():
    durations, ilens, olens, ys = make_case(seed=1)
    D = 7
    plan = build_plan(durations, olens, D, n_seg_padded=16,
                      max_olen=ys.shape[1])
    seg = gather_segments(jnp.asarray(ys), jnp.asarray(plan.seg_utt),
                          jnp.asarray(plan.seg_start),
                          jnp.asarray(plan.frame_mask))
    back = np.asarray(scatter_frames(seg, jnp.asarray(plan.utt_gather),
                                     jnp.asarray(plan.utt_mask)))
    np.testing.assert_allclose(back, ys, atol=0)


def test_token_vector_gather_and_position():
    durations, ilens, olens, ys = make_case(seed=2)
    D = 7
    plan = build_plan(durations, olens, D, n_seg_padded=16,
                      max_olen=ys.shape[1])
    B, Tmax = durations.shape
    hs = np.arange(B * Tmax * 3, dtype=np.float32).reshape(B, Tmax, 3)
    got = np.asarray(gather_token_vectors(jnp.asarray(hs),
                                          jnp.asarray(plan.seg_utt),
                                          jnp.asarray(plan.seg_tok)))
    n = plan.n_segments
    for i in range(n):
        np.testing.assert_array_equal(
            got[i], hs[plan.seg_utt[i], plan.seg_tok[i]])
    # position ramp: range(dur)/dur per segment (tts.py:258)
    for i in range(n):
        d = plan.seg_dur[i]
        np.testing.assert_allclose(plan.position[i, :d],
                                   np.arange(d) / d, atol=1e-7)
        np.testing.assert_array_equal(plan.position[i, d:], 0)
