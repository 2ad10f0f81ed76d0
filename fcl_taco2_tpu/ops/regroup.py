"""Phoneme <-> utterance frame regrouping as static-shape device gathers.

The semi-autoregressive trick: all phonemes of all utterances in a batch are
flattened into one "phoneme batch" of segments, each at most ``max_dur``
frames, so the AR decoder loop length is max_dur (<=50) instead of the
utterance length.

The reference does this with Python loops on the host per batch
(/root/reference/tts.py:243-263 builds new_ys / non_zero_lens_mask /
ds_nonzeros / output_masks / position; /root/reference/nets/modules/
decoder_sa.py:516-523 regroups decoder outputs back into utterances with
cumulative-length slicing).  Here the host builds small int32 index plans
with vectorized numpy (O(total_frames), no per-phoneme Python), and the
device does two gathers:

- ``gather_segments``: (B, Lmax, C) utterance-major -> (P, D, C)
  phoneme-major (the decoder's teacher-forcing targets / prev-frames).
- ``scatter_frames``: (P, D, C) phoneme-major -> (B, Lmax, C)
  utterance-major (the decoder outputs, before postnet).

Semantics parity: zero-duration phonemes are dropped (reference
non_zero_lens_mask, tts.py:255-260); segment order is utterance-major then
token order, so the concatenation of segments equals the original frame
order per utterance (decoder_sa.py:516-523 relies on this).

All shapes are static: P (segment count) and Lmax/Tmax are bucketed by the
converter so XLA compiles once per bucket.
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class RegroupPlan(NamedTuple):
    """Static-shape index plan for one batch. All host-built numpy int32."""

    seg_utt: np.ndarray      # (P,) utterance index of each segment (0 pad)
    seg_tok: np.ndarray      # (P,) token position within utterance (0 pad)
    seg_start: np.ndarray    # (P,) first frame of segment in utterance
    seg_dur: np.ndarray      # (P,) frames in segment (0 for pad segments)
    seg_mask: np.ndarray     # (P,) bool, True for real segments
    frame_mask: np.ndarray   # (P, D) bool, True where d < seg_dur
    position: np.ndarray     # (P, D) float32, d / dur (reference tts.py:258)
    utt_gather: np.ndarray   # (B, Lmax) flat index into (P*D) phoneme frames
    utt_mask: np.ndarray     # (B, Lmax) bool, True at valid output frames
    n_segments: int          # real (unpadded) segment count


def build_plan(durations, olens, max_dur, n_seg_padded, max_olen):
    """Build a RegroupPlan on the host.

    Args:
        durations: (B, Tmax) int array of per-token frame durations
            (0 beyond ilens and for zero-length tokens).
        olens: (B,) total frames per utterance (== durations.sum(1)).
        max_dur: D, static per-segment frame budget (reference caps at 50,
            preprocess.py:203).
        n_seg_padded: P, static segment-count bucket (>= #nonzero tokens).
        max_olen: Lmax, static utterance frame bucket.
    """
    durations = np.asarray(durations, dtype=np.int32)
    olens = np.asarray(olens, dtype=np.int32)
    B, Tmax = durations.shape

    utt_idx, tok_idx = np.nonzero(durations > 0)  # utterance-major order
    seg_dur_real = durations[utt_idx, tok_idx]
    n_seg = len(utt_idx)
    if n_seg > n_seg_padded:
        raise ValueError(
            f"segment bucket too small: {n_seg} segments > {n_seg_padded}")
    if seg_dur_real.size and int(seg_dur_real.max()) > max_dur:
        raise ValueError(
            f"duration {int(seg_dur_real.max())} exceeds max_dur={max_dur}")

    # start frame of each token within its utterance = exclusive cumsum of
    # durations along the token axis
    starts_all = np.cumsum(durations, axis=1) - durations
    seg_start_real = starts_all[utt_idx, tok_idx]

    P, D = n_seg_padded, max_dur
    seg_utt = np.zeros(P, np.int32)
    seg_tok = np.zeros(P, np.int32)
    seg_start = np.zeros(P, np.int32)
    seg_dur = np.zeros(P, np.int32)
    seg_utt[:n_seg] = utt_idx
    seg_tok[:n_seg] = tok_idx
    seg_start[:n_seg] = seg_start_real
    seg_dur[:n_seg] = seg_dur_real
    seg_mask = np.zeros(P, bool)
    seg_mask[:n_seg] = True

    d_range = np.arange(D, dtype=np.int32)[None, :]
    frame_mask = d_range < seg_dur[:, None]  # (P, D)
    # per-phoneme normalized position ramp: range(dur)/dur (tts.py:258)
    position = np.where(
        frame_mask, d_range / np.maximum(seg_dur[:, None], 1), 0.0
    ).astype(np.float32)

    # inverse map: utterance frame (b, l) -> flat phoneme frame p*D + d.
    # Frames of segment p land at rows seg_utt[p], cols seg_start[p]..+dur.
    utt_gather = np.zeros((B, max_olen), np.int32)
    total = int(seg_dur_real.sum())
    if total:
        seg_of_frame = np.repeat(np.arange(n_seg, dtype=np.int64),
                                 seg_dur_real)
        # offset within segment: arange over each run
        frame_off = (np.arange(total, dtype=np.int64)
                     - np.repeat(np.cumsum(seg_dur_real) - seg_dur_real,
                                 seg_dur_real))
        rows = utt_idx[seg_of_frame]
        cols = seg_start_real[seg_of_frame] + frame_off
        utt_gather[rows, cols] = (seg_of_frame * D + frame_off).astype(
            np.int32)
    utt_mask = (np.arange(max_olen, dtype=np.int32)[None, :]
                < olens[:, None])

    return RegroupPlan(seg_utt, seg_tok, seg_start, seg_dur, seg_mask,
                       frame_mask, position, utt_gather, utt_mask, n_seg)


# ----- device-side gathers (jittable; plan fields arrive as arrays) -----

def gather_token_vectors(hs, seg_utt, seg_tok):
    """(B, Tmax, C) token vectors -> (P, C) per-segment encoder vectors.

    Replaces ``hs[non_zero_lens_mask.eq(1)]`` (decoder_sa.py:467).
    """
    return hs[seg_utt, seg_tok]


def gather_segments(ys, seg_utt, seg_start, frame_mask):
    """(B, Lmax, C) frames -> (P, D, C) per-segment frames, zero padded.

    Replaces the converter's per-phoneme mel slicing (tts.py:243-263).
    """
    D = frame_mask.shape[1]
    d = jnp.arange(D, dtype=seg_start.dtype)[None, :]
    cols = jnp.minimum(seg_start[:, None] + d, ys.shape[1] - 1)
    out = ys[seg_utt[:, None], cols]  # (P, D, C)
    return out * frame_mask[..., None].astype(ys.dtype)


def scatter_frames(seg_out, utt_gather, utt_mask):
    """(P, D, C) phoneme-major frames -> (B, Lmax, C) utterance-major.

    Replaces output regrouping via output_masks + cumulative ylens slicing
    (decoder_sa.py:516-523).
    """
    P, D, C = seg_out.shape
    flat = seg_out.reshape(P * D, C)
    out = flat[utt_gather]  # (B, Lmax, C)
    return out * utt_mask[..., None].astype(seg_out.dtype)
