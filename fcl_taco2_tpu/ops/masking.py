"""Mask utilities (TPU-native replacements for espnet make_(non_)pad_mask).

Reference semantics: espnet ``make_non_pad_mask(lengths)`` gives True where
position < length (used all over /root/reference/tts.py and the loss modules,
e.g. nets/teacher_training/e2e_tts_tacotron2_sa.py:61, 563).  Losses then do
``masked_select(...).mean()``; here that becomes a masked mean with explicit
valid-element counting — identical value, no dynamic shapes.
"""

import jax.numpy as jnp


def lengths_to_non_pad_mask(lengths, max_len):
    """(B,) int lengths -> (B, max_len) bool, True at valid positions."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return pos < lengths[:, None]


def lengths_to_pad_mask(lengths, max_len):
    """(B,) int lengths -> (B, max_len) bool, True at padded positions."""
    return ~lengths_to_non_pad_mask(lengths, max_len)


def masked_mean(values, mask, eps=0.0):
    """Mean of ``values`` over elements where ``mask`` is True.

    Equals ``values.masked_select(mask).mean()`` in the reference losses.
    ``mask`` broadcasts against ``values``; the denominator counts the
    broadcast number of selected elements.
    """
    mask = jnp.broadcast_to(mask, values.shape)
    mask_f = mask.astype(values.dtype)
    total = jnp.sum(values * mask_f)
    count = jnp.sum(mask_f)
    return total / jnp.maximum(count, 1.0 if eps == 0.0 else eps)


def weighted_masked_sum(err, mask, n_valid_utts):
    """Reference ``use_weighted_masking`` reduction (Tacotron2Loss,
    e2e_tts_tacotron2_sa.py:72-80): per-element weights
    ``mask / mask.sum(time)`` (each utterance contributes equally
    regardless of length), divided by ``batch * feat_dim``, then the
    weighted error is summed.

    Two deliberate deltas from the literal torch code, both documented:
    - ``n_valid_utts`` replaces the reference's ``ys.size(0)``: the static
      batch axis here can carry all-pad ghost rows (olens=0) that the
      reference never sees; counting them would dilute the loss by the
      padding factor.
    - a ``max(count, 1)`` guard keeps ghost rows finite (their mask is
      all-False so they contribute exactly 0 either way).

    ``err`` is (B, T) or (B, T, C); ``mask`` is bool (B, T) or (B, T, 1)
    and must NOT be pre-broadcast over the feature axis — the per-utterance
    count is a frame count (masks.sum(dim=1) in the reference), not an
    element count.
    """
    mask_f = mask.astype(err.dtype)
    per_utt_frames = jnp.sum(mask_f, axis=1, keepdims=True)
    feat = err.shape[-1] if err.ndim == 3 else 1
    w = mask_f / jnp.maximum(per_utt_frames, 1.0)
    w = w / (jnp.maximum(n_valid_utts, 1.0).astype(err.dtype) * feat)
    return jnp.sum(err * w)


def weighted_l1(pred, target, mask, n_valid_utts):
    """use_weighted_masking L1 (Tacotron2Loss:72-80)."""
    return weighted_masked_sum(jnp.abs(pred - target), mask, n_valid_utts)


def weighted_mse(pred, target, mask, n_valid_utts):
    """use_weighted_masking MSE (Tacotron2Loss:72-80)."""
    diff = pred - target
    return weighted_masked_sum(diff * diff, mask, n_valid_utts)


def masked_l1(pred, target, mask):
    """Masked-mean L1, reference Tacotron2Loss l1_criterion semantics.
    ``mask=None`` is the use_masking=False path: a plain mean over the
    padded buffer (torch L1Loss(reduction='mean'))."""
    err = jnp.abs(pred - target)
    return jnp.mean(err) if mask is None else masked_mean(err, mask)


def masked_mse(pred, target, mask):
    """Masked-mean MSE, reference Tacotron2Loss mse_criterion semantics.
    ``mask=None`` = unmasked mean (use_masking=False)."""
    diff = pred - target
    err = diff * diff
    return jnp.mean(err) if mask is None else masked_mean(err, mask)
