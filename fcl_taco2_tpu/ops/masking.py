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
