"""1-D convolution, batch norm, and layer norm as pure functions.

Layout convention is channels-last (B, T, C) throughout — XLA:TPU prefers the
feature dim innermost (lane dim = 128); the reference's torch code is
channels-first (B, C, T) and transposes around every conv
(/root/reference/nets/modules/encoder_sa.py:134, variance_predictor.py:86-90).

BatchNorm parity note: torch BatchNorm1d over padded (B, C, T) includes
padded positions in the batch statistics; the reference trains that way
(encoder_sa.py:74, decoder_sa.py:214).  ``batch_norm`` reproduces exactly
that (no masking), with running stats updated using torch's rules (momentum
0.1, biased variance for the normalizer, unbiased for the running var).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


def conv1d(x, kernel, bias=None):
    """Same-padded 1-D conv. x: (B, T, Cin); kernel: (W, Cin, Cout)."""
    width = kernel.shape[0]
    pad = (width - 1) // 2
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if bias is not None:
        out = out + bias
    return out


class BatchNormParams(NamedTuple):
    scale: jax.Array  # (C,) gamma
    bias: jax.Array  # (C,) beta


class BatchNormState(NamedTuple):
    mean: jax.Array  # (C,) running mean
    var: jax.Array  # (C,) running var (unbiased, torch-style)


def batch_norm(x, params: BatchNormParams, state: BatchNormState, *, train,
               momentum=0.1, eps=1e-5, mask=None):
    """BatchNorm over positions of (B, T, C) (torch BatchNorm1d layout).

    With ``mask`` (B, T) the statistics cover VALID positions only.  The
    torch reference pads only to the per-batch max (tts.py:545-550), so its
    padding dilution is small; this codebase pads to fixed corpus-wide
    shapes plus empty batch-fill utterances, where unmasked statistics
    would be dominated by zeros — masked stats are required for training
    parity (pass mask=None only for exact torch-semantics unit tests).

    Returns (y, new_state). In eval mode new_state is state unchanged.
    Statistics are always computed in fp32 (mixed-precision safe); the
    output keeps the input dtype.
    """
    in_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    scale = params.scale.astype(jnp.float32)
    bias = params.bias.astype(jnp.float32)
    if train:
        if mask is None:
            n = x.shape[0] * x.shape[1]
            mean = jnp.mean(x32, axis=(0, 1))
            var = jnp.mean(jnp.square(x32 - mean), axis=(0, 1))  # biased
        else:
            m = mask.astype(jnp.float32)[..., None]
            n = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x32 * m, axis=(0, 1)) / n
            var = jnp.sum(jnp.square(x32 - mean) * m, axis=(0, 1)) / n
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        if mask is None:
            unbiased = var * (n / max(n - 1, 1))
        else:
            unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
        new_state = BatchNormState(
            mean=(1 - momentum) * state.mean + momentum * mean,
            var=(1 - momentum) * state.var + momentum * unbiased,
        )
    else:
        y = (x32 - state.mean) * jax.lax.rsqrt(state.var + eps)
        new_state = state
    return (y * scale + bias).astype(in_dtype), new_state


def layer_norm(x, scale, bias, eps=1e-12):
    """LayerNorm over the last dim (espnet transformer LayerNorm parity,
    used by the variance/duration predictors: variance_predictor.py:62).
    fp32 statistics, output in the input dtype."""
    in_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) \
        * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(in_dtype)
