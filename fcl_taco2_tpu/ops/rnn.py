"""LSTM primitives as pure functions over parameter pytrees.

TPU-first design notes:

- The cell is a single fused GEMM per gate block: ``x @ Wx + h @ Wh + b``
  with the 4 gates packed in one matrix (i, f, g, o — torch gate order, so
  torch LSTM checkpoints load directly).
- Sequences run under ``jax.lax.scan``; the *input* projection
  ``x @ Wx + b`` is hoisted out of the scan as one large batched GEMM
  (time-major (T*B, D) @ (D, 4H)) so the scan body only does the recurrent
  (B, H) @ (H, 4H) matmul. This is the standard way to keep the MXU fed for
  RNNs; the reference instead loops torch LSTMCell per step
  (/root/reference/nets/modules/decoder_sa.py:493-513).
- Variable-length ("packed") semantics from torch pack_padded_sequence
  (/root/reference/nets/modules/encoder_sa.py:143-146) are reproduced with
  masked state updates: past a sequence's length the carry is frozen, and
  outputs there are zero.
- Zoneout (decoder_sa.py:82-96): train draws a bernoulli keep-old mask per
  element; eval blends ``rate*old + (1-rate)*new``.

Parameters for one cell (matching torch.nn.LSTMCell, transposed to
right-multiply): ``wx`` (in, 4H), ``wh`` (H, 4H), ``bx`` (4H,), ``bh`` (4H,).
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class LSTMParams(NamedTuple):
    wx: jax.Array  # (in_dim, 4H)
    wh: jax.Array  # (H, 4H)
    bx: jax.Array  # (4H,)
    bh: jax.Array  # (4H,)


def lstm_cell(params: LSTMParams, x, h, c, *, precomputed_xproj=None):
    """One LSTM step. Gate packing is torch order [i, f, g, o].

    Args:
        x: (B, in_dim) input (ignored if precomputed_xproj given).
        h, c: (B, H) previous states.
        precomputed_xproj: optional (B, 4H) = x @ wx + bx, hoisted GEMM.
    Returns:
        (h_new, c_new)
    """
    if precomputed_xproj is None:
        gates = x @ params.wx + params.bx + h @ params.wh + params.bh
    else:
        gates = precomputed_xproj + h @ params.wh + params.bh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def zoneout_keep_masks(zo_key, n, P, H, rate, impl):
    """``n`` keep-old bernoulli masks for one decoder step, ONE bits call.

    The reference draws each mask with an independent torch RNG op
    (decoder_sa.py:91-93); a jax translation (split + bernoulli per mask)
    spends ~20% of the teacher decoder's train-scan time in threefry lane
    math (results/PALLAS_decoder.json train_scan_experiments).  Batching
    the draw and, with impl='rbg', lowering to XLA RngBitGenerator (the
    TPU hardware PRNG) makes the masks nearly free; 'threefry' keeps
    jax's default counter-based stream.  ``zo_key`` is a raw uint32[2]
    key-data pair (one per scan step).  Deterministic in ``zo_key`` — the
    custom-VJP backward (ops/rnn_vjp.py) recomputes the same masks instead
    of saving them."""
    if impl == "rbg":
        key = jax.random.wrap_key_data(jnp.tile(zo_key, 2),
                                       impl="unsafe_rbg")
    else:
        key = jax.random.wrap_key_data(zo_key, impl="threefry2x32")
    bits = jax.random.bits(key, (n, P, H), jnp.uint32)
    threshold = jnp.uint32(round(rate * 0xFFFFFFFF))
    return bits < threshold


def zoneout(old, new, rate, *, train, rng=None, keep=None):
    """Zoneout state blend (reference decoder_sa.py:82-96).

    train: per-element bernoulli(rate) mask keeps the OLD state — drawn
        from ``rng`` unless a precomputed boolean ``keep`` mask is given
        (the decoder generates all step masks in one cheap RNG call,
        models/decoder._zoneout_keep_masks).
    eval:  deterministic expectation blend rate*old + (1-rate)*new.
    """
    if rate <= 0.0:
        return new
    if train:
        if keep is None:
            keep = jax.random.bernoulli(rng, rate, old.shape)
        return jnp.where(keep, old, new)
    return rate * old + (1.0 - rate) * new


def lstm_scan(
    params: LSTMParams,
    xs,
    lengths: Optional[jax.Array] = None,
    reverse: bool = False,
    h0=None,
    c0=None,
):
    """Run an LSTM over a (B, T, in) sequence with packed-sequence semantics.

    With ``reverse=True`` the recurrence runs T-1..0 (like the backward half
    of a torch bidirectional LSTM over a packed sequence): for each example
    the state only starts to update once t < length, so the backward pass
    sees exactly the valid suffix — outputs at padded positions are zero.

    Returns (B, T, H) outputs and final (h, c).
    """
    B, T, _ = xs.shape
    H = params.wh.shape[0]
    dtype = xs.dtype
    if h0 is None:
        h0 = jnp.zeros((B, H), dtype)
    if c0 is None:
        c0 = jnp.zeros((B, H), dtype)

    # Hoist the input projection out of the scan: one (B*T, in) @ (in, 4H).
    xproj = (xs.reshape(B * T, -1) @ params.wx + params.bx).reshape(B, T, -1)
    xproj = jnp.swapaxes(xproj, 0, 1)  # (T, B, 4H) time-major for scan

    if lengths is None:
        valid = None
    else:
        t_idx = jnp.arange(T, dtype=lengths.dtype)
        valid = (t_idx[None, :] < lengths[:, None]).T  # (T, B)

    def step(carry, inp):
        h, c = carry
        if valid is None:
            xp = inp
            h_new, c_new = lstm_cell(params, None, h, c, precomputed_xproj=xp)
            out = h_new
        else:
            xp, v = inp
            h_new, c_new = lstm_cell(params, None, h, c, precomputed_xproj=xp)
            v = v[:, None]
            h_new = jnp.where(v, h_new, h)
            c_new = jnp.where(v, c_new, c)
            out = jnp.where(v, h_new, jnp.zeros_like(h_new))
        return (h_new, c_new), out

    inputs = xproj if valid is None else (xproj, valid)
    (h_f, c_f), outs = jax.lax.scan(step, (h0, c0), inputs, reverse=reverse)
    return jnp.swapaxes(outs, 0, 1), (h_f, c_f)


def bilstm(params_fwd: LSTMParams, params_bwd: LSTMParams, xs, lengths):
    """Bidirectional LSTM, torch packed-sequence parity.

    Reference: encoder BiLSTM /root/reference/nets/modules/encoder_sa.py:96-146
    (1 layer, hidden eunits//2 each direction, concat outputs).
    """
    out_f, _ = lstm_scan(params_fwd, xs, lengths, reverse=False)
    out_b, _ = lstm_scan(params_bwd, xs, lengths, reverse=True)
    return jnp.concatenate([out_f, out_b], axis=-1)


def bilstm_stack(layers, xs, lengths):
    """Stacked bidirectional LSTM (torch ``nn.LSTM(..., num_layers=elayers,
    bidirectional=True)``, encoder_sa.py:96-99): layer l>0 consumes the
    concatenated fwd/bwd outputs of layer l-1.

    Args:
        layers: sequence of (params_fwd, params_bwd) LSTMParams pairs.
    """
    for params_fwd, params_bwd in layers:
        xs = bilstm(params_fwd, params_bwd, xs, lengths)
    return xs
