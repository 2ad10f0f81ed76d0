"""Streaming Parallel-WaveGAN generator as one Pallas TPU kernel.

Measured on one quiet v5e chip — reps inside one jitted fori_loop with
fresh per-iteration noise, completion forced by host readback, RTT
subtracted (results/PWG_vocoder.json): **11.9 Msamples/s at B=1 (541x
realtime, 3.8x the XLA graph) and 22.2 Msamples/s at B=8 (1009x
realtime, 8.0x)**.  The whole 30-block stack's weights (~5.3 MB) stay
resident in VMEM and activations never touch HBM; the XLA graph
round-trips every block's (W, 128) activations through HBM instead and
flat-lines at ~2-3 Ms/s regardless of batch.  It is also a TRUE
streaming vocoder: waveform emerges tile by tile with a fixed
~total_delay(cfg)/sr (~139 ms) algorithmic latency and O(1) memory in
utterance length.

How (causal reformulation): a 'same'-padded dilated conv needs d future
samples (d = dilation; kernel 3).  Each layer is re-indexed as a CAUSAL
conv, which delays its output stream by d.  Per layer the kernel carries a
ring buffer of the last 2d input samples, so tile processing is exact:

    inp = concat(buffer_i, x_tile)               # (2d + T, C)
    out[j] = W0 @ inp[j] + W1 @ inp[j+d] + W2 @ inp[j+2d]
    residual tap  = inp[d : d+T]                 # center, same delay
    buffer_i      = inp[T : T+2d]

Cumulative delays: layer i's gates live at delay D_{i+1} = sum_{j<=i} d_j;
the mel conditioning is read from an aux history ring at static offset
(DELAY - D_{i+1}), and skip contributions are added into a (T + DELAY)
accumulator at the same static offset so all skips align at the final
delay DELAY = sum d_i = 3069.  The emitted stream equals the original
generator delayed by DELAY samples; the caller trims.

Grid = (B, n_tiles); Pallas TPU runs grid steps sequentially (last dim
fastest), so VMEM scratch legally carries stream state across tiles; state
resets when a new batch row starts (program_id(1) == 0).

Exactness: outputs match vocoder/pwg.py:pwg_generate over the WHOLE
utterance (fp reassociation only): each layer's stream is masked to zero
outside its valid original-time window [0, W) on both edges, reproducing
the 'same'-conv zero padding the full graph applies per layer (left edge:
t < 0 would otherwise be bias-driven garbage; right edge: t >= W would
otherwise be zero-noise/zero-aux continuations).  Tested to 1e-5 over
full length in tests/test_vocoder.py.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fcl_taco2_tpu.vocoder.pwg import PWGConfig, upsample_mel


def total_delay(cfg: PWGConfig) -> int:
    return int(sum(cfg.dilations))


def _round8(x):
    return -(-x // 8) * 8


def _buf_width(d):
    """Per-layer history width: at least the 2d the conv taps need, padded
    to a sublane multiple (Mosaic wants 8-aligned shapes); extra history
    rows are simply older samples that the taps skip."""
    return max(8, 2 * d)


def _stack_blocks(params, cfg):
    """Per-block params -> stacked arrays, one VMEM operand per type
    (Mosaic cannot lane-concatenate 64-wide operands, so taps stay
    separate matmuls)."""
    blocks = params["blocks"]
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    conv_w = jnp.stack([f32(b["conv"]["kernel"]) for b in blocks])
    gate_b = jnp.stack([f32(b["conv"]["bias"]) for b in blocks])
    aux_w = jnp.stack([f32(b["aux"]["kernel"][0]) for b in blocks])
    skip_w = jnp.stack([f32(b["skip"]["kernel"][0]) for b in blocks])
    skip_b = jnp.stack([f32(b["skip"]["bias"]) for b in blocks])
    out_w = jnp.stack([f32(b["out"]["kernel"][0]) for b in blocks])
    out_b = jnp.stack([f32(b["out"]["bias"]) for b in blocks])
    return conv_w, gate_b, aux_w, skip_w, skip_b, out_w, out_b


def pack_pwg_weights(params, cfg):
    """Pre-pack generator weights into the 13 fp32 kernel operands.

    Shared by the one-shot (`pwg_generate_streaming`) and stateful
    (`pwg_stream_step`) kernels; pack once and reuse across calls."""
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    conv_w, gate_b, aux_w, skip_w, skip_b, out_w, out_b = \
        _stack_blocks(params, cfg)
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    first_w = f32(params["first_conv"]["kernel"][0])      # (1, C)
    first_b = f32(params["first_conv"]["bias"])[None, :]  # (1, C)
    last1_w = f32(params["last1"]["kernel"][0])           # (C, C)
    last1_b = f32(params["last1"]["bias"])[None, :]
    last2_w = f32(params["last2"]["kernel"][0])           # (C, 1)
    last2_b = f32(params["last2"]["bias"])[None, :]
    return (conv_w, gate_b, aux_w, skip_w, skip_b, out_w, out_b,
            first_w, first_b, last1_w, last1_b, last2_w, last2_b)


def _kernel(noise_ref, aux_ref, conv_w_ref, gate_b_ref, aux_w_ref,
            skip_w_ref, skip_b_ref, out_w_ref, out_b_ref, first_w_ref,
            first_b_ref, last1_w_ref, last1_b_ref, last2_w_ref,
            last2_b_ref, out_ref, aux_hist, acc, *bufs, cfg: PWGConfig,
            T: int, delay: int, W: int):
    half = cfg.gate_channels // 2
    dils = cfg.dilations

    @pl.when(pl.program_id(1) == 0)  # new batch row: reset stream state
    def _():
        aux_hist[...] = jnp.zeros(aux_hist.shape, aux_hist.dtype)
        acc[...] = jnp.zeros(acc.shape, acc.dtype)
        for buf in bufs:
            buf[...] = jnp.zeros(buf.shape, buf.dtype)

    mm = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    # aux context for this tile: [S - delay, S + T) of the upsampled mel
    aux_ext = jnp.concatenate([aux_hist[...], aux_ref[0]], axis=0)
    aux_hist[...] = aux_ext[T:]

    # global stream position of each row in this tile: layer i's output
    # stream is only VALID on original-time t = pos - D_{i+1} in [0, W)
    # (outside, the reference's 'same' convs see zero padding; the causal
    # recomputation would fill t < 0 with bias-driven garbage and t >= W
    # with zero-noise/zero-aux continuations instead) — mask x on BOTH
    # edges so every layer's padding is exactly zero and the emitted
    # stream is bit-exact with the full graph over the whole utterance.
    # Out-of-range skip rows land at accumulator positions the caller
    # trims (< DELAY of the first tile; >= DELAY + W at the end), so only
    # x needs the mask.
    pos = (pl.program_id(1) * T
           + jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0))

    # first 1x1 conv: noise (T, 1) -> x (T, C); zero past the true sample
    # count W (the right-edge mirror of the per-layer masks: padded noise
    # rows would otherwise emit first_b instead of the graph's zero pad)
    x = noise_ref[0] * first_w_ref[0] + first_b_ref[...]
    x = jnp.where(pos < W, x, 0.0)

    cum = 0
    for i, d in enumerate(dils):
        cum += d
        bw = _buf_width(d)
        inp = jnp.concatenate([bufs[i][...], x], axis=0)  # (bw + T, C)
        bufs[i][...] = inp[T:]
        base = bw - 2 * d  # history padding the taps skip
        off = delay - cum  # delay is the 8-padded total delay
        h = (mm(inp[base:base + T], conv_w_ref[i, 0])
             + mm(inp[base + d:base + d + T], conv_w_ref[i, 1])
             + mm(inp[base + 2 * d:base + 2 * d + T], conv_w_ref[i, 2])
             + mm(aux_ext[off:off + T], aux_w_ref[i])
             + gate_b_ref[i][None, :])
        g = jnp.tanh(h[:, :half]) * jax.nn.sigmoid(h[:, half:])
        acc[off:off + T] = acc[off:off + T] \
            + mm(g, skip_w_ref[i]) + skip_b_ref[i][None, :]
        x = (mm(g, out_w_ref[i]) + out_b_ref[i][None, :]
             + inp[base + d:base + d + T]) * math.sqrt(0.5)
        x = jnp.where((pos >= cum) & (pos < W + cum), x, 0.0)

    z = acc[0:T] * math.sqrt(1.0 / cfg.layers)
    # shift the skip accumulator left by one tile
    tail = acc[T:]
    acc[...] = jnp.zeros(acc.shape, acc.dtype)
    acc[0:delay] = tail

    z = jnp.maximum(z, 0.0)
    z = jnp.maximum(mm(z, last1_w_ref[...]) + last1_b_ref[...], 0.0)
    wav = mm(z, last2_w_ref[...]) + last2_b_ref[...]  # (T, 1)
    out_ref[0] = wav


def pwg_generate_streaming(params, cfg: PWGConfig, mel, noise,
                           tile: int = 1024, interpret: bool = False):
    """mel (B, Tm, aux), noise (B, Tm*hop) -> wav (B, Tm*hop).

    Fused streaming Pallas path; exact (fp reassociation only) vs
    ``pwg_generate`` over the full length, tail included.
    """
    B, Tm, _ = mel.shape
    W = Tm * cfg.hop
    assert noise.shape == (B, W), (noise.shape, B, W)
    # the kernel computes in fp32 (fp32 accumulation, exact parity with
    # the XLA graph); accept params/inputs in any float dtype
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    delay = _round8(total_delay(cfg))  # 8-aligned buffer/stream delay
    T = tile
    n_tiles = -(-(W + delay) // T)
    Wp = n_tiles * T

    aux = upsample_mel(params, cfg, jnp.asarray(mel, jnp.float32))
    aux = jnp.pad(aux, ((0, 0), (0, Wp - W), (0, 0)))
    # noise/wav ride as (B, Wp, 1): Mosaic requires the last two block
    # dims to be (8, 128)-divisible or full — (T, 1) qualifies, (1, T)
    # does not for B > 1
    noise_p = jnp.pad(jnp.asarray(noise, jnp.float32),
                      ((0, 0), (0, Wp - W)))[..., None]

    weights = list(pack_pwg_weights(params, cfg))

    C = cfg.residual_channels
    A = cfg.aux_channels
    grid = (B, n_tiles)
    tile_spec = lambda: pl.BlockSpec(  # noqa: E731
        (1, T, 1), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)
    aux_spec = pl.BlockSpec((1, T, A), lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(  # noqa: E731
        a.shape, lambda b, t, _n=a.ndim: (0,) * _n,
        memory_space=pltpu.VMEM)

    scratch = [pltpu.VMEM((delay, A), jnp.float32),       # aux history
               pltpu.VMEM((T + delay, cfg.skip_channels), jnp.float32)]
    scratch += [pltpu.VMEM((_buf_width(d), C), jnp.float32)
                for d in cfg.dilations]

    out = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg, T=T, delay=delay, W=W),
        grid=grid,
        in_specs=[tile_spec(), aux_spec] + [full(w) for w in weights],
        out_specs=tile_spec(),
        out_shape=jax.ShapeDtypeStruct((B, Wp, 1), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(noise_p, aux, *weights)
    return out[:, delay:delay + W, 0]


# ----------------------------------------------------------------------
# stateful streaming: carry the ring-buffer state ACROSS calls
# ----------------------------------------------------------------------
#
# `pwg_generate_streaming` above is one-shot: stream state lives in VMEM
# scratch and dies with the call.  For real-time TTS (infer/stream.py)
# the mel arrives chunk by chunk, so the state must survive between
# calls: `pwg_stream_state` allocates it as device arrays, and
# `pwg_stream_step` runs the same causal kernel over one chunk of the
# sample stream, loading the state at the first tile and writing it back
# at the last.  Chaining steps over [0, W+delay) reproduces the one-shot
# output bit-for-bit (tested); the per-call algorithmic latency stays the
# fixed `total_delay(cfg)` samples (~139 ms at 22.05 kHz).


def pwg_stream_state(cfg: PWGConfig, B: int = 1):
    """Zero-initialized cross-call stream state (a fresh stream)."""
    delay = _round8(total_delay(cfg))
    return {
        "aux_hist": jnp.zeros((B, delay, cfg.aux_channels), jnp.float32),
        "acc": jnp.zeros((B, delay, cfg.skip_channels), jnp.float32),
        "bufs": tuple(
            jnp.zeros((B, _buf_width(d), cfg.residual_channels),
                      jnp.float32) for d in cfg.dilations),
    }


def _stream_kernel(start_ref, w_ref, noise_ref, aux_ref, conv_w_ref,
                   gate_b_ref, aux_w_ref, skip_w_ref, skip_b_ref,
                   out_w_ref, out_b_ref, first_w_ref, first_b_ref,
                   last1_w_ref, last1_b_ref, last2_w_ref, last2_b_ref,
                   ah_in_ref, acc_in_ref, *rest, cfg: PWGConfig, T: int,
                   delay: int, n_tiles: int):
    n = cfg.layers
    bufs_in = rest[:n]
    out_ref, ah_out_ref, acc_out_ref = rest[n:n + 3]
    bufs_out = rest[n + 3:n + 3 + n]
    aux_hist, acc = rest[n + 3 + n], rest[n + 4 + n]
    bufs = rest[n + 5 + n:]
    half = cfg.gate_channels // 2
    dils = cfg.dilations
    W = w_ref[0]

    @pl.when(pl.program_id(1) == 0)  # first tile of the call: load state
    def _():
        aux_hist[...] = ah_in_ref[0]
        acc[...] = jnp.zeros(acc.shape, acc.dtype)
        acc[0:delay] = acc_in_ref[0]
        for buf, bi in zip(bufs, bufs_in):
            buf[...] = bi[0]

    mm = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    aux_ext = jnp.concatenate([aux_hist[...], aux_ref[0]], axis=0)
    aux_hist[...] = aux_ext[T:]

    # global stream position (cross-call: offset by the caller's start)
    pos = (start_ref[0] + pl.program_id(1) * T
           + jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0))

    x = noise_ref[0] * first_w_ref[0] + first_b_ref[...]
    x = jnp.where(pos < W, x, 0.0)

    cum = 0
    for i, d in enumerate(dils):
        cum += d
        bw = _buf_width(d)
        inp = jnp.concatenate([bufs[i][...], x], axis=0)  # (bw + T, C)
        bufs[i][...] = inp[T:]
        base = bw - 2 * d
        off = delay - cum
        h = (mm(inp[base:base + T], conv_w_ref[i, 0])
             + mm(inp[base + d:base + d + T], conv_w_ref[i, 1])
             + mm(inp[base + 2 * d:base + 2 * d + T], conv_w_ref[i, 2])
             + mm(aux_ext[off:off + T], aux_w_ref[i])
             + gate_b_ref[i][None, :])
        g = jnp.tanh(h[:, :half]) * jax.nn.sigmoid(h[:, half:])
        acc[off:off + T] = acc[off:off + T] \
            + mm(g, skip_w_ref[i]) + skip_b_ref[i][None, :]
        x = (mm(g, out_w_ref[i]) + out_b_ref[i][None, :]
             + inp[base + d:base + d + T]) * math.sqrt(0.5)
        x = jnp.where((pos >= cum) & (pos < W + cum), x, 0.0)

    z = acc[0:T] * math.sqrt(1.0 / cfg.layers)
    tail = acc[T:]
    acc[...] = jnp.zeros(acc.shape, acc.dtype)
    acc[0:delay] = tail

    z = jnp.maximum(z, 0.0)
    z = jnp.maximum(mm(z, last1_w_ref[...]) + last1_b_ref[...], 0.0)
    out_ref[0] = mm(z, last2_w_ref[...]) + last2_b_ref[...]

    @pl.when(pl.program_id(1) == n_tiles - 1)  # last tile: save state
    def _():
        ah_out_ref[0] = aux_hist[...]
        acc_out_ref[0] = acc[0:delay]
        for bo, buf in zip(bufs_out, bufs):
            bo[0] = buf[...]


def pwg_stream_step(packed, cfg: PWGConfig, state, aux, noise, start, W,
                    tile: int = 1024, interpret: bool = False):
    """One streaming-vocoder call over a chunk of the sample stream.

    Args:
        packed: output of ``pack_pwg_weights`` (13 fp32 operands).
        state: from ``pwg_stream_state`` or the previous call.
        aux: (B, Vh, aux_channels) already-UPSAMPLED conditioning SAMPLES
            for stream positions [start, start+Vh); rows at positions
            >= W must be zero (the one-shot path's zero padding).
        noise: (B, Vh) input noise for the same positions (content past
            W is ignored — the kernel masks it).
        start: stream position of aux[:, 0] (int scalar, traceable).
        W: total real sample count of the stream (= frames*hop; int
            scalar, traceable).

    Returns (wav, new_state): wav (B, Vh) are stream positions
    [start, start+Vh); positions in [delay, delay+W) carry valid audio
    (delay = _round8(total_delay(cfg))) — the caller trims.  Chaining
    calls over [0, ceil((W+delay)/Vh)*Vh) is bit-identical to
    ``pwg_generate_streaming`` over the whole utterance.
    """
    B, Vh, A = aux.shape
    T = tile
    assert Vh % T == 0, (Vh, T)
    n_tiles = Vh // T
    assert noise.shape == (B, Vh), (noise.shape, B, Vh)
    delay = _round8(total_delay(cfg))
    C = cfg.residual_channels
    S = cfg.skip_channels

    noise_p = jnp.asarray(noise, jnp.float32)[..., None]
    start_a = jnp.reshape(jnp.asarray(start, jnp.int32), (1,))
    w_a = jnp.reshape(jnp.asarray(W, jnp.int32), (1,))

    grid = (B, n_tiles)
    smem = lambda: pl.BlockSpec((1,), lambda b, t: (0,),  # noqa: E731
                                memory_space=pltpu.SMEM)
    tile_spec = lambda: pl.BlockSpec(  # noqa: E731
        (1, T, 1), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)
    aux_spec = pl.BlockSpec((1, T, A), lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(  # noqa: E731
        a.shape, lambda b, t, _n=a.ndim: (0,) * _n,
        memory_space=pltpu.VMEM)
    row = lambda a: pl.BlockSpec(  # noqa: E731
        (1,) + a.shape[1:], lambda b, t: (b,) + (0,) * (a.ndim - 1),
        memory_space=pltpu.VMEM)

    state_in = [state["aux_hist"], state["acc"], *state["bufs"]]
    in_specs = ([smem(), smem(), tile_spec(), aux_spec]
                + [full(w) for w in packed]
                + [row(s) for s in state_in])
    out_shape = [jax.ShapeDtypeStruct((B, Vh, 1), jnp.float32),
                 jax.ShapeDtypeStruct((B, delay, A), jnp.float32),
                 jax.ShapeDtypeStruct((B, delay, S), jnp.float32)] + [
        jax.ShapeDtypeStruct((B, _buf_width(d), C), jnp.float32)
        for d in cfg.dilations]
    out_specs = [tile_spec(),
                 pl.BlockSpec((1, delay, A), lambda b, t: (b, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, delay, S), lambda b, t: (b, 0, 0),
                              memory_space=pltpu.VMEM)] + [
        pl.BlockSpec((1, _buf_width(d), C), lambda b, t: (b, 0, 0),
                     memory_space=pltpu.VMEM) for d in cfg.dilations]
    scratch = [pltpu.VMEM((delay, A), jnp.float32),
               pltpu.VMEM((T + delay, S), jnp.float32)]
    scratch += [pltpu.VMEM((_buf_width(d), C), jnp.float32)
                for d in cfg.dilations]

    outs = pl.pallas_call(
        functools.partial(_stream_kernel, cfg=cfg, T=T, delay=delay,
                          n_tiles=n_tiles),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(start_a, w_a, noise_p, jnp.asarray(aux, jnp.float32), *packed,
      *state_in)
    wav, ah, acc = outs[0], outs[1], outs[2]
    return wav[..., 0], {"aux_hist": ah, "acc": acc,
                         "bufs": tuple(outs[3:])}


def vocode(params, cfg: PWGConfig, mel, noise, backend: str = "auto",
           tile: int = 1024):
    """Best-path vocode dispatch: the fused streaming kernel on TPU
    (results/PWG_vocoder.json: 3.4-10x the XLA graph), exact chunked XLA
    elsewhere.  Jittable; same (B, W) output either way."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        return pwg_generate_streaming(params, cfg, mel, noise, tile=tile)
    from fcl_taco2_tpu.vocoder.pwg import pwg_generate_chunked
    # one-sided receptive field: conv stack (== total_delay samples) PLUS
    # the mel-grid context of conv_in and the upsample smoothing convs
    ctx = (-(-total_delay(cfg) // cfg.hop) + cfg.aux_context_window
           + sum(cfg.upsample_scales) + 1)
    return pwg_generate_chunked(params, cfg, mel, noise,
                                chunk_frames=128, context_frames=ctx)
