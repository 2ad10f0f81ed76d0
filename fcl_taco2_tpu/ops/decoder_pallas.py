"""Fused semi-autoregressive decoder loop as one Pallas TPU kernel.

The AR hot loop (reference decoder_sa.py:591-617; our lax.scan in
models/decoder.py) runs prenet -> 2x zoneout-LSTM -> feat_out per frame.
Under XLA each scan step re-reads every weight matrix from HBM; for the
student model (256-d) all decoder weights total only a few MB, so this
kernel keeps them RESIDENT IN VMEM across all ``max_dur`` steps and grids
over phoneme tiles — HBM traffic drops from O(D * weights) to
O(weights + outputs).

Step math parity (eval mode, as used at inference):
    enc_gates   = enc @ Wx0_enc          (hoisted: enc is step-invariant)
    prenet      = relu(relu(prev @ W1 + b1) dropout @ W2 + b2) dropout
    gates0      = enc_gates + prenet @ Wx0_pre + pos_t * Wx0_pos + b0
                  + h0 @ Wh0 + bh0
    (i,f,g,o)   -> zoneout eval blend (rate*old + (1-rate)*new)
    layer 1     likewise on h0
    out         = h1 @ Wf_z + enc @ Wf_enc      (hoisted enc part)
    prev        = out (autoregressive feedback)

The always-on prenet dropout (decoder_sa.py:109-112) uses the on-core PRNG
(pltpu.prng_*); pass dropout_rate=0.0 for deterministic parity testing.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # phoneme rows per grid step (fp32 sublane-friendly)


def tile_step_bounds(flat_dur):
    """Per-tile AR step bounds for the ragged decode: the max duration in
    each TILE-row group of ``flat_dur`` (traced, device-side).  The shape
    ((ceil(P/TILE),)) matches both kernels' internal grid exactly — every
    caller must build bounds through this helper so a TILE change cannot
    desynchronize them."""
    P = flat_dur.shape[0]
    n_tiles = -(-P // TILE)
    padded = jnp.zeros(n_tiles * TILE, jnp.int32).at[:P].set(
        flat_dur.astype(jnp.int32))
    return padded.reshape(n_tiles, TILE).max(axis=1)


def _dropout_bits(shape, rate):
    """Bernoulli keep mask from on-core PRNG; scale kept values.

    pltpu.prng_random_bits returns SIGNED int32 (its abstract eval is
    int32), uniform over the full 32-bit range — so the keep threshold
    must live in the signed domain: keep iff bits < -2^31 +
    round((1-rate)*2^32).  The uint32 threshold this used before r5
    compared as INT32_MAX for rate <= 0.5, keeping ~everything while
    still scaling by 1/(1-rate): the kernels applied no dropout and ran
    ~2x-hot prenet activations (+7.4 dB teacher MCD,
    results/MCD_e2e.json backend_quality row).  Statistics pinned by
    tests/test_pallas_decoder.py::test_dropout_bits_statistics."""
    bits = pltpu.prng_random_bits(shape)  # int32, full-range uniform
    t = int((1.0 - rate) * 4294967296.0) - 2147483648
    threshold = jnp.int32(max(min(t, 2147483647), -2147483648))
    return (bits < threshold).astype(jnp.float32) / (1.0 - rate)


def _kernel(seed_ref, bounds_ref, enc_ref, pos_ref, pre_w1_ref, pre_b1_ref,
            pre_w2_ref, pre_b2_ref, wx0_pre_ref, wx0_pos_ref, bx0_ref,
            wh0_ref, bh0_ref, wx1_ref, bx1_ref, wh1_ref, bh1_ref, wf_z_ref,
            wx0_enc_ref, wf_enc_ref, out_ref, *, D, odim, dunits, zoneout,
            dropout, ragged):
    wdt = wh0_ref.dtype  # fp32 (exact parity) or bf16 (halved residency)

    def mm(a, w_ref):
        # activations cast to the weight dtype feed the MXU natively;
        # accumulation is always fp32 (preferred_element_type)
        return jnp.dot(a.astype(wdt), w_ref[:],
                       preferred_element_type=jnp.float32)

    if dropout > 0.0:  # TPU-only PRNG; skipped in deterministic mode
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    enc = enc_ref[:]  # (TILE, idim)
    # hoisted step-invariant GEMMs
    enc_gates = mm(enc, wx0_enc_ref) + bx0_ref[:]
    enc_out = mm(enc, wf_enc_ref)

    keep = 1.0 - zoneout

    def lstm_half(gates, h, c):
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        # zoneout eval blend (decoder_sa.py:96)
        return zoneout * h + keep * h_new, zoneout * c + keep * c_new

    def step(t, carry):
        prev, h0, c0, h1, c1 = carry
        # prenet (always-on dropout)
        p = jnp.maximum(mm(prev, pre_w1_ref) + pre_b1_ref[:], 0.0)
        if dropout > 0.0:
            p = p * _dropout_bits(p.shape, dropout)
        p = jnp.maximum(mm(p, pre_w2_ref) + pre_b2_ref[:], 0.0)
        if dropout > 0.0:
            p = p * _dropout_bits(p.shape, dropout)

        pos_t = pos_ref[t, :][:, None]  # (TILE, 1); position stored
        # (D, TILE) so the dynamic step index hits the sublane dim
        # (lane-dim dynamic slices are not Mosaic-addressable)
        gates0 = (enc_gates
                  + mm(p, wx0_pre_ref)
                  + pos_t * wx0_pos_ref[:].astype(jnp.float32)
                  + mm(h0, wh0_ref)
                  + bh0_ref[:])
        h0n, c0n = lstm_half(gates0, h0, c0)
        gates1 = mm(h0n, wx1_ref) + bx1_ref[:] + mm(h1, wh1_ref) + bh1_ref[:]
        h1n, c1n = lstm_half(gates1, h1, c1)
        out = mm(h1n, wf_z_ref) + enc_out
        out_ref[:, t, :] = out
        return (out, h0n, c0n, h1n, c1n)

    zeros = jnp.zeros((TILE, dunits), jnp.float32)
    prev0 = jnp.zeros((TILE, odim), jnp.float32)
    if ragged:
        # ragged mode: this tile's AR loop runs only to the tile's max
        # duration (caller sorts segments by duration so short tiles stop
        # early); frames past the bound are never written, so zero the
        # output block first — the caller's frame_mask multiply must see
        # zeros, not stale VMEM
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
        bound = jnp.minimum(bounds_ref[pl.program_id(0)], D)
        jax.lax.fori_loop(0, bound, step,
                          (prev0, zeros, zeros, zeros, zeros))
    else:
        jax.lax.fori_loop(0, D, step, (prev0, zeros, zeros, zeros, zeros))


def vmem_bytes_estimate(cfg, D=None, weights_dtype=jnp.float32):
    """Rough VMEM need: resident weights + per-tile activations/outputs."""
    D = D or cfg.max_dur
    H, idim, units, odim = cfg.dunits, cfg.dec_idim, cfg.prenet_units, \
        cfg.odim
    weights = (odim * units + units * units          # prenet
               + (idim + units + 1) * 4 * H          # lstm0 wx split
               + H * 4 * H                           # lstm0 wh
               + H * 4 * H + H * 4 * H               # lstm1 wx + wh
               + (H + idim) * odim)                  # feat_out
    acts = TILE * (idim + D + D * odim + 4 * H + 2 * 4 * H + 2 * units)
    return jnp.dtype(weights_dtype).itemsize * weights + 4 * acts


def fits_vmem(cfg, D=None, budget=13 * 1024 * 1024,
              weights_dtype=jnp.float32):
    """True when the fused kernel's weights + tile fit on-chip (the teacher
    at 1024-d LSTMs does NOT fit even in bf16 — ~31 MB of weights vs ~16 MB
    VMEM; the student at 256-d fits in either dtype)."""
    return vmem_bytes_estimate(cfg, D, weights_dtype) <= budget


def _hbm_n_slots(n_chunks):
    """DMA pipeline depth.  The walk repeats with period n_chunks across
    steps, so slot assignment c % n_slots is only consistent when n_slots
    divides n_chunks.  Measured (v5e, teacher P=128): 4 slots == 2 slots
    to within noise (2.859 vs 2.850 ms) — the kernel sits at an additive
    compute+DMA floor that deeper prefetch does not move (fp32 weights,
    which double the DMA, land exactly +30 us/step on top of the same
    compute) — so keep the cheaper 2-slot residency."""
    return 2 if n_chunks % 2 == 0 else 1


def _kernel_hbm(seed_ref, bounds_ref, enc_gates_ref, enc_out_ref, pos_ref,
                pre_w1_ref, pre_b1_ref, pre_w2_ref, pre_b2_ref, wx0_pre_ref,
                wx0_pos_ref, bh0_ref, bx1_ref, bh1_ref, wf_z_ref, scales_ref,
                wbig_ref, out_ref, wchunk, dma_sem, *, D, odim, dunits, CH,
                zoneout, dropout, ragged, quantized):
    """Teacher-size AR decoder loop: big recurrent matrices streamed from
    HBM (see fused_ar_decode_hbm).

    DMA schedule: the step loop consumes weight chunks 0..n_chunks-1
    cyclically forever, so the pipeline is a plain n_slots-deep rotating
    buffer — consuming chunk c immediately re-arms its slot with chunk
    (c + n_slots) % n_chunks (possibly of the NEXT step).  Keeping
    n_slots chunks in flight lets the step's serial elementwise work
    (prenet, LSTM nonlinearities) overlap weight streaming; with the
    2-slot schedule those phases left the DMA engine idle and the kernel
    ran at ~55% of its HBM roofline (results/PALLAS_decoder.json
    hbm_pipeline experiment).

    ``quantized``: the streamed chunks are per-output-column symmetric
    int8; each matrix's contraction is accumulated in fp32 from the raw
    int8 codes (cast to bf16 — integers <= 127 are exact in bf16 — so
    the MXU runs natively) and dequantized ONCE per step with that
    matrix's scale row from ``scales_ref`` (3, 4H).  Valid because the
    scale is per OUTPUT column: (h @ q) * s == h @ (q * s)."""
    H = dunits
    n_per = H // CH
    n_chunks = 3 * n_per  # wh0, wx1, wh1 stacked row-wise in wbig
    n_slots = _hbm_n_slots(n_chunks)
    wdt = wf_z_ref.dtype
    qdt = jnp.bfloat16 if quantized else wdt

    def mm(a, w):
        return jnp.dot(a.astype(wdt), w, preferred_element_type=jnp.float32)

    def mmq(a, w):
        # streamed-chunk contraction: int8 codes ride the MXU as bf16
        return jnp.dot(a.astype(qdt), w.astype(qdt),
                       preferred_element_type=jnp.float32)

    if dropout > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    def dma(c, slot):
        return pltpu.make_async_copy(
            wbig_ref.at[pl.ds(c * CH, CH), :], wchunk.at[slot],
            dma_sem.at[slot])

    def consume(c):
        """Wait for chunk c, return its slot, re-arm the slot with the
        chunk n_slots ahead in the cyclic walk."""
        slot = c % n_slots
        dma(c, slot).wait()
        return slot

    def rearm(c):
        dma((c + n_slots) % n_chunks, c % n_slots).start()

    keep = 1.0 - zoneout

    def lstm_half(gates, h, c):
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return zoneout * h + keep * h_new, zoneout * c + keep * c_new

    def step(t, carry):
        prev, h0, c0, h1, c1 = carry
        # prenet (always-on dropout, decoder_sa.py:109-112); n_slots weight
        # chunks stream underneath this serial phase
        p = jnp.maximum(mm(prev, pre_w1_ref[:]) + pre_b1_ref[:], 0.0)
        if dropout > 0.0:
            p = p * _dropout_bits(p.shape, dropout)
        p = jnp.maximum(mm(p, pre_w2_ref[:]) + pre_b2_ref[:], 0.0)
        if dropout > 0.0:
            p = p * _dropout_bits(p.shape, dropout)

        def stream_mat(m, h_in):
            """Chunked contraction h_in @ wbig[matrix m]; the walk is
            UNROLLED (static slices — Mosaic cannot dynamically slice the
            lane dim).  Accumulates fp32, dequantizes once per matrix."""
            acc = jnp.zeros((h_in.shape[0], 4 * H), jnp.float32)
            for k in range(n_per):
                c = m * n_per + k
                slot = consume(c)
                acc = acc + mmq(h_in[:, k * CH:(k + 1) * CH], wchunk[slot])
                rearm(c)
            if quantized:
                acc = acc * scales_ref[m, :][None, :]
            return acc

        pos_t = pos_ref[t, :][:, None]
        gates0 = (enc_gates_ref[...]
                  + mm(p, wx0_pre_ref[:])
                  + pos_t * wx0_pos_ref[:].astype(jnp.float32)
                  + bh0_ref[:]
                  + stream_mat(0, h0))
        h0n, c0n = lstm_half(gates0, h0, c0)

        gates1 = (bx1_ref[:] + bh1_ref[:]
                  + stream_mat(1, h0n) + stream_mat(2, h1))
        h1n, c1n = lstm_half(gates1, h1, c1)

        out = mm(h1n, wf_z_ref[:]) + enc_out_ref[...]
        out_ref[:, t, :] = out
        return (out, h0n, c0n, h1n, c1n)

    for c in range(n_slots):  # warm-up: first n_slots chunks of step 0
        dma(c, c).start()
    zeros = jnp.zeros((TILE, dunits), jnp.float32)
    prev0 = jnp.zeros((TILE, odim), jnp.float32)
    if ragged:
        # dynamic trip count: weight streaming is the kernel's bound, so
        # stopping at the tile's true max duration cuts the streamed bytes
        # proportionally.  The consume/rearm walk is per-step cyclic with
        # n_slots | n_chunks, so after ANY whole number of steps the
        # in-flight set is exactly chunks 0..n_slots-1 in slots
        # 0..n_slots-1 — the drain below stays correct for every bound.
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
        bound = jnp.minimum(bounds_ref[pl.program_id(0)], D)
        jax.lax.fori_loop(0, bound, step,
                          (prev0, zeros, zeros, zeros, zeros))
    else:
        jax.lax.fori_loop(0, D, step, (prev0, zeros, zeros, zeros, zeros))
    for c in range(n_slots):  # drain the in-flight rearms before exit
        dma(c, c).wait()


def quantize_per_column(w):
    """Symmetric per-output-column int8 weight quantization:
    ``w ~= codes * scale[None, :]`` with codes in [-127, 127].  Per-column
    scales make the dequantization commute with the contraction
    ((h @ q) * s == h @ (q * s)), so kernels can accumulate raw codes on
    the MXU and scale once per step."""
    s = jnp.max(jnp.abs(w), axis=0).astype(jnp.float32) / 127.0
    s = jnp.maximum(s, jnp.float32(1e-30))  # dead columns: codes stay 0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def maybe_prequantize(cfg, dec_params, quantize):
    """Serving-wrapper init hook: one-time int8 codes when they can apply
    (quantize == "int8" AND the config can ride the weight-streaming
    kernel), else None.  Jitted so the ~50 MB quantization read happens
    once, on device, instead of eagerly over a remote-device link."""
    if quantize != "int8" or not hbm_stream_compatible(cfg):
        return None
    dt = jnp.dtype(cfg.compute_dtype)
    return jax.jit(functools.partial(prequantize_hbm_weights,
                                     compute_dtype=dt))(dec_params)


def prequantize_hbm_weights(dec_params, compute_dtype=jnp.float32):
    """One-time int8 prep for ``fused_ar_decode_hbm(prequant=...)``:
    returns ``(wbig_q (3H, 4H) int8, scales (3, 4H) fp32)`` for the three
    streamed matrices.  Weights are cast to ``compute_dtype`` FIRST —
    synthesize casts params before the kernel quantizes, so these are
    bit-identical to the codes the inline path derives.  Serving wrappers
    (Synthesizer / StreamTTS / TTSPipeline) call this once at init: the
    inline quantize re-reads ~50 MB of weights inside EVERY jitted call
    (every chunk for StreamTTS), which rivals the decode itself at
    batch-1/chunk scale."""
    big = [dec_params["lstm0"]["wh"], dec_params["lstm1"]["wx"],
           dec_params["lstm1"]["wh"]]
    qs = [quantize_per_column(w.astype(compute_dtype)) for w in big]
    return (jnp.concatenate([q for q, _ in qs], axis=0),
            jnp.stack([s for _, s in qs]))


def hbm_stream_compatible(cfg):
    """Config gate for fused_ar_decode_hbm: reference topology + chunkable
    recurrent width."""
    return (cfg.prenet_layers == 2 and cfg.append_position
            and cfg.use_concate and cfg.dlayers == 2
            and cfg.reduction_factor == 1 and cfg.dunits % 256 == 0)


@functools.partial(jax.jit,
                   static_argnames=("zoneout", "dropout", "weights_dtype",
                                    "chunk_rows"))
def fused_ar_decode_hbm(dec_params, enc_seg, position, seed, *, zoneout=0.1,
                        dropout=0.5, weights_dtype=jnp.bfloat16,
                        chunk_rows=256, bounds=None, prequant=None):
    """AR decoder loop for models whose weights do NOT fit VMEM (the
    teacher: ~31 MB bf16 vs ~16 MB VMEM): the three big recurrent
    matrices (wh0, wx1, wh1 — (H, 4H) each) stay in HBM and are streamed
    through a 2-slot VMEM chunk buffer with async DMA overlapped against
    the step's GEMMs; everything else (prenet, wx0 blocks, feat_out,
    biases, per-tile activations) is VMEM-resident.  The step-invariant
    enc projections (enc @ wx0_enc + bx0, enc @ wf_enc) are hoisted
    OUTSIDE the kernel as two plain XLA GEMMs.

    Roofline: per step the kernel must move 3*H*4H weight bytes; at H=1024
    bf16 that is ~25 MB/step -> ~31 us/step at v5e HBM bandwidth, vs the
    XLA scan's ~73 us/step (results/PALLAS_decoder.json teacher P=128) —
    the compute (~16 us/step at P=128) hides under the DMA.  Weights
    default to bf16 (fp32 doubles the DMA bound and loses the advantage).

    ``weights_dtype=jnp.int8`` streams per-output-column symmetric int8
    codes instead (quantize_per_column) — HALF the bf16 DMA bytes
    (~12.6 MB/step at H=1024), pushing the kernel from DMA-bound toward
    its compute floor; the small resident weights stay bf16 and the codes
    are dequantized once per step inside the kernel (see _kernel_hbm).
    Weight-only quantization: activations, biases and LSTM state stay
    fp32, so the numeric cost is bounded per-column rounding (~1e-2
    relative on the mel; tests/test_decoder_pallas.py pins it,
    results/QUANT_decode.json measures it end-to-end).

    int4 is deliberately NOT offered: at H=1024/P=128 the int8 stream
    (~15.5 us/step at v5e HBM bandwidth) already sits at the step's
    compute floor (~16 us/step of MXU work), so halving the bytes again
    cannot speed the kernel up — it would only double the per-column
    quantization step (the error compounds through the LSTM recurrence)
    for zero throughput gain.  Roofline decision, not an oversight.

    Only worthwhile while P is a single tile (each grid tile re-streams
    the weights; the XLA scan reads them once per step for ALL P) — the
    caller gates on P (see Tacotron2SA.synthesize auto policy).

    ``bounds``: optional (ceil(P/TILE),) int32 per-tile step bounds (the
    tile's max segment duration).  Streaming stops at the bound, so the
    DMA cost scales with the ACTUAL longest duration instead of the
    static max_dur cap — the reference always pads every phoneme to the
    cap (/root/reference/tts.py:243-263).

    ``prequant``: optional ``(wbig_q, scales)`` from
    ``prequantize_hbm_weights`` — skips the inline per-call quantization
    (a ~50 MB weight read) when weights_dtype is int8.

    Replaces the flagship batch-1 teacher decode hot loop,
    /root/reference/nets/modules/decoder_sa.py:591-617.
    """
    P, idim = enc_seg.shape
    D = position.shape[1]
    if P % TILE:
        pad = TILE - P % TILE
        enc_seg = jnp.pad(enc_seg, ((0, pad), (0, 0)))
        position = jnp.pad(position, ((0, pad), (0, 0)))
    Pp = enc_seg.shape[0]

    pre = dec_params["prenet"]["layers"]
    units = pre[0]["w"].shape[1]
    odim = pre[0]["w"].shape[0]
    wx0 = dec_params["lstm0"]["wx"]
    H = dec_params["lstm0"]["wh"].shape[0]
    CH = min(chunk_rows, H)
    if jnp.dtype(weights_dtype).itemsize == 4:
        # fp32 streams double every buffer: with the default CH=256 the
        # 2-slot chunk scratch (8.4 MB at H=1024) plus the fp32-resident
        # small weights exceed the 16 MB VMEM scoped limit by ~2.7 MB
        # (measured compile OOM).  Halving the chunk keeps the scratch at
        # the bf16 footprint; fp32 is a compat path (measured slower than
        # bf16 — the DMA bound doubles), so the smaller DMA granularity
        # is acceptable.
        CH = min(CH, 128)
    assert H % CH == 0, (H, CH)
    wx0_enc = wx0[:idim]
    wx0_pre = wx0[idim:idim + units]
    wx0_pos = wx0[idim + units:idim + units + 1]
    wf = dec_params["feat_out"]["w"]
    wf_z, wf_enc = wf[:H], wf[H:]

    quantized = jnp.dtype(weights_dtype) == jnp.int8
    # int8 applies to the STREAMED matrices only; resident weights stay bf16
    rdt = jnp.bfloat16 if quantized else weights_dtype
    f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
    wdt = lambda x: x.astype(rdt)  # noqa: E731

    # hoisted step-invariant GEMMs (plain XLA, once per call)
    enc_gates = f32(enc_seg) @ f32(wx0_enc) \
        + f32(dec_params["lstm0"]["bx"])              # (Pp, 4H)
    enc_out = f32(enc_seg) @ f32(wf_enc)              # (Pp, odim)

    big = [dec_params["lstm0"]["wh"], dec_params["lstm1"]["wx"],
           dec_params["lstm1"]["wh"]]
    if quantized:
        if prequant is not None:  # one-time codes from serving wrappers
            wbig, scales = prequant
        else:
            qs = [quantize_per_column(w) for w in big]
            wbig = jnp.concatenate([q for q, _ in qs], axis=0)
            scales = jnp.stack([s for _, s in qs])    # (3, 4H) fp32
    else:
        wbig = jnp.concatenate([wdt(w) for w in big], axis=0)
        scales = jnp.ones((3, 4 * H), jnp.float32)    # unused placeholder

    args = [
        enc_gates, enc_out, f32(position).T,
        wdt(pre[0]["w"]), f32(pre[0]["b"])[None, :],
        wdt(pre[1]["w"]), f32(pre[1]["b"])[None, :],
        wdt(wx0_pre), wdt(wx0_pos),
        f32(dec_params["lstm0"]["bh"])[None, :],
        f32(dec_params["lstm1"]["bx"])[None, :],
        f32(dec_params["lstm1"]["bh"])[None, :],
        wdt(wf_z), scales,
    ]

    grid = (Pp // TILE,)
    ragged = bounds is not None
    if ragged:
        bounds = jnp.asarray(bounds, jnp.int32).reshape(grid[0])
    else:
        bounds = jnp.zeros((1,), jnp.int32)  # unused placeholder
    tile_specs = [
        pl.BlockSpec((TILE, 4 * H), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, odim), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((D, TILE), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    weight_specs = [
        pl.BlockSpec(a.shape, lambda i, _n=a.ndim: (0,) * _n,
                     memory_space=pltpu.VMEM)
        for a in args[3:]
    ]
    out = pl.pallas_call(
        functools.partial(_kernel_hbm, D=D, odim=odim, dunits=H, CH=CH,
                          zoneout=float(zoneout), dropout=float(dropout),
                          ragged=ragged, quantized=quantized),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + tile_specs
        + weight_specs
        + [pl.BlockSpec(memory_space=pl.ANY)],  # wbig stays in HBM
        out_specs=pl.BlockSpec((TILE, D, odim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pp, D, odim), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_hbm_n_slots(3 * H // CH), CH, 4 * H),
                       weights_dtype),
            pltpu.SemaphoreType.DMA((_hbm_n_slots(3 * H // CH),)),
        ],
    )(jnp.asarray(seed, jnp.int32).reshape(1), bounds, *args, wbig)
    return out[:P]


@functools.partial(jax.jit,
                   static_argnames=("zoneout", "dropout", "weights_dtype"))
def fused_ar_decode(dec_params, enc_seg, position, seed, *, zoneout=0.1,
                    dropout=0.5, weights_dtype=jnp.float32, bounds=None):
    """Run the whole AR loop in one Pallas kernel.

    Args:
        dec_params: decoder param pytree (models/decoder.decoder_init).
        enc_seg: (P, idim) float32 per-segment conditioning vectors.
        position: (P, D) float32 position ramps.
        seed: int32 scalar for the prenet-dropout PRNG.
        weights_dtype: resident dtype of the weight MATRICES (biases and
            LSTM state stay fp32; MXU accumulates fp32).  bfloat16 halves
            VMEM residency — larger configs fit — at ~1e-2 relative
            output error.
        bounds: optional (ceil(P/TILE),) int32 per-tile step bounds (each
            tile's max segment duration).  With segments pre-sorted by
            duration descending (Tacotron2SA.synthesize ragged path) only
            the first tile pays for the long-duration tail and all-pad
            tiles cost zero steps; the reference runs every phoneme to
            the static cap (/root/reference/tts.py:243-263).
    Returns:
        (P, D, odim) float32 frames (valid frames selected by caller).
    """
    P, idim = enc_seg.shape
    D = position.shape[1]
    if P % TILE:
        pad = TILE - P % TILE
        enc_seg = jnp.pad(enc_seg, ((0, pad), (0, 0)))
        position = jnp.pad(position, ((0, pad), (0, 0)))
    Pp = enc_seg.shape[0]

    pre = dec_params["prenet"]["layers"]
    units = pre[0]["w"].shape[1]
    odim = pre[0]["w"].shape[0]
    wx0 = dec_params["lstm0"]["wx"]  # (idim + units + 1, 4H)
    dunits = dec_params["lstm0"]["wh"].shape[0]
    wx0_enc = wx0[:idim]
    wx0_pre = wx0[idim:idim + units]
    wx0_pos = wx0[idim + units:idim + units + 1]
    wf = dec_params["feat_out"]["w"]  # (dunits + idim, odim), order (z, enc)
    wf_z, wf_enc = wf[:dunits], wf[dunits:]

    f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
    wdt = lambda x: x.astype(weights_dtype)  # weight matrices only # noqa
    args = [
        f32(enc_seg), f32(position).T,  # (D, TILE-padded P)
        wdt(pre[0]["w"]), f32(pre[0]["b"])[None, :],
        wdt(pre[1]["w"]), f32(pre[1]["b"])[None, :],
        wdt(wx0_pre), wdt(wx0_pos),
        f32(dec_params["lstm0"]["bx"])[None, :],
        wdt(dec_params["lstm0"]["wh"]),
        f32(dec_params["lstm0"]["bh"])[None, :],
        wdt(dec_params["lstm1"]["wx"]),
        f32(dec_params["lstm1"]["bx"])[None, :],
        wdt(dec_params["lstm1"]["wh"]),
        f32(dec_params["lstm1"]["bh"])[None, :],
        wdt(wf_z), wdt(wx0_enc), wdt(wf_enc),
    ]

    grid = (Pp // TILE,)
    ragged = bounds is not None
    if ragged:
        bounds = jnp.asarray(bounds, jnp.int32).reshape(grid[0])
    else:
        bounds = jnp.zeros((1,), jnp.int32)  # unused placeholder
    tile_specs = [
        pl.BlockSpec((TILE, enc_seg.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((D, TILE), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    weight_specs = [
        pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                     memory_space=pltpu.VMEM)
        for a in args[2:]
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, D=D, odim=odim, dunits=dunits,
                          zoneout=float(zoneout), dropout=float(dropout),
                          ragged=ragged),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + tile_specs
        + weight_specs,
        out_specs=pl.BlockSpec((TILE, D, odim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pp, D, odim), jnp.float32),
    )(jnp.asarray(seed, jnp.int32).reshape(1), bounds, *args)
    return out[:P]
