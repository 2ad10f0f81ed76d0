"""Fused Pallas AR decoder vs the lax.scan reference path (interpret mode
on CPU; the real-TPU benchmark lives in scripts/bench_pallas.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fcl_taco2_tpu.models.decoder import decoder_inference, decoder_init

from helpers import tiny_config


def test_fused_matches_scan_no_dropout(monkeypatch):
    import fcl_taco2_tpu.ops.decoder_pallas as dp
    import jax.experimental.pallas as pl

    # interpret mode so the kernel runs on CPU
    orig = pl.pallas_call

    def interp_call(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(dp.pl, "pallas_call", interp_call)

    cfg = tiny_config(dropout_rate=0.0, max_dur=7)
    params, state = decoder_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    P, D = 5, cfg.max_dur
    enc_seg = jnp.asarray(rng.normal(size=(P, cfg.eunits)).astype(
        np.float32))
    dur = np.array([3, 7, 1, 5, 2], np.int32)
    frame_mask = jnp.asarray(np.arange(D)[None, :] < dur[:, None])
    position = jnp.asarray(np.where(
        np.asarray(frame_mask),
        np.arange(D)[None, :] / np.maximum(dur[:, None], 1), 0.0
    ).astype(np.float32))

    want = decoder_inference(params, state, cfg, enc_seg,
                             jnp.asarray(dur), position, frame_mask,
                             jax.random.PRNGKey(1))
    got = dp.fused_ar_decode(params, enc_seg, position, 0,
                             zoneout=cfg.zoneout_rate, dropout=0.0)
    got = got * np.asarray(frame_mask)[..., None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # bf16-resident weights: same math with halved residency; the AR
    # feedback compounds rounding, so the budget is loose but bounded
    got16 = dp.fused_ar_decode(params, enc_seg, position, 0,
                               zoneout=cfg.zoneout_rate, dropout=0.0,
                               weights_dtype=jnp.bfloat16)
    got16 = got16 * np.asarray(frame_mask)[..., None]
    err = np.abs(np.asarray(got16) - np.asarray(want)).max()
    scale = np.abs(np.asarray(want)).max()
    assert err < 0.05 * scale + 1e-3, (err, scale)


def test_fused_dropout_is_stochastic_but_bounded(monkeypatch):
    import fcl_taco2_tpu.ops.decoder_pallas as dp
    import jax.experimental.pallas as pl

    if jax.devices()[0].platform != "tpu":
        pytest.skip("pltpu PRNG has no CPU interpret path")

    cfg = tiny_config(max_dur=5)
    params, _ = decoder_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    enc_seg = jnp.asarray(rng.normal(size=(4, cfg.eunits)).astype(
        np.float32))
    position = jnp.zeros((4, cfg.max_dur), jnp.float32)
    a = dp.fused_ar_decode(params, enc_seg, position, 0, dropout=0.5)
    b = dp.fused_ar_decode(params, enc_seg, position, 1, dropout=0.5)
    assert np.isfinite(np.asarray(a)).all()
    assert not np.allclose(np.asarray(a), np.asarray(b))  # different seeds
    # unbiasedness on hardware: inverted dropout preserves expected
    # activation scale, so the mel RMS with dropout on must sit near the
    # deterministic level — the signed-threshold regression (see
    # _dropout_bits) ran ~2x-hot prenets and shifted this materially
    det = dp.fused_ar_decode(params, enc_seg, position, 0, dropout=0.0)
    rms = lambda x: float(np.sqrt((np.asarray(x) ** 2).mean()))
    ratio = (rms(a) + rms(b)) / (2 * rms(det))
    assert 0.7 < ratio < 1.4, ratio


def test_dropout_bits_statistics(monkeypatch):
    """_dropout_bits must be UNBIASED inverted dropout under the
    hardware PRNG semantics (pltpu.prng_random_bits -> SIGNED int32,
    full-range uniform; its abstract eval is int32): keep fraction
    ~= 1-rate and E[mask] ~= 1.  The pre-fix uint32 threshold compared
    as INT32_MAX for rate <= 0.5 and kept ~everything at 1/(1-rate)
    scale — no dropout, 2x-hot prenet, +7.4 dB teacher MCD
    (results/MCD_e2e.json backend_quality)."""
    import fcl_taco2_tpu.ops.decoder_pallas as dp

    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(-2 ** 31, 2 ** 31, size=(512, 512),
                                    dtype=np.int64).astype(np.int32))
    monkeypatch.setattr(dp.pltpu, "prng_random_bits", lambda shape: bits)
    for rate in (0.1, 0.5, 0.9):
        m = np.asarray(dp._dropout_bits(bits.shape, rate))
        keep = (m > 0).mean()
        assert abs(keep - (1 - rate)) < 5e-3, (rate, keep)
        assert abs(m.mean() - 1.0) < 2e-2, (rate, m.mean())
        np.testing.assert_allclose(m[m > 0], 1.0 / (1.0 - rate),
                                   rtol=1e-5)


def test_hbm_stream_kernel_matches_scan(monkeypatch):
    """Weight-streaming teacher kernel (fused_ar_decode_hbm, interpret
    mode): exact vs the lax.scan path with fp32 weights; the DMA chunk
    walk must reproduce h @ wh0 / h0n @ wx1 / h1 @ wh1 bit-for-tolerance."""
    import fcl_taco2_tpu.ops.decoder_pallas as dp
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(dp.pl, "pallas_call", interp_call)

    cfg = tiny_config(dropout_rate=0.0, max_dur=7)
    params, state = decoder_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    P, D = 5, cfg.max_dur
    enc_seg = jnp.asarray(rng.normal(size=(P, cfg.eunits)).astype(
        np.float32))
    dur = np.array([3, 7, 1, 5, 2], np.int32)
    frame_mask = jnp.asarray(np.arange(D)[None, :] < dur[:, None])
    position = jnp.asarray(np.where(
        np.asarray(frame_mask),
        np.arange(D)[None, :] / np.maximum(dur[:, None], 1), 0.0
    ).astype(np.float32))

    want = decoder_inference(params, state, cfg, enc_seg,
                             jnp.asarray(dur), position, frame_mask,
                             jax.random.PRNGKey(1))
    # chunk_rows > dunits exercises CH=H (single chunk per matrix);
    # chunk_rows = dunits//2 exercises the multi-chunk double-buffer walk
    for chunk_rows in (cfg.dunits, cfg.dunits // 2):
        got = dp.fused_ar_decode_hbm(params, enc_seg, position, 0,
                                     zoneout=cfg.zoneout_rate, dropout=0.0,
                                     weights_dtype=jnp.float32,
                                     chunk_rows=chunk_rows)
        got = got * np.asarray(frame_mask)[..., None]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5,
                                   err_msg=f"chunk_rows={chunk_rows}")


def test_quantize_per_column_roundtrip():
    """Symmetric per-column int8: dequantized weights land within half a
    quantization step of the original, column-wise."""
    import fcl_taco2_tpu.ops.decoder_pallas as dp

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(24, 40)).astype(np.float32))
    # a dead column must round-trip to exact zeros, not NaN/inf
    w = w.at[:, 7].set(0.0)
    q, s = dp.quantize_per_column(w)
    assert q.dtype == jnp.int8 and s.shape == (40,)
    deq = np.asarray(q, np.float32) * np.asarray(s)[None, :]
    err = np.abs(deq - np.asarray(w))
    assert (err <= np.asarray(s)[None, :] * 0.5 + 1e-7).all()
    assert (deq[:, 7] == 0.0).all()


def test_hbm_stream_int8_matches_scan(monkeypatch):
    """int8 weight-streaming kernel vs the fp32 lax.scan path: weight-only
    per-column quantization of the three streamed matrices must stay within
    a bounded relative mel error (the AR feedback compounds the per-column
    rounding, so the budget is loose but pinned)."""
    import fcl_taco2_tpu.ops.decoder_pallas as dp
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(dp.pl, "pallas_call", interp_call)

    cfg = tiny_config(dropout_rate=0.0, max_dur=7)
    params, state = decoder_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    P, D = 5, cfg.max_dur
    enc_seg = jnp.asarray(rng.normal(size=(P, cfg.eunits)).astype(
        np.float32))
    dur = np.array([3, 7, 1, 5, 2], np.int32)
    frame_mask = jnp.asarray(np.arange(D)[None, :] < dur[:, None])
    position = jnp.asarray(np.where(
        np.asarray(frame_mask),
        np.arange(D)[None, :] / np.maximum(dur[:, None], 1), 0.0
    ).astype(np.float32))

    want = decoder_inference(params, state, cfg, enc_seg,
                             jnp.asarray(dur), position, frame_mask,
                             jax.random.PRNGKey(1))
    for chunk_rows in (cfg.dunits, cfg.dunits // 2):
        got = dp.fused_ar_decode_hbm(params, enc_seg, position, 0,
                                     zoneout=cfg.zoneout_rate, dropout=0.0,
                                     weights_dtype=jnp.int8,
                                     chunk_rows=chunk_rows)
        got = got * np.asarray(frame_mask)[..., None]
        err = np.abs(np.asarray(got) - np.asarray(want)).max()
        scale = np.abs(np.asarray(want)).max()
        assert err < 0.05 * scale + 1e-3, (chunk_rows, err, scale)


def test_prequantized_codes_match_inline(monkeypatch):
    """prequantize_hbm_weights must produce BIT-identical output to the
    kernel's inline quantization (serving wrappers compute codes once;
    the decode must not change)."""
    import fcl_taco2_tpu.ops.decoder_pallas as dp
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(dp.pl, "pallas_call", interp_call)

    cfg = tiny_config(dropout_rate=0.0, max_dur=7)
    params, _ = decoder_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    P, D = 5, cfg.max_dur
    enc_seg = jnp.asarray(rng.normal(size=(P, cfg.eunits)).astype(
        np.float32))
    position = jnp.zeros((P, D), jnp.float32)

    pq = dp.prequantize_hbm_weights(params)
    inline = dp.fused_ar_decode_hbm(params, enc_seg, position, 0,
                                    zoneout=cfg.zoneout_rate, dropout=0.0,
                                    weights_dtype=jnp.int8)
    pre = dp.fused_ar_decode_hbm(params, enc_seg, position, 0,
                                 zoneout=cfg.zoneout_rate, dropout=0.0,
                                 weights_dtype=jnp.int8, prequant=pq)
    np.testing.assert_array_equal(np.asarray(inline), np.asarray(pre))

    # the DEPLOYED order: synthesize casts params to compute_dtype (bf16
    # teacher serving) BEFORE the kernel quantizes; prequantize must
    # reproduce those codes from the UNCAST params via compute_dtype=
    cast = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    pq16 = dp.prequantize_hbm_weights(params, compute_dtype=jnp.bfloat16)
    inline16 = dp.fused_ar_decode_hbm(cast, enc_seg, position, 0,
                                      zoneout=cfg.zoneout_rate,
                                      dropout=0.0, weights_dtype=jnp.int8)
    pre16 = dp.fused_ar_decode_hbm(cast, enc_seg, position, 0,
                                   zoneout=cfg.zoneout_rate, dropout=0.0,
                                   weights_dtype=jnp.int8, prequant=pq16)
    np.testing.assert_array_equal(np.asarray(inline16), np.asarray(pre16))
    # maybe_prequantize (the wrappers' entry point) routes the same way
    cfg16 = tiny_config(dropout_rate=0.0, max_dur=7, dunits=256,
                        compute_dtype="bfloat16")
    p256, _ = decoder_init(jax.random.PRNGKey(0), cfg16)
    mq = dp.maybe_prequantize(cfg16, p256, "int8")
    assert mq is not None and mq[0].dtype == jnp.int8
    np.testing.assert_array_equal(
        np.asarray(mq[0]),
        np.asarray(dp.prequantize_hbm_weights(
            p256, compute_dtype=jnp.bfloat16)[0]))
    assert dp.maybe_prequantize(cfg16, p256, "none") is None
    assert dp.maybe_prequantize(cfg, params, "int8") is None  # dunits=20


def test_synthesize_pallas_hbm_backend(monkeypatch):
    """End-to-end synthesize routing through the weight-streaming kernel
    (decoder_backend='pallas_hbm', interpret mode): output must match the
    scan backend with dropout disabled, and the compat gate must reject
    unsupported topologies."""
    import fcl_taco2_tpu.ops.decoder_pallas as dp
    import jax.experimental.pallas as pl

    from fcl_taco2_tpu.models import Tacotron2SA

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(dp.pl, "pallas_call", interp_call)

    cfg = tiny_config(dunits=256, dropout_rate=0.0, zoneout_rate=0.0)
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    tokens = jnp.asarray(np.array([[1, 4, 2, 7, 0]]), jnp.int32)
    ilens = jnp.asarray([4], jnp.int32)
    kw = dict(frame_budget=32, rng=jax.random.PRNGKey(1))
    want = model.synthesize(params, state, tokens, ilens,
                            decoder_backend="scan", **kw)
    got = model.synthesize(params, state, tokens, ilens,
                           decoder_backend="pallas_hbm", **kw)
    np.testing.assert_array_equal(np.asarray(want["olens"]),
                                  np.asarray(got["olens"]))
    # the HBM path runs bf16 weights by design (fp32 doubles the DMA
    # bound): tolerance is bf16 weight-rounding, not fp32-exact
    np.testing.assert_allclose(np.asarray(got["mel"]),
                               np.asarray(want["mel"]), atol=2e-3)

    # int8-quantized streaming: same shapes/olens, bounded mel error
    got8 = model.synthesize(params, state, tokens, ilens,
                            decoder_backend="pallas_hbm",
                            quantize="int8", **kw)
    np.testing.assert_array_equal(np.asarray(want["olens"]),
                                  np.asarray(got8["olens"]))
    err = np.abs(np.asarray(got8["mel"]) - np.asarray(want["mel"])).max()
    scale = np.abs(np.asarray(want["mel"])).max()
    assert err < 0.05 * scale + 1e-3, (err, scale)

    with pytest.raises(ValueError, match="quantize"):
        model.synthesize(params, state, tokens, ilens,
                         decoder_backend="pallas_hbm",
                         quantize="int4", **kw)

    bad = tiny_config(dunits=20)  # not chunkable: dunits % 256 != 0
    bad_model = Tacotron2SA(bad)
    bp, bs = bad_model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="pallas_hbm"):
        bad_model.synthesize(bp, bs, tokens, ilens,
                             decoder_backend="pallas_hbm", **kw)
