"""Duration-bounded ragged inference decode vs the capped legacy path.

The reference runs every phoneme segment's AR loop to the static max_dur
cap (/root/reference/tts.py:243-263, decoder_sa.py:591-617); synthesize's
ragged path sorts segments by duration on device and bounds every decode
backend by ACTUAL durations (per-tile bounds for the Pallas kernels, a
dynamic trip count for the XLA scan).  Segments are independent and frames
past each duration are exactly zero either way, so with dropout disabled
the two paths must agree to float tolerance.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fcl_taco2_tpu.models import Tacotron2SA
from fcl_taco2_tpu.models.decoder import decoder_inference, decoder_init

from helpers import tiny_config


def _seg_inputs(cfg, dur, seed=0):
    rng = np.random.default_rng(seed)
    P, D = len(dur), cfg.max_dur
    enc_seg = jnp.asarray(rng.normal(size=(P, cfg.eunits)).astype(
        np.float32))
    frame_mask = jnp.asarray(np.arange(D)[None, :] < dur[:, None])
    position = jnp.asarray(np.where(
        np.asarray(frame_mask),
        np.arange(D)[None, :] / np.maximum(dur[:, None], 1), 0.0
    ).astype(np.float32))
    return enc_seg, frame_mask, position


def test_decoder_inference_step_bound_exact():
    """Dynamic trip count == full scan when the bound covers all durations;
    frames past every duration stay exactly zero."""
    cfg = tiny_config(dropout_rate=0.0, max_dur=7)
    params, state = decoder_init(jax.random.PRNGKey(0), cfg)
    dur = np.array([3, 5, 1, 5, 0, 2], np.int32)  # incl. a pad slot
    enc_seg, frame_mask, position = _seg_inputs(cfg, dur)

    want = decoder_inference(params, state, cfg, enc_seg, jnp.asarray(dur),
                             position, frame_mask, jax.random.PRNGKey(1))
    got = decoder_inference(params, state, cfg, enc_seg, jnp.asarray(dur),
                            position, frame_mask, jax.random.PRNGKey(1),
                            step_bound=jnp.int32(dur.max()))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # masked region is exact zero (the fori_loop buffer is zero-init)
    assert (np.asarray(got)[~np.asarray(frame_mask)] == 0.0).all()


def test_decoder_inference_step_bound_r2():
    """reduction_factor > 1: the bound is in frames, the loop in r-groups —
    ceil rounding must not drop the last partial group."""
    cfg = tiny_config(dropout_rate=0.0, max_dur=8, reduction_factor=2)
    params, state = decoder_init(jax.random.PRNGKey(0), cfg)
    dur = np.array([5, 3, 8, 1], np.int32)  # 5 -> 3 groups of r=2
    enc_seg, frame_mask, position = _seg_inputs(cfg, dur)

    want = decoder_inference(params, state, cfg, enc_seg, jnp.asarray(dur),
                             position, frame_mask, jax.random.PRNGKey(1))
    got = decoder_inference(params, state, cfg, enc_seg, jnp.asarray(dur),
                            position, frame_mask, jax.random.PRNGKey(1),
                            step_bound=jnp.int32(dur.max()))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_fused_kernel_bounds_interpret(monkeypatch):
    """Per-tile bounds in the VMEM-resident kernel (interpret mode): masked
    output equals the unbounded kernel; the zero-init covers skipped
    steps."""
    import fcl_taco2_tpu.ops.decoder_pallas as dp
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(dp.pl, "pallas_call", interp_call)

    cfg = tiny_config(dropout_rate=0.0, max_dur=7)
    params, _ = decoder_init(jax.random.PRNGKey(0), cfg)
    dur = np.array([6, 4, 2, 1, 0], np.int32)  # sorted desc, pad slot last
    enc_seg, frame_mask, position = _seg_inputs(cfg, dur)

    full = dp.fused_ar_decode(params, enc_seg, position, 0,
                              zoneout=cfg.zoneout_rate, dropout=0.0)
    n_tiles = -(-len(dur) // dp.TILE)
    bounds = jnp.full((n_tiles,), int(dur.max()), jnp.int32)
    got = dp.fused_ar_decode(params, enc_seg, position, 0,
                             zoneout=cfg.zoneout_rate, dropout=0.0,
                             bounds=bounds)
    mask = np.asarray(frame_mask)[..., None]
    np.testing.assert_allclose(np.asarray(got) * mask,
                               np.asarray(full) * mask, atol=1e-6)
    # steps at/after the bound were never written -> exact zeros, no junk
    assert (np.asarray(got)[:, int(dur.max()):, :] == 0.0).all()


def test_hbm_kernel_bounds_interpret(monkeypatch):
    """Per-tile bounds in the weight-streaming kernel (interpret mode):
    the cyclic DMA schedule must stay consistent for ANY dynamic trip
    count — masked equality vs the unbounded kernel across chunk walks."""
    import fcl_taco2_tpu.ops.decoder_pallas as dp
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(dp.pl, "pallas_call", interp_call)

    cfg = tiny_config(dropout_rate=0.0, max_dur=7)
    params, _ = decoder_init(jax.random.PRNGKey(0), cfg)
    dur = np.array([5, 3, 1, 2, 0], np.int32)
    enc_seg, frame_mask, position = _seg_inputs(cfg, dur)
    mask = np.asarray(frame_mask)[..., None]

    # int8 included: quantization must not perturb the bounded/unbounded
    # equivalence (same codes both calls — the DMA schedule is what's
    # under test)
    for wdt in (jnp.float32, jnp.int8):
        for chunk_rows in (cfg.dunits, cfg.dunits // 2):
            full = dp.fused_ar_decode_hbm(params, enc_seg, position, 0,
                                          zoneout=cfg.zoneout_rate,
                                          dropout=0.0, weights_dtype=wdt,
                                          chunk_rows=chunk_rows)
            bounds = jnp.asarray([int(dur.max())], jnp.int32)
            got = dp.fused_ar_decode_hbm(params, enc_seg, position, 0,
                                         zoneout=cfg.zoneout_rate,
                                         dropout=0.0, weights_dtype=wdt,
                                         chunk_rows=chunk_rows,
                                         bounds=bounds)
            np.testing.assert_allclose(
                np.asarray(got) * mask, np.asarray(full) * mask,
                atol=1e-6, err_msg=f"wdt={wdt} chunk_rows={chunk_rows}")


def test_fused_kernel_multi_tile_distinct_bounds(monkeypatch):
    """P > TILE with DIFFERENT per-tile bounds: each grid tile must read
    ITS OWN bound (bounds_ref[program_id]), run exactly that many steps,
    and zero everything past it — a kernel that read bounds[0] everywhere
    or transposed the grid axis would fail one of the two tiles."""
    import fcl_taco2_tpu.ops.decoder_pallas as dp
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(dp.pl, "pallas_call", interp_call)

    cfg = tiny_config(dropout_rate=0.0, max_dur=7)
    params, _ = decoder_init(jax.random.PRNGKey(0), cfg)
    P = dp.TILE + 5  # two grid tiles
    rng = np.random.default_rng(3)
    # tile 0: durations up to 6 (sorted desc); tile 1: up to 3
    dur = np.concatenate([
        np.sort(rng.integers(1, 7, dp.TILE))[::-1],
        np.array([3, 2, 2, 1, 0])]).astype(np.int32)
    enc_seg, frame_mask, position = _seg_inputs(cfg, dur)
    bounds = dp.tile_step_bounds(jnp.asarray(dur))
    np.testing.assert_array_equal(np.asarray(bounds),
                                  [int(dur[:dp.TILE].max()), 3])

    full = dp.fused_ar_decode(params, enc_seg, position, 0,
                              zoneout=cfg.zoneout_rate, dropout=0.0)
    got = dp.fused_ar_decode(params, enc_seg, position, 0,
                             zoneout=cfg.zoneout_rate, dropout=0.0,
                             bounds=bounds)
    mask = np.asarray(frame_mask)[..., None]
    np.testing.assert_allclose(np.asarray(got) * mask,
                               np.asarray(full) * mask, atol=1e-6)
    # tile 1 segments: frames at/after ITS bound (3) are unwritten zeros —
    # proving tile 1 did not run to tile 0's larger bound
    assert (np.asarray(got)[dp.TILE:, 3:, :] == 0.0).all()
    # tile 0 rows with duration > 3 have real (nonzero) frames past 3 —
    # proving tile 0 did not stop at tile 1's smaller bound
    long_rows = np.asarray(got)[:dp.TILE][dur[:dp.TILE] > 4]
    assert np.abs(long_rows[:, 4, :]).max() > 0


@pytest.mark.parametrize("use_dur", [False, True])
def test_synthesize_ragged_matches_legacy(use_dur):
    """End-to-end synthesize: ragged (sorted + bounded) == legacy capped
    path on the scan backend with dropout off — the slot permutation must
    cancel out through the index-driven gather/scatter."""
    cfg = tiny_config(dropout_rate=0.0, zoneout_rate=0.0)
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    tokens = jnp.asarray(
        np.array([[1, 4, 2, 7, 3], [5, 2, 8, 0, 0]]), jnp.int32)
    ilens = jnp.asarray([5, 3], jnp.int32)
    durations = None
    if use_dur:
        durations = jnp.asarray(
            np.array([[2, 6, 1, 3, 2], [4, 1, 5, 0, 0]]), jnp.int32)
    kw = dict(frame_budget=32, rng=jax.random.PRNGKey(1),
              durations=durations, decoder_backend="scan")
    want = model.synthesize(params, state, tokens, ilens,
                            ragged_decode=False, **kw)
    got = model.synthesize(params, state, tokens, ilens,
                           ragged_decode=True, **kw)
    np.testing.assert_array_equal(np.asarray(want["olens"]),
                                  np.asarray(got["olens"]))
    np.testing.assert_array_equal(np.asarray(want["d_outs"]),
                                  np.asarray(got["d_outs"]))
    np.testing.assert_allclose(np.asarray(got["mel"]),
                               np.asarray(want["mel"]), atol=1e-5)


@pytest.mark.parametrize("variant", [
    dict(reduction_factor=2, max_dur=8),
    dict(prenet_layers=0),
    dict(postnet_layers=0),
    dict(elayers=0),
    dict(use_concate=False),
    dict(append_position=False),
])
def test_synthesize_ragged_matches_legacy_variants(variant):
    """Ragged == capped across the reference's config variants (r>1 frame
    bounds round up to r-groups; no-prenet removes the AR feedback
    nonlinearity; no-concate drops the hoisted enc feat_out half...)."""
    cfg = tiny_config(dropout_rate=0.0, zoneout_rate=0.0, **variant)
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    tokens = jnp.asarray(np.array([[1, 4, 2, 7, 3], [5, 2, 8, 0, 0]]),
                         jnp.int32)
    ilens = jnp.asarray([5, 3], jnp.int32)
    kw = dict(frame_budget=32, rng=jax.random.PRNGKey(1),
              durations=jnp.asarray(
                  np.array([[2, 6, 1, 3, 2], [4, 1, 5, 0, 0]]), jnp.int32),
              decoder_backend="scan")
    want = model.synthesize(params, state, tokens, ilens,
                            ragged_decode=False, **kw)
    got = model.synthesize(params, state, tokens, ilens,
                           ragged_decode=True, **kw)
    np.testing.assert_array_equal(np.asarray(want["olens"]),
                                  np.asarray(got["olens"]))
    np.testing.assert_allclose(np.asarray(got["mel"]),
                               np.asarray(want["mel"]), atol=1e-5)


def test_synthesize_ragged_jits_once():
    """The ragged path must stay fully jittable (device argsort, traced
    bounds): one compile, d_factor traced."""
    cfg = tiny_config(dropout_rate=0.0, zoneout_rate=0.0)
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    tokens = jnp.asarray(np.array([[1, 4, 2, 7, 3]]), jnp.int32)
    ilens = jnp.asarray([5], jnp.int32)

    calls = 0

    @jax.jit
    def run(params, state, tokens, ilens, d_factor):
        nonlocal calls
        calls += 1
        return model.synthesize(params, state, tokens, ilens,
                                jax.random.PRNGKey(1), frame_budget=32,
                                d_factor=d_factor,
                                decoder_backend="scan")["mel"]

    a = run(params, state, tokens, ilens, jnp.float32(1.0))
    b = run(params, state, tokens, ilens, jnp.float32(1.3))
    assert calls == 1  # traced once; d_factor is a traced argument
    assert np.isfinite(np.asarray(a)).all()
    assert np.isfinite(np.asarray(b)).all()


def test_synthesize_hybrid_backend(monkeypatch):
    """Multi-tile hybrid (head tile on the weight-streaming kernel, rest
    on a residual-bounded scan; interpret mode): must match the scan
    backend to bf16-weight tolerance, reject non-ragged calls, and fall
    back to the plain weight-streaming path at P <= TILE."""
    import fcl_taco2_tpu.ops.decoder_pallas as dp
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(dp.pl, "pallas_call", interp_call)

    cfg = tiny_config(dunits=256, dropout_rate=0.0, zoneout_rate=0.0)
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    B, Tmax = 2, 70  # P = 140 > TILE=128: head tile + 12 scan rows
    assert B * Tmax > dp.TILE
    tokens = np.zeros((B, Tmax), np.int32)
    dur = np.zeros((B, Tmax), np.int32)
    ilens = np.array([Tmax, Tmax - 5], np.int32)
    for b in range(B):
        tokens[b, :ilens[b]] = rng.integers(1, cfg.idim, ilens[b])
        dur[b, :ilens[b]] = rng.integers(0, cfg.max_dur + 1, ilens[b])
    kw = dict(frame_budget=256, rng=jax.random.PRNGKey(1),
              durations=jnp.asarray(dur))
    tokens, ilens = jnp.asarray(tokens), jnp.asarray(ilens)

    want = model.synthesize(params, state, tokens, ilens,
                            decoder_backend="scan", **kw)
    got = model.synthesize(params, state, tokens, ilens,
                           decoder_backend="hybrid", **kw)
    np.testing.assert_array_equal(np.asarray(want["olens"]),
                                  np.asarray(got["olens"]))
    # head tile runs bf16 kernel weights, rest runs the fp32 scan
    np.testing.assert_allclose(np.asarray(got["mel"]),
                               np.asarray(want["mel"]), atol=2e-3)
    # padding stays exact zero
    for b in range(B):
        olen = int(np.asarray(got["olens"])[b])
        assert np.abs(np.asarray(got["mel"])[b, olen:]).max() == 0.0

    # int8 variant: same shapes, bounded error
    got8 = model.synthesize(params, state, tokens, ilens,
                            decoder_backend="hybrid", quantize="int8",
                            **kw)
    err = np.abs(np.asarray(got8["mel"]) - np.asarray(want["mel"])).max()
    scale = np.abs(np.asarray(want["mel"])).max()
    assert err < 0.05 * scale + 1e-3, (err, scale)

    # hybrid requires the duration-sorted ragged layout
    with pytest.raises(ValueError, match="ragged"):
        model.synthesize(params, state, tokens, ilens,
                         decoder_backend="hybrid", ragged_decode=False,
                         **kw)

    # P <= TILE falls back to the plain weight-streaming kernel
    small_tok = tokens[:1, :8]
    small_dur = jnp.asarray(np.asarray(dur)[:1, :8])
    small = model.synthesize(params, state, small_tok,
                             jnp.asarray([8], jnp.int32),
                             jax.random.PRNGKey(1), frame_budget=64,
                             durations=small_dur,
                             decoder_backend="hybrid")
    assert np.isfinite(np.asarray(small["mel"])).all()
