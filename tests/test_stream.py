"""Streaming TTS (infer/stream.py) + stateful vocoder kernel.

The reference has no streaming path (whole-utterance decode, separate
vocoder process, /root/reference/tts.py:605-687); these tests pin the
TPU-native extension: chunked decode + stateful streaming vocoder must
reproduce the one-shot pipeline bit-for-bit (fp reassociation only)
when the acoustic model is deterministic.
"""

import numpy as np
import jax
import jax.numpy as jnp

from fcl_taco2_tpu.models import Tacotron2SA
from fcl_taco2_tpu.vocoder.pwg import PWGConfig, pwg_generate, pwg_init
from fcl_taco2_tpu.vocoder.pwg_pallas import (pwg_generate_streaming,
                                              pwg_stream_state,
                                              pwg_stream_step,
                                              pack_pwg_weights, _round8,
                                              total_delay)
from fcl_taco2_tpu.infer.stream import StreamTTS

from helpers import tiny_config


def small_pwg(aux):
    return PWGConfig(layers=6, stacks=2, residual_channels=8,
                     gate_channels=16, skip_channels=8, aux_channels=aux,
                     upsample_scales=(2, 2))


def test_stateful_kernel_chaining_matches_oneshot():
    """Chained pwg_stream_step calls == pwg_generate_streaming, bit-exact
    (the cross-call state handoff: aux history, skip accumulator, per
    layer ring buffers — pwg_pallas.py:254-422)."""
    cfg = small_pwg(5)
    params = pwg_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    B, Tm = 2, 30
    W = Tm * cfg.hop
    mel = jnp.asarray(rng.normal(size=(B, Tm, 5)).astype(np.float32))
    noise = rng.normal(size=(B, W)).astype(np.float32)
    want = np.asarray(pwg_generate_streaming(
        params, cfg, mel, jnp.asarray(noise), tile=8, interpret=True))

    from fcl_taco2_tpu.vocoder.pwg import upsample_mel
    delay = _round8(total_delay(cfg))
    Vh = 16
    n = -(-(W + delay) // Vh)
    aux = np.zeros((B, n * Vh, 5), np.float32)
    aux[:, :W] = np.asarray(upsample_mel(params, cfg, mel))
    noise_p = np.zeros((B, n * Vh), np.float32)
    noise_p[:, :W] = noise

    packed = pack_pwg_weights(params, cfg)
    state = pwg_stream_state(cfg, B)
    got = []
    for j in range(n):
        wav, state = pwg_stream_step(
            packed, cfg, state, jnp.asarray(aux[:, j * Vh:(j + 1) * Vh]),
            jnp.asarray(noise_p[:, j * Vh:(j + 1) * Vh]), j * Vh, W,
            tile=8, interpret=True)
        got.append(np.asarray(wav))
    got = np.concatenate(got, axis=1)[:, delay:delay + W]
    np.testing.assert_array_equal(got, want)


def _setup_stream(dropout=0.0, cfg_kw=None, **kw):
    cfg = tiny_config(dropout_rate=dropout, zoneout_rate=0.0,
                      **(cfg_kw or {}))
    model = Tacotron2SA(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    pwg_cfg = small_pwg(cfg.odim)
    pwg_params = pwg_init(jax.random.PRNGKey(3), pwg_cfg)
    st = StreamTTS(model, params, state, pwg_params, pwg_cfg,
                   chunk_phonemes=3, postnet_chunk=4, vocode_frames=4,
                   tile=8, interpret=True, budget_round=16, **kw)
    return cfg, model, params, state, pwg_cfg, pwg_params, st


def test_stream_matches_oneshot_pipeline():
    """StreamTTS (chunked decode -> windowed postnet -> streaming
    vocoder) == synthesize + pwg_generate over the whole utterance, to
    fp reassociation, with ground-truth durations and dropout 0."""
    cfg, model, params, state, pwg_cfg, pwg_params, st = _setup_stream()
    tokens = np.array([3, 1, 7, 2, 9, 4, 10], np.int32)
    dur = np.array([3, 0, 5, 2, 6, 1, 4], np.int32)
    T = tokens.shape[0]
    F = int(dur.sum())
    Wtot = F * pwg_cfg.hop
    rng = np.random.default_rng(7)
    noise = rng.normal(size=(Wtot,)).astype(np.float32)

    # one-shot reference: whole-utterance synthesize + full conv vocoder
    tok_pad = np.zeros((1, 8), np.int32)
    tok_pad[0, :T] = tokens
    dur_pad = np.zeros((1, 8), np.int32)
    dur_pad[0, :T] = dur
    out = model.synthesize(params, state, jnp.asarray(tok_pad),
                           jnp.asarray([T], jnp.int32),
                           jax.random.PRNGKey(5), frame_budget=32,
                           durations=jnp.asarray(dur_pad))
    assert int(out["olens"][0]) == F
    mel = np.asarray(out["mel"])[0, :F]
    want = np.asarray(pwg_generate(pwg_params, pwg_cfg, mel[None],
                                   jnp.asarray(noise[None])))[0]

    chunks = list(st.stream(tokens, jax.random.PRNGKey(5),
                            durations=dur, noise=noise))
    assert len(chunks) > 1  # actually streamed
    got = np.concatenate(chunks)
    assert got.shape == (Wtot,)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_stream_int8_matches_oneshot_int8(monkeypatch):
    """StreamTTS with int8 weight-only quantized decode (pallas_hbm,
    interpret mode) == whole-utterance synthesize with the SAME
    quantization + full conv vocoder: the streaming machinery must stay
    exact under quantization (both paths see identical dequantized
    weights, so the tolerance is fp reassociation, not quantization)."""
    import fcl_taco2_tpu.ops.decoder_pallas as dp
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(dp.pl, "pallas_call", interp_call)

    cfg, model, params, state, pwg_cfg, pwg_params, st = _setup_stream(
        cfg_kw={"dunits": 256}, decoder_backend="pallas_hbm",
        quantize="int8")

    tokens = np.array([3, 1, 7, 2, 9, 4], np.int32)
    dur = np.array([3, 2, 5, 1, 4, 2], np.int32)
    T = tokens.shape[0]
    F = int(dur.sum())
    Wtot = F * pwg_cfg.hop
    noise = np.random.default_rng(7).normal(size=(Wtot,)).astype(
        np.float32)

    tok_pad = np.zeros((1, 8), np.int32)
    tok_pad[0, :T] = tokens
    dur_pad = np.zeros((1, 8), np.int32)
    dur_pad[0, :T] = dur
    out = model.synthesize(params, state, jnp.asarray(tok_pad),
                           jnp.asarray([T], jnp.int32),
                           jax.random.PRNGKey(5), frame_budget=32,
                           durations=jnp.asarray(dur_pad),
                           decoder_backend="pallas_hbm", quantize="int8")
    assert int(out["olens"][0]) == F
    mel = np.asarray(out["mel"])[0, :F]
    want = np.asarray(pwg_generate(pwg_params, pwg_cfg, mel[None],
                                   jnp.asarray(noise[None])))[0]

    chunks = list(st.stream(tokens, jax.random.PRNGKey(5),
                            durations=dur, noise=noise))
    got = np.concatenate(chunks)
    assert got.shape == (Wtot,)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_stream_predicted_durations_smoke():
    """Predicted-duration path: stream emits sum(d_outs)*hop finite
    samples; prenet dropout active (stochastic inference like the
    reference, decoder_sa.py:109-112)."""
    cfg, model, params, state, pwg_cfg, pwg_params, st = _setup_stream(
        dropout=0.5)
    tokens = np.array([3, 1, 7, 2, 9], np.int32)
    wav = st.tts(tokens, jax.random.PRNGKey(2))
    assert wav.ndim == 1 and wav.shape[0] % pwg_cfg.hop == 0
    assert np.all(np.isfinite(wav))
    # total duration agrees with the frontend's prediction
    hs, d_outs = st._jit_frontend(
        params, state,
        jnp.asarray(np.pad(tokens, (0, 3))[None]),
        jnp.asarray([5], jnp.int32), jnp.float32(1.0))
    F = int(np.asarray(d_outs)[0, :5].sum())
    assert wav.shape[0] == F * pwg_cfg.hop


def test_stream_rejects_short_noise():
    cfg, model, params, state, pwg_cfg, pwg_params, st = _setup_stream()
    tokens = np.array([3, 1, 7], np.int32)
    dur = np.array([4, 4, 4], np.int32)
    try:
        list(st.stream(tokens, jax.random.PRNGKey(0), durations=dur,
                       noise=np.zeros(5, np.float32)))
    except ValueError as e:
        assert "noise" in str(e)
    else:
        raise AssertionError("short noise should raise")
