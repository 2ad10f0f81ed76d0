"""Audio frontend: STFT/mel/energy/F0/TextGrid/preprocess pipeline."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from fcl_taco2_tpu.ops.stft import (frame_energy, hann_window, logmel,
                                    mel_filterbank, stft_mag)
from fcl_taco2_tpu.ops.f0 import yin_f0


def ref_stft_mag(x, n_fft, hop, win_length=None):
    """Direct numpy re-derivation of librosa STFT magnitude semantics."""
    win_length = win_length or n_fft
    win = hann_window(win_length).astype(np.float64)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = np.pad(win, (lpad, n_fft - win_length - lpad))
    pad = n_fft // 2
    xp = np.pad(x.astype(np.float64), pad, mode="reflect")
    T = 1 + (len(xp) - n_fft) // hop
    out = np.zeros((T, 1 + n_fft // 2))
    for t in range(T):
        seg = xp[t * hop:t * hop + n_fft] * win
        out[t] = np.abs(np.fft.rfft(seg, n_fft))
    return out


def test_stft_mag_matches_reference_math():
    rng = np.random.default_rng(0)
    x = rng.normal(size=4096).astype(np.float32)
    got = np.asarray(stft_mag(jnp.asarray(x), 512, 128))
    want = ref_stft_mag(x, 512, 128)
    assert got.shape == want.shape == (1 + 4096 // 128, 257)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_frame_count_is_one_plus_n_over_hop():
    x = jnp.zeros(22050)
    assert stft_mag(x, 1024, 256).shape[0] == 1 + 22050 // 256


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 80.0, 7600.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # each filter is a triangle: single contiguous support
    for i in range(80):
        nz = np.nonzero(fb[i])[0]
        assert len(nz) > 0
        assert (np.diff(nz) == 1).all(), f"filter {i} not contiguous"
    # filters ordered by center frequency
    centers = [np.argmax(fb[i]) for i in range(80)]
    assert all(c2 >= c1 for c1, c2 in zip(centers, centers[1:]))
    # no support outside [fmin, fmax]
    freqs = np.linspace(0, 11025, 513)
    assert fb[:, freqs < 79].sum() == 0
    assert fb[:, freqs > 7605].sum() == 0


def test_logmel_tone_peaks_at_expected_mel_bin():
    sr = 22050
    t = np.arange(sr) / sr
    for freq in [200.0, 1000.0, 4000.0]:
        x = np.sin(2 * np.pi * freq * t).astype(np.float32)
        lm = np.asarray(logmel(jnp.asarray(x), sr))
        mean_spec = lm.mean(0)
        peak_bin = int(np.argmax(mean_spec))
        # find which filter has max response at the tone's fft bin
        fb = mel_filterbank(sr, 1024, 80, 80.0, 7600.0)
        fft_bin = int(round(freq * 1024 / sr))
        expect = int(np.argmax(fb[:, fft_bin]))
        assert abs(peak_bin - expect) <= 1, (freq, peak_bin, expect)


def test_energy_matches_stft_l2():
    rng = np.random.default_rng(1)
    x = rng.normal(size=8192).astype(np.float32)
    en = np.asarray(frame_energy(jnp.asarray(x), 1024, 256))
    mag = ref_stft_mag(x, 1024, 256)
    np.testing.assert_allclose(en, np.linalg.norm(mag, axis=1), rtol=1e-3)


@pytest.mark.parametrize("freq", [110.0, 220.0, 440.0])
def test_yin_on_harmonic_tone(freq):
    sr = 22050
    t = np.arange(int(sr * 0.6)) / sr
    x = (0.6 * np.sin(2 * np.pi * freq * t)
         + 0.3 * np.sin(2 * np.pi * 2 * freq * t)
         + 0.1 * np.sin(2 * np.pi * 3 * freq * t)).astype(np.float32)
    f0 = np.asarray(yin_f0(jnp.asarray(x), sr))
    mid = f0[10:-10]
    voiced = mid[mid > 0]
    assert len(voiced) > 0.9 * len(mid)
    rel_err = np.abs(voiced - freq) / freq
    assert np.median(rel_err) < 0.01, (freq, np.median(rel_err))


def test_yin_silence_is_unvoiced():
    x = np.zeros(22050, np.float32)
    f0 = np.asarray(yin_f0(jnp.asarray(x)))
    assert (f0 == 0).all()


def test_batched_frontend_tail_frames_match_exact():
    """Frontend bucketing must not corrupt edge frames: compare against
    the single-utterance center=True (reflect) computation."""
    from fcl_taco2_tpu.audio.preprocess import Frontend, PreprocessConfig

    rng = np.random.default_rng(0)
    cfg = PreprocessConfig(set_fs=22050, batch_frames=2 ** 18)
    wavs = [rng.normal(size=n).astype(np.float32) * 0.3
            for n in (5000, 7777, 12000)]
    results = Frontend(cfg).process(wavs)
    for w, (mel_b, f0_b, en_b) in zip(wavs, results):
        mel_e = np.asarray(logmel(jnp.asarray(w), cfg.set_fs, cfg.n_fft,
                                  cfg.n_shift, cfg.n_fft, cfg.n_mels,
                                  cfg.fmin, cfg.fmax))
        T = 1 + len(w) // cfg.n_shift
        assert mel_b.shape[0] == T
        np.testing.assert_allclose(mel_b, mel_e[:T], atol=2e-3)
        # the LAST frame especially (previous bug: zero-pad vs reflect)
        np.testing.assert_allclose(mel_b[-1], mel_e[T - 1], atol=2e-3)
