"""Jittable F0 extraction (YIN) — TPU-native replacement for pyworld
dio+stonemask (/root/reference/preprocess.py:64-66).

pyworld is C++ (WORLD); its exact numerics are not reproducible without the
dependency, so this is a proper reimplementation of fundamental-frequency
estimation: YIN (de Cheveigné & Kawahara 2002) with cumulative-mean
normalized difference, absolute threshold, parabolic interpolation, and a
voicing decision.

Error budget — measured against the committed torture goldens
(tests/fixtures/f0_goldens.npz, analytic ground truth; regenerate with
scripts/make_f0_goldens.py; asserted by tests/test_f0_goldens.py):

    case          voicing F1   median cents   octave errors
    vibrato          1.000          8.3            0
    octave_trap      0.996          0.0            0
    creaky_low       0.996          3.1            0
    noisy (5 dB)     0.990          4.2            0
    breathy          0.990          6.5            0
    speechlike       0.988          2.7            0
    onsets           0.905          0.1            0
    synthcorpus GT   0.973          3.8            0   (end-to-end)

The last row scores speech-like signals end-to-end: 24 full synthcorpus
utterances (formants, crossfades, noise phones, stop bursts) against the
generator's OWN per-sample excitation F0 + voicing mask at the
preprocessing parameters, plus the phoneme-averaged voiced-only lf0 the
pipeline actually emits (median |Δlf0| 0.0012 ≈ 2 cents) —
results/F0_groundtruth.json, regenerate with
scripts/f0_groundtruth_eval.py, regression-gated by
tests/test_f0_goldens.py::test_synthcorpus_ground_truth.

The default voicing threshold 0.35 is the measured sweet spot: 0.15 marks
5 dB-SNR and breathy voicing entirely unvoiced; 0.5 falls into the octave
trap (accepts the half-period lag of a dominant 2nd harmonic).  Unvoiced
frames are exact zeros, preserved through normalization
(preprocess.py:67-69, 142-144).

Everything is batched framewise; one jit handles a whole utterance (or a
padded batch of them).
"""

from functools import partial

import jax
import jax.numpy as jnp

from fcl_taco2_tpu.ops.stft import frame_signal


@partial(jax.jit, static_argnames=("sr", "hop", "win_length", "fmin", "fmax",
                                   "threshold"))
def yin_f0(x, sr=22050, hop=256, win_length=1024, fmin=71.0, fmax=800.0,
           threshold=0.35):
    """x: (N,) float -> f0 (T,) float32, 0 where unvoiced.

    T = 1 + N//hop (aligned with the STFT frame count so phoneme averaging
    uses one frame grid, preprocess.py:66 trims f0 to the mel length).
    """
    tau_max = int(sr / fmin)
    tau_min = max(int(sr / fmax), 1)
    W = win_length

    # frames long enough to evaluate lags up to tau_max
    frames = frame_signal(x, W + tau_max, hop, center=True)  # (T, W+tau_max)

    # difference function d(tau) = r0[0] + r0[tau] - 2*corr(tau), computed
    # with an FFT cross-correlation (O(T * L log L), MXU/VPU friendly)
    n_fft = 1
    while n_fft < (W + tau_max):
        n_fft *= 2
    head = frames[:, :W]
    spec_full = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    spec_head = jnp.fft.rfft(head, n=n_fft, axis=-1)
    corr = jnp.fft.irfft(spec_full * jnp.conj(spec_head), n=n_fft,
                         axis=-1)[:, :tau_max + 1]  # (T, tau_max+1)

    sq = frames * frames
    csum = jnp.cumsum(sq, axis=-1)
    e0 = csum[:, W - 1]  # energy of x[0:W]
    # energy of x[tau:tau+W] for each tau
    pad = jnp.concatenate([jnp.zeros_like(csum[:, :1]), csum], axis=-1)
    taus = jnp.arange(tau_max + 1)
    e_tau = pad[:, taus + W] - pad[:, taus]
    d = e0[:, None] + e_tau - 2.0 * corr  # (T, tau_max+1)

    # cumulative-mean normalized difference
    cums = jnp.cumsum(d[:, 1:], axis=-1)
    tau_idx = jnp.arange(1, tau_max + 1, dtype=d.dtype)
    cmnd = d[:, 1:] * tau_idx / jnp.maximum(cums, 1e-12)  # (T, tau_max)
    cmnd = jnp.concatenate([jnp.ones_like(d[:, :1]), cmnd], axis=-1)

    # first tau in [tau_min, tau_max] below threshold; fallback to argmin
    lag = jnp.arange(tau_max + 1)
    in_range = (lag >= tau_min) & (lag <= tau_max)
    below = (cmnd < threshold) & in_range
    first_below = jnp.argmax(below, axis=-1)  # 0 if none
    masked = jnp.where(in_range, cmnd, jnp.inf)
    best = jnp.argmin(masked, axis=-1)
    tau = jnp.where(below.any(axis=-1), first_below, best)

    # refine: from the first-below point, walk to the local minimum basin by
    # taking the argmin within a small window after tau
    WIN = 32
    offs = jnp.arange(WIN)
    local = jnp.take_along_axis(
        cmnd, jnp.clip(tau[:, None] + offs[None, :], 0, tau_max), axis=-1)
    tau = jnp.clip(tau + jnp.argmin(local, axis=-1), tau_min, tau_max)

    # parabolic interpolation around tau
    t0 = jnp.clip(tau - 1, 0, tau_max)
    t2 = jnp.clip(tau + 1, 0, tau_max)
    y0 = jnp.take_along_axis(cmnd, t0[:, None], -1)[:, 0]
    y1 = jnp.take_along_axis(cmnd, tau[:, None], -1)[:, 0]
    y2 = jnp.take_along_axis(cmnd, t2[:, None], -1)[:, 0]
    denom = y0 - 2 * y1 + y2
    shift = jnp.where(jnp.abs(denom) > 1e-12,
                      0.5 * (y0 - y2) / jnp.where(denom == 0, 1.0, denom),
                      0.0)
    shift = jnp.clip(shift, -1.0, 1.0)
    tau_f = tau.astype(jnp.float32) + shift

    # energy gate: silent frames are unvoiced regardless of the CMND value
    # (an all-zero frame has d == 0 everywhere which would read as voiced)
    has_energy = e0 > 1e-6
    voiced = ((y1 < threshold) | below.any(axis=-1)) & has_energy
    f0 = jnp.where(voiced, sr / jnp.maximum(tau_f, 1.0), 0.0)
    # frame count parity with the mel grid
    T = 1 + x.shape[-1] // hop
    return f0[:T].astype(jnp.float32)
