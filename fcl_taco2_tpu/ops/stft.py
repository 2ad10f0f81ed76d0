"""Jittable audio frontend: framing, STFT, log-mel, frame energy.

TPU-native replacement for the reference's librosa/espnet feature chain
(/root/reference/preprocess.py:40-50 logmelspectrogram, :71-72 energy via
|STFT| L2 norm).  Semantics reproduced:

- librosa-style STFT: periodic hann, center=True with reflect padding,
  n_frames = 1 + len(x)//hop
- log-mel: log10(max(1e-10, |S| @ mel_basis.T)) with a slaney-normalized
  librosa mel filterbank (htk=False)
- energy: per-frame L2 norm over frequency bins

The mel filterbank is built host-side in numpy (librosa.filters.mel math,
reimplemented since librosa is not a dependency); the per-sample compute is
one jnp matmul after an rfft — batched utterances run as a single XLA
program instead of the reference's serial CPU loop.
"""

import math

import numpy as np
import jax.numpy as jnp


def hann_window(win_length, dtype=np.float32):
    """Periodic hann (scipy get_window('hann', n, fftbins=True))."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2 * np.pi * n / win_length)).astype(dtype)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz)
                    / logstep,
                    f / f_sp)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    f_sp * m)


def mel_filterbank(sr, n_fft, n_mels=80, fmin=80.0, fmax=7600.0):
    """librosa.filters.mel(htk=False, norm='slaney') reimplementation.
    Returns (n_mels, 1 + n_fft//2) float32."""
    if fmax is None:
        fmax = sr / 2
    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax),
                          n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def frame_signal(x, frame_length, hop, center=True):
    """(..., N) -> (..., T, frame_length), librosa centering semantics."""
    if center:
        pad = frame_length // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)],
                    mode="reflect")
    n = x.shape[-1]
    n_frames = 1 + (n - frame_length) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(frame_length)[None, :])
    return x[..., idx]


def stft_mag(x, n_fft=1024, hop=256, win_length=None, center=True):
    """|STFT| with librosa conventions: (..., N) -> (..., T, 1+n_fft//2).

    T = 1 + len(x)//hop for center=True (espnet stft, preprocess.py:71)."""
    win_length = win_length or n_fft
    win = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:  # librosa pads the window to n_fft
        lpad = (n_fft - win_length) // 2
        win = jnp.pad(win, (lpad, n_fft - win_length - lpad))
    frames = frame_signal(x, n_fft, hop, center)
    spec = jnp.fft.rfft(frames * win, n=n_fft, axis=-1)
    return jnp.abs(spec)


def logmel(x, sr=22050, n_fft=1024, hop=256, win_length=None, n_mels=80,
           fmin=80.0, fmax=7600.0, eps=1e-10, mel_basis=None, center=True):
    """log10-mel spectrogram, espnet logmelspectrogram parity:
    (..., N) -> (..., T, n_mels)."""
    if mel_basis is None:
        mel_basis = jnp.asarray(
            mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mag = stft_mag(x, n_fft, hop, win_length, center=center)
    mel = mag @ mel_basis.T
    return jnp.log10(jnp.maximum(eps, mel))


def frame_energy(x, n_fft=1024, hop=256, win_length=None, center=True):
    """Per-frame L2 norm of |STFT| (preprocess.py:71-72):
    (..., N) -> (..., T)."""
    mag = stft_mag(x, n_fft, hop, win_length, center=center)
    return jnp.sqrt(jnp.sum(mag * mag, axis=-1))
