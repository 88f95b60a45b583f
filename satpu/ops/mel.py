"""HiFi-GAN style mel spectrogram (reference hifigan/dataset.py:264-310).

librosa-compatible slaney mel basis + hann STFT with the HiFi-GAN padding
convention (reflect pad of (n_fft - hop)/2 on each side, center=False), and
log dynamic-range compression with clip 1e-5. Used for the mel L1 training
loss and validation error of the GAN stack. Pure JAX and jittable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fbank import framed_rfft_sqmag


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    safe = np.maximum(f, 1e-12)
    return np.where(f >= min_log_hz, min_log_mel + np.log(safe / min_log_hz) / logstep, mels)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=None)
def librosa_mel_basis(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """librosa.filters.mel(htk=False, norm='slaney') reimplementation;
    shape [n_mels, n_fft//2 + 1]."""
    if fmax is None or fmax <= 0:
        fmax = sr / 2.0
    fftfreqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    mel_f = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def stft_magnitude(y: jnp.ndarray, n_fft: int, hop_size: int, win_size: int) -> jnp.ndarray:
    """[B, T] -> [B, n_fft//2+1, frames] magnitude with HiFi-GAN padding."""
    pad = (n_fft - hop_size) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (y.shape[1] - n_fft) // hop_size
    idx = (jnp.arange(n_frames) * hop_size)[:, None] + jnp.arange(n_fft)[None, :]
    frames = y[:, idx]  # [B, frames, n_fft]
    window = jnp.asarray(np.hanning(win_size + 1)[:-1].astype(np.float32))  # periodic hann
    lpad = (n_fft - win_size) // 2 if win_size < n_fft else 0
    if win_size < n_fft:
        window = jnp.pad(window, (lpad, n_fft - win_size - lpad))
    # |rfft| as DFT matmuls over the window's non-zero span (ops/fbank.py:
    # framed_rfft_sqmag) — XLA's TPU FFT custom call is far slower
    sqmag = framed_rfft_sqmag(frames * window, n_fft, lpad, win_size)
    mag = jnp.sqrt(sqmag + 1e-9)
    return jnp.transpose(mag, (0, 2, 1))


@functools.partial(jax.jit, static_argnames=("n_fft", "num_mels", "sampling_rate",
                                             "hop_size", "win_size", "fmin", "fmax"))
def mel_spectrogram(y: jnp.ndarray, n_fft: int = 1024, num_mels: int = 80,
                    sampling_rate: int = 16000, hop_size: int = 256,
                    win_size: int = 1024, fmin: float = 0.0,
                    fmax: float = 8000.0) -> jnp.ndarray:
    """[B, T] audio in [-1, 1] -> [B, num_mels, frames] log-mel."""
    if y.ndim == 1:
        y = y[None, :]
    mag = stft_magnitude(y, n_fft, hop_size, win_size)
    basis = jnp.asarray(librosa_mel_basis(sampling_rate, n_fft, num_mels, fmin, fmax))
    mel = jnp.einsum("mf,bft->bmt", basis, mag)
    return jnp.log(jnp.clip(mel, min=1e-5))
