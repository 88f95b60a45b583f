"""ASV acoustic frontends (reference satools/satools/sidekit/preprocessor.py).

``mel_spec_frontend`` replicates MelSpecFrontEnd (preprocessor.py:164-236):
pre-emphasis (reflect-padded, augmentation.py:219-246) -> torchaudio-style
MelSpectrogram (center=True reflect, hann periodic window, power 2, HTK mel
scale without norm, 90-7600 Hz) -> log(+1e-6) -> InstanceNorm CMVN. The
train-time time/freq masking lives in satpu.ops.augment (SpecAugment).

Pure functions, jittable; output layout [B, T, n_mels] (channels-last).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fbank import framed_rfft_sqmag

from ..models.torchlayers import instance_norm_1d


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def torchaudio_mel_fbanks(n_freqs: int, f_min: float, f_max: float, n_mels: int,
                          sample_rate: int) -> np.ndarray:
    """torchaudio.functional.melscale_fbanks(norm=None, mel_scale='htk');
    shape [n_freqs, n_mels]."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]  # [freq, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def pre_emphasis(x: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """y[t] = x[t] - coef * x[t-1], reflect pad 1 at the left."""
    prev = jnp.concatenate([x[:, 1:2], x[:, :-1]], axis=1)
    return x - coef * prev


def torch_stft_mag2(y: jnp.ndarray, n_fft: int, hop_length: int,
                    win_length: int) -> jnp.ndarray:
    """|torch.stft(center=True, pad_mode='reflect', hann periodic)|^2.

    Returns [B, n_fft//2 + 1, frames].
    """
    pad = n_fft // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (y.shape[1] - n_fft) // hop_length
    idx = (jnp.arange(n_frames) * hop_length)[:, None] + jnp.arange(n_fft)[None, :]
    frames = y[:, idx]
    window = np.hanning(win_length + 1)[:-1].astype(np.float32)  # periodic hann
    lpad = (n_fft - win_length) // 2 if win_length < n_fft else 0
    if win_length < n_fft:
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    # |rfft|^2 as DFT matmuls over the window's non-zero span (ops/fbank.py:
    # framed_rfft_sqmag) — XLA's TPU FFT custom call is far slower
    mag2 = framed_rfft_sqmag(frames * jnp.asarray(window), n_fft, lpad,
                             win_length)
    return jnp.transpose(mag2, (0, 2, 1))


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length",
                                             "n_mels", "sample_rate", "f_min",
                                             "f_max", "pre_emph"))
def mel_spec_frontend(x: jnp.ndarray, n_fft: int = 1024, hop_length: int = 160,
                      win_length: int = 400, n_mels: int = 80,
                      sample_rate: int = 16000, f_min: float = 90.0,
                      f_max: float = 7600.0, pre_emph: float = 0.97) -> jnp.ndarray:
    """[B, T] audio -> [B, frames, n_mels] log-mel, InstanceNorm-CMVN'd."""
    if x.ndim == 1:
        x = x[None, :]
    y = pre_emphasis(x, pre_emph)
    mag2 = torch_stft_mag2(y, n_fft, hop_length, win_length)  # [B, F, T]
    fb = jnp.asarray(torchaudio_mel_fbanks(n_fft // 2 + 1, f_min, f_max, n_mels,
                                           sample_rate))
    mel = jnp.einsum("bft,fm->bmt", mag2, fb)
    out = jnp.log(mel + 1e-6)
    out_tc = jnp.transpose(out, (0, 2, 1))  # [B, T, n_mels]
    return instance_norm_1d(out_tc)


def spec_masking(x: jnp.ndarray, key: jax.Array, time_mask_param: int = 5,
                 freq_mask_param: int = 10) -> jnp.ndarray:
    """torchaudio-style Time/FrequencyMasking used in training
    (preprocessor.py:216-218,232-235). x: [B, T, F]."""
    B, T, F = x.shape
    kt, kf, kt2, kf2 = jax.random.split(key, 4)
    f_len = jax.random.randint(kf, (B,), 0, freq_mask_param + 1)
    f_start = jax.random.randint(kf2, (B,), 0, jnp.maximum(F - f_len, 1))
    t_len = jax.random.randint(kt, (B,), 0, time_mask_param + 1)
    t_start = jax.random.randint(kt2, (B,), 0, jnp.maximum(T - t_len, 1))
    f_idx = jnp.arange(F)[None, :]
    t_idx = jnp.arange(T)[None, :]
    f_mask = (f_idx >= f_start[:, None]) & (f_idx < (f_start + f_len)[:, None])
    t_mask = (t_idx >= t_start[:, None]) & (t_idx < (t_start + t_len)[:, None])
    x = jnp.where(f_mask[:, None, :], 0.0, x)
    x = jnp.where(t_mask[:, :, None], 0.0, x)
    return x


def _dct2_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """Orthonormal DCT-II basis (torchaudio.functional.create_dct 'ortho')."""
    n = np.arange(n_mels)
    k = np.arange(n_mfcc)[:, None]
    dct = np.cos(np.pi / n_mels * (n + 0.5) * k)  # [n_mfcc, n_mels]
    dct[0] *= 1.0 / np.sqrt(2.0)
    dct *= np.sqrt(2.0 / n_mels)
    return dct.astype(np.float32)


def mfcc_frontend(x: jnp.ndarray, n_fft: int = 2048, hop_length: int = 512,
                  win_length: int = 1024, n_mels: int = 100, n_mfcc: int = 80,
                  sample_rate: int = 16000, f_min: float = 133.333,
                  f_max: float = 6855.4976, pre_emph: float = 0.97) -> jnp.ndarray:
    """MfccFrontEnd (reference sidekit/preprocessor.py:13-78): pre-emphasis ->
    mel power spectrogram -> natural-log mels -> orthonormal DCT-II (n_mfcc)
    -> InstanceNorm CMVN. [B, T] -> [B, frames, n_mfcc]."""
    if x.ndim == 1:
        x = x[None, :]
    y = pre_emphasis(x, pre_emph)
    mag2 = torch_stft_mag2(y, n_fft, hop_length, win_length)  # [B, F, T]
    fb = jnp.asarray(torchaudio_mel_fbanks(n_fft // 2 + 1, f_min, f_max, n_mels,
                                           sample_rate))
    mel = jnp.einsum("bft,fm->bmt", mag2, fb)  # [B, n_mels, T]
    logmel = jnp.log(mel + 1e-6)
    dct = jnp.asarray(_dct2_matrix(n_mfcc, n_mels))
    mfcc = jnp.einsum("bmt,cm->bct", logmel, dct)  # [B, n_mfcc, T]
    return instance_norm_1d(jnp.transpose(mfcc, (0, 2, 1)))
