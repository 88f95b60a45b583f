"""Data augmentation (reference satools/satools/augmentation.py).

Host-side waveform augmentations run in the data pipeline (numpy — the
reference likewise runs them in DataLoader workers on CPU):
``data_augmentation`` with the same pipeline keys
(none | add_reverb | add_noise | phone_filtering | codec | speed_perturb),
MUSAN-style SNR ranges (augmentation.py:96-137) and csv-driven noise/RIR
databases. sox-based phone filtering/codec are re-implemented directly
(biquad low-pass + mu-law / a-law companding).

``spec_augment`` (Snowdar-style, augmentation.py:248-334) is jittable JAX and
runs on-device inside the training step.
"""
from __future__ import annotations

import math
import random
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import kaldi_data


def fuse_speech_noise(speech: np.ndarray, noise: np.ndarray, snr_db: float,
                      rng: Optional[random.Random] = None) -> np.ndarray:
    """(augmentation.py:20-30)."""
    speech_power = np.linalg.norm(speech)
    if speech_power == 0:
        speech = speech + 1e-2 * np.random.randn(*speech.shape).astype(speech.dtype)
        speech_power = np.linalg.norm(speech)
    noise_power = np.linalg.norm(noise)
    snr = 10 ** (snr_db / 20)
    scale = snr * noise_power / speech_power
    return (scale * speech + noise) / 2


def load_noise_seg(noise_path: str, shape: Tuple[int, int], sample_rate: int,
                   rng: random.Random) -> np.ndarray:
    """Random aligned segment of a noise file, padded/tiled to `shape`."""
    noise, _ = kaldi_data.load_wav_from_scp(noise_path)
    noise = noise[0]
    need = shape[1]
    if len(noise) >= need:
        start = rng.randrange(0, len(noise) - need + 1)
        seg = noise[start : start + need]
    else:
        reps = int(np.ceil(need / len(noise)))
        seg = np.tile(noise, reps)[:need]
    return seg[None, :].astype(np.float32)


def _mu_law(x: np.ndarray, mu: float = 255.0) -> np.ndarray:
    y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    q = np.round((y + 1) / 2 * mu) / mu * 2 - 1
    return np.sign(q) * (np.expm1(np.abs(q) * np.log1p(mu))) / mu


def _a_law(x: np.ndarray, A: float = 87.6) -> np.ndarray:
    absx = np.abs(x)
    y = np.where(absx < 1 / A, A * absx / (1 + np.log(A)),
                 (1 + np.log(A * np.clip(absx, 1 / A, None))) / (1 + np.log(A)))
    y = np.sign(x) * y
    q = np.round((y + 1) / 2 * 255) / 255 * 2 - 1
    absq = np.abs(q)
    inv = np.where(absq < 1 / (1 + np.log(A)), absq * (1 + np.log(A)) / A,
                   np.exp(absq * (1 + np.log(A)) - 1) / A)
    return np.sign(q) * inv


def _lowpass_np(x: np.ndarray, fs: int, cutoff: float, order: int = 4) -> np.ndarray:
    from scipy import signal as sps

    sos = sps.butter(order, cutoff / (fs / 2), btype="low", output="sos")
    return sps.sosfilt(sos, x, axis=-1).astype(np.float32)


def speed_perturb(x: np.ndarray, factor: float) -> np.ndarray:
    """Resample-based speed perturbation (0.9-1.1)."""
    n = x.shape[-1]
    new_n = int(round(n / factor))
    idx = np.linspace(0, n - 1, new_n)
    lo = np.floor(idx).astype(int)
    hi = np.minimum(lo + 1, n - 1)
    frac = (idx - lo).astype(np.float32)
    return (x[..., lo] * (1 - frac) + x[..., hi] * frac).astype(np.float32)


def data_augmentation(speech: np.ndarray, transform_dict: Dict, sample_rate: int = 16000,
                      noise_db: Optional[Dict[str, Sequence[str]]] = None,
                      rir_db: Optional[Sequence[str]] = None,
                      rng: Optional[random.Random] = None) -> np.ndarray:
    """Apply ``aug_number`` randomly-picked transforms from the pipeline.

    noise_db: {"speech"|"music"|"noise": [wav paths]} (the musan csv contents);
    rir_db: [rir wav paths].
    """
    rng = rng or random
    if speech.ndim == 1:
        speech = speech[None, :]
    pipeline = transform_dict["pipeline"]
    k = transform_dict.get("aug_number", 1)
    augmentations = [pipeline[i] for i in rng.sample(range(len(pipeline)), k=k)]

    allowed = ["none", "add_reverb", "add_noise", "phone_filtering", "codec", "speed_perturb"]
    for a in augmentations:
        if a not in allowed:
            raise ValueError(f"{a} is not a valid augmentation, allowed: {allowed}")

    if "add_reverb" in augmentations and rir_db:
        rir_path = rir_db[rng.randrange(len(rir_db))]
        rir, rir_fs = kaldi_data.load_wav_from_scp(rir_path)
        assert rir_fs == sample_rate
        full = np.stack([np.convolve(speech[c], rir[0], mode="full")
                         for c in range(speech.shape[0])])
        speech = full[:, : speech.shape[1]].astype(np.float32)

    if "add_noise" in augmentations and noise_db:
        babble = str(transform_dict.get("add_noise", {}).get("babble_noise", "true")).lower() == "true"
        noise_idx = rng.randrange(0, 4) if babble else rng.randrange(1, 3)
        noise = np.zeros_like(speech)
        if noise_idx == 0 and noise_db.get("speech"):
            snr_db = rng.randint(13, 20)
            pick = rng.randint(3, 7)
            paths = [noise_db["speech"][i] for i in
                     rng.sample(range(len(noise_db["speech"])), k=min(pick, len(noise_db["speech"])))]
            for p in paths:
                noise += load_noise_seg(p, speech.shape, sample_rate, rng)
            noise /= max(len(paths), 1)
        elif noise_idx == 1 and noise_db.get("music"):
            snr_db = rng.randint(5, 15)
            noise += load_noise_seg(noise_db["music"][rng.randrange(len(noise_db["music"]))],
                                    speech.shape, sample_rate, rng)
        elif noise_db.get("noise"):
            snr_db = rng.randint(0, 15)
            noise += load_noise_seg(noise_db["noise"][rng.randrange(len(noise_db["noise"]))],
                                    speech.shape, sample_rate, rng)
        else:
            snr_db = None
        if snr_db is not None and np.any(noise):
            speech = fuse_speech_noise(speech, noise, snr_db).astype(np.float32)

    if "phone_filtering" in augmentations:
        # sox lowpass 3400 + compand approximation (augmentation.py:141-151)
        speech = _lowpass_np(speech, sample_rate, 3400.0)
        speech = _mu_law(speech).astype(np.float32)

    if "codec" in augmentations:
        codec = rng.choice(["mulaw", "alaw"])
        speech = (_mu_law(speech) if codec == "mulaw" else _a_law(speech)).astype(np.float32)

    if "speed_perturb" in augmentations:
        factor = rng.uniform(0.9, 1.1)
        speech = speed_perturb(speech, factor)

    return speech


def load_augmentation(value: str):
    """Parse a driver ``augmentation`` option into
    ``(transform_dict, noise_db, rir_db)`` ready for the datasets.

    ``value`` is either inline lenient JSON (the reference's config style,
    configs/tdnnf_bn:40-56, trailing commas tolerated like utils.fix_json)
    or a path to a .json file with the same contents. ``add_noise.noise_db_csv``
    / ``add_reverb.rir_db_csv`` point at prepare_aug outputs; their sibling
    ``.json`` databases are loaded here.
    """
    import json
    import os
    import re

    if not value:
        return None, None, None
    text = value
    if not value.lstrip().startswith("{"):
        with open(value) as f:
            text = f.read()
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r",\s*([}\]])", r"\1", text)  # trailing commas
    cfg = json.loads(text)
    noise_db = rir_db = None
    ncsv = cfg.get("add_noise", {}).get("noise_db_csv", "")
    if ncsv:
        with open(os.path.splitext(ncsv)[0] + ".json") as f:
            noise_db = json.load(f)
    rcsv = cfg.get("add_reverb", {}).get("rir_db_csv", "")
    if rcsv:
        with open(os.path.splitext(rcsv)[0] + ".json") as f:
            rir_db = json.load(f)
    return cfg, noise_db, rir_db


def spec_augment(x: jnp.ndarray, key: jax.Array, frequency: float = 0.2,
                 frame: float = 0.2, rows: int = 1, cols: int = 1,
                 random_rows: bool = False, random_cols: bool = False) -> jnp.ndarray:
    """Snowdar-style SpecAugment (augmentation.py:248-334), jittable.

    x: [B, F, T] (one shared mask per batch like the reference). Frequency
    masks rescale the surviving energy by num_f / (num_f - f).
    """
    B, F, T = x.shape
    max_f = int(F * frequency)
    max_t = int(T * frame)
    keys = jax.random.split(key, 4 * max(rows, cols) + 2)
    ki = 0

    def rand_int(k, lo, hi):
        return jax.random.randint(k, (), lo, hi)

    n_rows = (jax.random.randint(keys[ki], (), 1, rows + 1) if random_rows else rows)
    n_cols = (jax.random.randint(keys[ki + 1], (), 1, cols + 1) if random_cols else cols)
    ki += 2
    f_idx = jnp.arange(F)
    t_idx = jnp.arange(T)
    for i in range(rows):
        f = rand_int(keys[ki], 0, max_f + 1)
        f0 = rand_int(keys[ki + 1], 0, F - f + 1)
        ki += 2
        active = (i < n_rows) if random_rows else True
        mask = (f_idx >= f0) & (f_idx < f0 + f)
        scale = F / jnp.maximum(F - f, 1)
        x = jnp.where(jnp.logical_and(active, mask)[None, :, None], 0.0, x)
        x = jnp.where(active, x * scale, x)
    for i in range(cols):
        t = rand_int(keys[ki], 0, max_t + 1)
        t0 = rand_int(keys[ki + 1], 0, T - t + 1)
        ki += 2
        active = (i < n_cols) if random_cols else True
        mask = (t_idx >= t0) & (t_idx < t0 + t)
        x = jnp.where(jnp.logical_and(active, mask)[None, None, :], 0.0, x)
    return x
