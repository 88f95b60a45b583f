"""ASV training data pipeline (reference satools/satools/sidekit/dataset.py).

- ``SideSampler``: per-speaker balanced batch sampler — every batch holds
  ``examples_per_speaker`` chunks for each of ``spk_count`` speakers, with
  epoch-seeded shuffles and rank slicing for data parallelism
  (dataset.py:21-147).
- ``SideSet``: chunk index over wav segments with overlap and random shift;
  loads fixed-duration crops via offset reads, adds 1e-5 dither noise, and
  applies waveform augmentation (dataset.py:150-329).

Host-side numpy; batches feed the jitted train step as [B, T] float32.
"""
from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.augment import data_augmentation
from ..utils import kaldi_data


class SideSampler:
    """Deterministic per-speaker balanced sampler."""

    def __init__(self, data_source: np.ndarray, spk_count: int, examples_per_speaker: int,
                 samples_per_speaker: int, batch_size: int, seed: int = 0,
                 rank: int = 0, num_process: int = 1, num_replicas: int = 1):
        """data_source: [N] speaker index of each chunk."""
        self.train_sessions = np.asarray(data_source)
        self.labels_to_indices: Dict[int, List[int]] = {}
        for idx, spk in enumerate(self.train_sessions):
            self.labels_to_indices.setdefault(int(spk), []).append(idx)
        self.spk_count = spk_count
        self.examples_per_speaker = examples_per_speaker
        self.samples_per_speaker = samples_per_speaker
        self.epoch = 0
        self.seed = seed
        self.rank = rank
        self.num_process = num_process
        self.num_replicas = num_replicas
        assert batch_size % examples_per_speaker == 0
        assert (self.samples_per_speaker * self.spk_count * self.examples_per_speaker) % self.num_process == 0
        self.batch_size = batch_size // (self.examples_per_speaker * self.num_replicas)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self):
        g = np.random.default_rng(self.seed + self.epoch)
        numpy_indices = []
        speakers = np.arange(self.spk_count)
        for _ in range(self.samples_per_speaker):
            g.shuffle(speakers)
            for spk in speakers:
                pool = self.labels_to_indices[int(spk)]
                picks = g.choice(len(pool), size=self.examples_per_speaker,
                                 replace=len(pool) < self.examples_per_speaker)
                for p in picks:
                    numpy_indices.append(pool[int(p)])
        # rank slicing (interleaved, dataset.py:134-140)
        sel = numpy_indices[self.rank :: self.num_process]
        return iter(sel)

    def __len__(self) -> int:
        return (self.samples_per_speaker * self.spk_count * self.examples_per_speaker
                ) // self.num_process


@dataclass
class Chunk:
    utt: str
    wavspec: str
    spk_idx: int
    offset: int  # samples
    duration: int  # samples


class SideSet:
    """Chunk index over a kaldi data dir / csv table."""

    def __init__(self, utt2wav: Dict[str, str], utt2spk: Dict[str, str],
                 utt2dur: Dict[str, float], speakers: Optional[List[str]] = None,
                 duration: float = 3.0, overlap: float = 0.0, sample_rate: int = 16000,
                 chunk_per_segment: int = -1, random_shift: bool = True,
                 transform_pipeline: Optional[Dict] = None,
                 noise_db=None, rir_db=None, seed: int = 1234):
        self.sample_rate = sample_rate
        self.duration_samples = int(duration * sample_rate)
        self.transform_pipeline = transform_pipeline
        self.noise_db = noise_db
        self.rir_db = rir_db
        self.random_shift = random_shift
        self.rng = random.Random(seed)
        self.speakers = speakers or sorted(set(utt2spk.values()))
        spk_index = {s: i for i, s in enumerate(self.speakers)}
        shift = duration - overlap
        self.chunks: List[Chunk] = []
        for utt, wavspec in utt2wav.items():
            dur = utt2dur.get(utt, 0.0)
            n_chunks = int((dur - duration) / shift) + 1 if dur >= duration else 0
            if chunk_per_segment > 0:
                n_chunks = min(n_chunks, chunk_per_segment)
            for c in range(n_chunks):
                self.chunks.append(Chunk(
                    utt=utt, wavspec=wavspec, spk_idx=spk_index[utt2spk[utt]],
                    offset=int(c * shift * sample_rate),
                    duration=self.duration_samples))

    @classmethod
    def from_data_dir(cls, data_dir: str, **kw) -> "SideSet":
        import os

        utt2wav = kaldi_data.read_wav_scp(os.path.join(data_dir, "wav.scp"))
        utt2spk = kaldi_data.read_keyed_text(os.path.join(data_dir, "utt2spk"))
        utt2dur = kaldi_data.get_utt2dur(data_dir)
        return cls(utt2wav, utt2spk, utt2dur, **kw)

    @property
    def chunk_speakers(self) -> np.ndarray:
        return np.asarray([c.spk_idx for c in self.chunks], dtype=np.int32)

    def __len__(self) -> int:
        return len(self.chunks)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, int]:
        c = self.chunks[i]
        offset = c.offset
        if self.random_shift:
            # random shift within the chunk grid (dataset.py:209-232)
            jitter = self.rng.randint(-self.duration_samples // 4, self.duration_samples // 4)
            offset = max(0, offset + jitter)
        wav, _ = kaldi_data.load_wav_from_scp(c.wavspec, frame_offset=offset,
                                              num_frames=c.duration)
        x = wav[0]
        if len(x) < c.duration:
            x = np.pad(x, (0, c.duration - len(x)))
        x = x + 1e-5 * np.random.randn(len(x)).astype(np.float32)
        if self.transform_pipeline:
            x = data_augmentation(x[None, :], self.transform_pipeline,
                                  self.sample_rate, self.noise_db, self.rir_db,
                                  rng=self.rng)[0]
            if len(x) != c.duration:  # speed perturb changes length
                x = x[: c.duration] if len(x) >= c.duration else np.pad(
                    x, (0, c.duration - len(x)))
        return x.astype(np.float32), c.spk_idx

    def batches(self, sampler: SideSampler, batch_size: int):
        """Yield (wav [B, T], spk [B]) batches following the sampler order."""
        idxs = list(iter(sampler))
        for i in range(0, len(idxs) - batch_size + 1, batch_size):
            group = idxs[i : i + batch_size]
            wavs, spks = zip(*(self[j] for j in group))
            yield np.stack(wavs), np.asarray(spks, dtype=np.int32)
