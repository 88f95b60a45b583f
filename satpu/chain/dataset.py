"""LF-MMI egs pipeline (reference satools/satools/chain/dataset.py).

- ``EgsInfo`` / ``EgsDataset``: wav.scp + per-utterance numerator FSTs
  (fst scp -> kaldi-wrapped OpenFst binaries) + utt2len (dataset.py:22-272),
- exact-length ``BucketBatchSampler``: batches hold only utterances with the
  same output frame count (dataset.py:109-135) — the reference's
  allowed-lengths preprocessing snaps utterances to 12 lengths, giving a tiny
  set of static shapes: XLA compiles one program per bucket,
- optional on-the-fly waveform augmentation (dataset.py:167-205),
- minimum-path frame check: utterances whose numerator FST needs more frames
  than the model emits are rejected (FindMinimumLengthPathFromFst equivalent,
  csrc/chain.cc:588-630 / dataset.py:247).
"""
from __future__ import annotations

import logging
import os
import random
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..ops.augment import data_augmentation
from ..utils import kaldi_data
from .fst import (Fst, fst_compose_acceptor, fst_rmepsilon, fst_to_arrays,
                  pad_graph_arrays, read_fst_kaldi)


def fst_min_path_length(fst: Fst) -> int:
    """Minimum number of emitting arcs from start to a final state (BFS over
    epsilon-free graph) — FindMinimumLengthPathFromFst."""
    from collections import deque

    INF = 1 << 30
    dist = [INF] * fst.num_states
    dist[fst.start] = 0
    q = deque([fst.start])
    while q:
        s = q.popleft()
        for a in fst.arcs[s]:
            nd = dist[s] + (1 if a.ilabel > 0 else 0)
            if nd < dist[a.nextstate]:
                dist[a.nextstate] = nd
                q.append(a.nextstate)
    best = INF
    for s, w in enumerate(fst.finals):
        if w != float("inf"):
            best = min(best, dist[s])
    return best


@dataclass
class EgsInfo:
    utt: str
    wavspec: str
    fst_rx: str  # "path:offset" into the fst ark
    num_samples: int

    def load_fst(self) -> Fst:
        if ":" in self.fst_rx and self.fst_rx.rsplit(":", 1)[1].isdigit():
            path, off = self.fst_rx.rsplit(":", 1)
            with open(path, "rb") as f:
                f.seek(int(off))
                return read_fst_kaldi(f)
        with open(self.fst_rx, "rb") as f:
            return read_fst_kaldi(f)


class EgsDataset:
    """Numerator-supervised utterances grouped by exact output length."""

    def __init__(self, wav_scp: str, fst_scp: str, utt2len: str,
                 frame_subsampling: int = 3, samples_per_frame: int = 160,
                 transform_pipeline: Optional[Dict] = None,
                 noise_db=None, rir_db=None, seed: int = 42,
                 normalization_fst: Optional[str] = None,
                 trans_mdl: Optional[str] = None):
        self.samples_per_frame = samples_per_frame
        self.frame_subsampling = frame_subsampling
        self.transform_pipeline = transform_pipeline
        self.noise_db = noise_db
        self.rir_db = rir_db
        self.rng = random.Random(seed)
        # supervision normalization (reference chain/dataset.py:51-64): each
        # numerator FST is intersected with normalization.fst so the chain
        # objective matches Kaldi semantics
        self.normalization_fst = (Fst.read(normalization_fst)
                                  if normalization_fst else None)
        # kaldi-prepared graphs carry transition-id labels: relabel to pdf+1
        # through the transition model (reference 0.trans_mdl +
        # TrainingGraphToSupervisionE2e, csrc/pkwrap-main.h:112)
        self.trans_mdl = None
        if trans_mdl:
            from .hmm import read_transition_model

            self.trans_mdl = read_transition_model(trans_mdl)
        self._supervision_cache: Dict[int, object] = {}
        utt2wav = kaldi_data.read_wav_scp(wav_scp)
        utt2fst = kaldi_data.read_wav_scp(fst_scp)
        u2l = kaldi_data.read_utt2len_file(utt2len)
        self.egs: List[EgsInfo] = []
        for utt, wavspec in utt2wav.items():
            if utt not in utt2fst or utt not in u2l:
                continue
            self.egs.append(EgsInfo(utt, wavspec, utt2fst[utt], u2l[utt]))
        self.utt_index = {e.utt: i for i, e in enumerate(self.egs)}

    def output_frames(self, num_samples: int) -> int:
        """Network output length for a given sample count — must match the
        model's actual emission count (satpu.models.asrbn.output_num_frames:
        fbank snip_edges=False /160, then the /2 x /1.5 unfold arithmetic)."""
        feats = (num_samples + 80) // 160
        return max((feats - 2) // self.frame_subsampling, 0)

    def filter_min_path(self) -> int:
        """Drop utterances whose numerator FST cannot fit the frame count
        (dataset.py:247). Returns number removed."""
        keep = []
        removed = 0
        for e in self.egs:
            min_len = fst_min_path_length(e.load_fst())
            if min_len <= self.output_frames(e.num_samples):
                keep.append(e)
            else:
                removed += 1
        self.egs = keep
        self.utt_index = {e.utt: i for i, e in enumerate(self.egs)}
        self._supervision_cache.clear()  # indices changed
        return removed

    def __len__(self) -> int:
        return len(self.egs)

    def supervision_arrays(self, index: int):
        """Normalized, epsilon-free supervision arrays for one utterance,
        memoized: composition + epsilon removal are pure per-utterance work
        (the reference also normalizes once per eg, chain/dataset.py:51-64),
        so paying them on every batch of every epoch would dominate host time."""
        cached = self._supervision_cache.get(index)
        if cached is not None:
            return cached
        e = self.egs[index]
        g = e.load_fst()
        if self.trans_mdl is not None:
            from .hmm import relabel_fst_to_pdfs

            g = relabel_fst_to_pdfs(g, self.trans_mdl)
        if self.normalization_fst is not None:
            g = fst_compose_acceptor(g, self.normalization_fst)
            if g.num_states == 0:
                raise ValueError(
                    f"supervision for {e.utt} is empty after composing with "
                    "normalization.fst (label mismatch?)")
        # the dense forward-backward treats every arc as emitting: strip
        # epsilon arcs (prep numerators and normalization both add them)
        arrays = fst_to_arrays(fst_rmepsilon(g))
        self._supervision_cache[index] = arrays
        return arrays

    def load_batch(self, indices: List[int]):
        """-> (wav [B, T], num_graphs dict, num_frames [B], utts)."""
        egs = [self.egs[i] for i in indices]
        T = max(e.num_samples for e in egs)
        wavs = np.zeros((len(egs), T), np.float32)
        frames = []
        graphs = []
        for j, e in enumerate(egs):
            wav, _ = kaldi_data.load_wav_from_scp(e.wavspec)
            x = wav[0][:T]
            if self.transform_pipeline:
                x = data_augmentation(x[None, :], self.transform_pipeline, 16000,
                                      self.noise_db, self.rir_db, rng=self.rng)[0][:T]
            wavs[j, : len(x)] = x
            frames.append(self.output_frames(e.num_samples))
            graphs.append(self.supervision_arrays(indices[j]))
        return (wavs, pad_graph_arrays(graphs),
                np.asarray(frames, np.int32), [e.utt for e in egs])


class BucketBatchSampler:
    """Exact-length bucketing (dataset.py:109-135): every batch contains only
    utterances with identical ``num_output_frames`` (or length//199 groups
    with ``allow_some_padding``)."""

    def __init__(self, dataset: EgsDataset, batch_size: int,
                 allow_some_padding: bool = False, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.epoch = 0
        self.buckets: Dict[int, List[int]] = {}
        for i, e in enumerate(dataset.egs):
            key = (e.num_samples // 199 if allow_some_padding
                   else dataset.output_frames(e.num_samples))
            self.buckets.setdefault(key, []).append(i)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[List[int]]:
        rng = np.random.default_rng(self.seed + self.epoch)
        batches = []
        for key in sorted(self.buckets):
            idxs = list(self.buckets[key])
            rng.shuffle(idxs)
            for i in range(0, len(idxs), self.batch_size):
                b = idxs[i : i + self.batch_size]
                if b:
                    batches.append(b)
        order = rng.permutation(len(batches))
        for i in order:
            yield batches[int(i)]

    def __len__(self) -> int:
        return sum((len(v) + self.batch_size - 1) // self.batch_size
                   for v in self.buckets.values())
