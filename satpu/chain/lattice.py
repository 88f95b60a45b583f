"""Lattices, N-best extraction, ARPA LM rescoring, and CTM output.

The host-side half of the decode stack (the TPU computes loglikes, the native
decoder in satpu/native emits pruned token lattices). Replaces the
reference's kaldi-bound suite (csrc/decoder.cc: LatticeBestPath :280,
LatticeLmrescore :155, LatticeLmrescoreConstArpa :234,
LatticeAlignWordsLexicon :334, NbestToCTM :377; python API
satools/satools/chain/decoder.py:61-122) with a TPU-era design: exact
N-best over the pruned DAG + word-sequence LM rescoring, which subtracts the
decoding LM's score and adds the big LM's — the same G-removal + ConstArpa
composition result, computed per hypothesis instead of via FST composition.
"""
from __future__ import annotations

import gzip
import heapq
import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

LOG10 = math.log(10.0)


@dataclass
class Lattice:
    """Pruned token DAG: nodes carry frame times, arcs carry word labels and
    separate graph/acoustic costs (both -log)."""

    arc_from: np.ndarray
    arc_to: np.ndarray
    arc_word: np.ndarray
    arc_pdf: np.ndarray
    arc_graph: np.ndarray
    arc_acoustic: np.ndarray
    node_time: np.ndarray
    node_final: np.ndarray  # inf = not final

    @classmethod
    def empty(cls) -> "Lattice":
        z = np.zeros(0, np.int32)
        f = np.zeros(0, np.float32)
        return cls(z, z, z, z, f, f, z, f)

    @property
    def num_nodes(self) -> int:
        return len(self.node_time)

    @property
    def num_arcs(self) -> int:
        return len(self.arc_from)

    def out_arcs(self) -> List[List[int]]:
        outs: List[List[int]] = [[] for _ in range(self.num_nodes)]
        for i in range(self.num_arcs):
            outs[int(self.arc_from[i])].append(i)
        return outs

    def backward_costs(self) -> np.ndarray:
        """Best cost-to-final per node (for A* N-best)."""
        n = self.num_nodes
        bwd = np.where(np.isinf(self.node_final), np.inf, self.node_final)
        total = self.arc_graph + self.arc_acoustic
        for _ in range(16):
            upd = bwd[self.arc_to] + total
            nxt = bwd.copy()
            np.minimum.at(nxt, self.arc_from, upd)
            if np.array_equal(nxt, bwd):
                break
            bwd = nxt
        return bwd


@dataclass(order=True)
class _Hyp:
    f: float
    cost: float = field(compare=False)
    node: int = field(compare=False)
    words: Tuple[int, ...] = field(compare=False)
    times: Tuple[int, ...] = field(compare=False)
    acoustic: float = field(compare=False)


def nbest(lat: Lattice, n: int = 100, max_pop: int = 200000) -> List[dict]:
    """Exact A* N-best unique-word-sequence paths over the lattice DAG.

    Returns dicts: words (ids), times (emission frames), cost (graph+acoustic
    under decode scaling), acoustic, graph.
    """
    if lat.num_nodes == 0:
        return []
    outs = lat.out_arcs()
    bwd = lat.backward_costs()
    if not np.isfinite(bwd[0]):
        return []
    results: List[dict] = []
    seen_seqs: set = set()
    heap: List[_Hyp] = [_Hyp(float(bwd[0]), 0.0, 0, (), (), 0.0)]
    pops = 0
    while heap and len(results) < n and pops < max_pop:
        h = heapq.heappop(heap)
        pops += 1
        fin = lat.node_final[h.node]
        if np.isfinite(fin):
            seq = h.words
            if seq not in seen_seqs:
                seen_seqs.add(seq)
                results.append({
                    "words": list(seq), "times": list(h.times),
                    "end_frame": int(lat.node_time[h.node]),
                    "cost": h.cost + float(fin),
                    "acoustic": h.acoustic, "graph": h.cost + float(fin) - h.acoustic,
                })
        for ai in outs[h.node]:
            to = int(lat.arc_to[ai])
            if not np.isfinite(bwd[to]):
                continue
            c = h.cost + float(lat.arc_graph[ai] + lat.arc_acoustic[ai])
            w = int(lat.arc_word[ai])
            words = h.words + (w,) if w != 0 else h.words
            times = h.times + (int(lat.node_time[h.node]),) if w != 0 else h.times
            heapq.heappush(heap, _Hyp(c + float(bwd[to]), c, to, words, times,
                                      h.acoustic + float(lat.arc_acoustic[ai])))
    return results


def best_path(lat: Lattice) -> Optional[dict]:
    r = nbest(lat, n=1)
    return r[0] if r else None


# ---------------------------------------------------------------------------
# ARPA language model
# ---------------------------------------------------------------------------


class ArpaLM:
    """Backoff n-gram LM from an ARPA file (.arpa or .arpa.gz) — the stand-in
    for kaldi's G.fst / ConstArpa inputs (we read the ARPA text they are built
    from). Scores are natural-log (converted from the file's log10)."""

    def __init__(self, path: str):
        self.logprob: Dict[Tuple[str, ...], float] = {}
        self.backoff: Dict[Tuple[str, ...], float] = {}
        self.order = 1
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "rt", encoding="utf-8", errors="replace") as f:
            section = 0
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if line.startswith("\\") and "-grams:" in line:
                    section = int(line[1: line.index("-")])
                    self.order = max(self.order, section)
                    continue
                if line.startswith("\\"):
                    section = 0
                    continue
                if section == 0:
                    continue
                parts = line.split()
                if len(parts) < section + 1:
                    continue
                lp = float(parts[0]) * LOG10
                ngram = tuple(parts[1 : 1 + section])
                self.logprob[ngram] = lp
                if len(parts) > section + 1:
                    try:
                        self.backoff[ngram] = float(parts[section + 1]) * LOG10
                    except ValueError:
                        pass

    def score_word(self, context: Tuple[str, ...], word: str) -> float:
        """log P(word | context) with backoff."""
        ctx = context[-(self.order - 1):] if self.order > 1 else ()
        bo = 0.0
        while True:
            ngram = ctx + (word,)
            if ngram in self.logprob:
                return bo + self.logprob[ngram]
            if not ctx:
                # unseen unigram: treat as <unk> or a large penalty
                unk = self.logprob.get(("<unk>",), self.logprob.get(("<UNK>",)))
                return bo + (unk if unk is not None else -20.0)
            bo += self.backoff.get(ctx, 0.0)
            ctx = ctx[1:]

    def score_sequence(self, words: Sequence[str], bos: str = "<s>",
                       eos: str = "</s>") -> float:
        """Total log prob of the sentence incl. </s> (natural log)."""
        ctx: Tuple[str, ...] = (bos,)
        total = 0.0
        for w in words:
            total += self.score_word(ctx, w)
            ctx = (ctx + (w,))[-(self.order - 1):] if self.order > 1 else ()
        total += self.score_word(ctx, eos)
        return total


def rescore_nbest(hyps: List[dict], word_table: Dict[int, str],
                  new_lm: ArpaLM, old_lm: Optional[ArpaLM] = None,
                  lm_scale: float = 1.0) -> List[dict]:
    """LM rescoring of an N-best list: the reference's G-removal + big-LM
    composition (kaldi_lm_rescoring, chain/decoder.py:61-93) computed per
    hypothesis: new_cost = acoustic + (graph - lm_scale*old_lm) +
    lm_scale*new_lm. With ``old_lm=None`` the decode graph's LM cost stays in
    (pure additive rescoring). Returns hyps sorted by rescored cost, each
    with 'rescored' and 'text' fields added."""
    out = []
    for h in hyps:
        words = [word_table.get(w, str(w)) for w in h["words"]]
        cost = h["cost"]
        if old_lm is not None:
            cost += lm_scale * old_lm.score_sequence(words)  # remove (-log add)
        cost -= lm_scale * new_lm.score_sequence(words)  # note: score is logP
        out.append({**h, "rescored": cost, "text": " ".join(words)})
    out.sort(key=lambda d: d["rescored"])
    return out


def to_ctm(hyp: dict, word_table: Dict[int, str], utt: str = "utt",
           frame_shift: float = 0.03, channel: str = "1") -> List[str]:
    """Best path -> CTM lines (reference NbestToCTM, csrc/decoder.cc:377).

    Word start times come from the emission frames; durations span to the
    next word's start (last word ends at the final frame + 1)."""
    words = hyp["words"]
    times = hyp["times"]
    last = hyp.get("end_frame", (times[-1] + 1) if times else 0)
    lines = []
    for i, (w, t) in enumerate(zip(words, times)):
        start = t * frame_shift
        end_frame = times[i + 1] if i + 1 < len(times) else last
        dur = max((end_frame - t) * frame_shift, frame_shift)
        lines.append(f"{utt} {channel} {start:.2f} {dur:.2f} {word_table.get(w, str(w))}")
    return lines
