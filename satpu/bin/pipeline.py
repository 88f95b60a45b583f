"""Anonymization pipeline over a kaldi-style data dir (reference
satools/bin/pipeline.py, redesigned TPU-first).

Where the reference fans out one process per GPU slot with per-worker YAAPT
on CPU (bin/anonymize:82-93, pipeline.py:26-41), satpu buckets utterances by
length into a handful of padded static shapes, runs F0 + BN + HiFi-GAN as one
fused jitted graph per bucket on the chip, and overlaps host-side WAV writing
with device compute via a writer thread pool.

Target-selection algorithms are ported 1:1 (pipeline.py:110-143):
constant | none | bad_for_evaluation | random_per_utt | random_per_spk_uniq |
random_per_spk.
"""
from __future__ import annotations

import functools
import logging
import os
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from ..utils import kaldi_data

DEFAULT_BUCKETS = (16000, 32000, 48000, 64000, 96000, 128000, 160000, 240000, 320000)


def select_targets(utids: Sequence[str], algorithm: str, possible_targets: List[str],
                   source_utt2spk: Dict[str, str], state: Dict[str, object],
                   constant_spkid: str = "", rng: Optional[random.Random] = None) -> List[str]:
    """One batch of target speaker ids (pipeline.py:110-143)."""
    rng = rng or random
    out_spk2target = state.setdefault("out_spk2target", {})
    targets: List[str] = []
    if algorithm == "constant":
        targets = [constant_spkid] * len(utids)
    elif algorithm == "none":
        # reference bin/pipeline.py:113-114: no target = resynthesize each
        # utterance as its own source speaker
        targets = [source_utt2spk[ut] for ut in utids]
    elif algorithm == "bad_for_evaluation":
        for ut in utids:
            spk = source_utt2spk[ut]
            if spk not in out_spk2target:
                out_spk2target[spk] = rng.sample(possible_targets, 2)
            targets.append(rng.choice(out_spk2target[spk]))
    elif algorithm == "random_per_utt":
        targets = [rng.choice(possible_targets) for _ in utids]
    elif algorithm == "random_per_spk_uniq":
        remaining = state.setdefault("remaining_targets", list(possible_targets))
        for ut in utids:
            spk = source_utt2spk[ut]
            if spk not in out_spk2target:
                choice = rng.choice(remaining)
                out_spk2target[spk] = choice
                remaining.remove(choice)
            targets.append(out_spk2target[spk])
    elif algorithm == "random_per_spk":
        for ut in utids:
            spk = source_utt2spk[ut]
            if spk not in out_spk2target:
                out_spk2target[spk] = rng.choice(possible_targets)
            targets.append(out_spk2target[spk])
    else:
        raise ValueError(f"{algorithm} not implemented")
    return targets


def bucket_for(length: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if length <= b:
            return b
    # longer than the largest bucket: round up to a multiple of it so the
    # padded copy never overflows (rare outliers cost one extra compile each)
    top = buckets[-1]
    return ((length + top - 1) // top) * top


def process_data(model, variables, speakers: List[str], data_dir: str, results_dir: str,
                 f0_speaker_stats: Optional[Dict] = None,
                 target_selection_algorithm: str = "constant",
                 target_constant_spkid: str = "", batch_size: int = 32,
                 buckets: Sequence[int] = DEFAULT_BUCKETS, f0_transformation: str = "",
                 seed: int = 0, new_datadir_suffix: str = "_anon",
                 num_shards: int = 1, shard: int = 0,
                 serve_mesh: bool = False, devices: Optional[Sequence] = None,
                 progress_cb=None) -> str:
    """Anonymize every utterance of ``data_dir``; returns the new data dir.

    model: AnonymizationNet; variables: its flax variables; speakers: ordered
    target speaker list (index = one-hot id). With ``num_shards > 1`` only
    every num_shards-th utterance (offset ``shard``) is processed and a
    partial ``wav_shard{k}.scp`` is written; the full ``wav.scp`` is merged
    once all shards are present (reference bin/anonymize:82-93 fans out
    processes; here shards map to hosts).

    ``serve_mesh=True`` shards every batch over ALL local devices (1-D
    data-parallel ``jax.sharding.Mesh``) — the TPU-pod-slice analog of the
    reference's per-GPU process fan-out (bin/anonymize:82-93): one process
    drives N chips, each converting batch_size/N utterances, no collectives
    in the graph. Requires batch_size % device_count == 0.
    """
    rng = random.Random(seed)
    out_dir = data_dir.rstrip("/") + new_datadir_suffix
    kaldi_data.copy_data_dir(data_dir, out_dir)
    os.makedirs(results_dir, exist_ok=True)

    if f0_transformation and f0_transformation != model.cfg.f0_transformation:
        # transformation lives in the (param-free) config: rebuild the module
        import dataclasses as _dc

        model = type(model)(_dc.replace(model.cfg, f0_transformation=f0_transformation))

    utt2wav = kaldi_data.read_wav_scp(os.path.join(data_dir, "wav.scp"))
    utt2spk_path = os.path.join(data_dir, "utt2spk")
    source_utt2spk = (kaldi_data.read_keyed_text(utt2spk_path)
                      if os.path.exists(utt2spk_path) else {u: u for u in utt2wav})

    spk_index = {s: i for i, s in enumerate(speakers)}
    state: Dict[str, object] = {}

    # ---- load lengths and group into padded buckets ----
    all_utts = sorted(utt2wav)
    my_utts = all_utts[shard::num_shards] if num_shards > 1 else all_utts
    entries = []
    for utt in my_utts:
        wav, rate = kaldi_data.load_wav_from_scp(utt2wav[utt])
        entries.append((utt, wav[0], rate))
    entries.sort(key=lambda e: len(e[1]))

    # speaker-normalized F0 (hifigan_clean flow): the checkpoint carries
    # per-speaker stats and the model skips in-graph normalization
    f0_cmvn = None
    if f0_speaker_stats and getattr(model.cfg, "f0_norm", "utt") == "none":
        from ..ops.cmvn import SpeakerCMVN

        f0_cmvn = SpeakerCMVN.from_meta(f0_speaker_stats)
        f0_cmvn.pass_through = True

    def _convert(vars_, wav_batch, target_ids, f0_key):
        f0 = model.get_f0(wav_batch)
        return model.apply(vars_, wav_batch, f0, target_ids,
                           method=model.convert, f0_key=f0_key)

    def _convert_with_f0(vars_, wav_batch, f0, target_ids, f0_key):
        return model.apply(vars_, wav_batch, f0, target_ids,
                           method=model.convert, f0_key=f0_key)

    devices = list(devices) if devices is not None else jax.devices()
    n_dev = len(devices)
    if serve_mesh and n_dev > 1:
        if batch_size % n_dev:
            raise ValueError(
                f"serve_mesh needs batch_size ({batch_size}) divisible by "
                f"the device count ({n_dev})")
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        mesh = Mesh(np.array(devices), ("dp",))
        bsh = NamedSharding(mesh, P("dp"))
        repl = NamedSharding(mesh, P())
        variables = jax.device_put(variables, repl)
        f0_only = jax.jit(model.get_f0, in_shardings=(bsh,), out_shardings=bsh)
        convert = functools.partial(
            jax.jit(_convert, in_shardings=(repl, bsh, bsh, repl),
                    out_shardings=bsh), variables)
        convert_with_f0 = functools.partial(
            jax.jit(_convert_with_f0, in_shardings=(repl, bsh, bsh, bsh, repl),
                    out_shardings=bsh), variables)
        logging.info("serve_mesh: batches sharded over %d devices", n_dev)
    else:
        f0_only = jax.jit(model.get_f0)
        convert = functools.partial(jax.jit(_convert), variables)
        convert_with_f0 = functools.partial(jax.jit(_convert_with_f0), variables)

    new_wav_scp: Dict[str, str] = {}
    writer = ThreadPoolExecutor(max_workers=4)
    pending = []
    key = jax.random.PRNGKey(seed)

    def write_batch(utids, wavs, lens, rate):
        for u, w, l in zip(utids, wavs, lens):
            out = os.path.join(results_dir, f"{u}.wav")
            kaldi_data.write_wav(out, np.asarray(w[:l], dtype=np.float32), rate)
            new_wav_scp[u] = out

    done = 0
    i = 0
    in_flight = None
    while i < len(entries):
        batch = entries[i : i + batch_size]
        i += len(batch)
        utids = [e[0] for e in batch]
        rate = batch[0][2]
        maxlen = max(len(e[1]) for e in batch)
        bucket = bucket_for(maxlen, buckets)
        # always pad the batch dim to batch_size: at most len(buckets)
        # compiled shapes for the whole run
        wav_batch = np.zeros((batch_size, bucket), np.float32)
        lens = []
        for j, (_, w, _) in enumerate(batch):
            wav_batch[j, : len(w)] = w
            lens.append(len(w))
        targets = select_targets(utids, target_selection_algorithm, list(speakers),
                                 source_utt2spk, state, target_constant_spkid, rng)
        try:
            tids_list = [spk_index[t] for t in targets]
        except KeyError as e:
            raise KeyError(
                f"target speaker {e} is not in the model's speaker list "
                f"(algorithm={target_selection_algorithm!r}); with 'none' every "
                "source speaker must be a training speaker of the model") from None
        tids = np.zeros((batch_size,), np.int32)
        tids[: len(batch)] = tids_list
        key, sub = jax.random.split(key)
        if f0_cmvn is not None:
            f0 = np.array(f0_only(wav_batch))  # writable copy
            for j, ut in enumerate(utids):
                f0[j] = f0_cmvn(f0[j], source_utt2spk.get(ut, ut))
            out_dev = convert_with_f0(wav_batch, f0, tids, sub)
        else:
            out_dev = convert(wav_batch, tids, sub)
        # one batch in flight: fetch + write the PREVIOUS batch while the
        # device converts this one (device compute overlaps the
        # device->host transfer and the wav writes)
        if in_flight is not None:
            p_utids, p_out, p_lens, p_rate, p_n = in_flight
            pending.append(writer.submit(
                write_batch, p_utids, np.asarray(p_out)[:p_n], p_lens, p_rate))
        in_flight = (utids, out_dev, lens, rate, len(batch))
        done += len(batch)
        if progress_cb:
            progress_cb(done, len(entries))

    if in_flight is not None:
        p_utids, p_out, p_lens, p_rate, p_n = in_flight
        pending.append(writer.submit(
            write_batch, p_utids, np.asarray(p_out)[:p_n], p_lens, p_rate))
    for p in pending:
        p.result()
    writer.shutdown()
    if num_shards > 1:
        shard_scp = os.path.join(out_dir, f"wav_shard{shard}.scp")
        kaldi_data.write_keyed_text(new_wav_scp, shard_scp)
        parts = [os.path.join(out_dir, f"wav_shard{k}.scp") for k in range(num_shards)]
        if all(os.path.exists(p) for p in parts):
            merged: Dict[str, str] = {}
            for p in parts:
                merged.update(kaldi_data.read_keyed_text(p))
            kaldi_data.write_keyed_text(
                dict(sorted(merged.items())), os.path.join(out_dir, "wav.scp"))
            logging.info("merged %d shards -> %s/wav.scp", num_shards, out_dir)
    else:
        kaldi_data.write_keyed_text(new_wav_scp, os.path.join(out_dir, "wav.scp"))
    logging.info("anonymized %d utterances -> %s", len(new_wav_scp), out_dir)
    return out_dir
