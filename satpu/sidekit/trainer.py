"""ASV training/eval (reference satools/satools/sidekit/{model,objf,monitor}.py).

- jitted data-parallel train step (AdamW/Adam + schedule; explicit bf16
  autocast policy via compute_dtype="bfloat16" replacing the reference's
  AMP+GradScaler machinery in sidekit/objf.py:16-128 — bf16 keeps f32's
  exponent range so no GradScaler is needed),
- validation: cosine score matrix over embeddings with target/non-target
  masks + bootstrap EER (objf.py:132-186),
- test: enroll/trial x-vector extraction, speaker-mean + L2 norm, cosine
  scoring, metrics = EER+CI, linkability, min-Cllr, AS-norm
  (objf.py:189-369),
- TrainingMonitor: patience / best-EER tracking (monitor.py:10-252).
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Any, Callable, Dict, List, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import torchlayers
from . import scoring
from .xvector import XVectorConfig, build_xvector


@flax.struct.dataclass
class AsvTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_asv_optimizer(lr: float = 1e-3, weight_decay: float = 2e-5,
                       head_weight_decay: float = 2e-4,
                       schedule: Optional[Callable[[int], float]] = None):
    """AdamW with per-section weight decay like the reference recipes
    (tuning/ecapa_tdnn.py:55-106 set_lr_weight_decay_layers_for_optim):
    trunk sections decay at ``weight_decay`` (2e-5), the ArcMargin head
    (``after_speaker_embedding``) at ``head_weight_decay`` (2e-4)."""

    def _mask(head: bool):
        def mask(params):
            return {k: jax.tree_util.tree_map(
                lambda _: k.startswith("after_speaker_embedding") == head, v)
                for k, v in params.items()}
        return mask

    @optax.inject_hyperparams
    def opt(learning_rate):
        # = torch AdamW decomposed so the two decay groups compose
        return optax.chain(
            optax.scale_by_adam(),
            optax.add_decayed_weights(weight_decay, mask=_mask(False)),
            optax.add_decayed_weights(head_weight_decay, mask=_mask(True)),
            optax.scale_by_learning_rate(learning_rate),
        )

    return opt(learning_rate=lr)


def init_asv_state(model, rng, example_wav, optimizer) -> AsvTrainState:
    variables = model.init({"params": rng, "augment": rng}, example_wav,
                           np.zeros((example_wav.shape[0],), np.int32), train=False)
    params = variables["params"]
    return AsvTrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params))


def make_asv_train_step(model, optimizer, lr_schedule: Optional[Callable] = None,
                        arc_m: Optional[float] = None,
                        compute_dtype: str = "float32"):
    """(state, wav [B,T], target [B], rng) -> (state, metrics). Data-parallel
    under a mesh: shard wav/target on the batch dim, replicate state.

    compute_dtype="bfloat16" runs the trunk convs/linears in bf16 via
    torchlayers.autocast — the reference's AMP+autocast training policy
    (sidekit/objf.py:57) — with f32 master params, BatchNorm, pooling stats
    and ArcMargin loss. bf16 needs no GradScaler (same exponent range as
    f32), so the reference's GradScaler/skip machinery has no analog here.
    """
    cast = (jnp.bfloat16 if compute_dtype == "bfloat16" else None)

    def train_step(state: AsvTrainState, wav, target, rng):
        def loss_fn(params):
            with torchlayers.autocast(cast):
                ((loss, logits), _), new_model_state = model.apply(
                    {"params": params, "batch_stats": state.batch_stats}, wav, target,
                    train=True, arc_m=arc_m, rngs={"augment": rng},
                    mutable=["batch_stats"])
            acc = jnp.mean((jnp.argmax(logits, axis=-1) == target).astype(jnp.float32))
            return loss, (new_model_state["batch_stats"], acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if lr_schedule is not None:
            state.opt_state.hyperparams["learning_rate"] = lr_schedule(state.step)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats, opt_state=opt_state)
        return new_state, {"loss": loss, "accuracy": acc}

    return train_step


def extract_xvectors(model, variables, wavs: List[np.ndarray],
                     mode: str = "chunked", window: int = 48000,
                     batch_size: int = 64) -> np.ndarray:
    """Per-utterance x-vectors.

    mode="full" is the reference's batch=1-per-utterance pass
    (objf.py:228-258) — exact, but every distinct length is a new XLA
    compile (a 200-utterance eval measured 22 minutes on a v5e, nearly all
    compilation). mode="chunked" (default) embeds fixed ``window``-sample
    chunks (wrap-padded for short utterances) in big batches — ONE compiled
    shape — and mean-pools chunk embeddings per utterance; standard practice
    for speaker embeddings and what SideSet training matches (3 s chunks).
    """
    if mode == "full":
        out = []
        apply = jax.jit(lambda v, w: model.apply(v, w, None, train=False)[1])
        for w in wavs:
            x = np.asarray(w, np.float32)[None, :]
            out.append(np.asarray(apply(variables, x))[0])
        return np.stack(out)

    chunks, owners = [], []
    for i, w in enumerate(wavs):
        x = np.asarray(w, np.float32).reshape(-1)
        if len(x) <= window:
            chunks.append(np.resize(x, window))  # wrap-pad short utterances
            owners.append(i)
        else:
            for s in range(0, len(x) - window + 1, window):
                chunks.append(x[s : s + window])
                owners.append(i)
            if len(x) % window >= window // 2:  # keep a meaningful tail
                chunks.append(x[-window:])
                owners.append(i)
    apply = jax.jit(lambda v, w: model.apply(v, w, None, train=False)[1])
    embs = []
    for s in range(0, len(chunks), batch_size):
        b = chunks[s : s + batch_size]
        n = len(b)
        if n < batch_size:  # pad the batch dim: one compiled shape total
            b = b + [np.zeros(window, np.float32)] * (batch_size - n)
        e = np.asarray(apply(variables, np.stack(b)))[:n]
        embs.append(e)
    embs = np.concatenate(embs, axis=0)
    owners = np.asarray(owners)
    out = np.zeros((len(wavs), embs.shape[1]), np.float32)
    counts = np.zeros(len(wavs))
    np.add.at(out, owners, embs)
    np.add.at(counts, owners, 1.0)
    return out / np.maximum(counts[:, None], 1.0)


def validation_eer(embeddings: np.ndarray, labels: np.ndarray) -> float:
    """Cosine score matrix + target/non-target masks (objf.py:132-186)."""
    e = embeddings / np.maximum(np.linalg.norm(embeddings, axis=1, keepdims=True), 1e-12)
    scores = e @ e.T
    labels = np.asarray(labels)
    same = labels[:, None] == labels[None, :]
    iu = np.triu_indices(len(labels), k=1)
    tar = scores[iu][same[iu]]
    non = scores[iu][~same[iu]]
    return scoring.eer_point(tar, non)


def asv_test(model, variables, enroll: Dict[str, List[np.ndarray]],
             trials: List[Tuple[str, str, bool]],
             trial_wavs: Dict[str, np.ndarray],
             cohort_xv: Optional[np.ndarray] = None,
             metric_path: Optional[str] = None,
             xvector_mode: str = "chunked",
             ece_plot_path: Optional[str] = None) -> Dict[str, float]:
    """Full trial evaluation: enroll spk-means, cosine scoring, EER/CI,
    linkability, min-Cllr (+ AS-norm variants when a cohort is given).

    enroll: {spk: [wav, ...]}; trials: [(spk, utt, is_target)];
    trial_wavs: {utt: wav}.  xvector_mode="full" reproduces the reference's
    full-utterance batch=1 extraction protocol (objf.py:228-258) exactly;
    "chunked" (default) is the fast single-compiled-shape variant.
    """
    spk_xv = {}
    for spk, wavs in enroll.items():
        xv = extract_xvectors(model, variables, wavs, mode=xvector_mode)
        mean = xv.mean(axis=0)
        spk_xv[spk] = mean / np.maximum(np.linalg.norm(mean), 1e-12)
    utts = list(trial_wavs.keys())
    utt_xv_arr = extract_xvectors(model, variables,
                                  [trial_wavs[u] for u in utts],
                                  mode=xvector_mode)
    utt_xv = {u: v for u, v in zip(utts, utt_xv_arr)}

    e1 = np.stack([spk_xv[s] for s, _, _ in trials])
    e2 = np.stack([utt_xv[u] for _, u, _ in trials])
    is_tar = np.asarray([t for _, _, t in trials], bool)
    scores_all = scoring.cosine_scoring(e1, e2)
    tar, non = scores_all[is_tar], scores_all[~is_tar]

    eer, lo, hi = scoring.eer_ci_bootstrap(tar, non)
    dsys = scoring.linkability(tar, non)[0]
    cllr_min, rocch_eer = scoring.min_cllr(tar, non, compute_eer=True)
    cllr_act = scoring.cllr(tar, non)
    metrics = {
        "eer": eer * 100, "eer_ci_lower": lo * 100, "eer_ci_upper": hi * 100,
        "rocch_eer": rocch_eer * 100, "linkability": float(dsys),
        "cllr": float(cllr_act), "min_cllr": float(cllr_min),
    }
    if cohort_xv is not None:
        sn = scoring.asnorm(scores_all, e1, e2, cohort_xv)
        tar_n, non_n = sn[is_tar], sn[~is_tar]
        metrics["asnorm_eer"] = scoring.eer_point(tar_n, non_n) * 100
        metrics["asnorm_linkability"] = float(scoring.linkability(tar_n, non_n)[0])
        metrics["asnorm_min_cllr"] = float(scoring.min_cllr(tar_n, non_n))
    if ece_plot_path:
        # the reference plots the PAV-calibrated LLRs (metric.py:815-847)
        tar_opt, non_opt = scoring.optimal_llr(tar, non)
        metrics["dece"] = float(scoring.dece(tar_opt, non_opt))
        metrics["ece_plot"] = scoring.ece_plot(tar_opt, non_opt, ece_plot_path)
    if metric_path:
        with open(metric_path, "w") as f:
            json.dump(metrics, f, indent=2)
    return metrics


class TrainingMonitor:
    """Patience/early-stop + best-EER tracking (monitor.py:10-252),
    picklable state for resume."""

    def __init__(self, patience: int = 10):
        self.patience = patience
        self.best_eer = float("inf")
        self.best_epoch = -1
        self.current_patience = patience
        self.history: List[Dict[str, float]] = []

    def update(self, epoch: int, eer: float, **extra) -> bool:
        """Record an epoch; returns True if this is a new best."""
        self.history.append({"epoch": epoch, "eer": eer, **extra})
        if eer < self.best_eer:
            self.best_eer = eer
            self.best_epoch = epoch
            self.current_patience = self.patience
            return True
        self.current_patience -= 1
        return False

    @property
    def should_stop(self) -> bool:
        return self.current_patience <= 0

    def state_dict(self) -> Dict:
        return dict(patience=self.patience, best_eer=self.best_eer,
                    best_epoch=self.best_epoch, current_patience=self.current_patience,
                    history=self.history)

    def load_state_dict(self, d: Dict) -> None:
        self.__dict__.update(d)
