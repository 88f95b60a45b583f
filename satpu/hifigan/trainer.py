"""HiFi-GAN adversarial training, TPU-native.

Rebuild of the reference trainer loop (satools/satools/hifigan/model.py:296-445):
AdamW(lr 2e-4, betas (0.8, 0.99)) x2 with per-epoch ExponentialLR(0.999),
D step (MPD+MSD LSGAN) followed by G step (mel L1 x45 + feature-matching +
adversarial), identical loss composition.

TPU mapping: one jitted ``gan_train_step`` over a ``jax.sharding.Mesh`` —
parameters replicated, batch sharded on the ``data`` axis; XLA GSPMD inserts
the gradient all-reduce (the NCCL DDP equivalent, SURVEY.md §2.9). The
discriminator and generator updates happen in one fused step program.

The generator here is the anonymization decoder: it consumes cached
(bn, f0, spk) features + ground-truth audio segments produced by the data
pipeline (satpu.hifigan.dataset), mirroring the reference's on-the-fly cached
feature extraction design.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from ..models.anonymizer import AnonymizationNet, AnonymizerConfig
from ..models.hifigan import (MultiPeriodDiscriminator, MultiScaleDiscriminator,
                              discriminator_loss, feature_loss, generator_loss)
from ..ops.mel import mel_spectrogram


@dataclasses.dataclass(frozen=True)
class GanHparams:
    lr: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999  # per epoch
    weight_decay: float = 0.01  # torch AdamW default
    segment_size: int = 16640
    n_fft: int = 1024
    num_mels: int = 80
    sampling_rate: int = 16000
    hop_size: int = 256
    win_size: int = 1024
    fmin: float = 0.0
    fmax: float = 8000.0
    mel_weight: float = 45.0
    # "float32" | "bfloat16": conv compute dtype for G and the WN
    # discriminators (the explicit training mixed-precision policy; the
    # reference trains under torch autocast, tuning/hifigan.py:99). Params,
    # losses, mel comparison and the SN scale stay f32.
    compute_dtype: str = "float32"
    # CI/dryrun shrink knobs for the discriminator stacks; the defaults are
    # reference-exact (checkpoint-compatible). The 8-virtual-device mesh
    # dryrun/tests are execution-bound on full-width replicated discriminator
    # weight gradients (x8 partitions on one core) — a reduced set exercises
    # the identical train-step sharding at a fraction of the work.
    mpd_periods: tuple = (2, 3, 5, 7, 11)
    msd_scales: int = 3
    disc_channel_scale: float = 1.0


@flax.struct.dataclass
class GanTrainState:
    step: jnp.ndarray
    epoch: jnp.ndarray
    params_g: Any
    params_mpd: Any
    params_msd: Any
    spectral_msd: Any
    opt_g: Any
    opt_d: Any
    # frozen/broadcast pieces of the anonymizer (bn extractor etc.)
    frozen_g: Any = None


def _make_optim(h: GanHparams):
    sched = lambda count: h.lr  # epoch decay applied via scale_by_epoch below
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=h.lr, b1=h.adam_b1, b2=h.adam_b2, weight_decay=h.weight_decay)


def split_generator_params(anon_variables: Dict[str, Any]):
    """Split anonymizer variables into (trainable hifigan params, frozen rest).

    The BN extractor is frozen during GAN training (tuning/hifigan.py:29,54-56).
    """
    params = anon_variables["params"]
    train = {"hifigan": params["hifigan"]}
    frozen = {k: v for k, v in anon_variables.items() if k != "params"}
    frozen_params = {k: v for k, v in params.items() if k != "hifigan"}
    return train, {"params": frozen_params, **frozen}


def merge_generator_params(train_params, frozen):
    merged_params = dict(frozen.get("params", {}))
    merged_params.update(train_params)
    out = {k: v for k, v in frozen.items() if k != "params"}
    out["params"] = merged_params
    return out


def init_gan_state(anon_model: AnonymizationNet, anon_variables, rng,
                   h: GanHparams = GanHparams()) -> Tuple[GanTrainState, Any, Any]:
    """Initialize discriminators + optimizers. Returns (state, mpd, msd)."""
    dt = jnp.bfloat16 if h.compute_dtype == "bfloat16" else None
    mpd = MultiPeriodDiscriminator(dtype=dt, periods=h.mpd_periods,
                                   channel_scale=h.disc_channel_scale)
    msd = MultiScaleDiscriminator(dtype=dt, num_scales=h.msd_scales,
                                  channel_scale=h.disc_channel_scale)
    dummy = jnp.zeros((1, h.segment_size, 1))
    k1, k2 = jax.random.split(rng)
    # jit the inits: eager per-op init of the big 2D convs is minutes on CPU
    # (and worse through a remote-device tunnel); one compiled program is not
    v_mpd = jax.jit(mpd.init)(k1, dummy, dummy)
    v_msd = jax.jit(msd.init)(k2, dummy, dummy)
    params_g, frozen_g = split_generator_params(anon_variables)
    opt = _make_optim(h)
    params_d = {"mpd": v_mpd["params"], "msd": v_msd["params"]}
    state = GanTrainState(
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_mpd=v_mpd["params"],
        params_msd=v_msd["params"],
        spectral_msd=v_msd.get("spectral", {}),
        opt_g=opt.init(params_g),
        opt_d=opt.init(params_d),
        frozen_g=frozen_g,
    )
    return state, mpd, msd


def make_gan_train_step(anon_model: AnonymizationNet,
                        mpd: MultiPeriodDiscriminator,
                        msd: MultiScaleDiscriminator,
                        h: GanHparams = GanHparams()) -> Callable:
    """Build the jittable (state, batch) -> (state, metrics) GAN step.

    batch: {"bn": [B, C, T_bn], "f0": [B, T_f0], "spk": [B, S],
            "audio": [B, T_seg]} — aligned segment crops.
    """
    opt = _make_optim(h)
    mel_kw = dict(n_fft=h.n_fft, num_mels=h.num_mels, sampling_rate=h.sampling_rate,
                  hop_size=h.hop_size, win_size=h.win_size, fmin=h.fmin, fmax=h.fmax)

    def gen_forward(params_g, frozen_g, batch):
        variables = merge_generator_params(params_g, frozen_g)
        y = anon_model.apply(variables, batch["f0"], batch["bn"], batch["spk"],
                             method=anon_model.forward_decoder)
        return y  # [B, T_out]

    def train_step(state: GanTrainState, batch) -> Tuple[GanTrainState, Dict]:
        lr = h.lr * (h.lr_decay ** state.epoch.astype(jnp.float32))
        y = batch["audio"]

        y_gen = gen_forward(state.params_g, state.frozen_g, batch)
        # shapes are static: trim both to the shorter (reference truncate,
        # hifigan/model.py:283-294)
        t_static = min(y.shape[-1], y_gen.shape[-1])
        y = y[:, :t_static]
        y_gen_sg = jax.lax.stop_gradient(y_gen[:, :t_static])

        y3 = y[:, :, None]  # [B, T, 1]

        # ---- discriminator step ----
        def d_loss_fn(params_d, spectral):
            yg3 = y_gen_sg[:, :, None]
            df_r, df_g, _, _ = mpd.apply({"params": params_d["mpd"]}, y3, yg3)
            loss_f, _, _ = discriminator_loss(df_r, df_g)
            (ds_r, ds_g, _, _), new_vars = msd.apply(
                {"params": params_d["msd"], "spectral": spectral}, y3, yg3,
                update_sn=True, mutable=["spectral"])
            loss_s, _, _ = discriminator_loss(ds_r, ds_g)
            return loss_f + loss_s, new_vars["spectral"]

        params_d = {"mpd": state.params_mpd, "msd": state.params_msd}
        (loss_d, new_spectral), grads_d = jax.value_and_grad(
            d_loss_fn, has_aux=True)(params_d, state.spectral_msd)
        updates_d, opt_d = opt.update(grads_d, _with_lr(state.opt_d, lr), params_d)
        params_d = optax.apply_updates(params_d, updates_d)

        # ---- generator step (with updated discriminators) ----
        def g_loss_fn(params_g):
            y_gen_full = gen_forward(params_g, state.frozen_g, batch)
            yg = y_gen_full[:, :t_static]
            mel_real = mel_spectrogram(y, **mel_kw)
            mel_gen = mel_spectrogram(yg, **mel_kw)
            loss_mel = jnp.mean(jnp.abs(mel_real - mel_gen)) * h.mel_weight
            yg3 = yg[:, :, None]
            df_r, df_g, fmap_f_r, fmap_f_g = mpd.apply({"params": params_d["mpd"]}, y3, yg3)
            (ds_r, ds_g, fmap_s_r, fmap_s_g), _ = msd.apply(
                {"params": params_d["msd"], "spectral": new_spectral}, y3, yg3,
                update_sn=False, mutable=["spectral"])
            loss_fm_f = feature_loss(fmap_f_r, fmap_f_g)
            loss_fm_s = feature_loss(fmap_s_r, fmap_s_g)
            loss_gen_f, _ = generator_loss(df_g)
            loss_gen_s, _ = generator_loss(ds_g)
            total = loss_gen_s + loss_gen_f + loss_fm_s + loss_fm_f + loss_mel
            return total, loss_mel

        (loss_g, loss_mel), grads_g = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.params_g)
        updates_g, opt_g = opt.update(grads_g, _with_lr(state.opt_g, lr), state.params_g)
        params_g = optax.apply_updates(state.params_g, updates_g)

        new_state = state.replace(
            step=state.step + 1, params_g=params_g,
            params_mpd=params_d["mpd"], params_msd=params_d["msd"],
            spectral_msd=new_spectral, opt_g=opt_g, opt_d=opt_d)
        metrics = {"loss_gen_all": loss_g, "loss_disc_all": loss_d,
                   "mel_spec_error": loss_mel / h.mel_weight, "lr": lr}
        return new_state, metrics

    return train_step


def _with_lr(opt_state, lr):
    """Inject the current epoch-decayed lr into an inject_hyperparams state
    (the documented optax pattern: mutate .hyperparams before .update)."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def make_gan_eval_step(anon_model: AnonymizationNet,
                       h: GanHparams = GanHparams()) -> Callable:
    """Jittable validation step: (params_g, frozen_g, batch) -> mel L1 error
    (un-weighted), the reference's val_err (hifigan/model.py:454-472)."""
    mel_kw = dict(n_fft=h.n_fft, num_mels=h.num_mels, sampling_rate=h.sampling_rate,
                  hop_size=h.hop_size, win_size=h.win_size, fmin=h.fmin, fmax=h.fmax)

    def eval_step(params_g, frozen_g, batch):
        variables = merge_generator_params(params_g, frozen_g)
        y_gen = anon_model.apply(variables, batch["f0"], batch["bn"], batch["spk"],
                                 method=anon_model.forward_decoder)
        y = batch["audio"]
        t = min(y.shape[-1], y_gen.shape[-1])
        mel_real = mel_spectrogram(y[:, :t], **mel_kw)
        mel_gen = mel_spectrogram(y_gen[:, :t], **mel_kw)
        return jnp.mean(jnp.abs(mel_real - mel_gen))

    return eval_step


def make_gan_sample_step(anon_model: AnonymizationNet,
                         h: GanHparams = GanHparams()) -> Callable:
    """Jittable sample generation for observability: (params_g, frozen_g,
    batch) -> (y_gen, mel_gen, mel_real) — the waveform + spectrogram pairs
    the reference mirrors into tensorboard (hifigan/model.py:481-502)."""
    mel_kw = dict(n_fft=h.n_fft, num_mels=h.num_mels, sampling_rate=h.sampling_rate,
                  hop_size=h.hop_size, win_size=h.win_size, fmin=h.fmin, fmax=h.fmax)

    def sample_step(params_g, frozen_g, batch):
        variables = merge_generator_params(params_g, frozen_g)
        y_gen = anon_model.apply(variables, batch["f0"], batch["bn"], batch["spk"],
                                 method=anon_model.forward_decoder)
        y = batch["audio"]
        t = min(y.shape[-1], y_gen.shape[-1])
        return (y_gen[:, :t], mel_spectrogram(y_gen[:, :t], **mel_kw),
                mel_spectrogram(y[:, :t], **mel_kw))

    return sample_step


def restore_gan_state(state: GanTrainState, g_variables, d_state, trainer_state,
                      epoch: int, step: int) -> GanTrainState:
    """Rebuild a GanTrainState from the g_/d_/trainer_ checkpoint triplet.

    ``state`` is a freshly-initialized template providing the optax state
    structure (reference resume: vc train.py:117-125 + hifigan/model.py:266-281).
    """
    from ..utils.checkpoint import restore_like

    params_g, frozen_g = split_generator_params(g_variables)
    return state.replace(
        step=jnp.asarray(step, jnp.int32),
        epoch=jnp.asarray(epoch, jnp.int32),
        params_g=params_g,
        frozen_g=frozen_g,
        params_mpd=d_state["mpd"],
        params_msd=d_state["msd"],
        spectral_msd=restore_like(state.spectral_msd, d_state["spectral"]),
        opt_g=restore_like(state.opt_g, trainer_state["opt_g"]),
        opt_d=restore_like(state.opt_d, trainer_state["opt_d"]),
    )
