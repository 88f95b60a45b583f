"""The anonymization (voice-conversion) model: ASR-BN + F0 + target speaker
one-hot -> HiFi-GAN waveform.

Rebuild of the reference tuning net (egs/vc/libritts/local/tuning/hifigan.py):

- ``get_bn``: frozen TDNNF(+VQ) bottleneck extractor (tuning/hifigan.py:110-113)
- ``get_f0``: YAAPT pitch (satpu.ops.yaapt), normalized with UttCMVN
  (var_norm, keep_zeros) (tuning/hifigan.py:37,84)
- optional f0 transformation quant/awgn/mean-reverv (tuning/hifigan.py:73-81)
- nearest-neighbor interpolation of f0 + one-hot to the BN frame rate,
  concat, CoreHifiGan (tuning/hifigan.py:83-102)

The whole ``convert`` path is one jittable function of (wav, f0, target_id);
speaker selection/one-hot is done with a static speaker table so batches of
mixed targets compile once.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cmvn import utt_cmvn_keep_zeros
from .asrbn import TDNNFNet, TDNNFNetConfig
from .hifigan import CoreHifiGan, CoreHifiGanConfig, apply_f0_transformation


def interpolate_nearest(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') over the last axis."""
    in_len = x.shape[-1]
    idx = jnp.floor(jnp.arange(out_len) * (in_len / out_len)).astype(jnp.int32)
    idx = jnp.clip(idx, 0, in_len - 1)
    return x[..., idx]


YAAPT_OPTS = {
    # tuning/hifigan.py:31-36
    "frame_length": 35.0,
    "frame_space": 20.0,
    "nccf_thresh1": 0.25,
    "tda_frame_length": 25.0,
}


@dataclasses.dataclass(frozen=True)
class AnonymizerConfig:
    asrbn: TDNNFNetConfig = TDNNFNetConfig()
    # 0 = any-to-one (m2o): no target-speaker conditioning at all
    # (reference tuning/hifigan_m2o.py)
    num_speakers: int = 247  # libritts-train-clean-100 speaker count
    f0_transformation: str = ""
    # "utt" = UttCMVN(keep_zeros) inside the graph (tuning/hifigan.py:37);
    # "none" = caller pre-normalizes (the SpeakerCMVN flow of
    # tuning/hifigan_clean.py:37, stats ride the checkpoint metadata)
    f0_norm: str = "utt"
    upsample_rates: Tuple[int, ...] = (5, 4, 4, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (11, 8, 8, 4, 4)
    upsample_initial_channel: int = 512
    bn_dim: int = 256
    # "float32" | "bfloat16": serving compute dtype for generator convs +
    # TDNNF matmuls (params, YAAPT and normalizations stay f32)
    compute_dtype: str = "float32"

    def hifigan_config(self) -> CoreHifiGanConfig:
        return CoreHifiGanConfig(
            input_dim=self.bn_dim + 1 + self.num_speakers,
            upsample_rates=self.upsample_rates,
            upsample_kernel_sizes=self.upsample_kernel_sizes,
            upsample_initial_channel=self.upsample_initial_channel,
            compute_dtype=self.compute_dtype,
        )


class AnonymizationNet(nn.Module):
    """convert(wav, f0, target) -> anonymized waveform."""

    cfg: AnonymizerConfig

    def setup(self):
        import dataclasses as _dc

        asrbn = self.cfg.asrbn
        if self.cfg.compute_dtype != asrbn.compute_dtype:
            asrbn = _dc.replace(asrbn, compute_dtype=self.cfg.compute_dtype)
        self.bn_extractor = TDNNFNet(asrbn, name="bn_extractor")
        self.hifigan = CoreHifiGan(self.cfg.hifigan_config(), name="hifigan")

    @staticmethod
    def get_f0(wav: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> [B, T_f0] YAAPT pitch (tuning/hifigan.py:118-122).
        Stateless; runs on TPU as part of the fused convert graph."""
        from ..ops.yaapt import yaapt

        return yaapt(wav, YAAPT_OPTS)

    def get_bn(self, wav: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> [B, bn_dim, T_bn] (reference layout, tuning/hifigan.py:113)."""
        bn = self.bn_extractor.extract_bn(wav)  # [B, T_bn, C]
        return jnp.transpose(bn, (0, 2, 1))

    def forward_decoder(self, f0: jnp.ndarray, bn: jnp.ndarray,
                        spk_onehot: jnp.ndarray,
                        f0_key: Optional[jax.Array] = None) -> jnp.ndarray:
        """(f0 [B, T_f0], bn [B, C, T_bn], spk_onehot [B, S]) -> wav [B, T_out].

        Mirrors tuning/hifigan.py:83-102 (_forward).
        """
        f0 = jnp.asarray(f0)  # f0_norm="none" may hand a raw host array over
        if self.cfg.f0_norm == "utt":
            f0 = utt_cmvn_keep_zeros(f0, var_norm=True)
        f0 = f0[:, None, :]  # [B, 1, T]
        if self.cfg.f0_transformation:
            f0 = apply_f0_transformation(f0, self.cfg.f0_transformation, key=f0_key)
        f0_inter = interpolate_nearest(f0, bn.shape[-1])
        x = jnp.concatenate([bn, f0_inter], axis=1)
        if self.cfg.num_speakers > 0:
            spk = jnp.repeat(spk_onehot[:, :, None].astype(x.dtype), x.shape[-1],
                             axis=2)
            x = jnp.concatenate([x, spk], axis=1)  # [B, C_total, T]
        wav = self.hifigan(jnp.transpose(x, (0, 2, 1)))  # NWC in, [B, T_out, 1]
        return wav[..., 0]

    def convert(self, wav: jnp.ndarray, f0: jnp.ndarray, target_ids: jnp.ndarray,
                f0_key: Optional[jax.Array] = None) -> jnp.ndarray:
        """wav [B, T], f0 [B, T_f0], target_ids [B] int32 -> [B, T_out]."""
        bn = self.get_bn(wav)
        if self.cfg.num_speakers > 0:
            spk = jax.nn.one_hot(target_ids, self.cfg.num_speakers)
        else:  # m2o: ignored by forward_decoder
            spk = jnp.zeros((wav.shape[0], 0), wav.dtype)
        return self.forward_decoder(f0, bn, spk, f0_key=f0_key)

    def __call__(self, wav: jnp.ndarray, f0: jnp.ndarray, target_ids: jnp.ndarray):
        return self.convert(wav, f0, target_ids)


def convert_anonymizer_state_dict(sd) -> dict:
    """Split a reference tuning/hifigan.py Net state_dict into satpu variables."""
    from .convert import convert_asrbn, convert_hifigan

    bn_sd = {k[len("bn_extractor."):]: v for k, v in sd.items()
             if k.startswith("bn_extractor.")}
    hg_sd = {k[len("hifigan."):]: v for k, v in sd.items() if k.startswith("hifigan.")}
    bn_vars = convert_asrbn(bn_sd)
    hg_vars = convert_hifigan(hg_sd)
    out = {"params": {"bn_extractor": bn_vars["params"], "hifigan": hg_vars["params"]},
           "batch_stats": {"bn_extractor": bn_vars["batch_stats"]}}
    if "vq_stats" in bn_vars:
        out["vq_stats"] = {"bn_extractor": bn_vars["vq_stats"]}
    if "spectral" in hg_vars:
        out["spectral"] = {"hifigan": hg_vars["spectral"]}
    return out
