"""Model registry + self-describing checkpoint loading.

The reference distributes models as self-describing checkpoints that embed the
tuning-file path and build args, reconstructed via dynamic import
(satools/satools/infer_helper.py:10-59). satpu keeps the same capability with
a safer mechanism: checkpoints carry a ``model_id`` resolved through a
registry of builders, plus the JSON build params. ``load_model`` rebuilds the
flax module and returns (model, variables, meta).

A converter entry point imports reference torch ``final.pt`` checkpoints
(downloaded separately; this environment has no network egress).
"""
from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Tuple

from .utils.checkpoint import load_checkpoint, save_checkpoint

MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register_model(model_id: str):
    def deco(builder):
        MODEL_REGISTRY[model_id] = builder
        return builder

    return deco


def _tuplify(kwargs):
    """JSON round-trips tuples as lists; dataclass configs want tuples back."""
    out = {}
    for k, v in kwargs.items():
        out[k] = tuple(v) if isinstance(v, list) else v
    return out


def _register_builtins():
    from .models.asrbn import TDNNFNet, TDNNFNetConfig
    from .models.anonymizer import AnonymizationNet, AnonymizerConfig

    if "asrbn_tdnnf" not in MODEL_REGISTRY:

        @register_model("asrbn_tdnnf")
        def _build_asrbn(**kwargs):
            return TDNNFNet(TDNNFNetConfig(**_tuplify(kwargs)))

        @register_model("anonymizer_tdnnf_hifigan")
        def _build_anon(**kwargs):
            asrbn_kwargs = _tuplify(kwargs.pop("asrbn", {}))
            cfg = AnonymizerConfig(asrbn=TDNNFNetConfig(**asrbn_kwargs),
                                   **_tuplify(kwargs))
            return AnonymizationNet(cfg)

        @register_model("asv_xvector")
        def _build_asv(**kwargs):
            from .sidekit.xvector import XVectorConfig, build_xvector

            return build_xvector(XVectorConfig(**kwargs))

        @register_model("asrbn_tdnnf_spkadv")
        def _build_spkadv(**kwargs):
            from .models.spkadv import SpkAdvTDNNFNet

            num_speakers = kwargs.pop("num_speakers")
            adversarial = kwargs.pop("adversarial", True)
            return SpkAdvTDNNFNet(TDNNFNetConfig(**_tuplify(kwargs)),
                                  num_speakers=num_speakers,
                                  adversarial=adversarial)

        @register_model("asrbn_tdnnf_wav2vec2")
        def _build_asrbn_w2v2(**kwargs):
            from .models.asrbn import Wav2Vec2TDNNFNet
            from .models.wav2vec2 import Wav2Vec2Config

            w2v2_kwargs = kwargs.pop("wav2vec2", {})
            for key in ("conv_dim", "conv_kernel", "conv_stride"):
                if key in w2v2_kwargs:
                    w2v2_kwargs[key] = tuple(w2v2_kwargs[key])
            return Wav2Vec2TDNNFNet(TDNNFNetConfig(**_tuplify(kwargs)),
                                    Wav2Vec2Config(**w2v2_kwargs))


def serving_option_args(compute_dtype: str = "bfloat16") -> Dict[str, Any]:
    """Build-param deltas EVERY inference entry point applies on top of a
    checkpoint's stored params, so the benchmark measures the shipped
    configuration and vice versa: bf16 compute for generator/TDNNF matmuls
    (~1.5x on v5e, waveform rel err ~2e-3). bench.py and bin/anonymize both
    route through here; tests/test_serving_config.py asserts they build
    identical AnonymizerConfigs for the flagship."""
    return {"compute_dtype": compute_dtype}


def build_model(model_id: str, **build_params):
    _register_builtins()
    if model_id not in MODEL_REGISTRY:
        raise KeyError(f"unknown model_id {model_id!r}; known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[model_id](**build_params)


def load_model(path: str, load_weight: bool = True,
               option_args: Optional[Dict[str, Any]] = None):
    """Checkpoint file -> (model, variables, meta).

    Mirrors infer_helper.load_model(file, load_weight, option_args)
    (infer_helper.py:10-59): option_args override stored build params (the
    reference's "tag+f0-transformation=..." mechanism).
    """
    meta, state = load_checkpoint(path)
    build_params = dict(meta.get("build_params", {}))
    if option_args:
        build_params.update(option_args)
    model = build_model(meta["model_id"], **build_params)
    variables = state.get("variables", state) if load_weight else None
    return model, variables, meta


def save_model(path: str, model_id: str, build_params: Dict[str, Any],
               variables, extra_meta: Optional[Dict[str, Any]] = None) -> None:
    meta = {"model_id": model_id, "build_params": build_params}
    if extra_meta:
        meta.update(extra_meta)
    save_checkpoint(path, meta, {"variables": variables})


def import_reference_checkpoint(torch_ckpt_path: str, out_path: str,
                                kind: str = "anonymizer") -> str:
    """Convert a reference torch checkpoint (final.pt) into a satpu checkpoint.

    The reference checkpoint dict carries base_model_state_dict +
    base_model_params (chain/model.py:442-460).
    """
    import torch

    blob = torch.load(torch_ckpt_path, map_location="cpu", weights_only=False)
    sd = blob.get("base_model_state_dict", blob)
    params_meta = blob.get("base_model_params", {})

    def _asrbn_params(prefix: str = "") -> Dict[str, Any]:
        """Infer TDNNFNetConfig build params from state-dict shapes so the
        rebuilt module tree matches any reference tuning variant (output_dim,
        VQ codebook size, bottleneck dim)."""
        p: Dict[str, Any] = {}
        w = sd.get(prefix + "chain_output.weight")
        if w is not None:
            p["output_dim"] = int(w.shape[0])
        vq = sd.get(prefix + "tdnnfs.20.tdnn.bottleneck_func.quant._embedding.weight")
        if vq is not None:
            p["bottleneck"] = "vq"
            p["codebook_size"] = int(vq.shape[0])
        return p

    if kind == "anonymizer":
        from .models.anonymizer import convert_anonymizer_state_dict

        variables = convert_anonymizer_state_dict(sd)
        utt2spk = params_meta.get("utt2spk", {})
        spk = sorted(set(utt2spk.values())) if utt2spk else []
        num_speakers = len(spk)
        pre = sd.get("hifigan.conv_pre.weight_v")
        bn_dim = None
        # the BN feature is the inner bottleneck of tdnnfs[-2]
        # (return_bottleneck=True, tuning/tdnnf.py:175): linearA's input dim
        bnw = sd.get("bn_extractor.tdnnfs.20.tdnn.linearA.weight")
        if bnw is not None:
            bn_dim = int(bnw.shape[1])
        build_params: Dict[str, Any] = {}
        if pre is not None:
            # input_dim = bn_dim + 1 (f0) + num_speakers (tuning/hifigan.py:45)
            num_speakers = int(pre.shape[1]) - (bn_dim or 256) - 1
            build_params["upsample_initial_channel"] = int(pre.shape[0])
        build_params["num_speakers"] = num_speakers or 247
        if bn_dim is not None:
            build_params["bn_dim"] = bn_dim
        asrbn = _asrbn_params("bn_extractor.")
        if asrbn:
            build_params["asrbn"] = asrbn
        extra = {"speakers": spk}
        model_id = "anonymizer_tdnnf_hifigan"
    elif kind == "asrbn":
        from .models.convert import convert_asrbn

        variables = convert_asrbn(sd)
        build_params = {"output_dim": params_meta.get("output_dim", 3280)}
        build_params.update(_asrbn_params())
        extra = {}
        model_id = "asrbn_tdnnf"
    else:
        raise ValueError(kind)
    save_model(out_path, model_id, build_params, variables, extra_meta=extra)
    return out_path
