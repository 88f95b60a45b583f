"""Model distribution: the torch.hub analog + AOT export (``final.jit``).

The reference distributes models two ways (SURVEY.md §2.8):
- ``torch.hub.load(..., "anonymization", tag_version=...)`` resolving a tag
  to a GitHub-release checkpoint (hubconf.py:13-114);
- ``final.jit`` TorchScript artifacts with zero python deps
  (chain/model.py:167-174).

satpu mirrors both:
- ``load(tag_or_path)``: resolves a tag through the MODEL_ZOO table to a
  file under the zoo dir ($SATPU_ZOO or ~/.cache/satpu), downloading from the
  recorded URL when the file is absent and egress exists, then calls
  ``infer_helper.load_model``; ``tag+key=value`` option-args override build
  params exactly like the reference's "tag+f0-transformation=..." strings
  (hubconf.py:32-44);
- ``export_convert`` / ``load_exported``: jax.export (StableHLO) AOT
  serialization of the jitted convert function — runs without the satpu
  package, the analog of final.jit.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

from . import infer_helper

# tag -> (url, filename): every released reference tag (hubconf.py:46-87
# anonymization + asr_bn lists, plus the inception model of README.md:149-180)
# with a converter-ready filename. URLs point at converted satpu checkpoints
# (none hosted yet); in air-gapped setups convert the reference release with
#   python -m satpu.bin.import_model --torch-checkpoint final.pt --tag <tag>
# (final.pt from reference_release_url(tag)) and the file lands under the
# same name.
_REF_TAGS = (
    # anonymization pipelines (hubconf.py:70-87)
    "hifigan_bn_tdnnf_wav2vec2_vq_48_v1",      # VPC-B5 flagship
    "hifigan_bn_tdnnf_wav2vec2_100h_aug_v1",
    "hifigan_bn_tdnnf_600h_aug_v1",
    "hifigan_bn_tdnnf_600h_vq_48_v1",          # VPC-B6
    "hifigan_bn_tdnnf_100h_vq_64_v1",
    "hifigan_bn_tdnnf_100h_vq_256_v1",
    "hifigan_bn_tdnnf_100h_aug_v1",
    "hifigan_inception_bn_tdnnf_wav2vec2_train_600_vq_48_v1",  # README.md:149
    # ASR-BN extractors (hubconf.py:46-66)
    "bn_tdnnf_wav2vec2_vq_48_v1",
    "bn_tdnnf_wav2vec2_100h_aug_v1",
    "bn_tdnnf_600h_aug_v1",
    "bn_tdnnf_600h_vq_48_v1",
    "bn_tdnnf_100h_vq_64_v1",
    "bn_tdnnf_100h_vq_256_v1",
    "bn_tdnnf_100h_aug_v1",
)
MODEL_ZOO: Dict[str, Tuple[str, str]] = {
    tag: ("", tag + ".ckpt") for tag in _REF_TAGS
}
# satpu-native extra: the ASV eval model trained by egs/asv/voxceleb
MODEL_ZOO["asv_eval_vox1_ecapa_tdnn"] = ("", "asv_eval_vox1_ecapa_tdnn.ckpt")


def reference_release_url(tag: str) -> str:
    """GitHub-release URL of the reference torch ``final.pt`` for a tag
    (hubconf.py:42-44) — the download half of the import_model recipe; the
    file is torch format and must go through import_model, not resolve()."""
    base, _ = _parse_option_args(tag)
    if base not in MODEL_ZOO or base == "asv_eval_vox1_ecapa_tdnn":
        raise KeyError(f"no reference release for tag {base!r}")
    return ("https://github.com/deep-privacy/SA-toolkit/releases/download/"
            f"{base}/final.pt")


def zoo_dir() -> str:
    return os.environ.get(
        "SATPU_ZOO", os.path.join(os.path.expanduser("~"), ".cache", "satpu"))


def _parse_option_args(tag: str) -> Tuple[str, Dict[str, Any]]:
    """"tag+f0-transformation=quant_16+x=1" -> (tag, {...}) (hubconf.py:32-44)."""
    parts = tag.split("+")
    opts: Dict[str, Any] = {}
    for kv in parts[1:]:
        if "=" in kv:
            k, v = kv.split("=", 1)
            opts[k.replace("-", "_")] = v
    return parts[0], opts


def resolve(tag: str) -> str:
    """Tag -> local checkpoint path (downloading if a URL is recorded)."""
    if os.path.exists(tag):
        return tag
    base, _ = _parse_option_args(tag)
    if base not in MODEL_ZOO:
        raise KeyError(f"unknown model tag {base!r}; known: {sorted(MODEL_ZOO)}")
    url, fname = MODEL_ZOO[base]
    path = os.path.join(zoo_dir(), fname)
    if not os.path.exists(path):
        if not url:
            raise FileNotFoundError(
                f"{path} not found and tag {base!r} has no recorded URL; place "
                "the converted checkpoint there (import_reference_checkpoint)")
        import urllib.request

        os.makedirs(zoo_dir(), exist_ok=True)
        urllib.request.urlretrieve(url, path + ".tmp")
        os.replace(path + ".tmp", path)
    return path


def load(tag_or_path: str, load_weight: bool = True):
    """torch.hub.load analog: tag (with +option-args) or path ->
    (model, variables, meta)."""
    base, opts = _parse_option_args(tag_or_path)
    path = resolve(base if not os.path.exists(tag_or_path) else tag_or_path)
    return infer_helper.load_model(path, load_weight=load_weight,
                                   option_args=opts or None)


# ---------------------------------------------------------------------------
# AOT export (final.jit analog)
# ---------------------------------------------------------------------------


def export_fn(fn, example_args, path: str, platforms=None) -> str:
    """Serialize a jittable fn as portable StableHLO (jax.export).
    ``platforms``: lowering targets, e.g. ("tpu",) or ("cpu", "tpu");
    default = the current backend."""
    import jax
    from jax import export as jexport

    kw = {"platforms": tuple(platforms)} if platforms else {}
    exp = jexport.export(jax.jit(fn), **kw)(*example_args)
    blob = exp.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_exported(path: str):
    """Load a serialized export; returns a callable (runs with zero satpu
    code, the final.jit property)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call


def export_convert(model, variables, path: str, batch: int = 1,
                   num_samples: int = 160000, platforms=None) -> str:
    """AOT-export the anonymizer's fused F0+convert for fixed shapes
    (chain/model.py:167-174 jit_save analog)."""
    import numpy as np

    wav = np.zeros((batch, num_samples), np.float32)
    tid = np.zeros((batch,), np.int32)

    def fn(wav, tid):
        f0 = model.get_f0(wav)
        return model.apply(variables, wav, f0, tid, method=model.convert)

    return export_fn(fn, (wav, tid), path, platforms=platforms)
