"""Torch-reference checkpoint -> satpu flax parameter conversion.

Maps the reference state_dict names (tuning/tdnnf.py, tuning/hifigan.py module
trees) onto satpu module trees. Weight layouts:

- NaturalAffineTransform / Linear: torch weight [out, in] is kept as-is
  (satpu stores torch layout), torch nn.Linear bias [out] -> [1, out].
- BatchNorm running stats -> flax 'batch_stats' {mean, var}.
- VectorQuantizerEMA buffers -> 'vq_stats' {embedding, ema_cluster_size, ema_w}.
- weight-normed convs keep (g, v) split; Conv1d weights [out, in, k] ->
  flax NWC kernels [k, in, out] (transpose (2, 1, 0)); ConvTranspose1d
  [in, out, k] -> [k, out, in] handled by the hifigan converter.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _set(tree: Dict, path, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _affine(dst: Dict, flax_path, sd: Dict, torch_prefix: str, linear_bias_1d: bool = False):
    w = _np(sd[torch_prefix + ".weight"]).astype(np.float32)
    _set(dst, flax_path + ("weight",), w)
    bkey = torch_prefix + ".bias"
    if bkey in sd:
        b = _np(sd[bkey]).astype(np.float32)
        if b.ndim == 1:
            b = b[None, :]
        _set(dst, flax_path + ("bias",), b)


def _tdnnf_bn_layer(params: Dict, stats: Dict, sd: Dict, torch_prefix: str, flax_name: str,
                    vq_stats: Dict = None, vq_flax_path: Tuple = None):
    base = (flax_name, "tdnn")
    _affine(params, base + ("linearB", "inner_nat"), sd, torch_prefix + ".tdnn.linearB.inner_nat")
    _affine(params, base + ("linearA",), sd, torch_prefix + ".tdnn.linearA")
    _set(stats, (flax_name, "bn", "mean"),
         _np(sd[torch_prefix + ".bn.running_mean"]).astype(np.float32))
    _set(stats, (flax_name, "bn", "var"),
         _np(sd[torch_prefix + ".bn.running_var"]).astype(np.float32))
    vq_key = torch_prefix + ".tdnn.bottleneck_func.quant._embedding.weight"
    if vq_key in sd and vq_stats is not None:
        _set(vq_stats, vq_flax_path + ("embedding",), _np(sd[vq_key]).astype(np.float32))
        _set(vq_stats, vq_flax_path + ("ema_cluster_size",),
             _np(sd[torch_prefix + ".tdnn.bottleneck_func.quant._ema_cluster_size"]).astype(np.float32))
        _set(vq_stats, vq_flax_path + ("ema_w",),
             _np(sd[torch_prefix + ".tdnn.bottleneck_func.quant._ema_w"]).astype(np.float32))


def convert_asrbn(sd: Dict[str, Any], num_stage1_layers: int = 12,
                  num_after_layers: int = 4) -> Dict[str, Any]:
    """Reference tuning/tdnnf(_vq|_dp).py state_dict -> satpu TDNNFNet variables.

    Returns {'params': ..., 'batch_stats': ..., 'vq_stats': ...(if present)}.
    """
    params: Dict = {}
    stats: Dict = {}
    vq_stats: Dict = {}
    _tdnnf_bn_layer(params, stats, sd, "tdnn1", "tdnn1")
    # torch Sequential interleaves Dropout: TDNNFBatchNorm at even indices
    n_mid = num_stage1_layers - 2  # layers tdnnf1..tdnnf{n}, then BN layer
    for k in range(n_mid):
        _tdnnf_bn_layer(params, stats, sd, f"tdnnfs.{2 * k}", f"tdnnf{k + 1}")
    # the VQ module is declared in TDNNFNet.setup, so it binds at the top level
    vq_path = ("vq_bottleneck", "vq")
    _tdnnf_bn_layer(params, stats, sd, f"tdnnfs.{2 * n_mid}", "tdnnf_bn",
                    vq_stats=vq_stats, vq_flax_path=vq_path)
    for k in range(num_after_layers):
        _tdnnf_bn_layer(params, stats, sd, f"tdnnfs_after.{2 * k}", f"tdnnf_after{k}")
    _tdnnf_bn_layer(params, stats, sd, "prefinal_chain", "prefinal_chain")
    _tdnnf_bn_layer(params, stats, sd, "prefinal_xent", "prefinal_xent")
    _affine(params, ("chain_output",), sd, "chain_output")
    _affine(params, ("xent_output",), sd, "xent_output")
    out = {"params": params, "batch_stats": stats}
    if vq_stats:
        out["vq_stats"] = vq_stats
    return out


def _collapse_path(torch_key: str):
    """torch 'resblocks.3.convs1.2.weight_v' -> ('resblocks_3','convs1_2','weight_v')."""
    parts = torch_key.split(".")
    path = []
    i = 0
    while i < len(parts):
        if i + 1 < len(parts) and parts[i + 1].isdigit():
            path.append(f"{parts[i]}_{parts[i + 1]}")
            i += 2
        else:
            path.append(parts[i])
            i += 1
    return tuple(path)


def convert_hifigan(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Reference CoreHifiGan / discriminator state_dict -> satpu variables.

    Parameters keep their torch layouts (satpu stores weight-norm (g, v) and
    spectral-norm weight_orig in torch shape), so this is a pure name remap:
    torch Sequential/ModuleList indices become ``name_i`` flax scopes and the
    spectral-norm u/v power-iteration buffers move to the 'spectral'
    collection.
    """
    params: Dict = {}
    spectral: Dict = {}
    sn_prefixes = {k[: -len(".weight_orig")] for k in sd if k.endswith(".weight_orig")}
    for k, t in sd.items():
        path = _collapse_path(k)
        arr = _np(t).astype(np.float32)
        prefix = k.rsplit(".", 1)[0]
        leaf = path[-1]
        if prefix in sn_prefixes and leaf in ("weight_u", "weight_v"):
            _set(spectral, path[:-1] + (leaf[-1],), arr)  # weight_u -> u, weight_v -> v
        else:
            # satpu scale discriminators lift torch Conv1d to 2D (W axis = 1):
            # expand [out, in, k] -> [out, in, k, 1] and g [out,1,1] -> [out,1,1,1]
            if (path and path[0].startswith("discriminators_")
                    and leaf in ("weight_v", "weight_g", "weight_orig") and arr.ndim == 3):
                arr = arr[..., None]
            _set(params, path, arr)
    out = {"params": params}
    if spectral:
        out["spectral"] = spectral
    return out


def convert_sidekit(sd: Dict[str, Any], arch: str = "ecapa") -> Dict[str, Any]:
    """Reference ASV tuning net state_dict -> satpu x-vector variables.

    Handles: BN running stats -> batch_stats {mean, var}; torch Sequential
    indices -> flax scope names (SERes2Block children become ``block_i``,
    ResNet stage children keep their integer names); the reference's
    before_speaker_embedding Sequential(lin, bn2) flattens to
    ``before_speaker_embedding_<name>`` scopes. Parameter-free preprocessor /
    spec_augment buffers are dropped (satpu implements them functionally).
    """
    params: Dict = {}
    stats: Dict = {}
    for k, t in sd.items():
        if k.startswith(("preprocessor.", "spec_augment.")):
            continue
        arr = _np(t).astype(np.float32)
        parts = k.split(".")
        is_stat = parts[-1] in ("running_mean", "running_var")
        if parts[-1] == "num_batches_tracked":
            continue
        path = []
        i = 0
        while i < len(parts) - 1:
            p = parts[i]
            nxt = parts[i + 1] if i + 1 < len(parts) - 1 else None
            if p == "before_speaker_embedding" and nxt is not None:
                path.append(f"before_speaker_embedding_{parts[i + 1]}")
                i += 2
                continue
            if nxt is not None and nxt.isdigit():
                if arch == "ecapa" and p in ("layer2", "layer3", "layer4"):
                    path.append(p)
                    path.append(f"block_{nxt}")
                elif p.startswith("layer") and arch != "ecapa":
                    path.append(p)
                    path.append(nxt)
                else:
                    path.append(f"{p}_{nxt}")
                i += 2
                continue
            path.append(p)
            i += 1
        leaf = parts[-1]
        if is_stat:
            _set(stats, tuple(path) + ({"running_mean": "mean", "running_var": "var"}[leaf],), arr)
        else:
            _set(params, tuple(path) + (leaf,), arr)
    return {"params": params, "batch_stats": stats}


def conv1d_weight_to_nwc(w: np.ndarray) -> np.ndarray:
    """torch Conv1d [out, in, k] -> flax [k, in, out]."""
    return np.transpose(w, (2, 1, 0))


def conv_transpose1d_weight_to_nwc(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d [in, out, k] -> satpu transposed-conv layout [k, in, out]."""
    return np.transpose(w, (2, 0, 1))
