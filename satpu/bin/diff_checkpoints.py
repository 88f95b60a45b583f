"""Diff the weights of two satpu checkpoints (reference
egs/asr/librispeech/shutil/diff_models_weights.py): shape-match the two
parameter trees, then report per-tensor allclose / summed difference —
handy for checking what a fine-tune actually changed.

Usage:
    python -m satpu.bin.diff_checkpoints a.ckpt b.ckpt [--atol 1e-12]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten(v, f"{prefix}{k}." if not prefix else f"{prefix}{k}."))
        return out
    out[prefix.rstrip(".")] = np.asarray(tree)
    return out


def diff_checkpoints(path_a: str, path_b: str, atol: float = 1e-12,
                     skip_batchnorm: bool = True, out=sys.stdout) -> int:
    """Prints one line per comparable tensor; returns the count of tensors
    that differ beyond atol."""
    from ..utils import checkpoint as ckpt

    _, sa = ckpt.load_checkpoint(path_a)
    _, sb = ckpt.load_checkpoint(path_b)
    fa = flatten(sa.get("variables", sa))
    fb = flatten(sb.get("variables", sb))
    n_diff = 0
    for name in sorted(fa):
        if skip_batchnorm and ("batch_stats" in name or ".bn." in name):
            continue
        if name not in fb or fb[name].shape != fa[name].shape:
            print(f"INCOMPATIBLE\t{name}\t{fa[name].shape} vs "
                  f"{fb[name].shape if name in fb else 'missing'}", file=out)
            n_diff += 1
            continue
        same = np.allclose(fa[name], fb[name], atol=atol)
        delta = float(np.sum(fa[name] - fb[name]))
        print(f"{same}\t{name}\t sum-delta {delta:+.6g}", file=out)
        if not same:
            n_diff += 1
    return n_diff


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint_a")
    parser.add_argument("checkpoint_b")
    parser.add_argument("--atol", type=float, default=1e-12)
    parser.add_argument("--keep-batchnorm", action="store_true",
                        help="also compare batch-norm running stats")
    args = parser.parse_args(argv)
    n = diff_checkpoints(args.checkpoint_a, args.checkpoint_b, atol=args.atol,
                         skip_batchnorm=not args.keep_batchnorm)
    print(f"{n} tensors differ")
    return 0


if __name__ == "__main__":
    sys.exit(main())
