"""AOT-export CLI — the reference's --mode jit_save producing final.jit
(chain/model.py:167-174, hifigan/model.py:162-171).

Serializes the jitted convert (anonymizer) or extract_bn/loglikes (ASR-BN)
function to portable StableHLO via jax.export; the artifact runs with plain
jax, no satpu code.

Usage:
  python -m satpu.bin.export_model --checkpoint exp/hifigan/g_best.ckpt \\
      --out exp/hifigan/final.stablehlo --batch 8 --num-samples 160000
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import sys

from ..utils import config as cfg


@dataclasses.dataclass
class ExportOpts(cfg.Opts):
    checkpoint: str = ""
    out: str = ""
    kind: str = "convert"  # convert | loglikes | extract_bn
    batch: int = 8
    num_samples: int = 160000
    platforms: str = ""  # e.g. "tpu" or "cpu,tpu"; default current backend


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="satpu %(levelname)s: %(message)s")
    cfg.enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="")
    args, rest = parser.parse_known_args(argv)
    opts = ExportOpts()
    if args.config:
        ini = cfg.load_ini(args.config)
        if "export" in ini:
            opts.load_from_config(ini["export"])
    opts.load_from_args(rest)
    if not opts.checkpoint or not opts.out:
        print("need --checkpoint and --out", file=sys.stderr)
        return 2

    import numpy as np

    from .. import hub, infer_helper

    model, variables, _ = infer_helper.load_model(opts.checkpoint)
    platforms = tuple(opts.platforms.split(",")) if opts.platforms else None
    if opts.kind == "convert":
        path = hub.export_convert(model, variables, opts.out, batch=opts.batch,
                                  num_samples=opts.num_samples,
                                  platforms=platforms)
    else:
        wav = np.zeros((opts.batch, opts.num_samples), np.float32)
        if opts.kind == "loglikes":
            fn = lambda w: model.apply(variables, w, train=False)[0]
        elif opts.kind == "extract_bn":
            fn = lambda w: model.apply(variables, w, method=model.extract_bn)
        else:
            raise ValueError(opts.kind)
        path = hub.export_fn(fn, (wav,), opts.out, platforms=platforms)
    logging.info("exported %s (%s) -> %s", opts.checkpoint, opts.kind, path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
