"""Chain data-preparation CLI — the reference's
egs/asr/librispeech/local/chain/prepare_data.sh (stages 2-7) without Kaldi.

From a plain kaldi-style data dir (wav.scp, text, utt2spk [, lexicon]) it
produces everything ``satpu.bin.train_asr`` consumes: speed-perturbed
allowed-lengths egs, per-utterance numerator FSTs, den.fst,
normalization.fst, tree.json, num_pdfs.

Usage:
  python -m satpu.bin.prepare_data --data-dir data/train \\
      --out-dir exp/chain_prep [--lexicon data/lexicon.txt]
Then:
  python -m satpu.bin.train_asr \\
      --train-set exp/chain_prep/egs --fst-scp exp/chain_prep/fst_train.scp \\
      --den-fst exp/chain_prep/den.fst \\
      --normalization-fst exp/chain_prep/normalization.fst \\
      --num-pdfs $(cat exp/chain_prep/num_pdfs)
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import sys

from ..utils import config as cfg


@dataclasses.dataclass
class PrepareDataOpts(cfg.Opts):
    data_dir: str = ""
    out_dir: str = ""
    lexicon: str = ""
    num_lengths: int = 12
    biphone: bool = True
    speed_perturb: bool = True
    between_silprob: float = 0.1
    valid_fraction: float = 0.05
    seed: int = 0


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="satpu %(levelname)s: %(message)s")
    cfg.enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="")
    args, rest = parser.parse_known_args(argv)
    opts = PrepareDataOpts()
    if args.config:
        ini = cfg.load_ini(args.config)
        if "prepare_data" in ini:
            opts.load_from_config(ini["prepare_data"])
    opts.load_from_args(rest)
    if not opts.data_dir or not opts.out_dir:
        print("need --data-dir and --out-dir", file=sys.stderr)
        return 2

    from ..chain.prep import prepare_chain_data

    out = prepare_chain_data(
        opts.data_dir, opts.out_dir, lexicon_path=opts.lexicon or None,
        num_lengths=opts.num_lengths, biphone=opts.biphone,
        between_silprob=opts.between_silprob, valid_fraction=opts.valid_fraction,
        speed_perturb=opts.speed_perturb, seed=opts.seed)
    logging.info("prepared: num_pdfs=%d egs=%s", out["num_pdfs"], out["egs_dir"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
