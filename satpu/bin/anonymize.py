"""``satpu-anonymize`` CLI — the reference's ``anonymize`` bin
(satools/satools/bin/anonymize) over kaldi-style data dirs.

Config: INI with ``${:var}`` interpolation (satpu.utils.config.load_ini), an
``[anonymize]`` section mirroring the reference keys. Where the reference
forks ngpu x jobs processes (anonymize:82-93), the TPU-native version runs
one process with bucketed batches on the chip; ``--directory`` can still be
sharded across hosts with --num-shards/--shard.

Usage:
  python -m satpu.bin.anonymize --config configs/anon.ini --directory data/X
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import sys

from ..utils import config as cfg
from ..utils import kaldi_data


@dataclasses.dataclass
class AnonymizeOpts(cfg.Opts):
    checkpoint: str = ""
    directory: str = ""
    results_dir: str = ""
    target_selection_algorithm: str = "constant"
    target_constant_spkid: str = ""
    f0_transformation: str = ""
    batch_size: int = 32  # throughput scales with batch on TPU
    new_datadir_suffix: str = "_anon"
    seed: int = 0
    num_shards: int = 1
    shard: int = 0
    # local process fan-out (the reference's ngpu x jobs fork,
    # bin/anonymize:82-93): run num_procs shards as subprocesses with
    # fail-fast sibling termination
    num_procs: int = 1
    # serving compute dtype override (bfloat16 measured ~1.5x on v5e)
    compute_dtype: str = "bfloat16"
    # shard each batch over ALL local devices (TPU pod slice / multi-chip
    # host): one process drives N chips, batch_size/N utterances each — the
    # mesh analog of the reference's per-GPU fan-out (bin/anonymize:82-93)
    serve_mesh: bool = False


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="satpu %(levelname)s: %(message)s")
    cfg.enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="", help="INI config path")
    args, rest = parser.parse_known_args(argv)

    opts = AnonymizeOpts()
    if args.config:
        ini = cfg.load_ini(args.config)
        if "anonymize" in ini:
            opts.load_from_config(ini["anonymize"])
    opts.load_from_args(rest)

    if not opts.checkpoint or not opts.directory:
        print("need --checkpoint and --directory", file=sys.stderr)
        return 2

    if opts.num_procs > 1:
        import sys as _sys

        from ..utils.jobs import run_parallel_failfast

        cmds = []
        base = []
        skip = False
        for a in (argv if argv is not None else _sys.argv[1:]):
            if skip:
                skip = False
                continue
            if a.startswith("--num-procs"):
                skip = "=" not in a
                continue
            base.append(a)
        for k in range(opts.num_procs):
            cmds.append([_sys.executable, "-m", "satpu.bin.anonymize", *base,
                         "--num-shards", str(opts.num_procs), "--shard", str(k)])
        rcs = run_parallel_failfast(cmds)
        return 0 if all(rc == 0 for rc in rcs) else 1

    from .. import infer_helper
    from .pipeline import process_data

    # the shared serving config (bench.py measures the identical one)
    option_args = infer_helper.serving_option_args(
        opts.compute_dtype or "bfloat16")
    model, variables, meta = infer_helper.load_model(opts.checkpoint,
                                                     option_args=option_args)
    speakers = meta.get("speakers") or [str(i) for i in range(model.cfg.num_speakers)]

    results_dir = opts.results_dir or os.path.join(
        opts.directory.rstrip("/") + opts.new_datadir_suffix, "wavs")

    def progress(done, total):
        if done % 50 < opts.batch_size or done == total:
            logging.info("progress: %d/%d", done, total)

    out_dir = process_data(
        model, variables, speakers, opts.directory, results_dir,
        f0_speaker_stats=meta.get("f0_speaker_stats"),
        target_selection_algorithm=opts.target_selection_algorithm,
        target_constant_spkid=opts.target_constant_spkid,
        batch_size=opts.batch_size, f0_transformation=opts.f0_transformation,
        seed=opts.seed, new_datadir_suffix=opts.new_datadir_suffix,
        num_shards=opts.num_shards, shard=opts.shard,
        serve_mesh=opts.serve_mesh,
        progress_cb=progress)
    logging.info("done: %s", out_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
