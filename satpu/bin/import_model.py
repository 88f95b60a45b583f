"""Convert a reference torch checkpoint and install it into the satpu zoo.

The offline flagship-artifact recipe (round-2 VERDICT #8): download a
released reference ``final.pt`` on any machine with network access
(hubconf.py:46-87 model zoo, e.g.
https://github.com/deep-privacy/SA-toolkit/releases — tag
``hifigan_bn_tdnnf_wav2vec2_vq_48_v1``), copy it here, then:

    python -m satpu.bin.import_model \
        --torch-checkpoint final.pt \
        --tag hifigan_bn_tdnnf_wav2vec2_vq_48_v1

converts it (``infer_helper.import_reference_checkpoint``: shape-inferred
architecture, weight-norm (g,v) layouts, VQ codebooks) and installs it under
the zoo filename for that tag, so ``satpu.hub.load(tag)`` — including
"+f0-transformation=..." option args — works with zero network. The
waveform-level parity of the converted pipeline is covered by
tests/test_assembled_golden.py.

--kind is inferred from the tag (anonymizer for hifigan_*, asrbn for
asrbn_*); pass explicitly for custom tags. --out writes to an explicit path
instead of the zoo.
"""
import argparse
import logging
import os
import sys


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="satpu %(levelname)s: %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch-checkpoint", required=True,
                   help="reference final.pt (torch format)")
    p.add_argument("--tag", default="",
                   help="zoo tag to install as (satpu.hub.MODEL_ZOO)")
    p.add_argument("--kind", default="",
                   choices=["", "anonymizer", "asrbn"],
                   help="converter kind; inferred from the tag when empty")
    p.add_argument("--out", default="", help="explicit output path (skips zoo)")
    args = p.parse_args(argv)

    from .. import hub, infer_helper

    kind = args.kind
    if not kind:
        base = args.tag or os.path.basename(args.torch_checkpoint)
        kind = "asrbn" if base.startswith(("asrbn", "bn_")) else "anonymizer"

    if args.out:
        out = args.out
    else:
        if not args.tag:
            p.error("--tag or --out required")
        if args.tag not in hub.MODEL_ZOO:
            logging.warning("tag %r not in MODEL_ZOO; installing under "
                            "<zoo>/%s.ckpt", args.tag, args.tag)
            fname = args.tag + ".ckpt"
        else:
            fname = hub.MODEL_ZOO[args.tag][1]
        os.makedirs(hub.zoo_dir(), exist_ok=True)
        out = os.path.join(hub.zoo_dir(), fname)

    path = infer_helper.import_reference_checkpoint(
        args.torch_checkpoint, out, kind=kind)
    logging.info("converted %s -> %s (kind=%s)", args.torch_checkpoint, path,
                 kind)
    if args.tag:
        model, variables, meta = hub.load(args.tag, load_weight=True)
        logging.info("hub.load(%r) ok: model_id=%s build_params=%s",
                     args.tag, meta.get("model_id"), meta.get("build_params"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
