#!/bin/bash
# One-command real-data parity run ("first day with network"):
#   1. download the VPC vctk_test set + a released reference final.pt
#      (the only steps that need network — see README.md),
#   2. build the VPC enroll/trial dirs (reference data_prep_vpc.sh, native),
#   3. import the reference checkpoint, anonymize, evaluate, and print
#      measured WER/EER/linkability side by side with the reference's
#      published numbers (BASELINE.md).
#
# Usage: ./run_parity.sh [final.pt] [tag]
# The pipeline below (minus the download) is CI-tested end-to-end against a
# synthetic reference-format final.pt in tests/test_parity_cli.py.
set -e
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../../.. && pwd):$PYTHONPATH"

final_pt=${1:-final.pt}
tag=${2:-hifigan_bn_tdnnf_wav2vec2_vq_48_v1}

[ -d data/vctk_test ] || {
  echo "data/vctk_test missing: download + unpack the VPC vctk_test set"
  echo "(reference egs/anon/vctk/local/download_data.sh; password from the"
  echo " VoicePrivacy organisers), then re-run."
  exit 1
}
[ -f "$final_pt" ] || {
  echo "$final_pt missing: download the released reference checkpoint, e.g."
  echo "  https://github.com/deep-privacy/SA-toolkit/releases ($tag)"
  exit 1
}

# offline VPC prep: enroll/trial subset dirs (idempotent)
[ -d data/vctk_test_trials_all ] || \
  python -m satpu.bin.prepare_vctk --data data/vctk_test

# import -> anonymize -> eval -> side-by-side vs BASELINE.md
python -m satpu.bin.parity \
  --torch-checkpoint "$final_pt" --tag "$tag" \
  --data data/vctk_test_trials_all \
  --eval-config configs/eval.ini \
  --baseline vctk_clear \
  --enroll-dir data/vctk_test_enrolls \
  --trials data/vctk_test_trials_all/trials \
  --results exp/parity
