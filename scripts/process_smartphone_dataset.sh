#!/bin/bash
# Full raw -> trainable smartphone pipeline — equivalent of the reference's
# scripts/process_smartphone_dataset.sh (SURVEY.md §3.4):
#   sai-cli VIO -> COLMAP (retry 10) -> combine x3 intrinsics variants ->
#   blur-scored eval splits. Per-device calibration overrides and the 0.005 s
# iPhone rolling-shutter readout mirror the reference (:40-52).
set -e
cd "$(dirname "$0")/.."
PY=${PYTHON:-python}

$PY cli/process_sai_inputs.py "$@"
$PY cli/run_colmap.py all --max_retries=10 "$@"

# three intrinsics variants (reference :44-52)
$PY cli/combine.py all                                     # colmap intrinsics (-vels)
$PY cli/combine.py all --keep_intrinsics                   # factory (-orig-intrinsics)
for CALIB in data/inputs-raw/spectacular-rec-extras/calibration/*.json; do
  [ -e "$CALIB" ] || continue
  $PY cli/combine.py all --override_calibration "$CALIB"   # (-calib-intrinsics)
done

# iPhone rolling-shutter readout override: 0.005 s (reference :40-42)
for REC in data/inputs-processed/colmap-sai-cli-vels/ios-*; do
  [ -e "$REC" ] || continue
  $PY cli/combine.py "$REC" --set_rolling_shutter_to 0.005
done

# sharpest-of-8 eval splits
for DS in colmap-sai-cli-vels colmap-sai-cli-orig-intrinsics colmap-sai-cli-calib-intrinsics; do
  [ -d "data/inputs-processed/$DS" ] || continue
  $PY cli/train_eval_split_by_blur_score.py "$DS" all
done
