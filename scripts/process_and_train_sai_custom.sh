#!/bin/bash
# Process and train a custom Spectacular Rec recording — equivalent of the
# reference's scripts/process_and_train_sai_custom.sh: unzip -> sai-cli VIO ->
# (optional) COLMAP -> combine -> train with MB compensation, all frames.
#
#   ./scripts/process_and_train_sai_custom.sh /PATH/TO/RECORDING.zip
#
# Env switches (reference-compatible): SKIP_COLMAP=ON skips the COLMAP pass
# (uses VIO poses directly); SAI_PREVIEW=OFF disables preview windows.
set -e
cd "$(dirname "$0")/.."
PY=${PYTHON:-python}
ZIP=$1
[ -z "$ZIP" ] && { echo "usage: $0 <recording.zip>"; exit 1; }
NAME=$(basename "$ZIP"); NAME=${NAME%.zip}

: "${SKIP_COLMAP:=OFF}"
: "${SAI_PREVIEW:=ON}"
FLAGS=""
[ "$SKIP_COLMAP" = "ON" ] && FLAGS="$FLAGS --skip_colmap"
[ "$SAI_PREVIEW" = "ON" ] && FLAGS="$FLAGS --preview"

$PY cli/process_sai_custom.py "$ZIP" $FLAGS

# Flagship compensated model (MB + RS + pose/velocity optimization), all
# frames used for training (reference: train.py --train_all --no_eval).
$PY cli/fit.py splatfacto --data "data/inputs-processed/custom/$NAME" \
  --output-dir data/outputs --experiment-name "custom/pose_opt-motion_blur-rolling_shutter-velocity_opt/$NAME" \
  --pipeline.model.camera-optimizer.mode SO3xR3 \
  --pipeline.model.camera-velocity-optimizer.enabled True \
  nerfstudio-data --eval-mode all
