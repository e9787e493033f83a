#!/bin/bash
# Process and train a custom Spectacular Rec recording — equivalent of the
# reference's scripts/process_and_train_sai_custom.sh: unzip -> sai-cli VIO ->
# (optional) COLMAP + combine -> train with MB compensation on all frames.
#
#   ./scripts/process_and_train_sai_custom.sh /PATH/TO/RECORDING.zip
#
# SKIP_COLMAP=ON trains from the VIO poses directly (reference env switch;
# the comparison-video flow needs COLMAP poses for alignment).
set -e
cd "$(dirname "$0")/.."
PY=${PYTHON:-python}
ZIP=$1
[ -z "$ZIP" ] && { echo "usage: $0 <recording.zip>"; exit 1; }
NAME=$(basename "$ZIP"); NAME=${NAME%.zip}

: "${SKIP_COLMAP:=OFF}"
if [ "$SKIP_COLMAP" = "ON" ]; then
  $PY cli/process_sai_custom.py "$ZIP" --skip_colmap
  SCENE="data/inputs-processed/sai-custom/$NAME"
else
  $PY cli/process_sai_custom.py "$ZIP"
  SCENE="data/inputs-processed/sai-custom-combined/$NAME"
fi

# Flagship compensated model (MB + RS + pose/velocity optimization), all
# frames used for training (reference: train.py --train_all --no_eval).
$PY cli/fit.py splatfacto --data "$SCENE" \
  --output-dir data/outputs --experiment-name "custom/pose_opt-motion_blur-rolling_shutter-velocity_opt/$NAME" \
  --pipeline.model.camera-optimizer.mode SO3xR3 \
  --pipeline.model.camera-velocity-optimizer.enabled True \
  nerfstudio-data --eval-mode all
