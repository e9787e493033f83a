#!/bin/bash
# From a Spectacular Rec zip: process once (VIO + COLMAP + combine), then
# train baseline + compensated models and render a comparison video —
# equivalent of the reference's render_and_train_comparison_sai_custom.sh.
# (Do not SKIP_COLMAP: video alignment needs the COLMAP poses — reference
# note.) Both trainings happen inside render_and_compile_comparison_video.sh.
set -e
cd "$(dirname "$0")/.."
PY=${PYTHON:-python}
ZIP=$1
[ -z "$ZIP" ] && { echo "usage: $0 <recording.zip>"; exit 1; }
NAME=$(basename "$ZIP"); NAME=${NAME%.zip}

SCENE="data/inputs-processed/sai-custom-combined/$NAME"
[ -f "$SCENE/transforms.json" ] || $PY cli/process_sai_custom.py "$ZIP"

bash scripts/render_and_compile_comparison_video.sh "$SCENE" "data/comparison/$NAME"
echo "Success: see data/comparison/$NAME/comparison.mp4"
