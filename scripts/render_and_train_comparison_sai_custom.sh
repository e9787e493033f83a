#!/bin/bash
# Train baseline + motion-blur-compensated models from a Spectacular Rec zip
# and render a comparison video — equivalent of the reference's
# scripts/render_and_train_comparison_sai_custom.sh. (Do not SKIP_COLMAP: the
# comparison video alignment needs the COLMAP poses, reference note.)
set -e
cd "$(dirname "$0")/.."
ZIP=$1
[ -z "$ZIP" ] && { echo "usage: $0 <recording.zip>"; exit 1; }
NAME=$(basename "$ZIP"); NAME=${NAME%.zip}

./scripts/process_and_train_sai_custom.sh "$ZIP"
bash scripts/render_and_compile_comparison_video.sh \
  "data/inputs-processed/custom/$NAME" "data/comparison/$NAME"
echo "Success: see data/comparison/$NAME/comparison.mp4"
