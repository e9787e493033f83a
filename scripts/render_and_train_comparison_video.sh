#!/bin/bash
# Train deblurred (or RS-compensated with ROLLING_SHUTTER=ON) + baseline
# models from a plain video and render a side-by-side comparison — equivalent
# of the reference's scripts/render_and_train_comparison_video.sh.
set -e
cd "$(dirname "$0")/.."
VIDEO=$1; NAME=${2:-custom-video}
[ -z "$VIDEO" ] && { echo "usage: $0 <video> [name]"; exit 1; }

: "${ROLLING_SHUTTER:=OFF}"
export ROLLING_SHUTTER
if [ "$ROLLING_SHUTTER" = "ON" ]; then export OURS_NAME="Compensated"; else export OURS_NAME="Deblurred"; fi

echo "===== processing video + training compensated and baseline models ====="
./scripts/process_and_train_video.sh "$VIDEO" "$NAME"
bash scripts/render_and_compile_comparison_video.sh \
  "data/inputs-processed/video/$NAME" "data/comparison/$NAME"
echo "Success: see data/comparison/$NAME/comparison.mp4"
