#!/bin/bash
# From a plain video: extract frames + COLMAP once, then train baseline and
# deblurred (or RS-compensated with ROLLING_SHUTTER=ON) models and render a
# side-by-side comparison — equivalent of the reference's
# scripts/render_and_train_comparison_video.sh. The two trainings happen
# inside render_and_compile_comparison_video.sh (no duplicated runs).
set -e
cd "$(dirname "$0")/.."
PY=${PYTHON:-python}
VIDEO=$1; NAME=${2:-custom-video}
[ -z "$VIDEO" ] && { echo "usage: $0 <video> [name]"; exit 1; }

: "${ROLLING_SHUTTER:=OFF}"
export ROLLING_SHUTTER

WORK=data/inputs-processed/video/$NAME
if [ ! -f "$WORK/transforms.json" ]; then
  mkdir -p "$WORK/images"
  ffmpeg -y -loglevel error -i "$VIDEO" \
    -vf "select=not(mod(n\,$((${NUM_FRAMES:-100}))))" -vsync vfr \
    "$WORK/images/frame_%05d.png"
  $PY cli/run_colmap.py "$WORK"
fi

bash scripts/render_and_compile_comparison_video.sh "$WORK" "data/comparison/$NAME"
echo "Success: see data/comparison/$NAME/comparison.mp4"
