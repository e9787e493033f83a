#!/bin/bash
# Plain-video quickstart — equivalent of the reference's
# scripts/process_and_train_video.sh: COLMAP over extracted frames, then train
# with zero-init velocity optimization (no VIO prior). ROLLING_SHUTTER=ON
# switches from motion-blur mode to rolling-shutter mode (reference :13).
set -e
cd "$(dirname "$0")/.."
PY=${PYTHON:-python}
VIDEO=$1; NAME=${2:-custom-video}
[ -z "$VIDEO" ] && { echo "usage: $0 <video> [name]"; exit 1; }

WORK=data/inputs-processed/video/$NAME
mkdir -p "$WORK/images"
# NUM_FRAMES is a TARGET (reference: ns-process-data video --num-frames-target
# 100): pick an every-Nth stride so about that many frames come out.
TOTAL=$(ffprobe -v error -count_packets -select_streams v:0 \
  -show_entries stream=nb_read_packets -of csv=p=0 "$VIDEO")
TARGET=${NUM_FRAMES:-100}
STRIDE=$(( (TOTAL + TARGET - 1) / TARGET )); [ "$STRIDE" -lt 1 ] && STRIDE=1
ffmpeg -y -loglevel error -i "$VIDEO" -vf "select=not(mod(n\,$STRIDE))" -vsync vfr "$WORK/images/frame_%05d.png"
$PY cli/run_colmap.py "$WORK"

if [ "${ROLLING_SHUTTER:-OFF}" = "ON" ]; then
  MODEFLAGS="--pipeline.model.blur-samples 0 --pipeline.model.rolling-shutter-compensation True --pipeline.model.gamma 1.0"
else
  MODEFLAGS="--pipeline.model.blur-samples 5 --pipeline.model.rolling-shutter-compensation False --pipeline.model.gamma 2.2 --pipeline.model.min-rgb-level 10"
fi

$PY cli/fit.py splatfacto --data "$WORK" \
  --experiment-name "video/$NAME" \
  --pipeline.model.camera-velocity-optimizer.enabled True \
  --pipeline.model.camera-velocity-optimizer.zero-initial-velocities True \
  $MODEFLAGS \
  nerfstudio-data --eval-mode all
