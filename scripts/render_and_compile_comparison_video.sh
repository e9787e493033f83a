#!/bin/bash
# Train baseline + compensated variants, render both along the same spline
# path, composite side-by-side — equivalent of the reference's comparison
# video scripts (SURVEY.md §2a last row).
set -e
cd "$(dirname "$0")/.."
PY=${PYTHON:-python}
DATA=$1; OUT=${2:-data/comparison}
[ -z "$DATA" ] && { echo "usage: $0 <scene_dir> [out_dir]"; exit 1; }

for VARIANT in baseline compensated; do
  if [ "$VARIANT" = baseline ]; then
    FLAGS="--pipeline.model.blur-samples 0 --pipeline.model.rolling-shutter-compensation False --pipeline.model.gamma 1.0"
  else
    FLAGS="--pipeline.model.blur-samples 5 --pipeline.model.rolling-shutter-compensation True --pipeline.model.camera-velocity-optimizer.enabled True"
  fi
  $PY cli/fit.py splatfacto --data "$DATA" --experiment-name "comparison/$VARIANT" \
    --output-dir "$OUT/runs" $FLAGS nerfstudio-data --eval-mode all
  CFG=$(ls "$OUT"/runs/comparison/$VARIANT/splatfacto/*/config.json | head -1)
  $PY cli/render_video.py "$OUT/$VARIANT" --load-config "$CFG" --data "$DATA" \
    --original_trajectory --playback_speed 0.25 --zoom 1.5
done

bash scripts/compile_comparison_video.sh "$OUT/baseline/frames" "$OUT/compensated/frames" "$OUT/comparison.mp4"
