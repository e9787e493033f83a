#!/usr/bin/env bash
# Full-length (20k-iteration) training run — the reference's training length
# (train.py:129-132) on the heaviest benchmark scene, best variant. Produces:
#   data/bench/outputs_full/...           run dir (checkpoints, metrics)
#   benchmarks/full_length_metrics.json   final metrics + timing split
#   benchmarks/full_length_trajectory.jsonl  loss/eval-PSNR trajectory
#   benchmarks/full_length_renders/       converged eval renders (pred/gt)
# Env knobs: SCENE (scene2), VARIANT (motion_blur), ITERS (20000)
set -e
cd "$(dirname "$0")/.."
SCENE=${SCENE:-scene2}
VARIANT=${VARIANT:-motion_blur}
ITERS=${ITERS:-20000}
OUT=${OUT:-data/bench/outputs_full}
EXTRA=(--trainer.scan-steps 25 --trainer.sync-every 50
       --pipeline.model.initial-capacity 16384
       --trainer.max-capacity 32768
       --pipeline.model.max-tiles-per-gaussian 16
       --steps-per-eval 2000)

python cli/train.py --dataset synthetic-mb \
    --input-dir data/bench/inputs --output-dir "$OUT" \
    --variants "$VARIANT" \
    --case "$(python - <<EOF
# case index of (SCENE, VARIANT) with 1 variant: scenes sorted -> scene idx+1
import sys
print({"scene0":1,"scene1":2,"scene2":3}["$SCENE"])
EOF
)" \
    --iters "$ITERS" --no-render -- "${EXTRA[@]}"

RUN=$(ls -d "$OUT"/synthetic-mb/"$VARIANT"/"$SCENE"/splatfacto/*/ | tail -1)
mkdir -p benchmarks/full_length_renders
cp "$RUN/metrics.json" benchmarks/full_length_metrics.json
cp "$RUN/metrics_train.jsonl" benchmarks/full_length_trajectory.jsonl
python cli/render_model.py --load-config "$RUN/config.json" \
    --output-dir benchmarks/full_length_renders
echo "full-length run artifacts in benchmarks/"
