#!/usr/bin/env bash
# Draft benchmark matrix on the current backend (the real TPU by default):
# generate the synthetic suite, run the reference's synthetic-mb 8-variant
# matrix (Appendix A) + an RS-compensation subset + the corrupted-prior
# velnoise rows (velocity_opt must WIN there), aggregate the table, and
# assert the paper's variant ordering at the full 1.0 dB margin. Mirrors the
# reference workflow `process_synthetic_inputs.py && train.py
# --dataset=synthetic-mb --draft && parse_outputs.py` (reference
# train.py:246-311, parse_outputs.py:58).
#
# Env knobs: RES (default 512), SCENES (3), OUT (data/bench), MARGIN (1.0)
set -e
cd "$(dirname "$0")/.."
RES=${RES:-512}
SCENES=${SCENES:-3}
OUT=${OUT:-data/bench}
MARGIN=${MARGIN:-1.0}
# capacity pinned to one doubling: growth-by-doubling from the 512-seed auto
# capacity would recompile the step/scan graphs ~6x per variant on this box's
# minutes-per-compile remote-compile tunnel. max-tiles-per-gaussian 16 keeps
# the intersect-sort at capacity*16 entries (the 64 default made
# padded-capacity sorts the step's dominant cost: 171 ms/step at 32k x 64).
EXTRA=(--trainer.scan-steps 25 --trainer.sync-every 50
       --pipeline.model.initial-capacity 8192
       --trainer.max-capacity 16384
       --pipeline.model.max-tiles-per-gaussian 16)

mkdir -p benchmarks "$OUT"
python cli/generate_synthetic_suite.py \
    --input-dir "$OUT/inputs" --resolution "$RES" --scenes "$SCENES" \
    --variants mb,rs --derive-velnoise --jerk-scene

# full 8-variant matrix on motion-blur data
python cli/train.py --dataset synthetic-mb \
    --input-dir "$OUT/inputs" --output-dir "$OUT/outputs" \
    --draft --no-render -- "${EXTRA[@]}"

# rolling-shutter compensation subset on RS data
python cli/train.py --dataset synthetic-rs \
    --input-dir "$OUT/inputs" --output-dir "$OUT/outputs" \
    --variants baseline,rolling_shutter,rolling_shutter-velocity_opt,rolling_shutter-velocity_opt-zero_init \
    --draft --no-render -- "${EXTRA[@]}"

# corrupted-velocity-prior rows (scene0): the prior is wrong by construction,
# so velocity optimization must beat the fixed-prior parent (VERDICT r2 #6)
for case in 1 2 3 4; do
python cli/train.py --dataset synthetic-mb-velnoise \
    --input-dir "$OUT/inputs" --output-dir "$OUT/outputs" \
    --variants baseline,motion_blur,motion_blur-velocity_opt,motion_blur-velocity_opt-zero_init \
    --case "$case" --draft --no-render -- "${EXTRA[@]}"
done

python cli/parse_outputs.py --input-dir "$OUT/outputs" --csv benchmarks/synthetic_matrix.csv
python cli/parse_outputs.py --input-dir "$OUT/outputs" --by-variant | tee benchmarks/synthetic_matrix.txt
python cli/check_benchmark_ordering.py --input-dir "$OUT/outputs" --margin "$MARGIN"
