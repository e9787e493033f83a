#!/usr/bin/env python
"""Restore the still-valid round-4 full-length rows into the (wiped) output
tree so the resumable matrix runner treats them as cached.

Why this is legitimate: the gitignored data/ tree is wiped between sessions,
but `benchmarks/full_length_matrix.csv` (commit eba7749) holds the round-4
MEASURED 20k-iteration results. The round-5 suite recalibration changed ONLY
scene0 (shake 0.05 -> 0.095 rad) and scene_tex (moved to diagnostics); the
scene1/scene2 generation path is bit-identical (trajectory params unchanged
in cli/generate_synthetic_suite.py; the synthetic.py envelope additions
default OFF and the motion_blur_score change does not feed interval-eval
training). Training is deterministic on this stack (bit-identical loss
trajectories across reruns, BASELINE.md warm-start section), so re-running
those rows would reproduce the same numbers at ~10 min of TPU each.

Restored rows therefore ARE the committed round-4 measurements — each
metrics.json carries a `restored_from` provenance field, and the runner's
progress log shows them as "cached" rather than fresh "ok" runs. Rows whose
inputs changed (scene0, velnoise-scene0, scene_tex, synthetic-clear/scene0)
are NOT restored and must re-run.
"""
import csv
import io
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

R4_COMMIT = "eba7749"
R4_CSV = "benchmarks/full_length_matrix.csv"

# (dataset, variant, session) rows whose inputs are bit-identical post-
# recalibration. Everything scene0-derived or scene_tex is excluded.
KEEP = set()
for scene in ("scene1", "scene2"):
    for variant in ("baseline", "motion_blur", "motion_blur-pose_opt-velocity_opt"):
        KEEP.add(("synthetic-mb", variant, scene))
    for variant in ("baseline", "rolling_shutter", "rolling_shutter-velocity_opt"):
        KEEP.add(("synthetic-rs", variant, scene))


# Round-5 fresh rows (measured at the CURRENT recalibrated suite, committed
# at HEAD) — restored from HEAD's CSV with the same legitimacy argument: the
# suite generator now produces the recalibrated scene0 by default, and
# training is deterministic, so re-running would reproduce these at ~90 min
# of TPU.
KEEP_R5 = {
    ("synthetic-mb", "baseline", "scene0"),
    ("synthetic-mb", "motion_blur", "scene0"),
    ("synthetic-mb", "motion_blur-pose_opt-velocity_opt", "scene0"),
    ("synthetic-mb-velnoise", "motion_blur", "scene0"),
    ("synthetic-mb-velnoise", "motion_blur-velocity_opt", "scene0"),
}


def _restore(blob: str, keep: set, tag: str, provenance: str,
             out_root: str) -> int:
    restored = 0
    for row in csv.DictReader(io.StringIO(blob)):
        key = (row["dataset"], row["variant"], row["session"])
        if key not in keep:
            continue
        run_dir = (ROOT / out_root / row["dataset"] / row["variant"] /
                   row["session"] / "splatfacto" / tag)
        if (run_dir / "metrics.json").exists():
            continue
        run_dir.mkdir(parents=True, exist_ok=True)
        metrics = {
            "experiment_name": f"{row['dataset']}/{row['variant']}/{row['session']}",
            "method_name": "splatfacto",
            "results": {
                "psnr": float(row["psnr"]),
                "ssim": float(row["ssim"]),
                "lpips": None,
            },
            "wall_clock_time_seconds": float(row["wall_time"]),
            "compile_time_seconds": float(row["compile_time"]),
            "train_time_seconds": float(row["time"]),
            "restored_from": provenance,
        }
        (run_dir / "metrics.json").write_text(json.dumps(metrics, indent=2))
        restored += 1
    return restored


def main(out_root: str = "data/bench/outputs_full20k") -> int:
    blob4 = subprocess.check_output(
        ["git", "-C", str(ROOT), "show", f"{R4_COMMIT}:{R4_CSV}"], text=True
    )
    n4 = _restore(
        blob4, KEEP, "round4-restored",
        f"benchmarks/full_length_matrix.csv @ {R4_COMMIT} (round-4 "
        "measured 20k run; inputs bit-identical after the round-5 "
        "scene0/scene_tex recalibration — see scripts/"
        "restore_round4_rows.py docstring)",
        out_root,
    )
    blob5 = subprocess.check_output(
        ["git", "-C", str(ROOT), "show", f"HEAD:{R4_CSV}"], text=True
    )
    n5 = _restore(
        blob5, KEEP_R5, "round5-restored",
        "benchmarks/full_length_matrix.csv @ HEAD (round-5 measured 20k run "
        "at the recalibrated suite; the generator produces these inputs "
        "bit-identically — see scripts/restore_round4_rows.py docstring)",
        out_root,
    )
    print(f"restored {n4} round-4 + {n5} round-5 rows into {out_root}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
