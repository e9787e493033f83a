#!/usr/bin/env python
"""The full 20-variant real-dataset matrix (SURVEY.md Appendix A) end-to-end
on a synthetic STAND-IN smartphone recording (VERDICT r3 missing #3).

This environment has no sai-cli/COLMAP binaries and no smartphone data, so
the recording is fabricated exactly like tests/test_pipelines.py's
smartphone-flow integration test: one synthetic scene provides the COLMAP
side (accurate poses, no velocities) and the VIO side (2x scene scale,
velocities + blur scores); the REAL pipeline then runs: combine.py (RMS-
radius velocity rescale + merge) -> train_eval_split_by_blur_score (sharpest
-of-8, eval_ prefixes) -> cli/train.py over ALL 20 variants of
`colmap-sai-cli-vels-blur-scored` (filename eval mode) -> parse_outputs.

Every variant must train and evaluate without error; the committed table is
benchmarks/standin_20variant_matrix.{csv,txt}.

Env knobs: ITERS (default 3000 = reference --draft), RES (64), FRAMES (33),
WORKERS (1), OUT (data/standin).
"""
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
os.chdir(ROOT)
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "cli"))

ITERS = int(os.environ.get("ITERS", "3000"))
RES = int(os.environ.get("RES", "64"))
FRAMES = int(os.environ.get("FRAMES", "33"))
OUT = Path(os.environ.get("OUT", "data/standin"))
DEADLINE = float(os.environ.get("DEADLINE_TS", "0"))

MODEL_FLAGS = [
    # capacity cap: at 48px the default densification schedule over-splits
    # (7k+ splats for a 400-gaussian GT scene, 3x step cost, no quality
    # gain); 2048 matches where the scene's alive count plateaus
    "--pipeline.model.initial-capacity", "1024",
    "--trainer.max-capacity", "2048",
    "--pipeline.model.sh-degree", "2",
    "--pipeline.model.tile-size", "8",
    "--pipeline.model.max-per-tile", "128",
    "--pipeline.model.max-tiles-per-gaussian", "16",
    "--pipeline.model.chunk", "16",
    "--trainer.sync-every", "100",
    "--steps-per-save", str(ITERS),
]


def fabricate(proc: Path, res: int | None = None, frames: int | None = None,
              n_gaussians: int = 400, shake_amp: float = 0.16,
              n_seed_points: int = 128,
              envelope_shape: str = "raised_cosine",
              exposure: float = 0.06, rolling_shutter: float = 0.01,
              n_blur_samples: int = 9) -> Path:
    import numpy as np

    import combine as combine_cli
    import train_eval_split_by_blur_score as split_cli
    from splat_tpu.data import synthetic

    res = RES if res is None else res
    frames = FRAMES if frames is None else frames
    rec = proc / "raw" / "rec0"
    if not (rec / "transforms.json").exists():
        # INTERMITTENT shake (round-5 protocol fix): the raised-cosine
        # envelope (period = 8 frames x 0.35 s) dips the shake to zero
        # amplitude AND zero rate once per 8-frame window, so each window
        # contains a near-sharp frame — the assumption of the reference's
        # blur-score eval split (train_eval_split_by_blur_score.py:27-47).
        # Round 4's CONTINUOUS shake blurred even the sharpest-of-8 eval
        # frames, which made fitting the blur beat compensating it
        # (benchmarks/README.md round-4 protocol finding). Amp 0.10 keeps
        # the mean blur comparable (the envelope halves the average); 0.16
        # puts peak train-frame blur at ~3 px (48px res) while eval frames
        # measure ~0.2 px — strong score discrimination per window.
        synthetic.generate_scene(
            rec, n_gaussians=n_gaussians, n_frames=frames, img_size=res,
            exposure=exposure, rolling_shutter=rolling_shutter,
            n_blur_samples=n_blur_samples, seed=9,
            trajectory="shake", shake_amp=shake_amp, shake_envelope_period=2.8,
            shake_envelope_shape=envelope_shape,
            eval_interval=10**6, n_seed_points=n_seed_points,
        )
    meta = json.loads((rec / "transforms.json").read_text())

    colmap_dir = proc / "colmap-sai-cli-imgs" / "rec0"
    if not colmap_dir.exists():
        colmap_dir.mkdir(parents=True)
        shutil.copytree(rec / "images", colmap_dir / "images")
        shutil.copy2(rec / "sparse_pc.ply", colmap_dir / "sparse_pc.ply")
        colmap_meta = json.loads(json.dumps(meta))
        for f in colmap_meta["frames"]:
            for k in ("camera_linear_velocity", "camera_angular_velocity",
                      "motion_blur_score"):
                f.pop(k)
        (colmap_dir / "transforms.json").write_text(json.dumps(colmap_meta))

    sai_dir = proc / "sai-cli" / "rec0"
    if not sai_dir.exists():
        (sai_dir / "images").mkdir(parents=True)
        sai_meta = json.loads(json.dumps(meta))
        for f in sai_meta["frames"]:
            m = np.array(f["transform_matrix"])
            m[:3, 3] *= 2.0
            f["transform_matrix"] = m.tolist()
            f["camera_linear_velocity"] = [
                2.0 * v for v in f["camera_linear_velocity"]
            ]
        (sai_dir / "transforms.json").write_text(json.dumps(sai_meta))

    vels_dir = proc / "colmap-sai-cli-vels" / "rec0"
    if not (vels_dir / "transforms.json").exists():
        combine_cli.main([
            str(colmap_dir), str(sai_dir), str(vels_dir),
            "--dataset", "sai-cli", "--processed-prefix", str(proc),
        ])
    bs_dir = proc / "colmap-sai-cli-vels-blur-scored" / "rec0"
    if not (bs_dir / "transforms.json").exists():
        split_cli.main([
            "colmap-sai-cli-vels", str(vels_dir),
            "--processed-prefix", str(proc), "--interval", "8",
        ])
    return bs_dir


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    # this box force-selects the remote TPU backend at interpreter start;
    # the env var alone is not enough — override in process so the scene
    # fabrication runs on host CPU and never contends with a TPU job
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
    proc = OUT / "proc"
    fabricate(proc)

    import train as train_cli

    variants = [
        train_cli.flags_to_variant_name_and_cmd(
            v, "colmap-sai-cli-vels-blur-scored", False)[0]
        for v in train_cli.variants_for_dataset("colmap-sai-cli-vels-blur-scored")
    ]
    assert len(variants) == 20, variants
    # Run the paper's flagship all-on combinations FIRST: these are the three
    # variants the round-4 session's deadline cut (VERDICT r4 missing #2), so
    # a truncated session must never lose them again. baseline runs next (it
    # anchors every margin), then the rest in matrix order.
    priority = [v for v in variants if "motion_blur" in v and "pose_opt" in v
                and "rolling_shutter" in v]
    variants = (priority + ["baseline"]
                + [v for v in variants if v not in priority and v != "baseline"])
    out_dir = OUT / "outputs"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    results = {}
    for name in variants:
        run_root = (out_dir / "colmap-sai-cli-vels-blur-scored" / name /
                    "rec0" / "splatfacto")
        if list(run_root.glob("*/metrics.json")):
            results[name] = "cached"
            continue
        if DEADLINE and time.time() > DEADLINE:
            results[name] = "skipped (deadline)"
            continue
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "cli/train.py",
             "--dataset", "colmap-sai-cli-vels-blur-scored",
             "--input-dir", str(proc), "--output-dir", str(out_dir),
             "--variants", name, "--iters", str(ITERS), "--no-render",
             "--", *MODEL_FLAGS],
            env=env,
        )
        results[name] = ("ok" if r.returncode == 0 else
                         f"FAILED rc={r.returncode}") + f" ({time.time()-t0:.0f}s)"
        print(f"=== {name}: {results[name]}", flush=True)
        Path("benchmarks").mkdir(exist_ok=True)
        Path("benchmarks/standin_20variant_progress.json").write_text(
            json.dumps(results, indent=2))
        # regenerate the table after EVERY run: a truncated session must
        # still commit the rows it completed (the round-5 regeneration lost
        # 10 finished runs to exactly this — results existed only in the
        # wiped data/ tree because the CSV was written after the full loop)
        subprocess.call([
            sys.executable, "cli/parse_outputs.py", "--input-dir",
            str(out_dir), "--csv", "benchmarks/standin_20variant_matrix.csv",
        ])
        with open("benchmarks/standin_20variant_matrix.txt", "w") as f:
            subprocess.call(
                [sys.executable, "cli/parse_outputs.py", "--input-dir",
                 str(out_dir), "--by-variant"], stdout=f)
    # Ordering gate. With the round-5 intermittent-shake protocol fix the
    # eval frames are genuinely near-sharp, so compensation must WIN, not
    # merely not-hurt: the default margin is positive. (The round-4
    # continuous-shake recording could only support a -0.5 dB sanity margin
    # — blurred eval GT rewards fitting the blur.) Reference-strength
    # 1.0 dB margins remain the full-scale synthetic TPU matrix's job; at
    # stand-in scale (48px, CPU) run noise is a few tenths of a dB.
    margin = os.environ.get("MARGIN", "0.25")
    zmargin = os.environ.get("ZERO_INIT_MARGIN", "0.0")
    rc = subprocess.call([
        sys.executable, "cli/check_benchmark_ordering.py",
        "--input-dir", str(out_dir), "--margin", margin,
        "--zero-init-margin", zmargin,
    ])
    print(f"ordering gate (margin {margin}, zero-init {zmargin}) rc={rc}",
          flush=True)
    n_ok = sum(1 for v in results.values() if v.startswith(("ok", "cached")))
    print(f"{n_ok}/20 variants trained+evaluated", flush=True)
    sys.exit(0 if n_ok == 20 else 2)


if __name__ == "__main__":
    main()
