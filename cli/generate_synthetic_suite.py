#!/usr/bin/env python
"""Generate the committed synthetic benchmark suite (reference data contract).

The reference's synthetic benchmark re-renders Deblur-NeRF scenes
(cozyroom/factory/pool/tanabata/trolley) into clear/mb/rs/mbrs variants
(/root/reference/process_synthetic_inputs.py:414-465); the raw renders are a
Zenodo artifact this environment cannot download. This script generates the
same *dataset shapes* from the deterministic fixture generator
(splat_tpu/data/synthetic.py): ground-truth images integrated over the true
camera trajectory (real motion blur + rolling shutter, not the first-order
model the trainer uses), GT camera-frame velocities, every-8th sharp eval
frames, sparse_pc.ply seed clouds — at benchmark resolution.

Output tree matches cli/train.py's session discovery:
  INPUT_DIR/synthetic-{clear,mb,rs,mbrs}/{scene}/transforms.json

Usage:
  python cli/generate_synthetic_suite.py --input-dir data/inputs \
      --resolution 512 --scenes 2 [--variants mb,rs]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (exposure, rolling_shutter) per variant — mirrors the reference's synthetic
# matrix semantics: mb = exposure blur only, rs = readout skew only, mbrs =
# both (process_synthetic_inputs.py raw_clear/raw_mb/raw_rs/raw_mbrs)
VARIANTS = {
    "clear": (0.0, 0.0),
    "mb": (0.12, 0.0),
    "rs": (0.0, 0.03),
    "mbrs": (0.12, 0.03),
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input-dir", default="data/inputs")
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--scenes", type=int, default=2, help="scenes per variant")
    ap.add_argument("--n-gaussians", type=int, default=1500)
    ap.add_argument("--n-frames", type=int, default=33)
    ap.add_argument("--blur-gt-samples", type=int, default=9)
    ap.add_argument("--variants", default="mb,rs",
                    help="comma list from clear,mb,rs,mbrs")
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args(argv)

    from splat_tpu.data import synthetic
    from splat_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    for variant in args.variants.split(","):
        exposure, rs = VARIANTS[variant.strip()]
        for si in range(args.scenes):
            out = Path(args.input_dir) / f"synthetic-{variant}" / f"scene{si}"
            if (out / "transforms.json").exists():
                print(f"skip {out} (exists)", flush=True)
                continue
            print(f"generate {out}  ({args.resolution}px, exp={exposure}, "
                  f"rs={rs}, seed={1000 + si})", flush=True)
            if args.dry_run:
                continue
            t0 = time.time()
            synthetic.generate_scene(
                out,
                n_gaussians=args.n_gaussians,
                n_frames=args.n_frames,
                img_size=args.resolution,
                exposure=exposure,
                rolling_shutter=rs,
                n_blur_samples=args.blur_gt_samples,
                gamma=2.2,
                seed=1000 + si,
                eval_interval=8,
                n_seed_points=args.n_gaussians,
            )
            print(f"  done in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
