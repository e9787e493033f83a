#!/usr/bin/env python
"""Standalone evaluation — the `ns-eval` equivalent (SURVEY.md §2b):
loads a trained run's checkpoint and computes PSNR/SSIM/LPIPS over the eval
split, writing `{"results": {...}}` to --output-path (the metrics.json
contract consumed by parse_outputs.py; reference train.py:87-100).
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--load-config", required=True)
    ap.add_argument("--output-path", default="", help="default: <run_dir>/metrics.json")
    args = ap.parse_args(argv)

    from splat_tpu.utils.env import respect_jax_platforms_env

    respect_jax_platforms_env()
    from render_model import load_trainer_from_config

    config_path = Path(args.load_config)
    t0 = time.time()
    cfg, trainer = load_trainer_from_config(config_path)
    results = trainer.evaluate()
    out = {
        "experiment_name": cfg.experiment_name,
        "method_name": cfg.method_name,
        "checkpoint_step": trainer.step,
        "results": results,
        "eval_wall_clock_seconds": time.time() - t0,
    }
    out_path = Path(args.output_path) if args.output_path else config_path.parent / "metrics.json"
    # preserve an existing training wall clock if present
    if out_path.exists():
        try:
            prev = json.loads(out_path.read_text())
            if "wall_clock_time_seconds" in prev:
                out["wall_clock_time_seconds"] = prev["wall_clock_time_seconds"]
        except json.JSONDecodeError:
            pass
    out_path.write_text(json.dumps(out, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
