"""Trace REAL training steps (trainer path: render + loss + optimizer +
densify stats) on a generated scene — finds non-rasterizer bottlenecks the
bench hot-loop can't see (SSIM conv, Adam, refine bookkeeping).

Usage: python scripts_dev/trace_train.py [out_dir] [IMG=512] [STEPS=8]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

IMG = int(os.environ.get("IMG", 512))
STEPS = int(os.environ.get("STEPS", 8))
SCENE = os.environ.get("SCENE", f"/tmp/trace_train_scene_{IMG}")

from splat_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

if not Path(SCENE, "transforms.json").exists():
    from splat_tpu.data.synthetic import generate_scene

    generate_scene(SCENE, n_gaussians=800, n_frames=12, img_size=IMG,
                   exposure=0.12, rolling_shutter=0.03, seed=7)

import dataclasses

import jax

from splat_tpu.data import dataparser as dp
from splat_tpu.engine import config as cfg_mod
from splat_tpu.engine import trainer as tr
from splat_tpu.utils.profiling import jax_trace

cfg = cfg_mod.RunConfig()
scene = dp.parse_scene(SCENE, cfg.dataparser)
tc = dataclasses.replace(cfg.trainer, max_steps=10_000, scan_steps=STEPS)
trainer = tr.Trainer(scene, cfg.model, tc, output_dir=None)

trainer.run(STEPS)  # compile + warm
t0 = time.time()
trainer.run(STEPS)
warm = (time.time() - t0) / STEPS

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_train"
with jax_trace(out_dir):
    t0 = time.time()
    trainer.run(STEPS)
    dt = (time.time() - t0) / STEPS
print(f"train step: {dt*1e3:.2f} ms (warm {warm*1e3:.2f}) at {IMG}px, "
      f"blur={cfg.model.blur_samples} -> trace in {out_dir}")
