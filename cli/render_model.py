#!/usr/bin/env python
"""Eval-image renderer — equivalent of the reference's `render_model.py`
(SURVEY.md §2a row 3): loads a trained checkpoint and renders the eval (or
train) split to PNGs: `{i:05d}_pred.png` / `{i:05d}_gt.png`, colorized +
raw depth. Per-camera optimizer corrections are routed by camera index
(reference render_model.py:212-217 `camera.metadata['cam_idx']`).
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def colorize_depth(depth: np.ndarray, alpha: np.ndarray | None = None) -> np.ndarray:
    """Turbo-style colormap over normalized depth (utils/colormaps equivalent)."""
    import matplotlib.cm as cm

    valid = np.isfinite(depth)
    if alpha is not None:
        valid &= alpha > 0.05
    if valid.sum() == 0:
        return np.zeros(depth.shape + (3,), np.uint8)
    lo, hi = np.percentile(depth[valid], [2, 98])
    norm = np.clip((depth - lo) / max(hi - lo, 1e-9), 0, 1)
    rgba = cm.turbo(norm)
    return (rgba[..., :3] * 255).astype(np.uint8)


def depth_to_normals(
    depth: np.ndarray, fx: float, fy: float, cx: float, cy: float
) -> np.ndarray:
    """Camera-space surface normals from the rendered depth map.

    Unprojects each pixel to a 3D point and takes the cross product of the
    image-space point derivatives — the normals output of the reference's
    render_model (`render_model.py:135-146` saves pred normals when the model
    provides them; splat depth is the model's geometric output here).
    Returns (H, W, 3) in [0, 1] (n/2 + 0.5 encoding, OpenCV camera axes)."""
    h, w = depth.shape
    u = np.arange(w, dtype=np.float32)[None, :]
    v = np.arange(h, dtype=np.float32)[:, None]
    x = (u - cx) / fx * depth
    y = (v - cy) / fy * depth
    pts = np.stack([x, y, depth], axis=-1)
    du = np.gradient(pts, axis=1)
    dv = np.gradient(pts, axis=0)
    n = np.cross(du, dv)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.maximum(norm, 1e-9)
    # orient toward the camera (-z half-space in OpenCV convention)
    flip = (n[..., 2:3] > 0)
    n = np.where(flip, -n, n)
    return n * 0.5 + 0.5


def load_trainer_from_config(config_path: Path):
    """eval_setup equivalent: config.json -> (cfg, trainer-with-checkpoint)."""
    from splat_tpu.data import dataparser as dp
    from splat_tpu.engine import config as cfg_mod
    from splat_tpu.engine import trainer as tr

    cfg = cfg_mod.load_config(config_path)
    scene = dp.parse_scene(cfg.data, cfg.dataparser)
    trainer = tr.Trainer(scene, cfg.model, cfg.trainer)
    ckpts = sorted(
        (config_path.parent / "checkpoints").glob("step_*"),
        key=lambda p: int(p.name.split("_")[1]),
    )
    if ckpts:
        trainer.load_checkpoint(ckpts[-1])
    return cfg, trainer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--load-config", required=True)
    ap.add_argument("--split", default="eval", choices=["eval", "train"])
    ap.add_argument("--output-dir", default="", help="default: <run_dir>/renders/<split>")
    ap.add_argument("--no-depth", action="store_true")
    ap.add_argument(
        "--normals", action="store_true",
        help="also save depth-derived camera-space normal maps "
             "(reference render_model.py:135-146)",
    )
    args = ap.parse_args(argv)

    from splat_tpu.utils.env import respect_jax_platforms_env

    respect_jax_platforms_env()

    from PIL import Image

    from splat_tpu.models import splatfacto as sf

    config_path = Path(args.load_config)
    cfg, trainer = load_trainer_from_config(config_path)
    out_dir = (
        Path(args.output_dir)
        if args.output_dir
        else config_path.parent / "renders" / args.split
    )
    out_dir.mkdir(parents=True, exist_ok=True)

    import functools

    import jax

    cams = trainer.eval_cams if args.split == "eval" else trainer.train_cams
    images = trainer.eval_images if args.split == "eval" else trainer.train_images
    mcfg = cfg.model
    sh_deg = int(sf.active_sh_degree(mcfg, trainer.step))

    @functools.partial(jax.jit, static_argnames=("is_eval",))
    def render(params, cam, is_eval):
        bg = sf.background_color(params, mcfg)
        return sf.render_camera(params, cam, mcfg, sh_deg, bg, is_eval_camera=is_eval)

    for i in range(len(cams)):
        cam = cams[i]
        out = render(trainer.params, cam, args.split == "eval")
        pred = np.clip(np.asarray(sf.gamma_encode(out.rgb, mcfg)), 0, 1)
        gt = images.images[i]
        Image.fromarray((pred * 255).astype(np.uint8)).save(out_dir / f"{i:05d}_pred.png")
        Image.fromarray((gt * 255).astype(np.uint8)).save(out_dir / f"{i:05d}_gt.png")
        if not args.no_depth:
            depth = np.asarray(out.depth)
            alpha = np.asarray(out.alpha)
            np.save(out_dir / f"{i:05d}_depth.npy", depth)
            Image.fromarray(colorize_depth(depth, alpha)).save(
                out_dir / f"{i:05d}_depth.png"
            )
        if args.normals:
            depth = np.asarray(out.depth)
            nrm = depth_to_normals(
                depth, float(cam.fx[0]), float(cam.fy[0]),
                float(cam.cx[0]), float(cam.cy[0]),
            )
            Image.fromarray((nrm * 255).astype(np.uint8)).save(
                out_dir / f"{i:05d}_normal.png"
            )
    print(f"rendered {len(cams)} {args.split} views -> {out_dir}")


if __name__ == "__main__":
    main()
