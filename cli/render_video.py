#!/usr/bin/env python
"""Demo-video generator — equivalent of the reference's `render_video.py`
(SURVEY.md §2a row 4, §3.3).

Builds a Kochanek-Bartels spline camera path from the scene's original
trajectory (or a synthetic orbit), adds finite-difference camera velocities +
exposure/readout times to the path JSON so the renderer re-renders WITH
simulated motion blur / rolling shutter, then renders the path in-process
(the `ns-render camera-path` equivalent) to PNG frames and, if ffmpeg exists,
an mp4.

Coordinate plumbing mirrors reference render_video.py:134-148: input poses are
mapped through applied_transform^-1 -> dataparser transform -> scale before
rendering with the trained model.
"""
import argparse
import json
import shutil
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_path_json(args, scene_meta, dataparser_tf):
    from splat_tpu.cameras import paths as pth

    frames = scene_meta["frames"]
    key_poses = np.array([f["transform_matrix"] for f in frames], dtype=np.float64)

    # original data frame -> model's internal frame:
    # applied_transform^-1 (if the converter recorded one), then the
    # dataparser transform + scale (render_video.py:134-148).
    applied = np.eye(4)
    applied[:3] = np.array(
        scene_meta.get("applied_transform", np.eye(4)[:3].tolist()), dtype=np.float64
    )
    t4 = np.eye(4)
    t4[:3] = np.array(dataparser_tf["transform"], dtype=np.float64)
    scale = float(dataparser_tf["scale"])

    def to_internal(pose):
        p = t4 @ np.linalg.inv(applied) @ pose
        p[:3, 3] *= scale
        return p

    key_internal = np.stack([to_internal(p) for p in key_poses])

    if args.original_trajectory:
        spline = pth.PoseSpline(key_internal)
        n_key = len(key_internal)
    else:  # synthetic orbit around the scene center
        center = key_internal[:, :3, 3].mean(axis=0)
        radius = np.linalg.norm(key_internal[:, :3, 3] - center, axis=1).mean() * args.zoom
        ang = np.linspace(0, 2 * np.pi, 13)
        orbit = np.stack([
            pth.look_at(center + radius * np.array([np.cos(a), np.sin(a), 0.4]), center)
            for a in ang
        ])
        spline = pth.PoseSpline(orbit)
        n_key = len(orbit)

    n_frames = int(args.seconds * args.fps)
    us = np.linspace(0, n_key - 1, n_frames)
    # path-parameter speed (du per second), scaled by playback_speed
    du_per_s = (n_key - 1) / args.seconds * args.playback_speed

    exposure = float(scene_meta.get("exposure_time", 0.0)) * args.blur_scale
    rs_time = float(scene_meta.get("rolling_shutter_time", 0.0))

    cam_path = []
    for u in us:
        pose = spline(u)[0]
        v_cam, w_cam = pth.path_velocities_gl(spline, float(u), time_scale=du_per_s)
        cam_path.append(
            {
                "camera_to_world": pose.reshape(-1).tolist(),
                "fov": args.fov,
                "aspect": 1.0,
                "camera_linear_velocity": v_cam.tolist(),
                "camera_angular_velocity": np.asarray(w_cam).tolist(),
            }
        )
    return {
        "render_width": args.width or int(scene_meta["w"]),
        "render_height": args.height or int(scene_meta["h"]),
        "fps": args.fps,
        "seconds": args.seconds,
        "exposure_time": exposure,
        "rolling_shutter_time": rs_time,
        "camera_path": cam_path,
    }


def render_path(config_path: Path, path_json: dict, out_dir: Path, args):
    """ns-render camera-path equivalent: honors per-frame velocities +
    exposure/readout to simulate blur/RS (the fork's extension, SURVEY.md §2b)."""
    import jax.numpy as jnp

    from render_model import load_trainer_from_config
    from splat_tpu.cameras.cameras import Cameras
    from splat_tpu.models import splatfacto as sf
    from PIL import Image

    cfg, trainer = load_trainer_from_config(config_path)
    mcfg = cfg.model
    import dataclasses

    # simulate blur/RS from the path velocities (independent of train flags)
    mcfg = dataclasses.replace(
        mcfg, blur_samples=max(mcfg.blur_samples, 5) if path_json["exposure_time"] > 0 else 0,
        rolling_shutter_compensation=True,
    )
    w, h = path_json["render_width"], path_json["render_height"]
    fl = 0.5 * h / np.tan(0.5 * np.radians(args.fov))
    bg = sf.background_color(trainer.params, mcfg)
    sh_deg = int(sf.active_sh_degree(mcfg, trainer.step))
    out_dir.mkdir(parents=True, exist_ok=True)

    for i, frame in enumerate(path_json["camera_path"]):
        c2w_gl = jnp.asarray(
            np.array(frame["camera_to_world"], dtype=np.float64).reshape(4, 4)[None],
            jnp.float32,
        )
        R_cv, p = Cameras.gl_to_cv_c2w(c2w_gl)
        cam = Cameras(
            R_cv, p,
            fx=jnp.full((1,), fl), fy=jnp.full((1,), fl),
            cx=jnp.full((1,), w / 2.0), cy=jnp.full((1,), h / 2.0),
            width=w, height=h,
            lin_vel=Cameras.vel_gl_to_cv(
                jnp.asarray([frame["camera_linear_velocity"]], jnp.float32)),
            ang_vel=Cameras.vel_gl_to_cv(
                jnp.asarray([frame["camera_angular_velocity"]], jnp.float32)),
            exposure_time=jnp.full((1,), path_json["exposure_time"]),
            rolling_shutter_time=jnp.full((1,), path_json["rolling_shutter_time"]),
            cam_idx=jnp.zeros((1,), jnp.int32),
        )
        # path cameras are novel views: no per-camera optimizer routing
        import jax

        params = trainer.params._replace(camera_opt={}, velocity_opt={})
        out = sf.render_camera(params, cam, mcfg, sh_deg, bg)
        img = np.clip(np.asarray(sf.gamma_encode(out.rgb, mcfg)), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(out_dir / f"{i:05d}.png")
        if i % 10 == 0:
            print(f"frame {i}/{len(path_json['camera_path'])}", flush=True)

    if shutil.which("ffmpeg"):
        subprocess.check_call([
            "ffmpeg", "-y", "-loglevel", "error", "-framerate", str(path_json["fps"]),
            "-i", str(out_dir / "%05d.png"), "-pix_fmt", "yuv420p",
            str(out_dir.parent / f"{out_dir.name}.mp4"),
        ])
        print(f"wrote {out_dir.parent / (out_dir.name + '.mp4')}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out_folder")
    ap.add_argument("--load-config", required=True, help="trained run config.json")
    ap.add_argument("--data", default="", help="scene dir (default: from config)")
    ap.add_argument("--original_trajectory", action="store_true")
    ap.add_argument("--zoom", type=float, default=1.5)
    ap.add_argument("--playback_speed", type=float, default=1.0)
    ap.add_argument("--blur_scale", type=float, default=1.0)
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--fov", type=float, default=60.0)
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args(argv)

    from splat_tpu.utils.env import respect_jax_platforms_env

    respect_jax_platforms_env()

    config_path = Path(args.load_config)
    cfg_raw = json.loads(config_path.read_text())
    data_dir = Path(args.data or cfg_raw["data"])
    scene_meta = json.loads((data_dir / "transforms.json").read_text())
    dataparser_tf = json.loads(
        (config_path.parent / "dataparser_transforms.json").read_text()
    )

    path_json = build_path_json(args, scene_meta, dataparser_tf)
    out_dir = Path(args.out_folder)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "demo_video_camera_path.json").write_text(json.dumps(path_json, indent=2))
    print(f"wrote camera path ({len(path_json['camera_path'])} frames)")
    if args.dry_run:
        return
    render_path(config_path, path_json, out_dir / "frames", args)


if __name__ == "__main__":
    main()
