#!/usr/bin/env python
"""Synthetic-data converter — equivalent of the reference's
`process_synthetic_inputs.py` (SURVEY.md §2a row 5, §3.5).

Converts raw re-rendered Deblur-NeRF scenes (subfolders raw_clear / raw_rs /
raw_mb / raw_mbrs; each holds a raw transforms.json with `fov` (radians),
per-frame `filename`, `transform_matrix`, `blurcount`, `blur_matrices`) into
the benchmark contract (SURVEY.md §6b):
  * pose scale normalized from the first pose's rotation-column norm;
  * fl = w / 2 / tan(fov/2); cx=w/2 cy=h/2; orientation_override "none";
  * GT camera-frame velocities from the FIRST/LAST blur pose over the window
    (exposure + rolling_shutter), rotated into the (GL) camera frame
    (reference :157-165); sharp frames (blurcount 0) get zero velocity;
  * optional deterministic pose noise via the same LCG PRNG (same machine-
    independent sequence, reference :26-42). NOTE: the reference's position
    noise is a no-op (its `pose[:3,3] + noise` result is discarded,
    reference :188) — we reproduce the OBSERVED dataset behavior: orientation
    noise only;
  * optional fixed intrinsics noise (+1%/-1% on fl_x/fl_y, reference :105-111);
  * SIFT + two-view triangulation seed cloud over the training split
    (every-8th-frame eval excluded; eval frames must have zero velocity).

Emits the same 8 dataset variants when run without --single.
"""
import argparse
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

POSE_POSITION_NOISE_REL = 0.05
POSE_ORIENTATION_NOISE_DEG = 1.0
INTRINSIC_NOISE_REL = 0.01


def lcg_uniform(seed: int = 1000):
    """Machine-independent LCG (minstd), mapped to [0,1) in 999 steps —
    bit-identical to the reference's generator (reference :26-42)."""
    a, c, m = 48271, 0, 2147483647
    x = seed + 1
    steps = 999
    while True:
        x = (a * x + c) % m
        yield float(x % steps) / steps


def rotvec_to_matrix(v: np.ndarray) -> np.ndarray:
    from scipy.spatial.transform import Rotation

    return Rotation.from_rotvec(v).as_matrix()


def process_scene(raw_dir: Path, out_dir: Path, noisy_poses=False, noisy_intrinsics=False):
    import cv2

    meta = json.loads((raw_dir / "transforms.json").read_text())
    w, h = meta["w"], meta["h"]
    exposure = meta["exposure_time"]
    rs_time = meta["rolling_shutter_time"]
    fl = w / 2 / np.tan(meta["fov"] / 2)

    if out_dir.exists():
        shutil.rmtree(out_dir)
    (out_dir / "images").mkdir(parents=True)

    fx_scale = 1 + INTRINSIC_NOISE_REL if noisy_intrinsics else 1.0
    fy_scale = 1 - INTRINSIC_NOISE_REL if noisy_intrinsics else 1.0

    out_meta = {
        "aabb_scale": 16,
        "w": w, "h": h, "cx": w / 2, "cy": h / 2,
        "orientation_override": "none",
        "exposure_time": exposure,
        "rolling_shutter_time": rs_time,
        "fl_x": fl * fx_scale, "fl_y": fl * fy_scale,
        "k1": 0, "k2": 0, "p1": 0, "p2": 0,
        "frames": [],
    }

    scaling = None
    positions = []
    for fd in meta["frames"]:
        pose = np.array(fd["transform_matrix"], dtype=np.float64)
        if scaling is None:
            # normalize away any uniform scale baked into the raw poses
            scaling = 1.0 / np.sqrt((pose[:3, :3].T @ pose[:3, :3])[0, 0])
        pose[:3, :] *= scaling
        positions.append(pose[:3, 3].copy())

        name = Path(fd["filename"]).name
        img = cv2.imread(str(raw_dir / fd["filename"]))
        cv2.imwrite(str(out_dir / "images" / name), img)

        if fd.get("blurcount", 0) == 0:
            v_cam = np.zeros(3)
            w_cam = np.zeros(3)
        else:
            blur = [np.array(m, dtype=np.float64) for m in fd["blur_matrices"]]
            for b in blur:
                b[:3, :] *= scaling
            window = exposure + rs_time
            v_world = (blur[-1][:3, 3] - blur[0][:3, 3]) / window
            from scipy.spatial.transform import Rotation

            rot = blur[-1][:3, :3] @ blur[0][:3, :3].T
            w_world = Rotation.from_matrix(rot).as_rotvec() / window
            R_w2c = pose[:3, :3].T
            v_cam = R_w2c @ v_world
            w_cam = R_w2c @ w_world

        out_meta["frames"].append({
            "camera_linear_velocity": v_cam.tolist(),
            "camera_angular_velocity": w_cam.tolist(),
            "file_path": f"./images/{name}",
            "transform_matrix": pose.tolist(),
        })

    if noisy_poses:
        rand = lcg_uniform()
        rand3 = lambda: np.array([next(rand) for _ in range(3)]) * 2 - 1
        centers = np.asarray(positions)
        scene_scale = np.max(np.linalg.norm(centers - centers.mean(axis=0), axis=1))
        _pos_scale = POSE_POSITION_NOISE_REL * scene_scale  # reference no-op, kept for sequence parity
        for f in out_meta["frames"]:
            pose = np.array(f["transform_matrix"])
            _unused = rand3() * _pos_scale  # consume the same LCG draws as the reference
            ang = 0.0
            while ang < 1e-6:
                rv = rand3() * POSE_ORIENTATION_NOISE_DEG / 180.0 * np.pi
                ang = np.linalg.norm(rv)
            pose[:3, :3] = pose[:3, :3] @ rotvec_to_matrix(rv)
            f["transform_matrix"] = pose.tolist()

    (out_dir / "transforms.json").write_text(json.dumps(out_meta, indent=4))
    return out_meta


def generate_seed_cloud(out_dir: Path, max_reproj_px=10.0):
    """Triangulate a seed cloud over training frames; eval = every 8th (sorted
    by file_path), which must have zero velocity (reference :287-293)."""
    import cv2

    from splat_tpu.data import ply as ply_io
    from splat_tpu.data import seedpoints

    meta = json.loads((out_dir / "transforms.json").read_text())
    frames = sorted(meta["frames"], key=lambda fr: fr["file_path"])
    train = []
    for i, f in enumerate(frames):
        if i % 8 == 0:
            vel = np.linalg.norm(f.get("camera_linear_velocity", [0, 0, 0])) + np.linalg.norm(
                f.get("camera_angular_velocity", [0, 0, 0])
            )
            assert vel == 0, f"eval frame {f['file_path']} has nonzero velocity"
            continue
        train.append(f)

    images = [
        cv2.cvtColor(cv2.imread(str(out_dir / f["file_path"])), cv2.COLOR_BGR2RGB)
        for f in train
    ]
    poses = [np.array(f["transform_matrix"]) for f in train]
    intr = {k: meta[k] for k in ("fl_x", "fl_y", "cx", "cy")}
    xyzrgb = seedpoints.generate_seed_points(images, poses, intr, max_reproj_px)
    print(f"triangulated {len(xyzrgb)} points")
    ply_io.write_ply(
        out_dir / "sparse_pc.ply", xyzrgb[:, :3], xyzrgb[:, 3:].astype(np.uint8)
    )
    meta["ply_file_path"] = "./sparse_pc.ply"
    (out_dir / "transforms.json").write_text(json.dumps(meta, indent=4))


# the 8 emitted dataset variants (reference :414-465)
DATASET_VARIANTS = [
    ("synthetic-posenoise", "raw_clear", dict(noisy_poses=True)),
    ("synthetic-rs", "raw_rs", {}),
    ("synthetic-mb", "raw_mb", {}),
    ("synthetic-mb-posenoise", "raw_mb", dict(noisy_poses=True)),
    ("synthetic-clear", "raw_clear", {}),
    ("synthetic-mbrs", "raw_mbrs", {}),
    ("synthetic-mbrs-posenoise", "raw_mbrs", dict(noisy_poses=True)),
    ("synthetic-mbrs-pose-calib-noise", "raw_mbrs", dict(noisy_poses=True, noisy_intrinsics=True)),
]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input-dir", default="data/inputs-raw/synthetic-raw")
    ap.add_argument("--output-dir", default="data/inputs-processed")
    ap.add_argument("--single", default="", help="process one variant name only")
    ap.add_argument("--points_only", action="store_true")
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args(argv)

    inp = Path(args.input_dir)
    variants = [v for v in DATASET_VARIANTS if not args.single or v[0] == args.single]
    for out_name, subfolder, kw in variants:
        for scene_dir in sorted(p for p in inp.iterdir() if p.is_dir()) if inp.exists() else []:
            raw = scene_dir / subfolder
            if not raw.exists():
                continue
            out = Path(args.output_dir) / out_name / scene_dir.name
            print(f"{raw} -> {out}")
            if args.dry_run:
                continue
            if not args.points_only:
                process_scene(raw, out, **kw)
            if out.exists():
                generate_seed_cloud(out)


if __name__ == "__main__":
    main()
