"""COLMAP text-model parsing -> benchmark transforms.json.

Equivalent of the colmap-to-nerfstudio conversion inside `ns-process-data`
(SURVEY.md §2b row ns-process-data): reads a COLMAP TXT model (cameras.txt,
images.txt, points3D.txt), converts world-to-camera quaternions to OpenGL c2w
`transform_matrix` entries, writes intrinsics (+ Brown-Conrady distortion when
the camera model has it), the `applied_transform` bookkeeping, and the
`sparse_pc.ply` seed cloud.

COLMAP convention: images.txt rows hold (qw qx qy qz tx ty tz) of the
world-to-camera transform in OpenCV axes (+z forward). The benchmark wants
OpenGL c2w (SURVEY.md §6b); like nerfstudio, we also apply a fixed world-frame
`applied_transform` that maps COLMAP's world into the nerfstudio world
(x->y, y->z, z->x axis cycle is NOT used; nerfstudio uses [0,1,0;1,0,0;0,0,-1]
— we record whatever we applied in `applied_transform` so downstream
consumers (render_video.py:134-148) can undo it).
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

# world-frame change applied to COLMAP poses (same as nerfstudio's):
# swap x/y and negate z.
APPLIED_TRANSFORM = np.array(
    [[0.0, 1.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0], [0.0, 0.0, -1.0, 0.0]]
)

# camera-axis flip OpenCV (+z fwd, y down) -> OpenGL (-z fwd, y up)
_FLIP = np.diag([1.0, -1.0, -1.0])


def _quat_to_R(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def parse_cameras_txt(path: Path) -> dict:
    for line in path.read_text().splitlines():
        if line.startswith("#") or not line.strip():
            continue
        parts = line.split()
        model = parts[1]
        w, h = int(parts[2]), int(parts[3])
        p = [float(v) for v in parts[4:]]
        intr = {"w": w, "h": h, "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0}
        if model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL"):
            intr.update(fl_x=p[0], fl_y=p[0], cx=p[1], cy=p[2])
            if model == "SIMPLE_RADIAL":
                intr["k1"] = p[3]
        elif model in ("PINHOLE",):
            intr.update(fl_x=p[0], fl_y=p[1], cx=p[2], cy=p[3])
        elif model in ("OPENCV", "FULL_OPENCV"):
            intr.update(fl_x=p[0], fl_y=p[1], cx=p[2], cy=p[3],
                        k1=p[4], k2=p[5], p1=p[6], p2=p[7])
        elif model == "RADIAL":
            intr.update(fl_x=p[0], fl_y=p[0], cx=p[1], cy=p[2], k1=p[3], k2=p[4])
        else:
            raise ValueError(f"unsupported COLMAP camera model {model}")
        return intr  # single-camera assumption (reference uses --single_camera)
    raise ValueError(f"no camera found in {path}")


def parse_images_txt(path: Path) -> list[dict]:
    frames = []
    lines = [
        l for l in path.read_text().splitlines() if l.strip() and not l.startswith("#")
    ]

    def is_pose_line(parts: list[str]) -> bool:
        # pose lines: IMAGE_ID qw qx qy qz tx ty tz CAMERA_ID NAME — the name
        # is non-numeric; 2D-point lines are all numeric (and may be empty/absent)
        if len(parts) < 10:
            return False
        try:
            float(parts[9])
            return False
        except ValueError:
            return True

    for line in lines:
        parts = line.split()
        if not is_pose_line(parts):
            continue
        q = [float(v) for v in parts[1:5]]
        t = np.array([float(v) for v in parts[5:8]])
        name = parts[9]
        R_w2c = _quat_to_R(q)         # OpenCV axes
        R_c2w = R_w2c.T
        p = -R_c2w @ t
        c2w = np.eye(4)
        c2w[:3, :3] = R_c2w @ _FLIP   # OpenCV -> OpenGL camera axes
        c2w[:3, 3] = p
        # world-frame change (applied_transform)
        c2w = np.vstack([APPLIED_TRANSFORM, [0, 0, 0, 1]]) @ c2w
        frames.append({"file_path": f"./images/{name}", "transform_matrix": c2w.tolist(),
                       "colmap_im_id": int(parts[0])})
    frames.sort(key=lambda f: f["file_path"])
    return frames


def parse_points3d_txt(path: Path) -> tuple[np.ndarray, np.ndarray]:
    xyz, rgb = [], []
    for line in path.read_text().splitlines():
        if line.startswith("#") or not line.strip():
            continue
        parts = line.split()
        xyz.append([float(v) for v in parts[1:4]])
        rgb.append([int(v) for v in parts[4:7]])
    xyz = np.asarray(xyz, dtype=np.float64)
    if len(xyz):
        xyz = xyz @ APPLIED_TRANSFORM[:3, :3].T + APPLIED_TRANSFORM[:3, 3]
    return xyz.astype(np.float32), np.asarray(rgb, dtype=np.uint8)


def colmap_text_to_transforms(text_dir: Path, out_dir: Path) -> dict:
    from . import ply as ply_io

    out_dir.mkdir(parents=True, exist_ok=True)
    intr = parse_cameras_txt(text_dir / "cameras.txt")
    frames = parse_images_txt(text_dir / "images.txt")
    meta = {
        **intr,
        "applied_transform": APPLIED_TRANSFORM.tolist(),
        "ply_file_path": "./sparse_pc.ply",
        "frames": frames,
    }
    pts_path = text_dir / "points3D.txt"
    if pts_path.exists():
        xyz, rgb = parse_points3d_txt(pts_path)
        ply_io.write_ply(out_dir / "sparse_pc.ply", xyz, rgb)
    (out_dir / "transforms.json").write_text(json.dumps(meta, indent=4))
    return meta
