"""render_video CLI: camera-path JSON contract + actual path rendering."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from splat_tpu.data import synthetic

    root = tmp_path_factory.mktemp("rv")
    scene_dir = root / "scene"
    synthetic.generate_scene(scene_dir, n_gaussians=40, n_frames=9, img_size=32,
                             exposure=0.1, n_blur_samples=3, seed=2)
    out_dir = root / "outputs"
    subprocess.check_call([
        sys.executable, str(REPO / "cli" / "fit.py"),
        "--data", str(scene_dir),
        "--output-dir", str(out_dir),
        "--experiment-name", "ds/v/s",
        "--max-num-iterations", "20",
        "--steps-per-save", "20",
        "--pipeline.model.blur-samples", "2",
        "--pipeline.model.sh-degree", "1",
        "--pipeline.model.tile-size", "8",
        "--pipeline.model.max-per-tile", "64",
        "--pipeline.model.max-tiles-per-gaussian", "16",
        "--pipeline.model.chunk", "8",
        "nerfstudio-data", "--eval-mode", "interval", "--orientation-method", "none",
    ], cwd=REPO)
    run_dir = next((out_dir / "ds" / "v" / "s" / "splatfacto").iterdir())
    return scene_dir, run_dir


def test_render_video_path_json(trained_run, tmp_path):
    scene_dir, run_dir = trained_run
    out = tmp_path / "video"
    subprocess.check_call([
        sys.executable, str(REPO / "cli" / "render_video.py"), str(out),
        "--load-config", str(run_dir / "config.json"),
        "--data", str(scene_dir),
        "--original_trajectory", "--fps", "4", "--seconds", "1.0",
        "--dry_run",
    ], cwd=REPO)
    pj = json.loads((out / "demo_video_camera_path.json").read_text())
    assert pj["render_width"] == 32 and pj["fps"] == 4
    assert len(pj["camera_path"]) == 4
    f = pj["camera_path"][0]
    assert len(f["camera_to_world"]) == 16
    assert "camera_linear_velocity" in f and "camera_angular_velocity" in f
    assert "exposure_time" in pj and "rolling_shutter_time" in pj
    # path velocities nonzero along the real trajectory
    speeds = [np.linalg.norm(fr["camera_linear_velocity"]) for fr in pj["camera_path"]]
    assert max(speeds) > 0


def test_render_video_renders_frames(trained_run, tmp_path):
    scene_dir, run_dir = trained_run
    out = tmp_path / "video"
    subprocess.check_call([
        sys.executable, str(REPO / "cli" / "render_video.py"), str(out),
        "--load-config", str(run_dir / "config.json"),
        "--data", str(scene_dir),
        "--original_trajectory", "--fps", "3", "--seconds", "1.0",
    ], cwd=REPO)
    frames = sorted((out / "frames").glob("*.png"))
    assert len(frames) == 3
    from PIL import Image

    img = np.asarray(Image.open(frames[0]))
    assert img.shape == (32, 32, 3)
