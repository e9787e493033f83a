"""Full-image dataset cache.

Equivalent of nerfstudio's `FullImageDatamanager` (SURVEY.md §2b): 3DGS trains
on whole images, one (camera, image) pair per step, with ALL images cached
up-front. On TPU the cache lives in host RAM as one dense array; the training
loop feeds (cam_idx, image) pairs to the jitted step (static image shape).
"""
from __future__ import annotations

import numpy as np

from .dataparser import ParsedScene


def _load_image(path: str, downscale: int, distortion: dict | None) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if downscale != 1:
        img = img.resize((img.width // downscale, img.height // downscale), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=-1)
    if arr.shape[-1] == 4:
        arr = arr[..., :3]  # drop alpha (white-composite handled upstream if needed)
    if distortion and any(abs(distortion.get(k, 0.0)) > 1e-12 for k in ("k1", "k2", "p1", "p2", "k3")):
        arr = _undistort(arr, distortion)
    return arr


def _undistort(arr: np.ndarray, distortion: dict) -> np.ndarray:
    """Brown–Conrady undistortion via OpenCV (intrinsics supplied in `distortion`)."""
    import cv2

    K = distortion.get("K")
    if K is None:
        return arr  # no intrinsics provided for undistortion; pass through
    d = np.array(
        [distortion.get(k, 0.0) for k in ("k1", "k2", "p1", "p2", "k3")], dtype=np.float64
    )
    out = cv2.undistort((arr * 255).astype(np.uint8), np.asarray(K), d)
    return out.astype(np.float32) / 255.0


class ImageCache:
    """Caches all images of a split as one (N, H, W, 3) float32 array.

    Uses the native multithreaded PNG decoder (native/imgcache.cpp) when the
    images are undistorted PNGs it supports; otherwise the PIL path.
    """

    def __init__(self, paths: list[str], downscale: int = 1, distortion: dict | None = None):
        native = None
        needs_undistort = bool(distortion) and any(
            abs(distortion.get(k, 0.0) or 0.0) > 1e-12 for k in ("k1", "k2", "p1", "p2", "k3")
        )
        if paths and not needs_undistort and all(str(p).endswith(".png") for p in paths):
            from . import native_loader

            native = native_loader.load_images(paths, downscale)
        if native is not None:
            self.images = native
        else:
            imgs = [_load_image(p, downscale, distortion) for p in paths]
            shapes = {im.shape for im in imgs}
            if len(shapes) > 1:
                raise ValueError(f"inconsistent image shapes in split: {shapes}")
            self.images = np.stack(imgs) if imgs else np.zeros((0, 0, 0, 3), np.float32)
        self.paths = paths

    def __len__(self):
        return len(self.paths)


def load_scene_images(scene: ParsedScene) -> tuple[ImageCache, ImageCache]:
    d = scene.metadata.get("downscale_factor", 1)
    dist = scene.metadata.get("distortion")
    return (
        ImageCache(scene.train_paths, d, dist),
        ImageCache(scene.eval_paths, d, dist),
    )
