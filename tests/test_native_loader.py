"""Native C++ image loader vs PIL reference."""
import numpy as np
import pytest
from PIL import Image

from splat_tpu.data import native_loader


@pytest.fixture(scope="module")
def png_set(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    arrs = []
    for i in range(6):
        arr = rng.integers(0, 256, size=(32, 48, 3)).astype(np.uint8)
        p = d / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
        arrs.append(arr)
    return paths, arrs


def test_native_build_and_probe(png_set):
    paths, arrs = png_set
    if native_loader.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    assert native_loader.probe(paths[0]) == (48, 32)


def test_native_decode_matches_pil(png_set):
    paths, arrs = png_set
    out = native_loader.load_images(paths)
    if out is None:
        pytest.skip("native loader unavailable")
    assert out.shape == (6, 32, 48, 3)
    for i, arr in enumerate(arrs):
        np.testing.assert_allclose(out[i], arr.astype(np.float32) / 255.0, atol=1e-6)


def test_native_downscale_box_filter(png_set):
    paths, arrs = png_set
    out = native_loader.load_images(paths, downscale=2)
    if out is None:
        pytest.skip("native loader unavailable")
    assert out.shape == (6, 16, 24, 3)
    # box filter: mean of each 2x2 block
    ref = arrs[0].astype(np.float32).reshape(16, 2, 24, 2, 3).mean(axis=(1, 3)) / 255.0
    np.testing.assert_allclose(out[0], ref, atol=1e-5)


def test_grayscale_and_rgba(tmp_path):
    if native_loader.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, size=(8, 8)).astype(np.uint8)
    Image.fromarray(g, mode="L").save(tmp_path / "g.png")
    rgba = rng.integers(0, 256, size=(8, 8, 4)).astype(np.uint8)
    Image.fromarray(rgba, mode="RGBA").save(tmp_path / "a.png")
    out_g = native_loader.load_images([str(tmp_path / "g.png")])
    out_a = native_loader.load_images([str(tmp_path / "a.png")])
    np.testing.assert_allclose(out_g[0][..., 0], g / 255.0, atol=1e-6)
    np.testing.assert_allclose(out_g[0][..., 1], g / 255.0, atol=1e-6)
    np.testing.assert_allclose(out_a[0], rgba[..., :3] / 255.0, atol=1e-6)


def test_image_cache_uses_native(png_set):
    from splat_tpu.data.dataset import ImageCache

    paths, arrs = png_set
    cache = ImageCache(paths)
    assert cache.images.shape == (6, 32, 48, 3)
    np.testing.assert_allclose(cache.images[2], arrs[2].astype(np.float32) / 255.0, atol=1e-6)
