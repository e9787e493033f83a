"""LPIPS graph tests with randomly initialized weights (no pretrained weights
in this environment — the computation graph and weight plumbing are what we
can pin; numeric parity with torchmetrics needs the real checkpoint)."""
import numpy as np
import pytest

from splat_tpu.ops import lpips as lp


@pytest.fixture()
def fake_weights(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    out = {}
    in_ch = 3
    for idx, (out_ch, k, _, _) in zip(lp._CONV_IDX, lp._ALEX_CONVS):
        out[f"features.{idx}.weight"] = rng.normal(size=(out_ch, in_ch, k, k)).astype(np.float32) * 0.05
        out[f"features.{idx}.bias"] = np.zeros(out_ch, np.float32)
        in_ch = out_ch
    for kk, ch in enumerate([64, 192, 384, 256, 256]):
        out[f"lin{kk}.weight"] = np.abs(rng.normal(size=(1, ch, 1, 1)).astype(np.float32))
    path = tmp_path / "w.npz"
    np.savez(path, **out)
    monkeypatch.setenv("SPLAT_TPU_LPIPS_WEIGHTS", str(path))
    lp._WEIGHTS_CACHE = None  # reset cache
    yield path
    lp._WEIGHTS_CACHE = None


def test_lpips_none_without_weights(monkeypatch):
    monkeypatch.delenv("SPLAT_TPU_LPIPS_WEIGHTS", raising=False)
    lp._WEIGHTS_CACHE = None
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    assert lp.lpips(x, x) is None
    lp._WEIGHTS_CACHE = None


def test_lpips_identity_zero(fake_weights):
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    assert lp.lpips(x, x) == pytest.approx(0.0, abs=1e-6)


def test_lpips_positive_and_ordered(fake_weights):
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    y_small = np.clip(x + rng.normal(size=x.shape) * 0.01, 0, 1).astype(np.float32)
    y_big = np.clip(x + rng.normal(size=x.shape) * 0.3, 0, 1).astype(np.float32)
    d_small = lp.lpips(x, y_small)
    d_big = lp.lpips(x, y_big)
    assert 0 < d_small < d_big


def test_lpips_batch(fake_weights):
    rng = np.random.default_rng(3)
    preds = [rng.uniform(size=(64, 64, 3)).astype(np.float32) for _ in range(3)]
    gts = [np.clip(p + 0.05, 0, 1) for p in preds]
    v = lp.lpips_batch(preds, gts)
    assert v is not None and v > 0
