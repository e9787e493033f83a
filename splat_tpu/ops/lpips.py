"""LPIPS perceptual metric (AlexNet backbone) in pure jnp.

The reference reports lpips via torchmetrics' pretrained backbones (ns-eval,
SURVEY.md §2b; §7 hard part 4 "LPIPS parity"). This environment has no network
egress and ships no pretrained weights, so:

  * the full AlexNet-LPIPS computation graph is implemented here in jnp
    (convs on the MXU), matching the richzhang/PerceptualSimilarity reference
    pipeline: input scaling to [-1,1], per-layer unit-normalized features,
    learned linear weights on squared differences, spatial averaging;
  * weights load from an .npz whose path is given by $SPLAT_TPU_LPIPS_WEIGHTS
    or data/lpips_alex.npz (convert once from the torch checkpoint with
    `python -m splat_tpu.ops.lpips convert <lpips_ckpt> <out.npz>` on a
    machine that has it);
  * without weights, callers receive None and metrics.json reports lpips: null
    (PSNR/SSIM are unaffected).

npz contract: conv weights 'features.{idx}.weight'/'bias' (OIHW) for AlexNet
feature indices (0,3,6,8,10); LPIPS linear weights 'lin{k}.weight' (1,C,1,1).
"""
from __future__ import annotations

import functools
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature extractor structure: (out_ch, kernel, stride, pad), with
# ReLU after each conv and maxpool(3,2) after convs 0, 1 and the last.
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_CONV_IDX = [0, 3, 6, 8, 10]  # torchvision AlexNet feature indices
_POOL_AFTER = {0, 1, 4}

# ImageNet normalization used by LPIPS ("scaling layer"): applied to [-1,1] inputs
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

_WEIGHTS_CACHE: dict[str, dict] | None = None


def _weights_path() -> Path | None:
    env = os.environ.get("SPLAT_TPU_LPIPS_WEIGHTS")
    if env and Path(env).exists():
        return Path(env)
    default = Path(__file__).resolve().parents[2] / "data" / "lpips_alex.npz"
    return default if default.exists() else None


def load_weights() -> dict | None:
    global _WEIGHTS_CACHE
    if _WEIGHTS_CACHE is not None:
        return _WEIGHTS_CACHE or None
    path = _weights_path()
    if path is None:
        _WEIGHTS_CACHE = {}
        return None
    raw = np.load(path)
    w = {k: jnp.asarray(raw[k]) for k in raw.files}
    _WEIGHTS_CACHE = w
    return w


def _conv(x, w, b, stride, pad):
    # x: (N, C, H, W); w: (O, I, kh, kw)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
    )


def _alex_features(x, weights):
    feats = []
    for k, (idx, (_, _, stride, pad)) in enumerate(zip(_CONV_IDX, _ALEX_CONVS)):
        w = weights[f"features.{idx}.weight"]
        b = weights[f"features.{idx}.bias"]
        x = jax.nn.relu(_conv(x, w, b, stride, pad))
        feats.append(x)
        if k in _POOL_AFTER and k != 4:
            x = _maxpool(x)
    return feats


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True))
    return f / (norm + eps)


@jax.jit
def _lpips_pair(img0, img1, weights):
    """img*: (H, W, 3) in [0, 1]. Returns scalar LPIPS distance."""
    def prep(im):
        x = im * 2.0 - 1.0                      # [-1, 1]
        x = (x - _SHIFT[None, None]) / _SCALE[None, None]
        return jnp.transpose(x, (2, 0, 1))[None]  # (1, 3, H, W)

    f0 = _alex_features(prep(img0), weights)
    f1 = _alex_features(prep(img1), weights)
    total = 0.0
    for k, (a, b) in enumerate(zip(f0, f1)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        lin = weights[f"lin{k}.weight"]           # (1, C, 1, 1)
        total = total + jnp.mean(jnp.sum(d * lin[:, :, 0:1, 0:1][0][None], axis=1))
    return total


def lpips(img0, img1) -> float | None:
    """LPIPS between two (H, W, 3) float images in [0,1]; None if no weights."""
    weights = load_weights()
    if weights is None:
        return None
    return float(_lpips_pair(jnp.asarray(img0), jnp.asarray(img1), weights))


def lpips_batch(preds, gts) -> float | None:
    weights = load_weights()
    if weights is None:
        return None
    vals = [
        float(_lpips_pair(jnp.asarray(p), jnp.asarray(g), weights))
        for p, g in zip(preds, gts)
    ]
    return float(np.mean(vals)) if vals else None


def convert_torch_checkpoint(
    lpips_dir: str, out_npz: str, alexnet_state: str | dict | None = None
) -> None:
    """One-time converter (run where torch + the LPIPS checkpoint exist):
    packs the AlexNet feature trunk + LPIPS linear weights into the npz
    contract above.

    Trunk source: `alexnet_state` — a torch state-dict (or path to one) with
    torchvision key layout (`features.{idx}.weight/bias`); when None, the
    trunk is pulled from torchvision's pretrained alexnet (needs torchvision
    + network)."""
    import torch  # noqa: deliberate optional dependency

    out = {}
    if alexnet_state is None:
        import torchvision

        alex = torchvision.models.alexnet(weights="IMAGENET1K_V1").features
        for idx in _CONV_IDX:
            out[f"features.{idx}.weight"] = alex[idx].weight.detach().numpy()
            out[f"features.{idx}.bias"] = alex[idx].bias.detach().numpy()
    else:
        if isinstance(alexnet_state, (str, Path)):
            alexnet_state = torch.load(alexnet_state, map_location="cpu")
        for idx in _CONV_IDX:
            for part in ("weight", "bias"):
                key = f"features.{idx}.{part}"
                out[key] = torch.as_tensor(alexnet_state[key]).detach().numpy()
    lin = torch.load(lpips_dir, map_location="cpu")
    for k in range(5):
        key = f"lin{k}.model.1.weight"
        out[f"lin{k}.weight"] = lin[key].detach().numpy()
    np.savez(out_npz, **out)


if __name__ == "__main__":
    import sys

    if len(sys.argv) == 4 and sys.argv[1] == "convert":
        convert_torch_checkpoint(sys.argv[2], sys.argv[3])
    else:
        print(__doc__)
