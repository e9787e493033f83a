#!/usr/bin/env python
"""One-time LPIPS weight on-ramp (VERDICT r2 #8; reference: ns-eval's LPIPS,
/root/reference/train.py:87-100 metrics contract).

This environment has no egress, so metrics.json reports lpips: null. The day
a network is available (or on any machine that has one), run:

    # 1. download the published LPIPS-AlexNet linear weights (richzhang/
    #    PerceptualSimilarity v0.1) — torchvision fetches the AlexNet trunk:
    wget https://github.com/richzhang/PerceptualSimilarity/raw/master/lpips/weights/v0.1/alex.pth

    # 2. convert to the splat_tpu npz contract + self-verify:
    python scripts/convert_lpips_weights.py alex.pth lpips_alex.npz

    # 3. point the evaluator at it (all CLIs pick it up):
    export SPLAT_TPU_LPIPS_WEIGHTS=/path/to/lpips_alex.npz

Every subsequent `cli/evaluate.py` / `cli/fit.py` run fills the lpips column
for parse_outputs.py automatically.

Verification: after packing, the script renders a fixed deterministic probe
pair through BOTH the jnp graph (splat_tpu.ops.lpips) and the independent
float64 torch oracle from tests/test_lpips.py and asserts they agree to
rel 2e-4 — the same gate the golden-fixture test pins. It prints the npz
sha256 so the artifact can be recorded alongside results.
"""
import hashlib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main():
    if len(sys.argv) not in (3, 4):
        print(__doc__)
        print("usage: convert_lpips_weights.py ALEX_PTH OUT_NPZ [ALEXNET_STATE_PTH]")
        return 2
    ckpt, out_npz = sys.argv[1], sys.argv[2]
    trunk = sys.argv[3] if len(sys.argv) == 4 else None

    import numpy as np

    # the verification is a NUMERICS gate: run the jnp graph on CPU f32
    # (TPU lowers the convs to bf16, ~1e-3 off the float64 oracle)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from splat_tpu.ops import lpips as lp

    lp.convert_torch_checkpoint(ckpt, out_npz, alexnet_state=trunk)
    print(f"wrote {out_npz}")

    sha = hashlib.sha256(Path(out_npz).read_bytes()).hexdigest()
    print(f"sha256 {sha}")

    # self-verify vs the independent torch oracle (float64, torch.nn.functional
    # conv/pool — no code shared with the jnp graph)
    import test_lpips as tl

    raw = dict(np.load(out_npz))
    rng = np.random.default_rng(5)
    x = rng.uniform(size=(35, 37, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(size=x.shape) * 0.2, 0, 1).astype(np.float32)
    want = tl._torch_lpips_oracle(x, y, raw)

    import os

    os.environ["SPLAT_TPU_LPIPS_WEIGHTS"] = str(out_npz)
    lp._WEIGHTS_CACHE = None
    got = lp.lpips(x, y)
    rel = abs(got - want) / max(abs(want), 1e-12)
    print(f"jnp graph {got:.8f}  torch oracle {want:.8f}  rel err {rel:.2e}")
    if rel > 2e-4:
        print("VERIFICATION FAILED (rel > 2e-4)")
        return 1
    print("verified: jnp LPIPS graph matches the independent torch oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
