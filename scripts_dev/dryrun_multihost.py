#!/usr/bin/env python
"""Two-process hybrid-mesh dryrun — executes the DCN branch of
`parallel.sharding.make_multihost_mesh` (the `create_hybrid_device_mesh` path,
reachable only when jax.process_count() > 1) on CPU, and checks the sharded
train step produces the SAME loss trajectory as the identical single-process
mesh run.

The reference has no distribution at all (SURVEY.md §2d); this validates the
new layer's multi-host story without multi-host hardware: two local processes
x 4 virtual CPU devices each, jax.distributed over localhost, mesh axes
data=4 (2 per slice x 2 slices over "DCN") x tile=2 (within-slice "ICI").

Modes:
  python scripts_dev/dryrun_multihost.py            # orchestrate: single-proc
                                                    # reference + 2-proc run,
                                                    # compare losses
  ... --worker K --nproc 2 --port P --scene DIR     # internal worker mode
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

N_LOCAL_DEVICES = 4
STEPS = 6
DATA = 4
TILE = 2


def _boot_jax(n_local: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def _run_steps(scene_dir: Path, mesh, seed: int = 0):
    """Build a tiny model + sharded step on `mesh`, run STEPS steps on a fixed
    camera schedule, return the loss list. Deterministic given the scene."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from splat_tpu.data import dataparser as dparse
    from splat_tpu.engine import trainer as tr
    from splat_tpu.models import splatfacto as sf
    from splat_tpu.models import strategy as st
    from splat_tpu.parallel import sharding as sh
    from splat_tpu.data import dataset as ds
    from jax.sharding import NamedSharding, PartitionSpec as P

    scene = dparse.parse_scene(scene_dir, dparse.DataParserConfig())
    cfg = sf.SplatfactoConfig(
        initial_capacity=256, max_per_tile=128, tile_size=8,
        max_tiles_per_gaussian=16, blur_samples=2, sh_degree=1,
    )
    if cfg.blur_anchors == 0:
        import dataclasses as dc

        cfg = dc.replace(
            cfg, blur_anchors=sf.resolve_blur_anchors(cfg, scene.train_cameras)
        )
    tc = tr.TrainerConfig(seed=seed, donate_buffers=False)
    params = sf.init_model(
        scene.points_xyz, scene.points_rgb,
        len(scene.train_cameras), len(scene.eval_cameras), cfg, seed=seed,
    )
    optimizer = tr.build_optimizer(params, tc)
    opt_state = optimizer.init(params)
    strat_state = st.init_strategy_state(params.gaussians.alive.shape[0], seed)

    # Global placement that works in BOTH single- and multi-process mode:
    # every process holds the full host value (deterministic init), and
    # make_array_from_callback materializes only the local shards.
    shardings = sh.train_state_shardings(mesh, params, opt_state, strat_state)

    def gput(tree, tree_sh):
        """Place `tree` globally. tree_sh: matching tree of shardings or a
        single sharding for all leaves. Flat-zips the leaves (never unflattens
        a tree of shardings — validating pytree containers like Cameras would
        reject non-array leaves)."""
        leaves, treedef = jax.tree.flatten(tree)
        if isinstance(tree_sh, jax.sharding.Sharding):
            sh_leaves = [tree_sh] * len(leaves)
        else:
            sh_leaves = jax.tree.flatten(tree_sh)[0]

        def put(x, s):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, s, lambda idx, _x=x: _x[idx])

        return jax.tree.unflatten(
            treedef, [put(x, s) for x, s in zip(leaves, sh_leaves)]
        )

    params, opt_state, strat_state = (
        gput(params, shardings[0]),
        gput(opt_state, shardings[1]),
        gput(strat_state, shardings[2]),
    )

    train_images, _ = ds.load_scene_images(scene)
    cams = tr.Trainer._localize(scene.train_cameras)
    step_fn = sh.make_sharded_train_step(cfg, mesh, optimizer, donate=False)

    losses = []
    key = jax.random.PRNGKey(seed)
    n_train = len(scene.train_cameras)
    rep = NamedSharding(mesh, P())
    for s in range(STEPS):
        idxs = np.asarray([(s * DATA + j) % n_train for j in range(DATA)])
        cam = cams[idxs]
        gt = np.asarray(train_images.images[idxs])
        key, k = jax.random.split(key)
        # replicate the per-step inputs explicitly (multi-process jit requires
        # concrete global arrays, not raw host numpy)
        cam = gput(cam, rep)
        gt = gput(gt, rep)
        params, opt_state, strat_state, loss, _ = step_fn(
            params, opt_state, strat_state, cam, gt,
            gput(np.int32(s), rep), gput(np.asarray(k), rep),
        )
        losses.append(float(loss))
    return losses


def worker(args):
    jax = _boot_jax(N_LOCAL_DEVICES)
    # distributed init MUST precede importing splat_tpu: module-level jnp
    # constants (e.g. tiling.TILE_SENTINEL) initialize the XLA backend, after
    # which jax.distributed.initialize refuses to run. sharding.init_distributed
    # wraps the same call (and its no-op guard is backend-init-safe).
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.nproc,
        process_id=args.worker,
    )
    sys.path.insert(0, str(REPO))
    from splat_tpu.parallel import sharding as sh
    assert jax.process_count() == args.nproc, jax.process_count()
    assert jax.device_count() == args.nproc * N_LOCAL_DEVICES

    mesh = sh.make_multihost_mesh(n_blur=1, n_tile=TILE, n_gauss=1)
    assert dict(mesh.shape) == {"data": DATA, "gauss": 1, "blur": 1, "tile": TILE}
    losses = _run_steps(Path(args.scene), mesh, seed=0)
    if args.worker == 0:
        print("LOSSES " + json.dumps(losses), flush=True)


def single_process_reference(scene_dir: Path):
    """Same mesh shape on 8 local devices in one process (the non-hybrid
    branch) — the equivalence target."""
    code = f"""
import os, sys, json
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count={N_LOCAL_DEVICES * 2}"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {str(REPO)!r})
from pathlib import Path
from splat_tpu.parallel import sharding as sh
import scripts_dev.dryrun_multihost as dm
mesh = sh.make_multihost_mesh(n_blur=1, n_tile={TILE}, n_gauss=1)
losses = dm._run_steps(Path({str(scene_dir)!r}), mesh, seed=0)
print("LOSSES " + json.dumps(losses))
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO,
        timeout=1200,
    )
    if out.returncode != 0:
        raise RuntimeError(f"single-process reference failed:\n{out.stdout}\n{out.stderr}")
    return _parse_losses(out.stdout)


def _parse_losses(stdout: str):
    for line in stdout.splitlines():
        if line.startswith("LOSSES "):
            return json.loads(line[len("LOSSES "):])
    raise RuntimeError(f"no LOSSES line in:\n{stdout}")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def generate_scene(scene_dir: Path):
    code = f"""
import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {str(REPO)!r})
from splat_tpu.data import synthetic
synthetic.generate_scene({str(scene_dir)!r}, n_gaussians=64, n_frames=9,
                         img_size=32, exposure=0.1, trajectory="shake",
                         shake_amp=0.06, n_blur_samples=3, seed=11,
                         n_seed_points=64)
"""
    subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO, timeout=1200)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--scene", default="")
    args = ap.parse_args()
    if args.worker is not None:
        worker(args)
        return

    tmp = Path(tempfile.mkdtemp(prefix="mh_dryrun_"))
    scene_dir = tmp / "scene"
    print("generating scene...", flush=True)
    generate_scene(scene_dir)

    print("single-process reference mesh run...", flush=True)
    ref = single_process_reference(scene_dir)
    print("reference losses:", ref, flush=True)

    port = _free_port()
    print(f"2-process hybrid run (port {port})...", flush=True)
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(k), "--nproc",
             str(args.nproc), "--port", str(port), "--scene", str(scene_dir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, cwd=REPO,
        )
        for k in range(args.nproc)
    ]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for k, (p, o) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(f"worker {k} failed (rc {p.returncode}):\n{o}")
    hybrid = _parse_losses(outs[0])
    print("hybrid losses:   ", hybrid, flush=True)

    import numpy as np

    ok = np.allclose(ref, hybrid, rtol=2e-5, atol=1e-6)
    print("MATCH" if ok else "MISMATCH")
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
