"""Two-process hybrid-mesh equivalence (VERDICT r2 #5).

Executes the DCN branch of `parallel.sharding.make_multihost_mesh`
(`create_hybrid_device_mesh`, reachable only with jax.process_count() > 1) by
spawning two local CPU processes connected via jax.distributed over
localhost, and asserts the sharded train step's loss trajectory matches the
identical single-process mesh run. The reference has no distribution layer at
all (SURVEY.md §2d) — this guards the new layer's multi-host path without
multi-host hardware.

Runs in subprocesses (the current test process already initialized its own
JAX backend); ~2-4 min wall.
"""
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_two_process_hybrid_mesh_matches_single_process():
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts_dev" / "dryrun_multihost.py")],
        capture_output=True, text=True, cwd=REPO, timeout=1500,
        env={k: v for k, v in __import__("os").environ.items()
             if k not in ("XLA_FLAGS",)},
    )
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    assert "MATCH" in out.stdout, out.stdout
