"""Environment helpers.

This machine's sitecustomize registers a remote `axon` TPU backend and
force-sets `jax_platforms=axon,cpu` via jax.config at interpreter start —
overriding the JAX_PLATFORMS env var a caller set for a subprocess. CLI
entry points call `respect_jax_platforms_env()` so that an explicitly
exported JAX_PLATFORMS (e.g. `cpu` in tests) wins again.
"""
from __future__ import annotations

import os


def respect_jax_platforms_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want or want == "axon":
        return
    import jax

    try:
        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass
