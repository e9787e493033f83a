"""Environment helpers.

This machine's sitecustomize registers a remote `axon` TPU backend and
force-sets `jax_platforms=axon,cpu` via jax.config at interpreter start —
overriding the JAX_PLATFORMS env var a caller set for a subprocess. CLI
entry points call `respect_jax_platforms_env()` so that an explicitly
exported JAX_PLATFORMS (e.g. `cpu` in tests) wins again.
"""
from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Persistent XLA compilation cache — compiles on this box's remote-compile
    TPU tunnel run 1-10 MINUTES; caching across processes makes reruns start
    instantly."""
    import jax

    if os.environ.get("SPLAT_TPU_NO_COMPILE_CACHE"):
        # bypass: jax 0.9's persistent cache raises KeyError('closed_call')
        # on some precision-mix program variants (BASELINE.md round-3 A/B) —
        # this knob lets those programs compile uncached instead of crashing
        return
    path = cache_dir or os.environ.get(
        "SPLAT_TPU_COMPILE_CACHE", "/tmp/splat_tpu_jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


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
