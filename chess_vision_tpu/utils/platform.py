"""Platform selection helper.

This environment's sitecustomize imports jax and registers the TPU platform at
interpreter startup, which makes the JAX_PLATFORMS env var ineffective by the
time user code runs. CLIs call apply_platform_env() first thing so
`JAX_PLATFORMS=cpu python train.py ...` behaves as documented.
"""

from __future__ import annotations

import os


def apply_platform_env(default: str | None = None) -> None:
    import jax

    # Persistent compilation cache: CLI processes are short-lived and would
    # otherwise pay the full (remote) XLA compile on every invocation.
    try:
        cache_dir = os.environ.get(
            "CVT_COMPILE_CACHE", os.path.expanduser("~/.cache/cvt_jax_cache")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    want = os.environ.get("JAX_PLATFORMS") or default
    if not want:
        return
    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass  # backends already initialized; keep whatever is active
