"""Persistent XLA compilation cache.

The scanned-epoch programs compile in ~1-2 minutes over a remote-compile TPU
tunnel (and the vmapped multi-seed program much longer). Enabling JAX's
persistent cache makes every CLI invocation after the first start instantly —
call `enable_compilation_cache()` at the top of entry points.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/bridgerl_tpu_jax")


def enable_compilation_cache(path: str = _DEFAULT_DIR) -> bool:
    import jax

    apply_platform_override()
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False


def apply_platform_override() -> None:
    """Honor BRIDGERL_PLATFORM (e.g. 'cpu') via jax.config.

    Needed because the hosting environment's site hook pre-sets jax_platforms,
    making the standard JAX_PLATFORMS env var a no-op (see CLAUDE.md).
    Must run before the first device use.
    """
    platform = os.environ.get("BRIDGERL_PLATFORM")
    if not platform:
        return
    import jax

    try:
        jax.config.update("jax_platforms", platform)
        n = os.environ.get("BRIDGERL_CPU_DEVICES")
        if n and platform == "cpu":
            jax.config.update("jax_num_cpu_devices", int(n))
    except Exception:
        pass  # backend already initialized
