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

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
