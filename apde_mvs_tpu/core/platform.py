"""Platform/runtime knobs."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "~/.cache/apde_mvs_tpu_xla") -> None:
    """Persistent XLA compilation cache: the engine jits one kernel set per
    (resolution, view-count, flag) configuration, which all views and scans of
    a dataset share — caching across processes removes recompiles entirely
    after the first run."""
    import jax

    cache_dir = os.path.expanduser(path)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except AttributeError:
        pass
