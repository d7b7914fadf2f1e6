"""Persistent XLA compile cache for the production path (VERDICT r4 #4).

The dryrun/test harnesses always set jax_compilation_cache_dir; the
production entry points (pipeline.assemble / the CLI) did not, so every
fresh process re-compiled the whole executable family — hundreds of
seconds cold on a tunneled TPU.  One cache dir (ALGA_TPU_CACHE, default
~/.cache/alga_tpu_jax) holds both the XLA persistent cache and the
capacity-hint warmstart files (device_join/device_scale), so a second
process starts with converged capacities AND compiled executables.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compile_cache() -> str | None:
    """Idempotently point jax's persistent compilation cache at the
    alga cache dir.  Safe before or after backend init; returns the dir
    (or None if jax refused the config)."""
    global _enabled
    import jax

    d = os.environ.get("ALGA_TPU_CACHE",
                       os.path.expanduser("~/.cache/alga_tpu_jax"))
    if _enabled:
        return d
    try:
        os.makedirs(d, exist_ok=True)
        # respect an explicit user/test setting (conftest points at
        # /tmp/alga_jax_cache); only fill the default in
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled = True
        return jax.config.jax_compilation_cache_dir
    except Exception:
        return None
