"""Persistent XLA compilation cache shared by every entry point.

The reference pays its clBuildProgram JIT on every run (main.cpp:466-551);
here compilations persist across processes (~20-40 s saved per warm start
locally; minutes through the remote-TPU relay).
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("VVC_MIP_CACHE_DIR",
                           os.path.expanduser("~/.cache/vvc_mip_tpu_xla")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only home: run uncached
