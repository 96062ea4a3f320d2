"""Persistent XLA compilation cache.

The TPU analogue of QCDGPU's on-disk compiled-binary cache keyed by
source+device (SURVEY.md §2 "OpenCL wrapper"): jit compiles are cached
across processes, which matters doubly here because the axon remote-compile
path costs minutes for the sweep graph, and <10 s on a warm cache.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None):
    import jax

    if path is None:
        path = os.environ.get("QCDGPU_TPU_CACHE")
    if path is None:
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        path = os.path.join(repo_root, ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
