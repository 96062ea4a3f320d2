"""Persistent XLA compilation cache.

The TPU analogue of QCDGPU's on-disk compiled-binary cache keyed by
source+device (SURVEY.md §2 "OpenCL wrapper"): jit compiles are cached
across processes, which matters doubly here because the axon remote-compile
path costs minutes for the sweep graph, and <10 s on a warm cache.

CPU-backend caches are keyed by a host fingerprint: XLA:CPU entries are
AOT binaries that embed the build host's CPU feature set, so loading them
on a different machine does not merely miss — it spams feature-mismatch
errors into every gate tail and risks SIGILL (observed: the round-3
driver's multichip gate tail was ~90% this noise).  A foreign host now
gets a deterministic cold cache instead of a corrupted warm one.  TPU
entries are host-independent (the compile targets the chip, not the host
CPU), so the TPU cache directory stays shared.
"""

from __future__ import annotations

import os


def host_fingerprint() -> str:
    """12-hex digest of this host's CPU identity (model name + features)."""
    import hashlib
    import platform

    bits = [platform.machine(), platform.system()]
    try:
        with open("/proc/cpuinfo") as f:
            seen = set()
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("model name", "flags", "Features") and key not in seen:
                    seen.add(key)
                    bits.append(line.strip())
                if len(seen) >= 2:
                    break
    except OSError:
        bits.append(platform.processor())
    return hashlib.sha1("\n".join(bits).encode()).hexdigest()[:12]


def _cpu_backend_selected() -> bool:
    """True when this process has (or will) select the CPU backend."""
    import jax

    plats = None
    try:
        plats = jax.config.jax_platforms
    except AttributeError:  # very old jax; fall through to the env var
        pass
    if not plats:
        plats = os.environ.get("JAX_PLATFORMS", "")
    first = (plats or "").split(",")[0].strip().lower()
    if first:
        return first == "cpu"
    # nothing configured explicitly: JAX will auto-select — resolve the
    # backend (e.g. a plain CPU-only host) so the host-fingerprint keying
    # still applies and foreign-host AVX AOT poisoning cannot recur
    try:
        return jax.default_backend() == "cpu"
    except RuntimeError:
        return False


def enable_persistent_cache(path: str | None = None):
    import jax

    if path is None:
        path = os.environ.get("QCDGPU_TPU_CACHE")
    if path is None:
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        path = os.path.join(repo_root, ".jax_cache")
    if _cpu_backend_selected():
        path = os.path.join(path, f"cpu-{host_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
