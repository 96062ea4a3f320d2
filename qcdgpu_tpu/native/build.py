"""On-demand native build: g++ -O3 -shared -fPIC, cached by source mtime.

No pybind11 in the image; bindings are plain C ABI + ctypes.  Shared objects
land in native/build/ (gitignored).  Build failures degrade gracefully —
callers fall back to pure-numpy implementations.
"""

from __future__ import annotations

import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
BUILD_DIR = os.path.join(_HERE, "build")


class NativeBuildError(RuntimeError):
    pass


def build_lib(name: str, sources: list[str]) -> str:
    """Compile sources into build/lib<name>.so if stale; return its path."""
    os.makedirs(BUILD_DIR, exist_ok=True)
    out = os.path.join(BUILD_DIR, f"lib{name}.so")
    srcs = [os.path.join(_HERE, s) for s in sources]
    if os.path.exists(out) and all(
        os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs
    ):
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *srcs, "-o", out]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=120, check=False
        )
    except (OSError, subprocess.TimeoutExpired) as e:
        raise NativeBuildError(f"native build failed to launch: {e}") from e
    if proc.returncode != 0:
        raise NativeBuildError(
            f"g++ failed ({proc.returncode}):\n{proc.stderr[-2000:]}"
        )
    return out


def load_lib(name: str, sources: list[str]):
    """Build (if needed) and dlopen; returns ctypes.CDLL or None on failure."""
    import ctypes

    try:
        path = build_lib(name, sources)
        return ctypes.CDLL(path)
    except (NativeBuildError, OSError):
        return None
