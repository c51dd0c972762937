"""Build the native runtime shared library on demand.

No pybind11 in this image, so the library exposes a C ABI consumed via
ctypes; the build is one g++ invocation, cached next to the source with an
mtime check.
"""

from __future__ import annotations

import os
import subprocess
import threading

_LOCK = threading.Lock()

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "solid_runtime.cc")
_OUT = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "libsolid_runtime.so")


def _writable_out(src: str) -> str:
    """Preferred output path, falling back to a user cache dir when the
    package directory is read-only (e.g. system-wide installs)."""
    out = os.path.abspath(_OUT)
    out_dir = os.path.dirname(out)
    if os.access(out_dir, os.W_OK):
        return out
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.join(os.path.expanduser("~"), ".cache")),
        "solid_dsp_tpu",
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libsolid_runtime.so")


def ensure_built() -> str:
    """Compile native/solid_runtime.cc if missing or stale; return .so path.

    Uses a portable -march=x86-64-v2 baseline (override with
    SOLID_DSP_CXXFLAGS_ARCH) so the artifact runs on CPUs other than the
    build machine's.
    """
    src = os.path.abspath(_SRC)
    out = _writable_out(src)
    arch = os.environ.get("SOLID_DSP_CXXFLAGS_ARCH", "-march=x86-64-v2")
    with _LOCK:
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(src)):
            cmd = [
                "g++", "-O3", arch, "-std=c++17", "-shared",
                "-fPIC", "-pthread", src, "-o", out,
            ]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
    return out
