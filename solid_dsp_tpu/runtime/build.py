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


def ensure_built() -> str:
    """Compile native/solid_runtime.cc if missing or stale; return .so path."""
    src = os.path.abspath(_SRC)
    out = os.path.abspath(_OUT)
    with _LOCK:
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(src)):
            cmd = [
                "g++", "-O3", "-march=native", "-std=c++17", "-shared",
                "-fPIC", "-pthread", src, "-o", out,
            ]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
    return out
