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


def _default_arch_flags() -> list:
    """Portable arch baseline per host ISA.

    x86-64-v2 keeps artifacts portable across x86 machines; non-x86 hosts
    (aarch64 etc.) and toolchains that predate the -v2 level names get no
    arch flag at all (plain -O3), which always compiles.
    """
    import platform

    env = os.environ.get("SOLID_DSP_CXXFLAGS_ARCH")
    if env is not None:
        return env.split() if env else []
    if platform.machine() in ("x86_64", "AMD64"):
        return ["-march=x86-64-v2"]
    return []


def ensure_built() -> str:
    """Compile native/solid_runtime.cc if missing or stale; return .so path.

    Falls back to no arch flag if the baseline level name is rejected
    (GCC < 11 does not know x86-64-v2).
    """
    src = os.path.abspath(_SRC)
    out = _writable_out(src)
    with _LOCK:
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(src)):
            base = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                    "-pthread", src, "-o", out]
            arch = _default_arch_flags()
            try:
                subprocess.run(base[:2] + arch + base[2:], check=True,
                               capture_output=True, text=True)
            except subprocess.CalledProcessError:
                if not arch:
                    raise
                subprocess.run(base, check=True, capture_output=True,
                               text=True)
    return out
