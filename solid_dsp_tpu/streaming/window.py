"""Window — fixed-capacity shift register (newest sample at index 0).

Parity: reference ``src/window/mod.rs`` (struct :8-14, push :63-71,
to_vec :44-51, reset :54-56) — the live streaming-state container behind
FIR/IIR/PFB/AutoCorrelator in the reference.  In the TPU build the jitted
paths carry state as pytree tails instead (streaming.state); this class
exists for API parity and host-side use, including the ``delay`` extra
slots the AutoCorrelator reads (ref auto_correlator/mod.rs:26-35).
"""

from __future__ import annotations

import numpy as np

__all__ = ["Window"]


class Window:
    """Newest-first shift register with optional delayed read slots."""

    def __init__(self, size: int, delay: int = 0, dtype=np.complex128):
        if size < 1:
            raise ValueError("window size must be >= 1")
        if delay < 0:
            raise ValueError("delay must be >= 0")
        self._size = int(size)
        self._delay = int(delay)
        self._buf = np.zeros(self._size + self._delay, dtype=dtype)

    def __len__(self) -> int:
        return self._size

    @property
    def delay(self) -> int:
        return self._delay

    def push(self, value) -> None:
        """Shift everything one slot older; newest value lands at index 0."""
        self._buf[1:] = self._buf[:-1]
        self._buf[0] = value

    def __getitem__(self, i: int):
        """w[i] = the i-th most recent sample (0 = newest)."""
        return self._buf[i]

    def delayed(self, i: int = 0):
        """The i-th most recent sample of the *delayed* view."""
        return self._buf[self._delay + i]

    def to_vec(self) -> np.ndarray:
        """Copy of the undelayed window, newest first (ref to_vec :44-51)."""
        return self._buf[: self._size].copy()

    def to_vec_delayed(self) -> np.ndarray:
        """Copy of the delayed window, newest first."""
        return self._buf[self._delay:].copy()

    def reset(self) -> None:
        self._buf[:] = 0

    def __repr__(self) -> str:
        return f"Window<{self._buf.dtype}> [Size={self._size}] [Delay={self._delay}]"
