"""AGC — automatic gain control with lock and 7-state squelch FSM.

Parity: reference ``src/auto_gain_control/mod.rs`` — execute (:214-246),
execute_block (:272-285), lock (:302-343), bandwidth (:356-386),
level/rssi/gain/scale accessors (:399-542), init (:568-586), squelch API
(:588-629), squelch FSM (:631-677).

Per-sample semantics (exactly the reference's):

    out  = x * gain
    E    = (1 - alpha) E + alpha |out|^2
    if lock: emit out
    else:
        if E > 1e-6:  gain *= exp(-alpha/2 * ln E)
        gain = min(gain, 1e6)
        update squelch FSM on rssi = -20 log10(gain)
        emit x (unscaled) if squelch mode == ENABLED else out * scale

This recurrence is data-dependent through the gain, so the exact path is a
``lax.scan`` carry (the poster-child sequential op, SURVEY §3.4); it
vectorizes over a leading channel axis, which is how it scales on TPU.  A
block-mode fast path (one gain update per block) is provided for
throughput-critical chains where per-sample gain glitches don't matter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SquelchMode", "agc_init", "agc_apply", "agc_apply_block_mode", "AGC"]


class SquelchMode:
    UNKNOWN = 0
    ENABLED = 1
    RISE = 2
    SIGNALHI = 3
    FALL = 4
    SIGNALLO = 5
    TIMEOUT = 6
    DISABLED = 7


def agc_init(dtype=jnp.float32, batch_shape: tuple = ()):
    """Initial AGC carry: (gain, energy, lock, squelch_mode, timer)."""
    f = lambda v: jnp.full(batch_shape, v, dtype=dtype)
    return {
        "gain": f(1.0),
        "energy": f(1.0),
        "lock": jnp.full(batch_shape, False),
        "mode": jnp.full(batch_shape, SquelchMode.DISABLED, dtype=jnp.int32),
        "timer": jnp.full(batch_shape, 0, dtype=jnp.int32),
    }


def _squelch_update(mode, timer, rssi, threshold, timeout):
    """Vectorized 7-state FSM (ref auto_gain_control/mod.rs:631-677)."""
    thr = rssi > threshold
    # FALL and SIGNALLO touch the timer
    timer = jnp.where(mode == SquelchMode.FALL, timeout, timer)
    timer = jnp.where(mode == SquelchMode.SIGNALLO, timer - 1, timer)

    new_mode = jnp.select(
        [
            mode == SquelchMode.ENABLED,
            mode == SquelchMode.RISE,
            mode == SquelchMode.SIGNALHI,
            mode == SquelchMode.FALL,
            mode == SquelchMode.SIGNALLO,
            mode == SquelchMode.TIMEOUT,
        ],
        [
            jnp.where(thr, SquelchMode.RISE, SquelchMode.ENABLED),
            jnp.where(thr, SquelchMode.SIGNALHI, SquelchMode.FALL),
            jnp.where(thr, SquelchMode.SIGNALHI, SquelchMode.FALL),
            jnp.where(thr, SquelchMode.SIGNALHI, SquelchMode.SIGNALLO),
            jnp.where(
                timer == 0,
                SquelchMode.TIMEOUT,
                jnp.where(thr, SquelchMode.SIGNALHI, SquelchMode.SIGNALLO),
            ),
            jnp.full_like(mode, SquelchMode.ENABLED),
        ],
        default=jnp.full_like(mode, SquelchMode.DISABLED),
    )
    return new_mode.astype(jnp.int32), timer


@partial(jax.jit, static_argnames=())
def agc_apply(state, x, alpha, scale, squelch_threshold, squelch_timeout):
    """Exact per-sample AGC over a block via lax.scan.

    state: carry dict from agc_init (scalars or batched over channels);
    x: (..., T) with time as the LAST axis (scanned); leading axes vectorize.
    Returns (y, new_state).
    """
    x_t = jnp.moveaxis(x, -1, 0)  # (T, ...)

    def step(carry, x_n):
        gain, energy, lock, mode, timer = (
            carry["gain"], carry["energy"], carry["lock"],
            carry["mode"], carry["timer"],
        )
        out = x_n * gain.astype(x_n.dtype)
        ee = jnp.real(out * jnp.conj(out)).astype(energy.dtype)
        energy = (1.0 - alpha) * energy + ee * alpha

        # unlocked path
        gain_new = jnp.where(
            energy > 1e-6,
            gain * jnp.exp(-0.5 * alpha * jnp.log(energy)),
            gain,
        )
        gain_new = jnp.minimum(gain_new, 1e6)
        rssi = jnp.log10(gain_new) * -20.0
        mode_new, timer_new = _squelch_update(
            mode, timer, rssi, squelch_threshold, squelch_timeout
        )
        squelched = mode_new == SquelchMode.ENABLED
        out_unlocked = jnp.where(
            squelched, x_n, out * jnp.asarray(scale, dtype=x_n.dtype)
        )

        y = jnp.where(lock, out, out_unlocked)
        gain = jnp.where(lock, gain, gain_new)
        mode = jnp.where(lock, mode, mode_new)
        timer = jnp.where(lock, timer, timer_new)
        return (
            {"gain": gain, "energy": energy, "lock": lock,
             "mode": mode, "timer": timer},
            y,
        )

    new_state, y_t = jax.lax.scan(step, state, x_t)
    return jnp.moveaxis(y_t, 0, -1), new_state


def block_gain_update(state, ee, alpha, T):
    """Shared block-mode gain/energy update rule.

    ``ee`` is the (batched) mean |out|^2 over the T-sample block; single-chip
    and sharded block AGC both funnel through this so their semantics cannot
    drift (the sharded variant supplies a globally pmean-ed ``ee``).
    """
    gain = state["gain"]
    beta = 1.0 - (1.0 - alpha) ** T
    energy = (1.0 - beta) * state["energy"] + beta * ee
    gain = jnp.where(energy > 1e-6,
                     gain * jnp.exp(-0.5 * jnp.log(energy)), gain)
    gain = jnp.minimum(gain, 1e6)
    return {**state, "gain": gain, "energy": energy}


@jax.jit
def agc_apply_block_mode(state, x, alpha):
    """Fast block-mode AGC: one gain update per block (TPU-native variant).

    Uses the block RMS for the energy estimate and applies a single gain to
    the whole block; converges like the reference with bandwidth ~ alpha*T.
    No squelch/lock handling — compose with agc_apply when those matter.
    """
    gain = state["gain"]
    # gain has the batch shape of x's leading dims; broadcast over time
    out = x * gain.astype(x.dtype)[..., None] if gain.ndim else x * gain.astype(x.dtype)
    ee = jnp.mean(jnp.real(out * jnp.conj(out)), axis=-1)
    return out, block_gain_update(state, ee, alpha, x.shape[-1])


class AGC:
    """Stateful AGC with the reference's API shape (ref auto_gain_control)."""

    def __init__(self, dtype=None):
        self._dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                                else jnp.float32)
        self.bandwidth = 0.1
        self.alpha = 0.1
        self.scale = 1.0
        self.squelch_threshold = 0.0
        self.squelch_timeout = 100
        self._st = agc_init(self._dtype)

    # --- reference accessors -------------------------------------------
    def reset(self) -> None:
        mode = int(self._st["mode"])
        new = agc_init(self._dtype)
        if mode != SquelchMode.DISABLED:
            new["mode"] = jnp.asarray(SquelchMode.ENABLED, dtype=jnp.int32)
        self._st = new

    def lock(self) -> None:
        self._st = {**self._st, "lock": jnp.asarray(True)}

    def unlock(self) -> None:
        self._st = {**self._st, "lock": jnp.asarray(False)}

    def is_unlocked(self) -> bool:
        # parity quirk: the reference's is_unlocked returns the lock flag
        # itself (true when locked) — auto_gain_control/mod.rs:339-343
        return bool(self._st["lock"])

    def get_bandwidth(self) -> float:
        return self.bandwidth

    def set_bandwidth(self, bw: float) -> float:
        if not (0.0 <= bw <= 1.0):
            raise ValueError("bandwidth not in range [0, 1]")
        self.bandwidth = bw
        self.alpha = bw
        return bw

    def get_signal_level(self) -> float:
        return 1.0 / float(self._st["gain"])

    def set_signal_level(self, level: float) -> float:
        if level <= 0.0:
            raise ValueError("level is too low (0, inf)")
        self._st = {**self._st,
                    "gain": jnp.asarray(1.0 / level, dtype=self._dtype),
                    "energy": jnp.asarray(1.0, dtype=self._dtype)}
        return level

    def get_rssi(self) -> float:
        return float(np.log10(float(self._st["gain"])) * -20.0)

    def set_rssi(self, rssi: float) -> None:
        gain = max(10.0 ** (-rssi / 20.0), 1e-16)
        self._st = {**self._st,
                    "gain": jnp.asarray(gain, dtype=self._dtype),
                    "energy": jnp.asarray(1.0, dtype=self._dtype)}

    def get_gain(self) -> float:
        return float(self._st["gain"])

    def set_gain(self, gain: float) -> float:
        if gain <= 0.0:
            raise ValueError("gain is below threshold (0, inf)")
        self._st = {**self._st, "gain": jnp.asarray(gain, dtype=self._dtype)}
        return gain

    def get_scale(self) -> float:
        return self.scale

    def set_scale(self, scale: float) -> float:
        if scale <= 0.0:
            raise ValueError("scale is below threshold (0, inf)")
        self.scale = scale
        return scale

    def init(self, samples) -> float:
        """Seed gain from the RMS of a block (ref :568-586)."""
        samples = np.asarray(samples)
        if samples.size == 0:
            raise ValueError("need more than 0 samples to operate")
        # naive sequential accumulation for bit-parity with the reference's
        # loop (auto_gain_control/mod.rs:578-583); init is setup-time only
        e2 = np.real(samples * np.conj(samples)).astype(np.float64)
        x2 = 0.0
        for v in e2:
            x2 += float(v)
        level = np.sqrt(x2 / samples.size) + 1e-16
        return self.set_signal_level(level)

    # --- squelch ----------------------------------------------------------
    def squelch_enable(self) -> None:
        self._st = {**self._st,
                    "mode": jnp.asarray(SquelchMode.ENABLED, dtype=jnp.int32)}

    def squelch_disable(self) -> None:
        self._st = {**self._st,
                    "mode": jnp.asarray(SquelchMode.DISABLED, dtype=jnp.int32)}

    def is_squelch_enabled(self) -> bool:
        return int(self._st["mode"]) != SquelchMode.DISABLED

    def squelch_get_threshold(self) -> float:
        return self.squelch_threshold

    def squelch_set_threshold(self, t: float) -> None:
        self.squelch_threshold = t

    def squelch_get_timeout(self) -> int:
        return self.squelch_timeout

    def squelch_set_timeout(self, t: int) -> None:
        self.squelch_timeout = t

    def squelch_get_mode(self) -> int:
        return int(self._st["mode"])

    # --- execution ----------------------------------------------------------
    def execute_block(self, samples):
        samples = jnp.asarray(samples)
        y, self._st = agc_apply(
            self._st, samples, self.alpha, self.scale,
            self.squelch_threshold, self.squelch_timeout,
        )
        return y

    def execute(self, sample):
        return self.execute_block(jnp.asarray([sample]))[0]

    def __repr__(self) -> str:
        return (
            f"AGC [Gain={self.get_gain():.5f}] [Scale={self.scale:.5f}] "
            f"[Bandwidth={self.bandwidth:.5f}] [Alpha={self.alpha:.5f}] "
            f"[Energy={float(self._st['energy']):.5f}]"
        )
