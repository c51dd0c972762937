"""Trustworthy wall-clock measurement over the axon TPU tunnel.

Problem: ``jax.block_until_ready`` through the tunneled PJRT client can
return before the device has actually finished the enqueued executables,
which inflates naive timing loops past hardware speed-of-light (observed:
"647 Gs/s" on a chain whose input read alone would need 5.2 TB/s of HBM
bandwidth on a chip with <1 TB/s).  Device->host *value* fetches are the
only reliable completion barrier — but a fetch costs a round trip over the
tunnel (tens of ms), which swamps short runs.

Fix: regression timing.  Measure wall time T(k) for k in ``ks`` chained
iterations with ONE trailing scalar fetch; then

    T(k) = latency + k * t_iter

and the least-squares slope is the true per-iteration device time with the
round-trip latency removed.  The chain must be sequential on device (each
iteration consumes the previous state), which every `(state, x) -> state`
step here is.

Validation: ``hbm_read_control`` measures a pure 256 MB reduction with the
same estimator; the implied bandwidth must land at/below the chip's HBM
speed of light.  If a workload's implied HBM traffic exceeds that control,
the measurement — not the hardware — is wrong.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

__all__ = ["fit_iter_time", "measure_step", "hbm_read_control",
           "measure_apply_devloop"]


def fit_iter_time(times_s: Sequence[float], ks: Sequence[int]) -> tuple[float, float]:
    """Least-squares fit T(k) = intercept + slope*k; returns (slope, intercept)."""
    n = len(ks)
    sk = sum(ks)
    st = sum(times_s)
    skk = sum(k * k for k in ks)
    skt = sum(k * t for k, t in zip(ks, times_s))
    denom = n * skk - sk * sk
    slope = (n * skt - sk * st) / denom
    intercept = (st - slope * sk) / n
    return slope, intercept


def measure_step(
    step: Callable,
    state,
    ks: Sequence[int] = (1, 2, 4, 8, 16),
    reps: int = 2,
    warmup: int = 3,
) -> dict:
    """Estimate the true per-iteration time of ``step``.

    ``step(state) -> (chk, state)`` must return a SCALAR chk derived from
    the iteration's full output (so the device cannot skip work) plus the
    carried state.  Completion is forced by fetching ``float(chk)`` once
    per timed run; the tunnel round-trip lands in the intercept, not the
    slope.

    Returns {"t_iter": s, "latency": s, "times": {k: best_s}}.
    """
    # warm up past compile AND past input-sharding fixed point (two calls
    # minimum — see memory note on feedback-state resharding)
    for _ in range(max(warmup, 2)):
        chk, state = step(state)
    float(chk)

    best: dict[int, float] = {}
    for _ in range(reps):
        for k in ks:
            s = state
            t0 = time.perf_counter()
            for _ in range(k):
                chk, s = step(s)
            float(chk)  # completion barrier: scalar device->host fetch
            dt = time.perf_counter() - t0
            if k not in best or dt < best[k]:
                best[k] = dt
    slope, intercept = fit_iter_time(
        [best[k] for k in ks], list(ks))
    return {"t_iter": slope, "latency": intercept, "times": best}


def measure_apply_devloop(apply, state, x, iters: int = 16,
                          ks: Sequence[int] = (1, 2, 4), reps: int = 3,
                          warmup: int = 2) -> dict:
    """Per-block time of ``apply(state, x) -> (out, state)`` with the
    iteration loop ON DEVICE.

    Per-dispatch slope regression cannot resolve fast blocks over the
    tunnel: the HOST enqueue rate (~0.2-1 ms/dispatch, load-dependent)
    becomes the pipeline bottleneck and the slope measures the host, not
    the device (PERF_NOTES.md #14).  Here ONE dispatch runs ``iters``
    chained applications via ``lax.fori_loop`` — the state carry chains
    them, and one element of ``x`` is salted per iteration (in place, in
    the loop carry) so even state-light chains cannot be elided or
    overlapped.  The outer ks/regression then removes the per-dispatch
    round trip as usual.

    Returns {"t_iter": seconds per single apply, ...}.
    """
    idx = (0,) * x.ndim

    @jax.jit
    def g(x, st, acc0):
        def body(_, carry):
            xc, st, acc = carry
            out, st = apply(st, xc)
            acc = acc + jnp.sum(jnp.real(out))
            xc = xc.at[idx].add((acc * 1e-30).astype(xc.dtype))
            return (xc, st, acc)
        xc, st, acc = jax.lax.fori_loop(0, iters, body, (x, st, acc0))
        return acc, st

    def step(carry):
        chk, st = carry
        c2, st2 = g(x, st, chk * 1e-30)
        return c2, (c2, st2)

    r = measure_step(step, (jnp.zeros(()), state), ks=ks, reps=reps,
                     warmup=warmup)
    r["t_iter"] = r["t_iter"] / iters
    return r


def hbm_read_control(nbytes: int = 1 << 28) -> dict:
    """Pure HBM-read control: implied GB/s for a f32 sum reduction.

    Run this alongside any throughput claim; a workload implying more
    HBM traffic than this control sustains is a measurement artifact.

    Long iteration chains (k up to 48) on purpose: short-k slopes over
    the tunnel OVERESTIMATE badly (a 920 GB/s "measurement" of this very
    control was observed with k <= 16 — above the chip's HBM speed of
    light; k <= 48 lands at ~340 GB/s, consistent across harnesses).
    """
    a = jnp.ones((nbytes // 4,), jnp.float32)

    @jax.jit
    def red(a, seed):
        # seed makes each iteration's result depend on the previous
        # (forces sequential execution, like a real state carry)
        return jnp.sum(a) + 1e-12 * seed

    def step(seed):
        chk = red(a, seed)
        return chk, chk

    r = measure_step(step, jnp.zeros((), jnp.float32), ks=(4, 16, 48),
                     reps=3)
    r["gbps"] = nbytes / r["t_iter"] / 1e9
    return r
