"""Generic chain composition: build custom streaming pipelines.

The flagship RxChain (models/rx_chain.py) is a hand-fused pipeline; this
module is the same pattern as a reusable combinator, the framework's
"flowgraph" equivalent.  Where GNU-Radio-style frameworks schedule a
graph of blocks at runtime, here a chain is COMPILED: ``compose`` folds
any sequence of block-functional stages into one pure transform

    apply(state, x) -> (y, state)

with a merged ChainState (so checkpointing, lax.scan streaming, and
halo exchange keep working exactly as they do for the built-in chains),
and XLA fuses the stage boundaries away — there is no scheduler, no
queues, no per-block Python in the hot path.

A stage is anything with ``name`` / ``init()`` / ``apply(state, x)``;
``Stage`` wraps plain functions, and the ``stage_*`` factories adapt the
framework's functional cores (FIR, decimating FIR, IIR, NCO mix, AGC,
FM discriminator, stateless maps) with their design-time constants held
HOST-side (numpy) per the repo convention — jit closures must not embed
committed device arrays (see models/rx_chain.py note).

    from solid_dsp_tpu.streaming.compose import (
        compose, stage_nco_mix_down, stage_fir_decim, stage_agc,
        stage_fm_demod)
    init, apply = compose(stage_nco_mix_down(0.2),
                          stage_fir_decim(taps, 4),
                          stage_agc(0.01),
                          stage_fm_demod(0.1))
    state = init()
    y, state = jax.jit(apply)(state, x)      # one fused dispatch
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from .state import ChainState

__all__ = ["Stage", "compose", "stream_scan",
           "stage_fn", "stage_fir", "stage_fir_decim", "stage_iir",
           "stage_nco_mix_down", "stage_nco_mix_up", "stage_agc",
           "stage_fm_demod"]


@dataclass(frozen=True)
class Stage:
    """A named block-functional stage: apply(state, x) -> (y, state)."""

    name: str
    init: Callable[[], Any]
    apply: Callable[[Any, jnp.ndarray], tuple]


def compose(*stages) -> tuple:
    """Fold stages into one ``(init, apply)`` pair over a ChainState.

    Duplicate stage names get ``_2``, ``_3``... suffixes.  The result is
    itself a valid stage body: compose(compose(...) stages) nests.
    """
    if not stages:
        raise ValueError("compose needs at least one stage")
    names: list[str] = []
    for s in stages:
        base = s.name
        name = base
        k = 2
        while name in names:
            name = f"{base}_{k}"
            k += 1
        names.append(name)

    def init() -> ChainState:
        return ChainState(**{n: s.init()
                             for n, s in zip(names, stages)})

    def apply(state: ChainState, x):
        outs = {}
        y = x
        for n, s in zip(names, stages):
            y, st2 = s.apply(state[n], y)
            outs[n] = st2
        return y, ChainState(**outs)

    return init, apply


def stream_scan(apply, state, blocks):
    """Run ``apply`` over (B, L) stacked blocks as ONE lax.scan dispatch.

    Returns (ys (B, ...), final_state) — the multi-block serving pattern
    (models/rx_chain.make_rx_chain_stream) for composed chains.
    """
    import jax

    def body(st, xb):
        yb, st2 = apply(st, xb)
        return st2, yb

    final, ys = jax.lax.scan(body, state, blocks)
    return ys, final


# ------------------------------------------------------------ adapters

def stage_fn(f: Callable, name: str = "fn") -> Stage:
    """Stateless elementwise/block map (e.g. jnp.abs, a slicer)."""
    return Stage(name, lambda: (),
                 lambda st, x: (f(x), st))


def stage_fir(coefficients, scale: float = 1.0, dtype=jnp.complex64,
              name: str = "fir") -> Stage:
    from ..ops import fir as fir_ops

    taps = np.asarray(coefficients)

    def init():
        return fir_ops.fir_init(len(taps), dtype=dtype)

    def apply(tail, x):
        y, tail2 = fir_ops.fir_apply(
            jnp.asarray(taps, dtype), tail, x,
            jnp.asarray(scale, dtype))
        return y, tail2

    return Stage(name, init, apply)


def stage_fir_decim(coefficients, decimation: int, scale: float = 1.0,
                    dtype=jnp.complex64, precision: str | None = None,
                    name: str = "fir_decim") -> Stage:
    from ..ops import fir as fir_ops

    taps = np.asarray(coefficients)
    M = int(decimation)

    def init():
        return {"tail": fir_ops.fir_init(len(taps), dtype=dtype),
                "phase": jnp.zeros((), jnp.int32)}

    def apply(st, x):
        y, tail, phase = fir_ops.fir_decim_apply(
            jnp.asarray(taps, dtype), st["tail"], st["phase"], x,
            jnp.asarray(scale, dtype), M, precision=precision)
        return y, {"tail": tail, "phase": phase}

    return Stage(name, init, apply)


def stage_iir(feed_forward, feed_back, dtype=jnp.complex64,
              method: str = "parallel", name: str = "iir") -> Stage:
    from ..ops import iir as iir_ops

    b = np.asarray(feed_forward)
    a = np.asarray(feed_back)
    b0 = b / a[0]
    a_tail = (a / a[0])[1:]

    def init():
        return iir_ops.iir_init(len(a_tail), dtype=dtype)

    def apply(w, x):
        y, w2 = iir_ops.iir_apply(jnp.asarray(b0, dtype),
                                  jnp.asarray(a_tail, dtype), w, x,
                                  method=method)
        return y, w2

    return Stage(name, init, apply)


def _stage_nco(freq_rad: float, mode: str, down: bool, name: str,
               rdtype) -> Stage:
    from ..ops import nco as nco_ops

    dtheta = nco_ops.constrain(float(freq_rad))
    lut = nco_ops.make_sine_lut(np.dtype(rdtype)) if mode == "lut" else None

    def init():
        return jnp.zeros((), jnp.uint32)

    def apply(theta, x):
        f = (nco_ops.mix_down_block if down else nco_ops.mix_up_block)
        y, theta2 = f(x, theta, dtheta, lut, mode)
        return y, theta2

    return Stage(name, init, apply)


def stage_nco_mix_down(freq_rad: float, mode: str = "exact",
                       rdtype=np.float32,
                       name: str = "nco_down") -> Stage:
    """Downconvert by ``freq_rad`` rad/sample (phase carried as u32)."""
    return _stage_nco(freq_rad, mode, True, name, rdtype)


def stage_nco_mix_up(freq_rad: float, mode: str = "exact",
                     rdtype=np.float32, name: str = "nco_up") -> Stage:
    return _stage_nco(freq_rad, mode, False, name, rdtype)


def stage_agc(bandwidth: float, mode: str = "block", scale: float = 1.0,
              name: str = "agc") -> Stage:
    """AGC stage; mode "block" (fast), "parallel" (exact semantics) or
    "exact" (sequential scan) — same knobs as RxChainConfig."""
    from ..ops import agc as agc_ops

    if mode not in ("block", "parallel", "exact"):
        raise ValueError(f"unknown agc mode {mode!r}")

    def init():
        return agc_ops.agc_init()

    def apply(st, x):
        if mode == "block":
            return agc_ops.agc_apply_block_mode(st, x, bandwidth)
        f = (agc_ops.agc_apply_parallel if mode == "parallel"
             else agc_ops.agc_apply)
        return f(st, x, bandwidth, scale, -1e30, 100)

    return Stage(name, init, apply)


def stage_fm_demod(kf: float, dtype=jnp.complex64,
                   name: str = "fm") -> Stage:
    from ..models import fm as fm_mod

    def init():
        # prev = 1 (not 0): angle(x0 * conj(0)) is indeterminate — same
        # convention as the flagship chain (models/rx_chain.py init)
        return jnp.ones((), dtype)

    def apply(prev, x):
        return fm_mod.fm_demodulate(prev, x, kf)

    return Stage(name, init, apply)
