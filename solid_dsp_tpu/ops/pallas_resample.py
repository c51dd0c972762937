"""Scalar-prefetch Mosaic kernel for arbitrary-grid resampling (Farrow).

The XLA grid engines (ops/farrow.py::make_farrow_resampler) are bounded
by the selection-primitive wall (PERF_NOTES #23): any per-output window
extraction lowers to gathers (~0.1 Gelem/s) or narrow-row takes
(0.02-1 Gelem/s).  The hardware DMA engine has no such limit — it
fetches ARBITRARY HBM offsets at full bandwidth.  This kernel uses
pallas-TPU scalar prefetch to do exactly that:

* the per-GROUP window starts (one int32 per G=1024 outputs, computed
  by the exact fixed-point grid in XLA) ride in as prefetched scalars;
* each grid step issues ONE contiguous HBM->VMEM copy of the group's
  combined input span (consecutive outputs read a contiguous interval);
* inside VMEM the group is processed in SUB-GROUPS of 128 outputs: a
  (128, SUBW) one-hot-times-taps matrix built from broadcasted iota
  compares contracts against the sub-window by an elementwise multiply
  + row reduction — VMEM-resident VPU work, no HBM.

All intermediates keep >= 128-lane minors (the backend's Mosaic
compiler crashes on sub-128-lane shapes, PERF_NOTES #24).

STATUS (round 5): correct and validated against the XLA grid engine in
interpret mode (tests/test_resample.py), but the tunnel backend's
remote compiler HANGS on any PrefetchScalarGridSpec kernel (bisected:
even a trivial prefetch-only body never returns; plain-grid kernels
compile fine).  The design is kept as the documented lever for when
the backend catches up — on a stock TPU runtime this kernel is the
path past the PERF_NOTES #23 selection wall.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_farrow_kernel_resampler"]

G = 1024            # outputs per grid step
SUBG = 128          # outputs per sub-group (one VPU batch)


def _make_kernel(SPAN: int, SUBW: int, n_sub: int, P: int):
    def kernel(starts_ref, crel_ref, coef_ref, xr_hbm, xi_hbm,
               or_ref, oi_ref, xr_s, xi_s, sem):
        s = pl.program_id(0)
        start = starts_ref[s]
        cpy_r = pltpu.make_async_copy(
            xr_hbm.at[pl.ds(start, SPAN)], xr_s, sem)
        cpy_r.start()
        cpy_r.wait()
        cpy_i = pltpu.make_async_copy(
            xi_hbm.at[pl.ds(start, SPAN)], xi_s, sem)
        cpy_i.start()
        cpy_i.wait()
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBG, SUBW), 1)
        for b in range(n_sub):
            # sub-window offset: the sub-group's first window start,
            # floored to a sublane multiple (scalar arithmetic)
            off = (crel_ref[0, b, 0] // 8) * 8
            xsr = xr_s[pl.ds(off, SUBW)]
            xsi = xi_s[pl.ds(off, SUBW)]
            c = crel_ref[0, b, :] - off
            acc = jnp.zeros((SUBG, SUBW), jnp.float32)
            for i in range(P):
                sel = (w_iota == (c[:, None] + i)).astype(jnp.float32)
                acc = acc + coef_ref[0, i * n_sub + b, :][:, None] * sel
            or_ref[0, b, :] = jnp.sum(acc * xsr[None, :], axis=1)
            oi_ref[0, b, :] = jnp.sum(acc * xsi[None, :], axis=1)

    return kernel


@lru_cache(maxsize=32)
def _build_call(n_steps: int, SPAN: int, SUBW: int, P: int,
                interpret: bool):
    n_sub = G // SUBG
    kern = _make_kernel(SPAN, SUBW, n_sub, P)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, n_sub, SUBG),
                         lambda s, starts: (s, 0, 0)),             # c_rel
            pl.BlockSpec((1, P * n_sub, SUBG),
                         lambda s, starts: (s, 0, 0)),             # coefs
            pl.BlockSpec(memory_space=pltpu.ANY),                  # xr
            pl.BlockSpec(memory_space=pltpu.ANY),                  # xi
        ],
        out_specs=[
            pl.BlockSpec((1, n_sub, SUBG), lambda s, starts: (s, 0, 0)),
            pl.BlockSpec((1, n_sub, SUBG), lambda s, starts: (s, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((SPAN,), jnp.float32),
            pltpu.VMEM((SPAN,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_steps, n_sub, SUBG), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, n_sub, SUBG), jnp.float32)],
        interpret=interpret,
    )


def make_farrow_kernel_resampler(ratio: float, block_len: int,
                                 dtype=jnp.complex64,
                                 interpret: bool | None = None):
    """Build ``(init, apply, plan)`` like make_farrow_resampler, with
    the window extraction done by the scalar-prefetch Mosaic kernel.

    Same exact fixed-point position grid and cubic Lagrange taps as the
    XLA engine (ops/farrow.py) — outputs agree to f32 rounding; only
    the extraction mechanism differs (hardware DMA + VMEM one-hot
    contraction instead of XLA gathers).
    """
    from .farrow import FarrowResampler, lagrange_coeffs
    from .gridresample import (grid_advance, grid_n_valid, grid_positions,
                               plan_ratio)
    from ..utils.transfer import zeros_device

    P = FarrowResampler.STENCIL
    L = int(block_len)
    plan = plan_ratio(ratio, L)
    n_pad = plan.n_pad
    n_steps = -(-n_pad // G)
    SUBW = -(-int(np.ceil(SUBG * plan.ratio + P + 10)) // 128) * 128
    SPAN = -(-int(np.ceil(G * plan.ratio + SUBW + 16)) // 128) * 128
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    call = _build_call(n_steps, SPAN, SUBW, P, bool(interpret))

    def init():
        return (zeros_device(P - 1, dtype), jnp.zeros((), jnp.int32))

    @jax.jit
    def apply(state, x):
        tail, t0 = state
        # right pad: the last group's DMA reads SPAN samples from its
        # start, and masked (k >= n_valid) outputs still read in-bounds
        ext = jnp.concatenate(
            [tail, x.astype(tail.dtype),
             jnp.zeros((SPAN,), tail.dtype)], axis=-1)
        base, mu = grid_positions(plan, t0, n_steps * G)
        base = jnp.clip(base, 0, L - 1)
        n_sub = G // SUBG
        starts = base[:: G].astype(jnp.int32)              # (n_steps,)
        c_rel = (base.reshape(n_steps, n_sub, SUBG)
                 - starts[:, None, None]).astype(jnp.int32)
        coefs = lagrange_coeffs(mu).astype(jnp.float32)    # (n, P)
        # (n_steps, P*n_sub, SUBG) with row index i*n_sub + b
        coefs = coefs.reshape(n_steps, n_sub, SUBG, P)
        coefs = jnp.transpose(coefs, (0, 3, 1, 2)).reshape(
            n_steps, P * n_sub, SUBG)
        xr = jnp.real(ext).astype(jnp.float32)
        xi = jnp.imag(ext).astype(jnp.float32)
        yr, yi = call(starts, c_rel, coefs, xr, xi)
        y = jax.lax.complex(yr.reshape(-1)[:n_pad],
                            yi.reshape(-1)[:n_pad]).astype(tail.dtype)
        n_valid = grid_n_valid(plan, t0)
        y = jnp.where(jnp.arange(n_pad) < n_valid, y, 0)
        new_state = (ext[..., L: L + P - 1], grid_advance(plan, t0))
        return y, n_valid, new_state

    return init, apply, plan
