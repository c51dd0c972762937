"""Geometry probe for the fused-DDC kernels (follow-up to probe_dma.py).

probe_dma.py showed the r3 '230 GB/s pallas wall' was a small-block
pipelining artifact — >= 512 KB blocks stream at 340-380 GB/s.  The
shipped DDC kernel already uses 2 MB tiles, so its observed ~204-230 GB/s
per-tile rate must be compute overlap, not DMA: at P=64 the bank dots are
(TF, 256) @ (256, 128) — N=128 barely fills the MXU, and the x3 mode
runs 12 such dots per tile (~500 MFLOP ~ 7-10 us, comparable to the 2 MB
tile's DMA time).  This probe measures the real body kernel across

  P    64 (shipped) vs 128 (hop 512: K=512, N=256 dots — 4x the
       MXU work per dot at the same total flops, much better utilization)
  TF   tile rows (block bytes)
  mode x3 vs fast (3 vs 1 MXU pass)

plus a pure-reduce twin with identical BlockSpecs as the DMA ceiling.

Usage: python tools/probe_ddc_tile.py [--smoke]
"""

from __future__ import annotations

import json
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from solid_dsp_tpu.ops.ddc import ddc_taps  # noqa: E402
from solid_dsp_tpu.ops.pallas_ddc import (  # noqa: E402
    HALO_FRAMES, make_pallas_ddc_full, pallas_full_supported)
from solid_dsp_tpu.utils.benchtime import measure_step  # noqa: E402

SMOKE = "--smoke" in sys.argv
N_TAPS = 64
M = 4
L = 1 << (18 if SMOKE else 24)
KS = (1, 2, 3) if SMOKE else (16, 96, 256)
DTHETA = np.uint32(0x1999_9999)


def _taps():
    rng = np.random.default_rng(0)
    h = np.hamming(N_TAPS) * np.sinc(0.2 * (np.arange(N_TAPS) - 31.5))
    return h / np.sum(h)


def _measure(fn, x2, tailrow, n):
    @jax.jit
    def g(chk, x2, tailrow):
        y = fn(x2, tailrow)
        y0 = y[0] if isinstance(y, (tuple, list)) else y
        return chk + jnp.sum(jnp.abs(y0))

    def step(chk):
        c2 = g(chk, x2, tailrow)
        return c2, c2

    try:
        r = measure_step(step, jnp.zeros(()), ks=KS, reps=2, warmup=3)
    except Exception as e:  # noqa: BLE001
        return {"error": str(e)[:100]}
    return {"gsps": round(n / r["t_iter"] / 1e9, 2)}


def _emit(name, res, **kw):
    print(json.dumps({"variant": name, **res, **kw}), flush=True)


def _reduce_twin(P, TF, tiles):
    """Pure-reduce kernel with the SAME BlockSpecs as the body kernel:
    the DMA+pipeline ceiling for this geometry."""
    hop = P * M

    def kern(x_ref, lhalo_ref, tail_ref, o_ref):
        s = (jnp.sum(x_ref[0], axis=-1, keepdims=True)
             + jnp.sum(x_ref[1], axis=-1, keepdims=True)
             + lhalo_ref[0, 0, 0] + tail_ref[0, 0, 0])
        o_ref[:] = jnp.broadcast_to(s, o_ref.shape)  # (TF, 128) min tile

    call = pl.pallas_call(
        kern,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((2, TF, hop), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, HALO_FRAMES, hop),
                         lambda i: (0, jnp.maximum(
                             i * (TF // HALO_FRAMES) - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, HALO_FRAMES, hop), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TF, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles * TF, 128), jnp.float32),
    )

    def run(xf, tailrow):
        return call(xf, xf, tailrow)

    return run


def main():
    taps = _taps()
    h_bp = ddc_taps(taps, DTHETA)
    rng = np.random.default_rng(1)
    sig = (0.1 * np.exp(2j * np.pi * 0.033 * np.arange(L))
           + 0.001 * (rng.standard_normal(L)
                      + 1j * rng.standard_normal(L)))
    x2_np = np.stack([sig.real, sig.imag]).astype(np.float32)
    D = N_TAPS - M
    print(json.dumps({"L": L, "n_taps": N_TAPS, "M": M}), flush=True)

    for P in (64, 128):
        hop = P * M
        if not pallas_full_supported(N_TAPS, M, P) or L % hop:
            continue
        F_all = L // hop
        x2 = jax.device_put(x2_np)
        for TF in (512, 1024):
            if TF % HALO_FRAMES or F_all % TF:
                continue
            tiles = F_all // TF
            if tiles < 2:
                continue
            blk_kb = 2 * TF * hop * 4 // 1024
            tailrow = jnp.asarray(np.zeros((2, HALO_FRAMES, hop),
                                           np.float32))
            twin = _reduce_twin(P, TF, tiles)
            _emit(f"reduce_twin_P{P}_TF{TF}",
                  _measure(twin, x2.reshape(2, F_all, hop), tailrow, L),
                  block_kb=blk_kb)
            for mode in ("x3", "fast"):
                try:
                    body = make_pallas_ddc_full(h_bp, M, tiles, P=P, TF=TF,
                                                mode=mode)
                except Exception as e:  # noqa: BLE001
                    _emit(f"body_P{P}_TF{TF}_{mode}",
                          {"error": str(e)[:80]})
                    continue
                _emit(f"body_P{P}_TF{TF}_{mode}",
                      _measure(body, x2.reshape(2, F_all, hop), tailrow, L),
                      block_kb=blk_kb)


if __name__ == "__main__":
    main()
