"""Root-cause probe for the Pallas HBM->VMEM bandwidth gap (PERF_NOTES #10).

Round 3 measured every Pallas streaming kernel plateauing at ~230 GB/s
while a plain XLA reduction sustains ~340 GB/s on the same chip — a 1.5x
tax on every full-rate kernel.  The r3 sweep varied tile size and manual
DMA depth only; this probe walks the remaining axes:

  block geometry   minor-dim width C x rows TB (DMA burst length)
  operand rank     (TB, C) single plane vs (2, TB, C) plane pair
                   (the chain's layout: does the leading 2 split the DMA?)
  compiler params  vmem_limit_bytes (buffering headroom),
                   dimension_semantics arbitrary vs parallel
  grid arity       1-D grid vs 2-D grid over rows
  controls         XLA sum-reduction and AXPY over the same bytes

Every variant is a read->reduce kernel (writes are negligible) measured by
chained-iteration slope regression (utils/benchtime.py).  Prints one JSON
line per variant: {"variant", "gbps", ...}.

Usage: python tools/probe_dma.py [--smoke] [--pick SUBSTR]
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from solid_dsp_tpu.utils.benchtime import measure_step  # noqa: E402

SMOKE = "--smoke" in sys.argv
TOTAL = 1 << (20 if SMOKE else 27)      # f32 elements (512 MB full)
KS = (1, 2, 3) if SMOKE else (4, 16, 48)


def _measure_reduce(fn, x, nbytes):
    @jax.jit
    def g(chk):
        return chk + fn(x)

    def step(chk):
        c2 = g(chk)
        return c2, c2

    try:
        r = measure_step(step, jnp.zeros(()), ks=KS, reps=2, warmup=2)
    except Exception as e:  # noqa: BLE001 — probe must keep sweeping
        return {"error": str(e)[:100]}
    return {"gbps": round(nbytes / r["t_iter"] / 1e9, 1)}


def _emit(name, res, **kw):
    print(json.dumps({"variant": name, **res, **kw}), flush=True)


def _reduce_kernel(x_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[0, 0] = 0.0

    o_ref[0, 0] += jnp.sum(x_ref[:])


def probe_block_geometry(picks):
    """Minor-dim width x block rows: DMA burst-length dependence."""
    for C in (256, 1024, 4096, 8192):
        R = TOTAL // C
        x = jnp.asarray(np.zeros((R, C), np.float32))
        for tb_bytes in (1 << 17, 1 << 19, 1 << 21, 1 << 22):
            TB = max(tb_bytes // (C * 4), 8)
            if R % TB or R // TB < 2:
                continue
            name = f"grid_reduce_C{C}_TB{TB}"
            if picks and not any(p in name for p in picks):
                continue
            call = pl.pallas_call(
                _reduce_kernel,
                grid=(R // TB,),
                in_specs=[pl.BlockSpec((TB, C), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                       memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            )
            _emit(name, _measure_reduce(lambda a, c=call: c(a)[0, 0], x,
                                        TOTAL * 4),
                  block_kb=TB * C * 4 // 1024)


def _reduce_kernel_pair(x_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[0, 0] = 0.0

    o_ref[0, 0] += jnp.sum(x_ref[0]) + jnp.sum(x_ref[1])


def probe_plane_pair(picks):
    """The chain's (2, F, hop) layout vs one flat plane, same bytes."""
    C = 1024
    R = TOTAL // (2 * C)
    x = jnp.asarray(np.zeros((2, R, C), np.float32))
    for TB in (128, 512, 1024):
        if R % TB:
            continue
        name = f"pair_reduce_C{C}_TB{TB}"
        if picks and not any(p in name for p in picks):
            continue
        call = pl.pallas_call(
            _reduce_kernel_pair,
            grid=(R // TB,),
            in_specs=[pl.BlockSpec((2, TB, C), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )
        _emit(name, _measure_reduce(lambda a, c=call: c(a)[0, 0], x,
                                    TOTAL * 4),
              block_kb=2 * TB * C * 4 // 1024)


def probe_compiler_params(picks):
    """vmem_limit (pipeline buffer headroom) and dimension semantics."""
    C, TB = 1024, 512
    R = TOTAL // C
    x = jnp.asarray(np.zeros((R, C), np.float32))
    variants = [
        ("vmem_default", {}),
        ("vmem_8m", {"vmem_limit_bytes": 8 * 1024 * 1024}),
        ("vmem_14m", {"vmem_limit_bytes": 14 * 1024 * 1024}),
        ("dims_parallel", {"dimension_semantics": ("parallel",)}),
        ("dims_arbitrary", {"dimension_semantics": ("arbitrary",)}),
    ]
    for name, kw in variants:
        full = f"cparam_{name}_C{C}_TB{TB}"
        if picks and not any(p in full for p in picks):
            continue
        try:
            params = pltpu.CompilerParams(**kw)
        except TypeError as e:
            _emit(full, {"error": str(e)[:80]})
            continue
        call = pl.pallas_call(
            _reduce_kernel,
            grid=(R // TB,),
            in_specs=[pl.BlockSpec((TB, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            compiler_params=params,
        )
        _emit(full, _measure_reduce(lambda a, c=call: c(a)[0, 0], x,
                                    TOTAL * 4))


def _manual_kernel(hbm_ref, o_ref, *, nbuf, tb, c, nchunks):
    def body(scratch, sems, acc_ref):
        def get(slot, idx):
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(idx * tb, tb), :],
                scratch.at[slot], sems.at[slot])

        for s in range(nbuf - 1):
            get(s, s).start()
        acc_ref[0, 0] = 0.0

        def loop(i, _):
            slot = i % nbuf
            nxt = (i + nbuf - 1) % nbuf

            @pl.when(i + nbuf - 1 < nchunks)
            def _():
                get(nxt, i + nbuf - 1).start()

            get(slot, i).wait()
            acc_ref[0, 0] += jnp.sum(scratch[slot])
            return 0

        jax.lax.fori_loop(0, nchunks, loop, 0)
        o_ref[0, 0] = acc_ref[0, 0]

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((nbuf, tb, c), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((nbuf,)),
        acc_ref=pltpu.SMEM((1, 1), jnp.float32),
    )


def probe_manual_dma(picks):
    """Manual N-deep double buffering (control: r3 found ~= grid)."""
    C = 1024
    R = TOTAL // C
    x = jnp.asarray(np.zeros((R, C), np.float32))
    from functools import partial

    for TB, nbuf in ((256, 2), (256, 4), (1024, 2), (1024, 4), (2048, 8)):
        if R % TB or R // TB < nbuf:
            continue
        name = f"manual_dma_TB{TB}_nbuf{nbuf}"
        if picks and not any(p in name for p in picks):
            continue
        call = pl.pallas_call(
            partial(_manual_kernel, nbuf=nbuf, tb=TB, c=C,
                    nchunks=R // TB),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 1), lambda: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )
        _emit(name, _measure_reduce(lambda a, c=call: c(a)[0, 0], x,
                                    TOTAL * 4),
              block_kb=TB * C * 4 // 1024)


def probe_controls(picks):
    """XLA reduction / AXPY over the same byte count."""
    x = jnp.asarray(np.zeros((TOTAL,), np.float32))
    if not picks or any(p in "xla_sum_reduce" for p in picks):
        _emit("xla_sum_reduce", _measure_reduce(jnp.sum, x, TOTAL * 4))
    x2 = jnp.asarray(np.zeros((TOTAL // 2,), np.float32))
    if not picks or any(p in "xla_axpy" for p in picks):
        # read+write traffic: 2 reads + 1 write per element
        @jax.jit
        def g(chk):
            return chk + jnp.sum(x2 * 1.0001 + chk)

        def step(chk):
            c2 = g(chk)
            return c2, c2

        r = measure_step(step, jnp.zeros(()), ks=KS, reps=2, warmup=2)
        _emit("xla_axpy_rw", {"gbps": round(TOTAL // 2 * 4 * 2
                                            / r["t_iter"] / 1e9, 1)})


def main():
    picks = [a for a in sys.argv[1:] if not a.startswith("-")]
    print(json.dumps({"total_mb": TOTAL * 4 // (1 << 20),
                      "backend": jax.default_backend()}), flush=True)
    probe_controls(picks)
    probe_block_geometry(picks)
    probe_plane_pair(picks)
    probe_compiler_params(picks)
    probe_manual_dma(picks)


if __name__ == "__main__":
    main()
