"""FIR method microbenchmark: matmul (MXU conv) vs segmented overlap-save.

VERDICT r1 item 6: `_pick_method`'s threshold had never been perf-validated.
This sweep times both methods over a taps x block grid on the current
backend and reports, per cell, the winner and whether the "auto" choice is
within 10% of the best manual choice.  Run on the TPU; results for r2 are
committed in FIR_METHODS_r02.json.

Usage: python bench_fir_methods.py [--quick]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from solid_dsp_tpu.ops import fir as fir_ops

TAPS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)
BLOCKS = (1 << 16, 1 << 19, 1 << 22)


def _best_of(fn, trials=3, iters=3):
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    quick = "--quick" in sys.argv
    taps_grid = TAPS[:5] if quick else TAPS
    blocks = BLOCKS[:2] if quick else BLOCKS
    rows = []
    for L in blocks:
        rng = np.random.default_rng(L)
        x = jnp.asarray((rng.standard_normal(L) + 1j * rng.standard_normal(L)
                         ).astype(np.complex64))
        for n in taps_grid:
            taps = jnp.asarray(
                rng.standard_normal(n).astype(np.float32), jnp.complex64)
            tail = fir_ops.fir_init(n, jnp.complex64)
            res = {}
            for method in ("matmul", "fft"):
                f = jax.jit(lambda t, tl, v, m=method:
                            fir_ops.fir_apply(t, tl, v, method=m)[0])
                y = f(taps, tail, x)
                jax.block_until_ready(y)
                res[method] = L / _best_of(lambda: f(taps, tail, x)) / 1e9
            auto = fir_ops._pick_method("auto", n, L)
            best = max(res, key=res.get)
            row = {
                "ntaps": n, "block": L,
                "matmul_Gs": round(res["matmul"], 2),
                "fft_Gs": round(res["fft"], 2),
                "auto": auto, "best": best,
                "auto_within_10pct": bool(
                    res[auto] >= 0.9 * res[best]),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    n_bad = sum(not r["auto_within_10pct"] for r in rows)
    print(json.dumps({"cells": len(rows), "auto_losses_gt_10pct": n_bad}),
          flush=True)


if __name__ == "__main__":
    main()
