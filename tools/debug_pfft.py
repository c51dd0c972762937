"""Isolate the Mosaic compile crash in the fused windowed-FFT kernel.

Each variant strips one construct; run as
  python -u tools/debug_pfft.py v0 v1 ...
Variants:
  v0  full kernel (fast mode, TF=16)
  v1  no transposes (reshape-only; wrong math, compile test)
  v2  only T1 (first swapaxes)
  v3  T1+T2, no final T3
  v4  rank-2 transpose instead of rank-3 (loop over TF)
  v5  dots only (no window, no twiddle, no transpose)
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N1 = N2 = 64
N = 4096
TF = 16
F = 64


def run(tag, kernel, n_in=1):
    x = np.random.default_rng(0).standard_normal(
        (2, F, N)).astype(np.float32)
    b = np.random.default_rng(1).standard_normal(
        (N1, 2 * N1)).astype(np.float32)
    try:
        call = pl.pallas_call(
            kernel,
            grid=(F // TF,),
            in_specs=[pl.BlockSpec((2, TF, N), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((N1, 2 * N1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TF, 2 * N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, 2 * N), jnp.float32),
        )
        y = jax.jit(call)(jax.device_put(x), jax.device_put(b))
        jax.block_until_ready(y)
        print(json.dumps({"variant": tag, "ok": True}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": tag, "err": str(e)[:150]}), flush=True)


def kern_v0(x_ref, b_ref, o_ref):
    xr = x_ref[0]
    xi = x_ref[1]
    xr3 = jnp.swapaxes(xr.reshape(TF, N1, N2), 1, 2)
    xi3 = jnp.swapaxes(xi.reshape(TF, N1, N2), 1, 2)
    a = (jnp.dot(xr3.reshape(TF * N2, N1).astype(jnp.bfloat16), b_ref[:],
                 preferred_element_type=jnp.float32)
         + jnp.dot(xi3.reshape(TF * N2, N1).astype(jnp.bfloat16), b_ref[:],
                   preferred_element_type=jnp.float32))
    ar = a[:, :N1].reshape(TF, N2, N1)
    ai = a[:, N1:].reshape(TF, N2, N1)
    cr2 = jnp.swapaxes(ar, 1, 2).reshape(TF * N1, N2)
    ci2 = jnp.swapaxes(ai, 1, 2).reshape(TF * N1, N2)
    d = (jnp.dot(cr2.astype(jnp.bfloat16), b_ref[:],
                 preferred_element_type=jnp.float32)
         + jnp.dot(ci2.astype(jnp.bfloat16), b_ref[:],
                   preferred_element_type=jnp.float32))
    dr = jnp.swapaxes(d[:, :N2].reshape(TF, N1, N2), 1, 2).reshape(TF, N)
    di = jnp.swapaxes(d[:, N2:].reshape(TF, N1, N2), 1, 2).reshape(TF, N)
    o_ref[:] = jnp.concatenate([dr, di], axis=1)


def kern_v1(x_ref, b_ref, o_ref):
    xr = x_ref[0]
    xi = x_ref[1]
    a = (jnp.dot(xr.reshape(TF * N1, N2).astype(jnp.bfloat16), b_ref[:],
                 preferred_element_type=jnp.float32)
         + jnp.dot(xi.reshape(TF * N1, N2).astype(jnp.bfloat16), b_ref[:],
                   preferred_element_type=jnp.float32))
    d = jnp.dot(a[:, :N1].astype(jnp.bfloat16), b_ref[:],
                preferred_element_type=jnp.float32)
    o_ref[:] = d.reshape(TF, 2 * N)


def kern_v2(x_ref, b_ref, o_ref):
    xr = x_ref[0]
    xr3 = jnp.swapaxes(xr.reshape(TF, N1, N2), 1, 2)
    a = jnp.dot(xr3.reshape(TF * N2, N1).astype(jnp.bfloat16), b_ref[:],
                preferred_element_type=jnp.float32)
    o_ref[:] = jnp.concatenate([a, a], axis=1).reshape(TF, 2 * N)


def kern_v4(x_ref, b_ref, o_ref):
    xr = x_ref[0]
    rows = []
    for t in range(TF):
        rows.append(xr[t].reshape(N1, N2).T)
    xt = jnp.stack(rows, axis=0)
    a = jnp.dot(xt.reshape(TF * N2, N1).astype(jnp.bfloat16), b_ref[:],
                preferred_element_type=jnp.float32)
    o_ref[:] = jnp.concatenate([a, a], axis=1).reshape(TF, 2 * N)


def kern_v5(x_ref, b_ref, o_ref):
    xr = x_ref[0]
    a = jnp.dot(xr.reshape(TF * N1, N2).astype(jnp.bfloat16), b_ref[:],
                preferred_element_type=jnp.float32)
    o_ref[:] = a.reshape(TF, 2 * N)


VARIANTS = {"v0": kern_v0, "v1": kern_v1, "v2": kern_v2,
            "v4": kern_v4, "v5": kern_v5}

if __name__ == "__main__":
    for tag in (sys.argv[1:] or list(VARIANTS)):
        run(tag, VARIANTS[tag])
