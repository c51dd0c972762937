"""Variant sweep for the fused-DDC body kernel (ops/pallas_ddc.py).

The shipped x3 kernel measures ~14 Gs/s on chip, but neither the HBM
bound (read 128 MB at ~500 GB/s -> ~60 Gs/s) nor the MXU bound
(~26 GFLOP x3 at 77 TFLOP/s -> ~50 Gs/s) explains that — something in
the pipeline is worth 3-4x.  This sweep isolates the suspects:

  memcpy     pure read->reduce kernel, same grid/blocks: pipeline ceiling
  x3         shipped kernel shape (split in kernel, head re-split)
  x3s        split ONCE per tile, heads sliced from the bf16 splits
  fast       single-pass bf16
  nohead     x3 without the head dots (math wrong; timing bound)
  TF         tile-size sweep for each

Usage: python tools/proto_pallas_ddc2.py [--smoke]
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from solid_dsp_tpu.ops.ddc import ddc_taps  # noqa: E402
from solid_dsp_tpu.ops.fir import _banks_np  # noqa: E402
from solid_dsp_tpu.utils.benchtime import measure_step  # noqa: E402

SMOKE = "--smoke" in sys.argv
N_TAPS = 64
M = 4
P = 64
HOP = P * M                # 256
L = 1 << (18 if SMOKE else 24)
KS = (1, 2, 3) if SMOKE else (4, 16, 48)
DTHETA = np.uint32(0x1999_9999)
HPAD = 64


def _taps():
    rng = np.random.default_rng(0)
    return rng.standard_normal(N_TAPS) * 0.1


def _banks():
    h_bp = ddc_taps(_taps(), DTHETA)
    hr2 = h_bp.real.astype(np.float32)[:, None]
    hi2 = h_bp.imag.astype(np.float32)[:, None]
    Hb_r, Hh_r = _banks_np(hr2, P, M)
    Hb_i, Hh_i = _banks_np(hi2, P, M)

    def fold(Hr, Hi, rows):
        Br = np.zeros((rows, 2 * P), np.float32)
        Bi = np.zeros((rows, 2 * P), np.float32)
        r = Hr.shape[0]
        Br[:r, :P] = Hr
        Br[:r, P:] = Hi
        Bi[:r, :P] = -Hi
        Bi[:r, P:] = Hr
        return Br, Bi

    Bbr, Bbi = fold(Hb_r, Hb_i, HOP)
    Bhr, Bhi = fold(Hh_r, Hh_i, HPAD)
    return Bbr, Bbi, Bhr, Bhi


def _split_np(a):
    hi = np.asarray(jnp.asarray(a).astype(jnp.bfloat16))
    lo = np.asarray((a - hi.astype(np.float32))).astype(jnp.bfloat16)
    return np.asarray(jnp.asarray(hi)), np.asarray(jnp.asarray(lo))


def _sb(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def make_variant(name: str, TF: int, F: int):
    tiles = F // TF
    Bbr, Bbi, Bhr, Bhi = _banks()
    if name in ("x3", "x3s", "nohead"):
        bank_np = []
        for b in (Bbr, Bbi, Bhr, Bhi):
            bank_np += list(_split_np(b))
        banks = tuple(jnp.asarray(b, jnp.bfloat16) for b in bank_np)
    elif name == "fast":
        banks = tuple(jnp.asarray(b, jnp.bfloat16)
                      for b in (Bbr, Bbi, Bhr, Bhi))
    else:  # memcpy
        banks = ()

    if name == "memcpy":
        def kern(x_ref, halo_ref, o_ref):
            r = x_ref[0]
            im = x_ref[1]
            o_ref[:] = (r[:, : 2 * P] + im[:, : 2 * P]
                        + halo_ref[0, :1, : 2 * P])
    elif name == "fast":
        def kern(x_ref, halo_ref, brh, bih, hrh, hih, o_ref):
            r = x_ref[0].astype(jnp.bfloat16)
            im = x_ref[1].astype(jnp.bfloat16)
            y = jnp.dot(r, brh[:], preferred_element_type=jnp.float32)
            y += jnp.dot(im, bih[:], preferred_element_type=jnp.float32)
            hr = jnp.concatenate(
                [r[1:], halo_ref[0, :1].astype(jnp.bfloat16)],
                axis=0)[:, :HPAD]
            hi = jnp.concatenate(
                [im[1:], halo_ref[1, :1].astype(jnp.bfloat16)],
                axis=0)[:, :HPAD]
            y += jnp.dot(hr, hrh[:], preferred_element_type=jnp.float32)
            y += jnp.dot(hi, hih[:], preferred_element_type=jnp.float32)
            o_ref[:] = y
    elif name == "x3":
        # shipped shape: split per dot, heads re-split from f32 concat
        def dot3(a32, bh, bl):
            ah, al = _sb(a32)
            y = jnp.dot(ah, bh[:], preferred_element_type=jnp.float32)
            y += jnp.dot(al, bh[:], preferred_element_type=jnp.float32)
            y += jnp.dot(ah, bl[:], preferred_element_type=jnp.float32)
            return y

        def kern(x_ref, halo_ref, brh, brl, bih, bil, hrh, hrl, hih, hil,
                 o_ref):
            r = x_ref[0]
            im = x_ref[1]
            y = dot3(r, brh, brl) + dot3(im, bih, bil)
            hr = jnp.concatenate([r[1:], halo_ref[0, :1]], axis=0)[:, :HPAD]
            hi = jnp.concatenate([im[1:], halo_ref[1, :1]], axis=0)[:, :HPAD]
            y += dot3(hr, hrh, hrl) + dot3(hi, hih, hil)
            o_ref[:] = y
    elif name in ("x3s", "nohead"):
        # split ONCE; heads sliced from the bf16 splits (no f32 re-split)
        def kern(x_ref, halo_ref, brh, brl, bih, bil, hrh, hrl, hih, hil,
                 o_ref):
            rh, rl = _sb(x_ref[0])
            ih, il = _sb(x_ref[1])

            def dots(ah, al, bh, bl):
                y = jnp.dot(ah, bh[:], preferred_element_type=jnp.float32)
                y += jnp.dot(al, bh[:], preferred_element_type=jnp.float32)
                y += jnp.dot(ah, bl[:], preferred_element_type=jnp.float32)
                return y

            y = dots(rh, rl, brh, brl) + dots(ih, il, bih, bil)
            if name == "x3s":
                hh, hl = _sb(halo_ref[0, :1])
                gh, gl = _sb(halo_ref[1, :1])
                hrh_a = jnp.concatenate([rh[1:], hh], axis=0)[:, :HPAD]
                hrl_a = jnp.concatenate([rl[1:], hl], axis=0)[:, :HPAD]
                hih_a = jnp.concatenate([ih[1:], gh], axis=0)[:, :HPAD]
                hil_a = jnp.concatenate([il[1:], gl], axis=0)[:, :HPAD]
                y += dots(hrh_a, hrl_a, hrh, hrl)
                y += dots(hih_a, hil_a, hih, hil)
            o_ref[:] = y
    else:
        raise ValueError(name)

    in_specs = [
        pl.BlockSpec((2, TF, HOP), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 8, HOP),
                     lambda i: (0, jnp.minimum((i + 1) * (TF // 8),
                                               tiles * (TF // 8) - 1), 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
         for b in banks]

    flops = 2 * TF * HOP * 2 * P * 2 * (3 if name.startswith("x3") else 1)
    call = pl.pallas_call(
        kern,
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TF, 2 * P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, 2 * P), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops * tiles,
            bytes_accessed=2 * F * HOP * 4 + F * 2 * P * 4,
            transcendentals=0),
    )

    @jax.jit
    def run(x2):
        xf = x2.reshape(2, F, HOP)
        return call(xf, xf, *banks)

    return run


def _measure(fn, *args):
    # Chain through the CHECKSUM only: the old `a0 + 0.0*chk` trick costs
    # a full read+write copy of the 128 MB input per iteration (~0.76 ms
    # at 500 GB/s) — it was the bottleneck of every earlier measurement,
    # capping all variants at ~16 Gs/s.  k sequential dispatches of the
    # same executable cannot be elided or CSE'd across calls, and a single
    # TPU core serializes their compute, so summing into the carry is a
    # sound dependence.
    @jax.jit
    def g(chk, a0, *rest):
        out = fn(a0, *rest)
        return chk + jnp.sum(jnp.abs(out))

    def step(chk):
        c2 = g(chk, *args)
        return c2, c2

    r = measure_step(step, jnp.zeros((), jnp.float32), ks=KS, reps=3)
    return L / r["t_iter"] / 1e9


def main():
    rng = np.random.default_rng(2)
    x2 = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))
    F = L // HOP

    for name in ("memcpy", "fast", "x3", "x3s", "nohead"):
        for TF in (128, 256, 512, 1024):
            if F % TF:
                continue
            try:
                run = make_variant(name, TF, F)
                g = _measure(run, x2)
                print(json.dumps({"impl": name, "TF": TF,
                                  "gsps": round(g, 2)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"impl": name, "TF": TF,
                                  "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
