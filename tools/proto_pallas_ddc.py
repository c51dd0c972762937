"""Speed prototype: fused DDC body as ONE Pallas kernel.

Measures the Pallas formulation (body+head dots, complex combine folded
into the contraction, in-VMEM precision split, rotation epilogue) against
the shipped XLA banded-Toeplitz path (ops/ddc.py) on the bench shapes.
Correctness here is "close enough to trust the timing" (aligned L, no
tail/straggler logic); integration happens in ops/ only if this wins.

All in-kernel ops are 2-D with lane-width-aligned minor dims (Mosaic
rejects 1-D reshapes/concats); the (2, L) planes are pre-shaped to
(2, F, HOP) outside the kernel (a free reshape).

Usage: python tools/proto_pallas_ddc.py [--smoke] [--interpret]
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
INTERPRET = "--interpret" in sys.argv
N_TAPS = 64
M = 4                      # decimation
P = 64                     # outputs per frame
HOP = P * M                # 256
TF = 64                    # frames per pallas tile
L = 1 << (18 if SMOKE else 24)
KS = (1, 2, 3) if SMOKE else (2, 6, 10)
DTHETA = np.uint32(0x1999_9999)


def _taps():
    rng = np.random.default_rng(0)
    return rng.standard_normal(N_TAPS) * 0.1


def _banks(split: bool):
    """Static banks: per-plane body (hop, 2P) and padded head (64, 2P)
    matrices such that y = r@Br + i@Bi (+ head terms) = [re | im]."""
    h_bp = ddc_taps(_taps(), DTHETA)
    hr2 = h_bp.real.astype(np.float32)[:, None]
    hi2 = h_bp.imag.astype(np.float32)[:, None]
    Hb_r, Hh_r = _banks_np(hr2, P, M)   # (hop, P), (63, P)
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
    Bhr, Bhi = fold(Hh_r, Hh_i, 64)
    mats = (Bbr, Bbi, Bhr, Bhi)
    if not split:
        return mats

    def sp(a):
        hi = a.astype(jnp.bfloat16)
        lo = (a - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        return np.asarray(hi), np.asarray(lo)

    out = ()
    for a in mats:
        out += sp(a)
    return out


def _rotate(y, rot_ref):
    yre = y[:, :P]
    yim = y[:, P:]
    c = rot_ref[:, :P]
    s = rot_ref[:, P:]
    return jnp.concatenate([yre * c + yim * s, yim * c - yre * s], axis=1)


def _kernel_f32(x_ref, halo_ref, rot_ref, br_ref, bi_ref, hr_ref, hi_ref,
                o_ref):
    r = x_ref[0]                                    # (TF, HOP)
    im = x_ref[1]
    y = jnp.dot(r, br_ref[:], preferred_element_type=jnp.float32)
    y += jnp.dot(im, bi_ref[:], preferred_element_type=jnp.float32)
    # heads: one-frame shift — rows 1..TF of this block + next block row 0
    hr = jnp.concatenate([r[1:], halo_ref[0, :1]], axis=0)[:, :64]
    hi = jnp.concatenate([im[1:], halo_ref[1, :1]], axis=0)[:, :64]
    y += jnp.dot(hr, hr_ref[:], preferred_element_type=jnp.float32)
    y += jnp.dot(hi, hi_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = _rotate(y, rot_ref[:])


def _kernel_x3(x_ref, halo_ref, rot_ref,
               brh_ref, brl_ref, bih_ref, bil_ref,
               hrh_ref, hrl_ref, hih_ref, hil_ref, o_ref):
    def x3(a32, bh_ref, bl_ref):
        ah = a32.astype(jnp.bfloat16)
        al = (a32 - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        y = jnp.dot(ah, bh_ref[:], preferred_element_type=jnp.float32)
        y += jnp.dot(al, bh_ref[:], preferred_element_type=jnp.float32)
        y += jnp.dot(ah, bl_ref[:], preferred_element_type=jnp.float32)
        return y

    r = x_ref[0]
    im = x_ref[1]
    y = x3(r, brh_ref, brl_ref) + x3(im, bih_ref, bil_ref)
    hr = jnp.concatenate([r[1:], halo_ref[0, :1]], axis=0)[:, :64]
    hi = jnp.concatenate([im[1:], halo_ref[1, :1]], axis=0)[:, :64]
    y += x3(hr, hrh_ref, hrl_ref) + x3(hi, hih_ref, hil_ref)
    o_ref[:] = _rotate(y, rot_ref[:])


def make_pallas_ddc(mode: str, F: int):
    tiles = F // TF
    banks = _banks(mode == "x3")
    bank_const = tuple(jnp.asarray(b) for b in banks)
    kern = _kernel_f32 if mode == "f32" else _kernel_x3

    in_specs = [
        pl.BlockSpec((2, TF, HOP), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        # halo: the 8 frames after the tile, of which only row 0 is used
        # (Mosaic needs the middle block dim divisible by 8; clamped on
        # the last tile — timing-only garbage there; integration handles
        # the edge)
        pl.BlockSpec((2, 8, HOP),
                     lambda i: (0, jnp.minimum((i + 1) * (TF // 8),
                                               tiles * (TF // 8) - 1),
                                0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TF, 2 * P), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
         for b in bank_const]

    call = pl.pallas_call(
        kern,
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TF, 2 * P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, 2 * P), jnp.float32),
        interpret=INTERPRET,
    )

    @jax.jit
    def run(x2, rot):
        xf = x2.reshape(2, F, HOP)
        return call(xf, xf, rot, *bank_const)

    return run


def _check_correctness():
    """Aligned-case parity vs a direct per-sample reference."""
    Lc = TF * HOP * 4
    F = Lc // HOP
    rng = np.random.default_rng(3)
    x2 = jnp.asarray(rng.standard_normal((2, Lc)).astype(np.float32))
    rot = jnp.asarray(np.tile(
        np.concatenate([np.ones(P), np.zeros(P)]).astype(np.float32),
        (F, 1)))  # identity rotation
    run = make_pallas_ddc("f32", F)
    got = np.asarray(run(x2, rot))                  # (F, 2P)
    gre = got[:, :P].reshape(-1)
    gim = got[:, P:].reshape(-1)

    # direct reference: y[t] = sum_i x[t*M + i] * h_bp[i]
    h_bp = ddc_taps(_taps(), DTHETA)
    xr = np.asarray(x2[0], np.float64)
    xi = np.asarray(x2[1], np.float64)
    xc = xr + 1j * xi
    T = Lc // M
    ref = np.zeros(T, np.complex128)
    for f in range(F):
        for p in range(P):
            t = f * P + p
            s = f * HOP + p * M
            seg = xc[s : s + N_TAPS]
            ref[t] = np.sum(seg * h_bp[: len(seg)])
    err = (np.abs(gre + 1j * gim - ref) ** 2)[: (F - 1) * P].sum()
    pwr = (np.abs(ref) ** 2)[: (F - 1) * P].sum()
    snr = 10 * np.log10(pwr / err) if err else np.inf
    print(json.dumps({"check": "pallas_f32_vs_direct", "snr_db":
                      round(float(snr), 1)}), flush=True)


def _measure(fn, *args):
    @jax.jit
    def g(chk, a0, *rest):
        out = fn(a0 + (0.0 * chk).astype(a0.dtype), *rest)
        if isinstance(out, tuple):
            return sum(jnp.sum(jnp.abs(o)) for o in out)
        return jnp.sum(jnp.abs(out))

    def step(chk):
        c2 = g(chk, *args)
        return c2, c2

    r = measure_step(step, jnp.zeros((), jnp.float32), ks=KS)
    return L / r["t_iter"] / 1e9


def main():
    if INTERPRET or jax.default_backend() == "cpu":
        _check_correctness()
        return

    rng = np.random.default_rng(2)
    x2 = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))
    F = L // HOP
    rot = jnp.asarray(rng.standard_normal((F, 2 * P)).astype(np.float32))

    for mode in ("f32", "x3"):
        try:
            run = make_pallas_ddc(mode, F)
            g = _measure(run, x2, rot)
            print(json.dumps({"impl": f"pallas_{mode}", "gsps": round(g, 2)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"impl": f"pallas_{mode}",
                              "error": str(e)[:300]}), flush=True)

    from solid_dsp_tpu.ops.ddc import ddc_apply_planar
    taps = _taps()
    for precname in ("highest", "x3", "default"):
        try:
            @jax.jit
            def run(x2_, p=precname):
                o_re, o_im, t2, _ = ddc_apply_planar(
                    taps, DTHETA, jnp.zeros((2, N_TAPS - 1), jnp.float32),
                    jnp.uint32(0), x2_, M, precision=p)
                return o_re, o_im

            g = _measure(run, x2)
            print(json.dumps({"impl": f"xla_{precname}", "gsps": round(g, 2)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"impl": f"xla_{precname}",
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
