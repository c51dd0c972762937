"""Fused windowed 4-step FFT: window + both DFT stages + twiddle in VMEM.

Config-2 (windowed 4096-pt spectral analysis) is TRAFFIC-bound in every
XLA formulation: jnp.fft and the matmul 4-step (ops/matfft.py) both
round-trip HBM between stages and measured 290-450 GFLOP/s on chip
(tools/probe_r5.py fft section) against a read+write floor ~4x higher.
A whole N-point transform is only N*8 bytes (32 KB at N=4096), so the
entire pipeline fits VMEM: this kernel reads the input planes once,
applies the analysis window, runs both DFT stages as MXU matmuls with
the twiddle VMEM-local, and writes once.

Math (Bailey 4-step, N = N1*N2, x[n1*N2 + n2]):

    A[n1 -> k1] stage, twiddle W_N^{n2 k1}, [n2 -> k2] stage,
    X[k1 + N1*k2] = D[k1, k2]

Mosaic constraint (measured: the backend's remote compiler crashes on
ANY sub-128-lane intermediate — 64-minor reshapes, lane-concats and
rank-3 transposes all reproduce it, tools/debug_pfft*.py): every
in-kernel array keeps a minor dim that is a multiple of 128.  Hence

* the split is N = 32 * 128 (N2 = 128 minor);
* stage A contracts the MAJOR n1 axis with a block-diagonal bank
  B[t*N1 + k1, t'*N1 + n1] = F_{N1}[n1, k1] * [t == t'] — one plain
  (TF*N1, TF*N1) @ (TF*N1, N2) matmul instead of a transpose (the
  97% zeros cost only MXU FLOPs, which are free at these sizes);
* the twiddle is a host-tiled (TF*N1, N2) constant pair;
* stage C contracts the (minor) n2 axis with a plane-fused
  [re | im]-column bank (K = 2*N2 = 256);
* the (k1, k2) -> k1 + N1*k2 output reordering runs OUTSIDE the
  kernel as one XLA transpose pass (the only extra HBM trip left).

Modes: "x3" (split-bf16 3-dot contraction per stage, ~f32 mantissa) |
"fast" (single-pass bf16).  Reference seed: the mixed-radix P x Q
column-twiddle-row plan of fft/mixed_radix/mod.rs:87-130, done as two
MXU matrix stages instead of recursive pointer chasing.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_fused_windowed_fft", "fused_windowed_fft"]

N1 = 32
N2 = 128


@lru_cache(maxsize=16)
def _stage_a_bank_np(TF: int, sign: int):
    """Block-diagonal (TF*N1, TF*N1) real/imag stage-A banks."""
    j = np.arange(N1, dtype=np.int64)
    ph = (j[:, None] * j[None, :]) % N1
    f = np.exp(sign * 2j * np.pi * ph / N1)   # F[n1, k1]
    Br = np.zeros((TF * N1, TF * N1), np.float32)
    Bi = np.zeros((TF * N1, TF * N1), np.float32)
    for t in range(TF):
        Br[t * N1: (t + 1) * N1, t * N1: (t + 1) * N1] = f.real.T
        Bi[t * N1: (t + 1) * N1, t * N1: (t + 1) * N1] = f.imag.T
    return Br, Bi


@lru_cache(maxsize=16)
def _stage_c_bank_np(sign: int):
    """Plane-fused stage-C banks: [cr | ci] (.., 2N2) @ bank -> [re|im].

    bank = [[F2r, F2i], [-F2i, F2r]] of shape (2*N2, 2*N2)."""
    j = np.arange(N2, dtype=np.int64)
    ph = (j[:, None] * j[None, :]) % N2
    f = np.exp(sign * 2j * np.pi * ph / N2)   # F2[n2, k2]
    top = np.concatenate([f.real, f.imag], axis=1)
    bot = np.concatenate([-f.imag, f.real], axis=1)
    return np.concatenate([top, bot], axis=0).astype(np.float32)


@lru_cache(maxsize=16)
def _twiddle_big_np(TF: int, sign: int):
    """(2, TF*N1, N2) tiled twiddle W_N^{n2 k1} at row t*N1 + k1."""
    N = N1 * N2
    k1 = np.arange(N1, dtype=np.int64)[:, None]
    n2 = np.arange(N2, dtype=np.int64)[None, :]
    ph = (n2 * k1) % N
    w = np.exp(sign * 2j * np.pi * ph / N)    # (N1, N2)
    wr = np.tile(w.real, (TF, 1)).astype(np.float32)
    wi = np.tile(w.imag, (TF, 1)).astype(np.float32)
    return np.stack([wr, wi])


def _split_bf16_np(a: np.ndarray):
    import ml_dtypes

    hi = np.asarray(a, ml_dtypes.bfloat16)
    lo = np.asarray(a - np.asarray(hi, np.float32), ml_dtypes.bfloat16)
    return jnp.asarray(hi), jnp.asarray(lo)


def _r5_split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_fft_kernel(TF: int, mode: str, with_window: bool):
    N = N1 * N2

    def dot1(a32, bank):
        if mode == "x3":
            bh, bl = bank
            ah, al = _r5_split_bf16(a32)
            y = jnp.dot(ah, bh[:], preferred_element_type=jnp.float32)
            y += jnp.dot(al, bh[:], preferred_element_type=jnp.float32)
            y += jnp.dot(ah, bl[:], preferred_element_type=jnp.float32)
            return y
        return jnp.dot(a32.astype(jnp.bfloat16), bank[:],
                       preferred_element_type=jnp.float32)

    def dotL(bank, a32):
        """bank @ a32 (the stage-A major-axis contraction)."""
        if mode == "x3":
            bh, bl = bank
            ah, al = _r5_split_bf16(a32)
            y = jnp.dot(bh[:], ah, preferred_element_type=jnp.float32)
            y += jnp.dot(bh[:], al, preferred_element_type=jnp.float32)
            y += jnp.dot(bl[:], ah, preferred_element_type=jnp.float32)
            return y
        return jnp.dot(bank[:], a32.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    def kernel(x_ref, w_ref, tw_ref, bar, bai, bc, o_ref):
        xr = x_ref[0]
        xi = x_ref[1]
        if with_window:
            w = w_ref[0]
            xr = xr * w
            xi = xi * w
        x2r = xr.reshape(TF * N1, N2)
        x2i = xi.reshape(TF * N1, N2)
        # stage A (contract major n1 via the block-diagonal bank):
        # complex bank x complex data -> 4 real dots
        arr = dotL(bar, x2r)          # (TF*N1, N2) rows (t, k1)
        ari = dotL(bai, x2r)
        air = dotL(bar, x2i)
        aii = dotL(bai, x2i)
        ar = arr - aii
        ai = ari + air
        # twiddle W_N^{n2 k1} (host-tiled constant planes)
        twr = tw_ref[0]
        twi = tw_ref[1]
        cr = ar * twr - ai * twi
        ci = ar * twi + ai * twr
        # stage C (contract minor n2, plane-fused K = 2*N2 bank)
        c2 = jnp.concatenate([cr, ci], axis=1)         # (TF*N1, 2N2)
        d2 = dot1(c2, bc)                              # (TF*N1, 2N2)
        o_ref[:] = d2

    return kernel


def make_fused_windowed_fft(N: int, n_frames: int, window=None,
                            TF: int = 16, mode: str = "x3", sign: int = -1,
                            interpret: bool | None = None):
    """Build ``apply(x2) -> Y2`` for batched windowed N-point DFTs.

    x2: (2, F, N) re/im f32 planes of F frames; Y2: (F, 2N) [re|im]
    columns of the unnormalized transforms in NATURAL bin order (same
    values as ``jnp.fft.fft(x * window)`` to the mode's accuracy).
    Currently N must be 4096 (= 32 x 128, the v5e-lane-friendly split);
    n_frames must divide by TF.
    """
    if N != N1 * N2:
        raise ValueError("fused windowed FFT currently supports N = 4096")
    F = int(n_frames)
    if F % TF:
        raise ValueError("n_frames must be a multiple of TF")
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    Bar_np, Bai_np = _stage_a_bank_np(TF, sign)
    Bc_np = _stage_c_bank_np(sign)
    tw = jnp.asarray(_twiddle_big_np(TF, sign))
    if window is None:
        w2 = jnp.asarray(np.ones((1, N), np.float32))
        with_window = False
    else:
        w2 = jnp.asarray(np.asarray(window, np.float32).reshape(1, N))
        with_window = True
    if mode == "x3":
        banks = (_split_bf16_np(Bar_np), _split_bf16_np(Bai_np),
                 _split_bf16_np(Bc_np))
    else:
        banks = (jnp.asarray(Bar_np, jnp.bfloat16),
                 jnp.asarray(Bai_np, jnp.bfloat16),
                 jnp.asarray(Bc_np, jnp.bfloat16))

    kern = _make_fft_kernel(TF, mode, with_window)
    if mode == "x3":
        def kern_use(x_ref, w_ref, tw_ref, barh, barl, baih, bail,
                     bch, bcl, o_ref):
            return kern(x_ref, w_ref, tw_ref, (barh, barl), (baih, bail),
                        (bch, bcl), o_ref)
        bank_args = tuple(b for pair in banks for b in pair)
    else:
        kern_use = kern
        bank_args = banks

    const_spec = [pl.BlockSpec(a.shape, (lambda nd: lambda i: (0,) * nd)(
                               a.ndim), memory_space=pltpu.VMEM)
                  for a in (w2, tw, *bank_args)]
    call = pl.pallas_call(
        kern_use,
        grid=(F // TF,),
        in_specs=[pl.BlockSpec((2, TF, N), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)] + const_spec,
        out_specs=pl.BlockSpec((TF * N1, 2 * N2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F * N1, 2 * N2), jnp.float32),
        interpret=interpret,
    )

    def apply(x2):
        d2 = call(x2, w2, tw, *bank_args)              # (F*N1, 2N2)
        d3 = d2.reshape(F, N1, 2, N2)
        # X[k1 + N1*k2] = D[k1, k2]: one XLA transpose pass to natural
        # bin order (the kernel's only HBM round trip beyond in/out)
        Y = jnp.transpose(d3, (0, 2, 3, 1)).reshape(F, 2 * N)
        return Y

    return apply


def fused_windowed_fft(x, window=None, TF: int = 16, mode: str = "x3"):
    """Complex convenience wrapper: x (F, N) complex -> (F, N) complex
    spectra of ``fft(x * window)`` via the fused kernel."""
    x = jnp.asarray(x)
    F, N = int(x.shape[0]), int(x.shape[-1])
    apply = make_fused_windowed_fft(N, F, window=window, TF=TF, mode=mode)
    x2 = jnp.stack([jnp.real(x), jnp.imag(x)]).astype(jnp.float32)
    Y2 = apply(x2)
    return jax.lax.complex(Y2[:, :N], Y2[:, N:])
