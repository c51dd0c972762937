"""Fused windowed 4-step FFT: window + both DFT stages + twiddle in VMEM.

Config-2 (windowed 4096-pt spectral analysis) is TRAFFIC-bound in every
XLA formulation: jnp.fft and the matmul 4-step (ops/matfft.py) both
round-trip HBM between stages and measured 290-450 GFLOP/s on chip
(tools/probe_r5.py fft section) against a ~1.6 TFLOP/s-equivalent
read+write floor.  A whole N-point transform is only N*8 bytes
(32 KB at N=4096), so the entire pipeline fits VMEM: this kernel reads
the input planes once, applies the analysis window, runs both DFT
stages as plane-folded MXU matmuls with the twiddle and the three
(N1, N2) transposes VMEM-local, and writes the (TF, 2N) [re|im] output
once.

Math (Bailey 4-step, the same decomposition as ops/matfft.py::_core,
whose XLA version is the accuracy reference):

    x[n1*N2 + n2],  X[k1 + N1*k2] =
      sum_n2 F2[n2, k2] * W_N^{n2 k1} * sum_n1 x[n1, n2] F1[n1, k1]

Both contractions run over the MINOR axis of a 2D view (MXU-shaped);
the two inter-stage reorderings and the final output ordering are
rank-3 minor-dim swaps (VMEM relayouts — cheap next to HBM passes).

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


@lru_cache(maxsize=64)
def _folded_bank_np(n: int, sign: int):
    """Plane-folded DFT bank pair: real planes (Ar, Ai) contract as
    out2 = Ar @ br + Ai @ bi -> (..., [re | im]) columns."""
    j = np.arange(n, dtype=np.int64)
    ph = (j[:, None] * j[None, :]) % n
    f = np.exp(sign * 2j * np.pi * ph / n)
    br = np.concatenate([f.real, f.imag], axis=1).astype(np.float32)
    bi = np.concatenate([-f.imag, f.real], axis=1).astype(np.float32)
    return br, bi


@lru_cache(maxsize=64)
def _twiddle_np(n1: int, n2: int, sign: int):
    """(2, n2, n1) twiddle planes W[n2, k1] = e^{sign 2i pi n2 k1 / N}."""
    n = n1 * n2
    a = np.arange(n2, dtype=np.int64)[:, None]
    b = np.arange(n1, dtype=np.int64)[None, :]
    ph = (a * b) % n
    w = np.exp(sign * 2j * np.pi * ph / n)
    return np.stack([w.real, w.imag]).astype(np.float32)


def _split_bf16_np(a: np.ndarray):
    import ml_dtypes

    hi = np.asarray(a, ml_dtypes.bfloat16)
    lo = np.asarray(a - np.asarray(hi, np.float32), ml_dtypes.bfloat16)
    return jnp.asarray(hi), jnp.asarray(lo)


def _r5_split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_fft_kernel(N1: int, N2: int, TF: int, mode: str, with_window: bool):
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

    def kernel(x_ref, w_ref, tw_ref, b1r, b1i, b2r, b2i, o_ref):
        # plane extraction + window (VPU)
        xr = x_ref[0]
        xi = x_ref[1]
        if with_window:
            w = w_ref[0]
            xr = xr * w
            xi = xi * w
        # T1: (TF, n1, n2) -> (TF, n2, n1), stage A contracts n1 (minor)
        xr3 = jnp.swapaxes(xr.reshape(TF, N1, N2), 1, 2)
        xi3 = jnp.swapaxes(xi.reshape(TF, N1, N2), 1, 2)
        a2 = (dot1(xr3.reshape(TF * N2, N1), b1r)
              + dot1(xi3.reshape(TF * N2, N1), b1i))   # (TF*N2, 2N1)
        ar = a2[:, :N1].reshape(TF, N2, N1)
        ai = a2[:, N1:].reshape(TF, N2, N1)
        # twiddle W^{n2 k1}: rows n2, cols k1 (broadcast over TF)
        twr = tw_ref[0]
        twi = tw_ref[1]
        cr = ar * twr - ai * twi
        ci = ar * twi + ai * twr
        # T2: (TF, n2, k1) -> (TF, k1, n2), stage C contracts n2 (minor)
        cr2 = jnp.swapaxes(cr, 1, 2).reshape(TF * N1, N2)
        ci2 = jnp.swapaxes(ci, 1, 2).reshape(TF * N1, N2)
        d2 = (dot1(cr2, b2r) + dot1(ci2, b2i))          # (TF*N1, 2N2)
        dr = d2[:, :N2].reshape(TF, N1, N2)
        di = d2[:, N2:].reshape(TF, N1, N2)
        # T3: X[k1 + N1 k2] -> flatten needs k2 major, k1 minor
        dr = jnp.swapaxes(dr, 1, 2).reshape(TF, N)
        di = jnp.swapaxes(di, 1, 2).reshape(TF, N)
        o_ref[:] = jnp.concatenate([dr, di], axis=1)

    return kernel


def make_fused_windowed_fft(N: int, n_frames: int, window=None,
                            TF: int = 32, mode: str = "x3", sign: int = -1,
                            interpret: bool | None = None):
    """Build ``apply(x2) -> Y2`` for batched windowed N-point DFTs.

    x2: (2, F, N) re/im f32 planes of F frames; Y2: (F, 2N) [re|im]
    columns of the unnormalized transforms (same values as
    ``jnp.fft.fft(x * window)`` to the mode's accuracy).  N must be a
    perfect square with sqrt(N) a lane-friendly size (64, 128);
    n_frames must divide by TF.
    """
    N1 = int(round(np.sqrt(N)))
    if N1 * N1 != N:
        raise ValueError("fused windowed FFT needs a square size "
                         f"(got {N})")
    N2 = N1
    F = int(n_frames)
    if F % TF:
        raise ValueError("n_frames must be a multiple of TF")
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    b1r_np, b1i_np = _folded_bank_np(N1, sign)
    b2r_np, b2i_np = _folded_bank_np(N2, sign)
    tw = jnp.asarray(_twiddle_np(N1, N2, sign))
    if window is None:
        w2 = jnp.asarray(np.ones((1, N), np.float32))
        with_window = False
    else:
        w2 = jnp.asarray(np.asarray(window, np.float32).reshape(1, N))
        with_window = True
    if mode == "x3":
        banks = (_split_bf16_np(b1r_np), _split_bf16_np(b1i_np),
                 _split_bf16_np(b2r_np), _split_bf16_np(b2i_np))
    else:
        banks = (jnp.asarray(b1r_np, jnp.bfloat16),
                 jnp.asarray(b1i_np, jnp.bfloat16),
                 jnp.asarray(b2r_np, jnp.bfloat16),
                 jnp.asarray(b2i_np, jnp.bfloat16))

    kern = _make_fft_kernel(N1, N2, TF, mode, with_window)
    if mode == "x3":
        def kern_wrap(x_ref, w_ref, tw_ref, b1rh, b1rl, b1ih, b1il,
                      b2rh, b2rl, b2ih, b2il, o_ref):
            return kern(x_ref, w_ref, tw_ref, (b1rh, b1rl), (b1ih, b1il),
                        (b2rh, b2rl), (b2ih, b2il), o_ref)
        kern_use = kern_wrap
        bank_args = tuple(b for pair in banks for b in pair)
    else:
        kern_use = kern
        bank_args = banks

    const_spec = [pl.BlockSpec(a.shape, (lambda nd: lambda i: (0,) * nd)(
                               a.ndim), memory_space=pltpu.VMEM)
                  for a in (w2, tw, *bank_args)]
    grid = (F // TF,)
    call = pl.pallas_call(
        kern_use,
        grid=grid,
        in_specs=[pl.BlockSpec((2, TF, N), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)] + const_spec,
        out_specs=pl.BlockSpec((TF, 2 * N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, 2 * N), jnp.float32),
        interpret=interpret,
    )

    def apply(x2):
        return call(x2, w2, tw, *bank_args)

    return apply


def fused_windowed_fft(x, window=None, TF: int = 32, mode: str = "x3"):
    """Complex convenience wrapper: x (F, N) complex -> (F, N) complex
    spectra of ``fft(x * window)`` via the fused kernel."""
    x = jnp.asarray(x)
    F, N = int(x.shape[0]), int(x.shape[-1])
    apply = make_fused_windowed_fft(N, F, window=window, TF=TF, mode=mode)
    x2 = jnp.stack([jnp.real(x), jnp.imag(x)]).astype(jnp.float32)
    Y2 = apply(x2)
    return jax.lax.complex(Y2[:, :N], Y2[:, N:])
