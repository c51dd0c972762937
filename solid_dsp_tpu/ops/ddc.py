"""Fused digital down-converter: NCO mix + decimating FIR as one MXU pass.

The reference chain idiom (src/main.rs:25-46 builds NCO -> filter; the
driver's config-4 chain is NCO mix -> 64-tap decimating FIR -> AGC -> FM)
runs the oscillator at the FULL input rate: every sample pays a sin/cos
(or LUT lookup) plus a complex multiply before the filter discards
(M-1)/M of the results.

On TPU the whole front end folds into the filter (the classic one-stage
DDC identity).  With u32 phase words theta(k) = theta0 + k*dtheta
(nco/mod.rs:93-96) and decimation M:

    y[t] = sum_i h[i] * x[s + tM + i] * e^{-j theta(s + tM + i)}
         = e^{-j theta(s + tM)} * sum_i (h[i] e^{-j i*drad}) * x[s + tM + i]

(s = the decimator's first-output offset, drad = dtheta * 2pi / 2^32).
So the mix at the input rate becomes

  * a complex BANDPASS tap set  h_bp[i] = h[i] * e^{-j i*drad}   (design
    time, exact in f64 — u32 phase increments are exact integers), and
  * ONE post-rotation at the DECIMATED rate, whose phase words
    w_t = theta(s + tM) use the same wrapping u32 arithmetic as the NCO,
    so phase continuity across blocks is bit-exact with the unfused chain.

The filter itself runs as banded-Toeplitz real matmuls on raw input
PLANES (re/im as two rows), framed zero-copy exactly like
ops.fir._toep_real: bodies are a contiguous reshape fused into the dot,
the first Th outputs (which straddle the carried tail) and the last
partial frame are two small side matmuls.  Nothing at the input rate is
ever materialized beyond the input itself.

Accuracy: identical math to nco_mode="exact" + fir_decim_apply modulo
float reordering; the parity test gates >= 100 dB against the unfused
chain (tests/test_ddc.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .fir import _bank_rem_np, _banks_np, _resolve_precision
from .nco import _U32, _TWO_PI, nco_complex_exponential

__all__ = ["ddc_taps", "ddc_apply_planar", "ddc_apply"]


def ddc_taps(taps: np.ndarray, dtheta: np.uint32) -> np.ndarray:
    """Bandpass tap set h[i] * e^{-j i * dtheta_rad} (complex128 host)."""
    taps = np.asarray(taps)
    drad = np.float64(dtheta) * (_TWO_PI / float(_U32))
    i = np.arange(len(taps), dtype=np.float64)
    return np.asarray(taps, np.complex128) * np.exp(-1j * drad * i)


def _fold_banks(Hr: np.ndarray, Hi: np.ndarray, bank_dt) -> np.ndarray:
    """Fold the complex-tap plane algebra into one rhs (2, W, 2K).

    Column layout is [re-block | im-block] (NOT per-output interleaving:
    a stride-2 combine over millions of outputs lowers to a pathological
    gather on the TPU backend — measured 23 ms of pure data movement).
    With lhs planes (2, ..., W) contracted over (plane, W):

        out[..., :K] = xr@Hr - xi@Hi = Re(y),
        out[..., K:] = xr@Hi + xi@Hr = Im(y),

    so the complex combine is two contiguous block slices — free.
    """
    W, K = Hr.shape
    H = np.zeros((2, W, 2 * K), bank_dt)
    H[0, :, :K] = Hr
    H[0, :, K:] = Hi
    H[1, :, :K] = -Hi
    H[1, :, K:] = Hr
    return H


def _plane_dot(lhs: jnp.ndarray, bank: np.ndarray, rdtype, prec):
    """lhs (2, ..., W) x folded bank (2, W, 2K) -> (..., 2K), contracting
    the plane dim and W together."""
    H = jnp.asarray(bank).astype(rdtype)
    nd = lhs.ndim
    return jax.lax.dot_general(
        lhs, H, (((0, nd - 1), (0, 1)), ((), ())), precision=prec)


def _use_pallas(engine: str, precision, rdtype) -> bool:
    """Engine resolution for the body kernel (ops/pallas_ddc.py).

    "auto" engages the Pallas kernel on TPU backends for the two
    precision modes it implements (x3-equivalent and single-pass bf16);
    "pallas" forces it (interpret-mode off-TPU, so CPU tests drive the
    identical kernel); f64 planes always stay on the XLA path."""
    if rdtype == jnp.float64:
        return False
    if engine == "pallas":
        return True
    return (engine == "auto"
            and jax.default_backend() not in ("cpu",)
            and precision in ("x3", "default"))


def ddc_apply_planar(taps, dtheta, tail2, theta0, x2, decimation: int,
                     precision="highest", block: int | None = None,
                     rot_mode: str = "fast", engine: str = "auto"):
    """One fused DDC block on input planes.

    Args:
      taps: CONCRETE real/complex prototype taps (numpy; design-time).
      dtheta: concrete u32 NCO frequency word.
      tail2: carried raw-input tail planes (2, ntaps-1), real dtype.
      theta0: traced u32 phase word of the first sample of this block.
      x2: input planes (2, L) — re/im rows, L % decimation == 0.  ONE
        array, not two: plane slices of a (2, L) array stay fusable views
        (stacking two separate (L,) planes costs a full-block copy).
      decimation: M.
      precision / block: see ops.fir.fir_toeplitz.
      rot_mode: "fast" (factorized oscillator, ~1 ulp) | "exact" | "lut".
      engine: "auto" | "xla" | "pallas" — whether the aligned interior
        runs as the fused Mosaic kernel (ops/pallas_ddc.py; 3x the XLA
        path on chip at x3/default precision) with edges on XLA.

    Returns (out_re, out_im, new_tail2, theta_end) where out has length
    L // M and equals mix_down_block + fir_decim_apply of the unfused
    chain (decimator phase 0) to float rounding.
    """
    taps = np.asarray(taps)
    n = len(taps)
    n1 = n - 1
    M = int(decimation)
    L = int(x2.shape[-1])
    if L % M:
        raise ValueError("block length must be a multiple of the decimation")
    T = L // M
    first = M - 1                       # decimator phase 0 (ref decim.rs:221)
    h_bp = ddc_taps(taps, np.uint32(dtheta))
    rdtype = x2.dtype
    bank_dt = np.float64 if rdtype == jnp.float64 else np.float32
    hr2 = h_bp.real.astype(bank_dt)[:, None]      # (n, 1)
    hi2 = h_bp.imag.astype(bank_dt)[:, None]
    prec = _resolve_precision(precision)

    def rem_bank(Tr):
        return _fold_banks(_bank_rem_np(hr2, Tr, M),
                           _bank_rem_np(hi2, Tr, M), bank_dt)

    # ---- piece 1: head outputs that straddle the carried tail ----------
    Th = min(max(-(-(n1 - first) // M), 0), T)
    pieces_re, pieces_im = [], []
    if Th > 0:
        head_w = (Th - 1) * M + n
        from_x = head_w - (n1 - first)
        zhead = jnp.concatenate([tail2[:, first:], x2[:, :from_x]], axis=1)
        yh = _plane_dot(zhead, rem_bank(Th), rdtype, prec)   # (2*Th,)
        pieces_re.append(yh[:Th])
        pieces_im.append(yh[Th:])
    # ---- piece 2: body frames, aligned to x ----------------------------
    shift0 = first + Th * M - n1        # in [0, M)
    Tb = T - Th
    start = shift0
    # ---- piece 2a: Pallas tiled interior (ops/pallas_ddc.py) -----------
    if _use_pallas(engine, precision, rdtype):
        from .pallas_ddc import (DEFAULT_P, DEFAULT_TF, HALO_FRAMES,
                                 make_pallas_ddc_body,
                                 pallas_body_supported)
        Pp = DEFAULT_P
        hop_p = Pp * M
        if pallas_body_supported(n, M, Pp) and Tb > 0:
            fb_avail = max((L - start - n1) // hop_p, 0)
            fb_avail = min(fb_avail, Tb // Pp)
            tiles = max((fb_avail - HALO_FRAMES) // DEFAULT_TF, 0)
            if tiles > 0:
                mode = "x3" if precision != "default" else "fast"
                body_fn = make_pallas_ddc_body(
                    ddc_taps(taps, np.uint32(dtheta)), M, tiles, mode=mode)
                span = (tiles * DEFAULT_TF + HALO_FRAMES) * hop_p
                xf = x2[:, start : start + span].reshape(2, -1, hop_p)
                yp = body_fn(xf)                     # (tiles*TF, 2P)
                pieces_re.append(yp[:, :Pp].reshape(-1).astype(rdtype))
                pieces_im.append(yp[:, Pp:].reshape(-1).astype(rdtype))
                emitted = tiles * DEFAULT_TF * Pp
                start += tiles * DEFAULT_TF * hop_p
                Tb -= emitted
    # ---- piece 2b: XLA banded-Toeplitz over what remains ----------------
    if block:
        P = max(min(int(block), max(Tb, 1)), max(-(-n1 // M), 1))
    else:
        P = max(min(max(128 // 2, 8), max((4 * n) // M, 8), max(Tb, 1)),
                max(-(-n1 // M), 1))
    hop = P * M
    Fb = 0
    if Tb > 0:
        Fb = min(max((L - start - n1) // hop, 0), Tb // P)
    if Fb > 0:
        Hb_r, Hh_r = _banks_np(hr2, P, M)
        Hb_i, Hh_i = _banks_np(hi2, P, M)
        bodies = x2[:, start : start + Fb * hop].reshape(2, Fb, hop)
        yb = _plane_dot(bodies, _fold_banks(Hb_r, Hb_i, bank_dt),
                        rdtype, prec)                        # (Fb, 2P)
        if n1 > 0:
            s1 = start + hop
            if Fb > 1:
                heads = x2[:, s1 : s1 + (Fb - 1) * hop].reshape(
                    2, Fb - 1, hop)[..., :n1]
                sl = start + Fb * hop
                last = x2[:, sl : sl + n1].reshape(2, 1, n1)
                heads = jnp.concatenate([heads, last], axis=1)
            else:
                heads = x2[:, s1 : s1 + n1].reshape(2, 1, n1)
            yb = yb + _plane_dot(heads, _fold_banks(Hh_r, Hh_i, bank_dt),
                                 rdtype, prec)
        pieces_re.append(yb[:, :P].reshape(-1).astype(rdtype))
        pieces_im.append(yb[:, P:].reshape(-1).astype(rdtype))
    # ---- piece 3: straggler outputs past the last full frame -----------
    Trem = Tb - Fb * P
    if Trem > 0:
        srem = start + Fb * hop
        wr = (Trem - 1) * M + n
        zrem = x2[:, srem : srem + wr]
        yr = _plane_dot(zrem, rem_bank(Trem), rdtype, prec)  # (2*Trem,)
        pieces_re.append(yr[:Trem])
        pieces_im.append(yr[Trem:])

    yre = pieces_re[0] if len(pieces_re) == 1 else jnp.concatenate(pieces_re)
    yim = pieces_im[0] if len(pieces_im) == 1 else jnp.concatenate(pieces_im)

    # ---- post-rotation at the decimated rate ---------------------------
    # w_t = theta0 + (first - n1 + t*M) * dtheta, all u32 wrapping
    d = int(np.uint32(dtheta))
    w0 = (jnp.uint32(theta0)
          + jnp.uint32((first * d) & 0xFFFFFFFF)
          - jnp.uint32((n1 * d) & 0xFFFFFFFF))
    dw = np.uint32((M * d) & 0xFFFFFFFF)
    rot = nco_complex_exponential(w0, dw, T, mode=rot_mode)
    c = jnp.real(rot).astype(rdtype)
    s = jnp.imag(rot).astype(rdtype)
    out_re = yre * c + yim * s
    out_im = yim * c - yre * s

    if n1 == 0:
        new_tail2 = tail2[:, :0]
    elif L >= n1:
        new_tail2 = x2[:, L - n1 :]
    else:  # short block: the new tail keeps part of the old one
        new_tail2 = jnp.concatenate([tail2[:, L:], x2], axis=1)
    theta_end = jnp.uint32(theta0) + jnp.uint32((L * d) & 0xFFFFFFFF)
    return out_re, out_im, new_tail2, theta_end


def ddc_apply(taps, dtheta, tail, theta0, x, decimation: int,
              precision="highest", block: int | None = None,
              rot_mode: str = "fast", engine: str = "auto"):
    """Complex-in/complex-out wrapper around :func:`ddc_apply_planar`.

    ``tail`` is the carried complex raw-input tail (ntaps-1,) — the same
    format as fir_decim_apply's tail but PRE-mix; returns
    (y, new_tail, theta_end) with y complex of length L // M.
    """
    tail2 = jnp.stack([jnp.real(tail), jnp.imag(tail)])
    x2 = jnp.stack([jnp.real(x), jnp.imag(x)])
    out_re, out_im, new_tail2, theta_end = ddc_apply_planar(
        taps, dtheta, tail2, theta0, x2,
        decimation, precision, block, rot_mode, engine)
    y = jax.lax.complex(out_re, out_im).astype(x.dtype)
    new_tail = jax.lax.complex(new_tail2[0], new_tail2[1]).astype(x.dtype)
    return y, new_tail, theta_end
