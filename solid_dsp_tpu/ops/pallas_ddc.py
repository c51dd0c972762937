"""Pallas (Mosaic) kernel for the fused-DDC body: banded-Toeplitz frame
dots + complex combine in one VMEM-resident pass.

Why: the XLA formulation of the same math (ops/ddc.py) round-trips HBM
between the body dot, the head dot, and the precision-split passes of
the BF16_BF16_F32_X3 algorithm.  Fusing them in VMEM reads the input
planes once and writes the decimated output once.  Measured on chip
(tools/proto_pallas_ddc.py, 16M-sample blocks, 64 taps, M=4):

    XLA x3       4.59 Gs/s   (~95 dB vs f64)
    Pallas x3   13.84 Gs/s   (106.8 dB vs f64)   <- 3.0x
    Pallas fast 16.4  Gs/s   (52 dB; single-pass bf16)

The kernel computes whole TILES of TF frames; every edge case (outputs
straddling the carried tail, non-tile-aligned remainders, stragglers)
stays on the XLA path in ops/ddc.py, which calls this for the aligned
interior only.

Layout (PERF_NOTES.md): input is (2, F, hop) f32 planes — a free reshape
of the chain's planar carry; output is (F, 2P) [re-block | im-block]
(block columns, never per-output interleaving).  The complex-tap algebra
is folded into per-plane banks: y = xr @ Br + xi @ Bi with
Br = [Hr | Hi], Bi = [-Hi | Hr] (ops/ddc.py::_fold_banks rationale).

In-kernel ops are all 2-D (Mosaic rejects 1-D reshapes/concats) and the
x3 precision split happens on VMEM tiles: a = hi(a) + lo(a) in bf16,
y = hi@Bhi + lo@Bhi + hi@Blo — the same three MXU passes as the XLA
X3 dot algorithm without its HBM-materialized operand conversions.

Reference seed: this is the hot loop of the reference chain
(dot_product/mod.rs:159-170 inside filter/fir/decim.rs:221-228 after
nco mix_down, main.rs:29-41) — one kernel instead of per-sample MACs.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fir import _banks_np

__all__ = ["make_pallas_ddc_body", "pallas_body_supported",
           "DEFAULT_P", "DEFAULT_TF", "HALO_FRAMES"]

DEFAULT_P = 64     # outputs per frame (N = 2P = 128 bank columns)
DEFAULT_TF = 128   # frames per grid tile (measured best of {64,128,256})
HALO_FRAMES = 8    # extra frames after the tiled region (Mosaic block min)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def pallas_body_supported(n_taps: int, M: int, P: int = DEFAULT_P) -> bool:
    """The kernel's head dot reaches at most one frame ahead: needs
    n_taps - 1 <= hop (= P*M)."""
    return 0 < n_taps - 1 <= P * M


@lru_cache(maxsize=64)
def _banks_cached(h_bytes: bytes, n: int, M: int, P: int):
    """Per-plane f32 banks from the complex bandpass taps: body
    (hop, 2P) and head (hpad, 2P) pairs (Br, Bi, Hr, Hi)."""
    h_bp = np.frombuffer(h_bytes, np.complex128).reshape(n)
    hr2 = h_bp.real.astype(np.float32)[:, None]
    hi2 = h_bp.imag.astype(np.float32)[:, None]
    hop = P * M
    n1 = n - 1
    hpad = min(hop, max(_round_up(max(n1, 1), 8), 8))
    Hb_r, Hh_r = _banks_np(hr2, P, M)   # (hop, P), (n1, P)
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

    Bbr, Bbi = fold(Hb_r, Hb_i, hop)
    Bhr, Bhi = fold(Hh_r, Hh_i, hpad)
    return (Bbr, Bbi, Bhr, Bhi), hpad


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_kernel(P: int, hpad: int, mode: str):
    def dot3(a32, b32):
        """x3: the three bf16 passes of the X3 dot algorithm, split in
        VMEM (operands never round-trip HBM in reduced precision)."""
        ah, al = _split_bf16(a32)
        bh, bl = _split_bf16(b32)
        y = jnp.dot(ah, bh, preferred_element_type=jnp.float32)
        y += jnp.dot(al, bh, preferred_element_type=jnp.float32)
        y += jnp.dot(ah, bl, preferred_element_type=jnp.float32)
        return y

    def dot1(a32, b32):
        """fast: single-pass bf16 (~52 dB)."""
        return jnp.dot(a32.astype(jnp.bfloat16), b32.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    dot = dot3 if mode == "x3" else dot1

    def kernel(x_ref, halo_ref, br_ref, bi_ref, hr_ref, hi_ref, o_ref):
        r = x_ref[0]                                  # (TF, hop)
        im = x_ref[1]
        y = dot(r, br_ref[:]) + dot(im, bi_ref[:])
        # heads: one-frame shift — rows 1..TF of this tile + halo row 0
        hr = jnp.concatenate([r[1:], halo_ref[0, :1]], axis=0)[:, :hpad]
        hi = jnp.concatenate([im[1:], halo_ref[1, :1]], axis=0)[:, :hpad]
        y += dot(hr, hr_ref[:]) + dot(hi, hi_ref[:])
        o_ref[:] = y

    return kernel


def make_pallas_ddc_body(h_bp: np.ndarray, M: int, tiles: int,
                         P: int = DEFAULT_P, TF: int = DEFAULT_TF,
                         mode: str = "x3",
                         interpret: bool | None = None):
    """Build the tiled body function.

    Args:
      h_bp: CONCRETE complex bandpass taps (numpy, design time).
      M: decimation.  tiles: grid size (static).
      mode: "x3" (~f32 accuracy, 3 MXU passes) | "fast" (1 bf16 pass).
      interpret: force interpreter mode (defaults to True off-TPU so CPU
        tests drive the identical kernel).

    Returns fn(xf) -> (tiles*TF, 2P) float32 where xf is the frame view
    (2, tiles*TF + HALO_FRAMES, hop) of the input planes; output columns
    are [re | im] blocks, UNROTATED (the caller applies the decimated-
    rate NCO rotation with the rest of the pieces).
    """
    h_bp = np.ascontiguousarray(np.asarray(h_bp, np.complex128))
    n = h_bp.shape[0]
    if not pallas_body_supported(n, M, P):
        raise ValueError("taps reach beyond one frame: n-1 > P*M")
    if TF % HALO_FRAMES:
        raise ValueError(f"TF must be a multiple of {HALO_FRAMES}")
    (banks, hpad) = _banks_cached(h_bp.tobytes(), n, M, P)
    bank_const = tuple(jnp.asarray(b) for b in banks)
    hop = P * M
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    kern = _make_kernel(P, hpad, mode)

    in_specs = [
        pl.BlockSpec((2, TF, hop), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        # halo: the HALO_FRAMES frames after the tile (row 0 used);
        # in range because xf carries HALO_FRAMES extra frames
        pl.BlockSpec((2, HALO_FRAMES, hop),
                     lambda i: (0, (i + 1) * (TF // HALO_FRAMES), 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
         for b in bank_const]

    call = pl.pallas_call(
        kern,
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TF, 2 * P), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles * TF, 2 * P), jnp.float32),
        interpret=interpret,
    )

    def run(xf):
        return call(xf, xf, *bank_const)

    return run
