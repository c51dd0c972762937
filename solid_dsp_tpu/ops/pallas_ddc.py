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

(body-kernel-only numbers from that prototype harness, round 3; the
current end-to-end chain rows live in BENCH_ALL_r*.jsonl.)

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
           "make_pallas_ddc_full", "pallas_full_supported",
           "make_pallas_ddc_fm", "pallas_fm_supported",
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


# --------------------------------------------------------------------------
# Backward-halo full-coverage kernel
#
# The forward kernel above needs its operand pre-sliced to the covered span,
# and a pallas operand that is a strided slice of a runtime argument forces
# XLA to materialize a full-rate copy (~0.43 ms / 128 MB block on chip —
# measured sliced 1.06 ms vs full-buffer 0.63 ms, tools/proto_pallas_ddc2.py
# follow-up).  This variant reformulates the band so output t reads
# x[t*M - D .. t*M - D + n), D = n - M: every frame's outputs reach BACKWARD
# into the previous frame only, so the kernel consumes the free reshape
# (2, L) -> (2, F, hop) of the WHOLE input argument — no slice, no copy —
# and the carried filter tail enters as one tiny extra row, replacing the
# XLA head piece entirely.


def pallas_full_supported(n_taps: int, M: int, P: int = DEFAULT_P) -> bool:
    """Backward reach D = n_taps - M must fit one frame: 0 < D <= hop."""
    return 0 < n_taps - M <= P * M


@lru_cache(maxsize=64)
def _banks_full_cached(h_bytes: bytes, n: int, M: int, P: int):
    """Banks for the backward formulation.

    _banks_np's Hfull[(p*M + j), p] = h[j] has its nonzero rows in
    [0, hop + D) with D = n - M; output p's window covers frame-local
    x rows [p*M - D, p*M - D + n).  Body rows (x_f[0..hop)) are
    Hfull[D : D + hop]; rows [0, D) hit the PREVIOUS frame's trailing
    columns [hop - D, hop), padded at the top to hpad (sublane multiple)
    so the kernel slices prev[:, hop - hpad :].
    """
    h_bp = np.frombuffer(h_bytes, np.complex128).reshape(n)
    hr2 = h_bp.real.astype(np.float32)[:, None]
    hi2 = h_bp.imag.astype(np.float32)[:, None]
    hop = P * M
    D = n - M
    hpad = min(hop, max(_round_up(D, 8), 8))
    Hf_r = np.concatenate(_banks_np(hr2, P, M), axis=0)   # (hop + n-1, P)
    Hf_i = np.concatenate(_banks_np(hi2, P, M), axis=0)

    def fold(Hr, Hi, rows):
        Br = np.zeros((rows, 2 * P), np.float32)
        Bi = np.zeros((rows, 2 * P), np.float32)
        r = Hr.shape[0]
        Br[:r, :P] = Hr
        Br[:r, P:] = Hi
        Bi[:r, :P] = -Hi
        Bi[:r, P:] = Hr
        return Br, Bi

    Bbr, Bbi = fold(Hf_r[D : D + hop], Hf_i[D : D + hop], hop)
    prev_r = np.zeros((hpad, P), np.float32)
    prev_i = np.zeros((hpad, P), np.float32)
    prev_r[hpad - D :] = Hf_r[:D]
    prev_i[hpad - D :] = Hf_i[:D]
    Bpr, Bpi = fold(prev_r, prev_i, hpad)
    return (Bbr, Bbi, Bpr, Bpi), hpad


def _fdiv(num, den):
    """Division via approximate reciprocal + TWO Newton steps (~1e-10
    relative — the bound the _atan2 accuracy claim relies on): measured
    faster than the hardware f32 divide in the VPU epilogue (compiled
    path); interpret mode (CPU tests) falls back to the exact divide —
    pl.reciprocal has no interpret lowering."""
    try:
        r = pl.reciprocal(den, approx=True)
    except Exception:  # unsupported backend
        return num / den
    r = r * (2.0 - den * r)
    r = r * (2.0 - den * r)   # 2nd step: ~1e-5 -> ~1e-10 relative
    return num * r


# atan(t)/t ~ P(t^2) on [0, 1]: degree-8 Chebyshev-fitted minimax, max
# error 4.6e-8 rad (host-fitted; see tools history).  One long polynomial
# replaces the classic second range reduction at tan(pi/8) — its extra
# DIVISION plus branch selects cost more VPU passes than 4 extra FMAs.
_ATAN_P = tuple(np.float32(v) for v in (
    3.0496670837e-03, -1.6826361744e-02, 4.3854018740e-02,
    -7.5966915136e-02, 1.0681372642e-01, -1.4213185682e-01,
    1.9993715063e-01, -3.3333120743e-01, 9.9999998808e-01))


def _atan2(y, x):
    """f32 atan2 from supported Mosaic primitives (no atan/atan2 lowering).

    Reduce to t = min/max in [0, 1] (ONE division, via fast reciprocal),
    evaluate the odd minimax polynomial, fix quadrants with where/sign.
    Max error < 1e-7 rad vs libm atan2 — far below the chain's 90 dB
    gates (checked by the interpret-mode parity tests).
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    t = _fdiv(mn, jnp.maximum(mx, np.float32(1e-37)))
    z = t * t
    p = _ATAN_P[0]
    for c in _ATAN_P[1:]:
        p = p * z + c
    r = p * t
    r = jnp.where(ay > ax, np.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, np.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def _make_kernel_full(P: int, hop: int, hpad: int, mode: str):
    if mode == "x3":
        def dots(ah, al, bh, bl):
            y = jnp.dot(ah, bh[:], preferred_element_type=jnp.float32)
            y += jnp.dot(al, bh[:], preferred_element_type=jnp.float32)
            y += jnp.dot(ah, bl[:], preferred_element_type=jnp.float32)
            return y

        def kernel(x_ref, lhalo_ref, tail_ref,
                   brh, brl, bih, bil, prh, prl, pih, pil, o_ref):
            i = pl.program_id(0)
            r = x_ref[0]
            im = x_ref[1]
            rh, rl = _split_bf16(r)
            ih, il = _split_bf16(im)
            y = dots(rh, rl, brh, brl) + dots(ih, il, bih, bil)
            # previous frame per row: in-tile shift; tile boundary row
            # comes from the left halo (or the carried tail at tile 0)
            pr0 = jnp.where(i == 0, tail_ref[0, 7:8], lhalo_ref[0, 7:8])
            pi0 = jnp.where(i == 0, tail_ref[1, 7:8], lhalo_ref[1, 7:8])
            p0h, p0l = _split_bf16(pr0)
            q0h, q0l = _split_bf16(pi0)
            pvh = jnp.concatenate([p0h, rh[:-1]], axis=0)[:, hop - hpad :]
            pvl = jnp.concatenate([p0l, rl[:-1]], axis=0)[:, hop - hpad :]
            qvh = jnp.concatenate([q0h, ih[:-1]], axis=0)[:, hop - hpad :]
            qvl = jnp.concatenate([q0l, il[:-1]], axis=0)[:, hop - hpad :]
            y += dots(pvh, pvl, prh, prl) + dots(qvh, qvl, pih, pil)
            o_ref[:] = y
    else:
        def kernel(x_ref, lhalo_ref, tail_ref, br, bi, pr, pi_, o_ref):
            i = pl.program_id(0)
            r = x_ref[0].astype(jnp.bfloat16)
            im = x_ref[1].astype(jnp.bfloat16)
            y = jnp.dot(r, br[:], preferred_element_type=jnp.float32)
            y += jnp.dot(im, bi[:], preferred_element_type=jnp.float32)
            pr0 = jnp.where(i == 0, tail_ref[0, 7:8],
                            lhalo_ref[0, 7:8]).astype(jnp.bfloat16)
            pi0 = jnp.where(i == 0, tail_ref[1, 7:8],
                            lhalo_ref[1, 7:8]).astype(jnp.bfloat16)
            pv = jnp.concatenate([pr0, r[:-1]], axis=0)[:, hop - hpad :]
            qv = jnp.concatenate([pi0, im[:-1]], axis=0)[:, hop - hpad :]
            y += jnp.dot(pv, pr[:], preferred_element_type=jnp.float32)
            y += jnp.dot(qv, pi_[:], preferred_element_type=jnp.float32)
            o_ref[:] = y
    return kernel


def _split_banks_np(mats):
    import ml_dtypes

    bf16 = ml_dtypes.bfloat16
    out = []
    for a in mats:
        hi = np.asarray(a, bf16)   # pure numpy: safe inside jit traces
        lo = np.asarray(a - np.asarray(hi, np.float32), bf16)
        out += [hi, lo]
    return out


def make_pallas_ddc_full(h_bp: np.ndarray, M: int, tiles: int,
                         P: int = DEFAULT_P, TF: int = DEFAULT_TF,
                         mode: str = "x3",
                         interpret: bool | None = None):
    """Build the full-coverage backward-halo body function.

    Returns fn(xf, tailrow) -> (tiles*TF, 2P) f32 where xf is the FREE
    frame view (2, F, hop) of the whole input planes (F >= tiles*TF;
    trailing frames beyond the tiles are untouched) and tailrow is a
    (2, 8, hop) array whose LAST row holds the carried extended tail
    x_ext[-hop:] = [zeros(hop - D) | tail2[:, M-1:]] (D = n - M).

    Output index t = (tile*TF + f)*P + p runs over ALL outputs of the
    covered frames starting at output 0 of the block — the tail
    contribution is inside the kernel, so no separate XLA head piece.
    """
    h_bp = np.ascontiguousarray(np.asarray(h_bp, np.complex128))
    n = h_bp.shape[0]
    if not pallas_full_supported(n, M, P):
        raise ValueError("backward reach out of range: need 0 < n-M <= P*M")
    if TF % HALO_FRAMES:
        raise ValueError(f"TF must be a multiple of {HALO_FRAMES}")
    (banks, hpad) = _banks_full_cached(h_bp.tobytes(), n, M, P)
    if mode == "x3":
        bank_const = tuple(jnp.asarray(b) for b in _split_banks_np(banks))
    else:
        bank_const = tuple(jnp.asarray(b, jnp.bfloat16) for b in banks)
    hop = P * M
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    kern = _make_kernel_full(P, hop, hpad, mode)

    in_specs = [
        pl.BlockSpec((2, TF, hop), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        # left halo: the HALO_FRAMES frames before the tile (last row
        # used); clamped at tile 0 where the tail row takes over
        pl.BlockSpec((2, HALO_FRAMES, hop),
                     lambda i: (0, jnp.maximum(i * (TF // HALO_FRAMES) - 1,
                                               0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, HALO_FRAMES, hop), lambda i: (0, 0, 0),
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
        cost_estimate=pl.CostEstimate(
            flops=(2 * TF * (hop + hpad) * 2 * P * 2
                   * (3 if mode == "x3" else 1)) * tiles,
            bytes_accessed=2 * tiles * TF * hop * 4
            + tiles * TF * 2 * P * 4,
            transcendentals=0),
        interpret=interpret,
    )

    def run(xf, tailrow):
        return call(xf, xf, tailrow, *bank_const)

    return run


# --------------------------------------------------------------------------
# Fully fused FM kernel: DDC body + discriminator in one VMEM pass
#
# With the collapsed-epilogue algebra (ops/ddc.py::ddc_fm_epilogue), the FM
# audio is atan2 of z[t] conj(z[t-1]) e^{-j drad} — every term of which the
# backward-halo kernel already has in VMEM: z[t-1] is the neighbouring
# output inside the tile (previous column / previous row's last column),
# and the one cross-tile seam is recomputed from the left-halo frame with a
# single extra bank column.  Emitting the f32 audio (half the bytes of the
# complex z) plus a tiny per-tile stats row removes the entire decimated-
# rate XLA epilogue from HBM.


def pallas_fm_supported(n_taps: int, M: int, P: int = DEFAULT_P) -> bool:
    """Needs the backward-halo geometry AND the seam recompute window
    (the previous frame's last output) to fit one frame: n <= hop."""
    return pallas_full_supported(n_taps, M, P) and n_taps <= P * M


@lru_cache(maxsize=64)
def _seam_bank_cached(h_bytes: bytes, n: int, M: int, P: int):
    """Bank for the previous frame's LAST output: its window is the
    frame's trailing n samples (rows [hop-n, hop)).  Padded to 128 lanes
    (cols 0/1 = re/im parts) so the dot shape is MXU-clean."""
    h_bp = np.frombuffer(h_bytes, np.complex128).reshape(n)
    hr = h_bp.real.astype(np.float32)
    hi = h_bp.imag.astype(np.float32)
    hop = P * M
    Bs_r = np.zeros((hop, 128), np.float32)
    Bs_i = np.zeros((hop, 128), np.float32)
    Bs_r[hop - n :, 0] = hr
    Bs_r[hop - n :, 1] = hi
    Bs_i[hop - n :, 0] = -hi
    Bs_i[hop - n :, 1] = hr
    return Bs_r, Bs_i


def _make_kernel_fm(P: int, hop: int, hpad: int, mode: str,
                    cd: float, sd: float, scale: float):
    # NumPy scalars (not jnp): device scalars made outside the kernel
    # trace would be "captured constants", which pallas_call rejects
    cd = np.float32(cd)
    sd = np.float32(sd)
    scale = np.float32(scale)

    def pick11(v, i, j):
        """v[i, j] as a (1, 1) value at register offset (0, 0) — direct
        corner slices carry their source offsets, which Mosaic's concat
        rejects on the non-concat dimension; a masked reduction lands
        the value at offset 0.  The reduction runs over an 8-ROW slice
        around i, not the whole tile: full-tile masked reductions just to
        read one scalar measured as a large share of the VPU epilogue."""
        if v.shape[0] <= 8:
            r0, vs = 0, v
        else:
            r0 = (i // 8) * 8          # python int (i is static)
            vs = v[r0:r0 + 8, :]
        ri = jax.lax.broadcasted_iota(jnp.int32, vs.shape, 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, vs.shape, 1)
        m = (ri == (i - r0)) & (ci == j)
        return jnp.sum(jnp.where(m, vs, 0.0), axis=(0, 1), keepdims=True)

    def finish(y, zs, o_audio, o_stats):
        # FULL-LANE (packed) epilogue: every op below runs on the intact
        # (TF, 2P) [re-block | im-block] register layout.  The earlier
        # formulation sliced y into (TF, P) re/im halves first — P = 64
        # lanes, so every roll/where/product ran at half lane width with
        # relayouts, and the 64-lane audio output block forced another;
        # that split + narrow output alone measured ~0.4 ms/block (the
        # whole body dot section is ~0.24 ms).
        #
        # Previous-output-in-flat-order, packed: lane-roll right by 1
        # shifts both blocks at once; the wrapped lanes {0, P} need the
        # previous row's last column OF THEIR OWN BLOCK, which is exactly
        # roll(y, P+1, lanes) sublane-rolled by 1.  The (0, {0, P})
        # corners take the recomputed cross-tile seam zs.
        ci = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
        ri = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
        A = pltpu.roll(y, 1, 1)
        E2 = pltpu.roll(pltpu.roll(y, P + 1, 1), 1, 0)
        wrap = (ci == 0) | (ci == P)
        seam_row = (pick11(zs, 0, 0) * (ci == 0)
                    + pick11(zs, 0, 1) * (ci == P))
        pre = jnp.where(wrap & (ri == 0), seam_row,
                        jnp.where(wrap, E2, A))
        # cross products u = z * conj(z_prev) in packed halves:
        #   S = y*pre -> [re*pre_re | im*pre_im]; u_re = S + roll(S, P)
        #   T = roll(y, P)*pre -> [im*pre_re | re*pre_im];
        #   u_im = T - roll(T, P)   (upper half is -u_im: never read —
        #   the caller consumes audio[:, :P] only)
        S = y * pre
        ure = S + pltpu.roll(S, P, 1)
        T = pltpu.roll(y, P, 1) * pre
        uim = T - pltpu.roll(T, P, 1)
        dre = ure * cd - uim * sd
        dim = uim * cd + ure * sd
        o_audio[:] = _atan2(dim, dre) * scale
        one = jnp.zeros((1, 1), jnp.float32)
        TFr = y.shape[0]
        stats = jnp.concatenate([
            one + jnp.sum(y * y),            # [0] tile energy sum|z|^2
            pick11(y, TFr - 1, P - 1),       # [1] z_last re
            pick11(y, TFr - 1, 2 * P - 1),   # [2] z_last im
            pick11(y, 0, 0),                 # [3] z_first re
            pick11(y, 0, P),                 # [4] z_first im
            jnp.zeros((1, 128 - 5), jnp.float32),
        ], axis=1)
        # (8, 128) block: Mosaic needs the trailing dims of an output
        # block to be sublane/lane aligned — row 0 carries the data
        o_stats[:] = jnp.concatenate([stats] * 8, axis=0)

    if mode == "x3":
        def dots(ah, al, bh, bl):
            y = jnp.dot(ah, bh[:], preferred_element_type=jnp.float32)
            y += jnp.dot(al, bh[:], preferred_element_type=jnp.float32)
            y += jnp.dot(ah, bl[:], preferred_element_type=jnp.float32)
            return y

        def kernel(x_ref, lhalo_ref, tail_ref,
                   brh, brl, bih, bil, prh, prl, pih, pil,
                   bsr, bsi, o_audio, o_stats):
            i = pl.program_id(0)
            r = x_ref[0]
            im = x_ref[1]
            rh, rl = _split_bf16(r)
            ih, il = _split_bf16(im)
            y = dots(rh, rl, brh, brl) + dots(ih, il, bih, bil)
            pr0 = jnp.where(i == 0, tail_ref[0, 7:8], lhalo_ref[0, 7:8])
            pi0 = jnp.where(i == 0, tail_ref[1, 7:8], lhalo_ref[1, 7:8])
            p0h, p0l = _split_bf16(pr0)
            q0h, q0l = _split_bf16(pi0)
            pvh = jnp.concatenate([p0h, rh[:-1]], axis=0)[:, hop - hpad :]
            pvl = jnp.concatenate([p0l, rl[:-1]], axis=0)[:, hop - hpad :]
            qvh = jnp.concatenate([q0h, ih[:-1]], axis=0)[:, hop - hpad :]
            qvl = jnp.concatenate([q0l, il[:-1]], axis=0)[:, hop - hpad :]
            y += dots(pvh, pvl, prh, prl) + dots(qvh, qvl, pih, pil)
            # seam: previous frame's last output, full-precision f32 dot
            # (1 row — MXU cost is negligible)
            zs = (jnp.dot(pr0, bsr[:], preferred_element_type=jnp.float32)
                  + jnp.dot(pi0, bsi[:], preferred_element_type=jnp.float32))
            finish(y, zs, o_audio, o_stats)
    else:
        def kernel(x_ref, lhalo_ref, tail_ref, br, bi, pr, pi_,
                   bsr, bsi, o_audio, o_stats):
            i = pl.program_id(0)
            r16 = x_ref[0].astype(jnp.bfloat16)
            i16 = x_ref[1].astype(jnp.bfloat16)
            y = jnp.dot(r16, br[:], preferred_element_type=jnp.float32)
            y += jnp.dot(i16, bi[:], preferred_element_type=jnp.float32)
            pr0 = jnp.where(i == 0, tail_ref[0, 7:8], lhalo_ref[0, 7:8])
            pi0 = jnp.where(i == 0, tail_ref[1, 7:8], lhalo_ref[1, 7:8])
            pv = jnp.concatenate([pr0.astype(jnp.bfloat16), r16[:-1]],
                                 axis=0)[:, hop - hpad :]
            qv = jnp.concatenate([pi0.astype(jnp.bfloat16), i16[:-1]],
                                 axis=0)[:, hop - hpad :]
            y += jnp.dot(pv, pr[:], preferred_element_type=jnp.float32)
            y += jnp.dot(qv, pi_[:], preferred_element_type=jnp.float32)
            zs = (jnp.dot(pr0, bsr[:], preferred_element_type=jnp.float32)
                  + jnp.dot(pi0, bsi[:], preferred_element_type=jnp.float32))
            finish(y, zs, o_audio, o_stats)
    return kernel


def make_pallas_ddc_fm(h_bp: np.ndarray, M: int, tiles: int, dw: np.uint32,
                       kf: float, P: int = DEFAULT_P, TF: int = DEFAULT_TF,
                       mode: str = "x3",
                       interpret: bool | None = None):
    """Build the fused DDC+FM body: fn(xf, tailrow) -> (audio, stats).

    audio: (tiles*TF, 2P) f32 — the FM audio in columns [:P] (columns
    [P:] are a packed-lane computation artifact, see the out_specs note);
    audio[t] (row-major over the [:P] block) = atan2 of z[t] conj(z[t-1])
    rotated by the constant e^{-j rad(dw)}, scaled by 1/(2 pi kf) — i.e.
    the collapsed-epilogue FM discriminator (ops/ddc.py) for every output
    of the covered frames.  Output 0 of tile 0 uses a seam recomputed
    from the carried tail row that is missing the oldest tap sample
    (the tail carries n-1, the seam window wants n) — the caller
    overwrites audio[0] exactly from the carried fm_prev state.

    stats: (tiles*8, 128) f32 — per tile an (8, 128) block whose row 0 is
    [energy sum|z|^2, z_last re, z_last im, z_first re, z_first im, 0...]
    (8 identical rows: output blocks need sublane-aligned shapes) — the
    AGC energy and seam values the caller needs, so the complex z never
    leaves VMEM.
    """
    h_bp = np.ascontiguousarray(np.asarray(h_bp, np.complex128))
    n = h_bp.shape[0]
    if not pallas_fm_supported(n, M, P):
        raise ValueError("fused FM needs 0 < n-M <= hop and n <= hop")
    if TF % HALO_FRAMES:
        raise ValueError(f"TF must be a multiple of {HALO_FRAMES}")
    (banks, hpad) = _banks_full_cached(h_bp.tobytes(), n, M, P)
    if mode == "x3":
        bank_const = tuple(jnp.asarray(b) for b in _split_banks_np(banks))
    else:
        bank_const = tuple(jnp.asarray(b, jnp.bfloat16) for b in banks)
    seam_const = tuple(jnp.asarray(b)
                       for b in _seam_bank_cached(h_bp.tobytes(), n, M, P))
    hop = P * M
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    drad = float(np.float64(np.uint32(dw)) * (2.0 * np.pi / 4294967296.0))
    kern = _make_kernel_fm(P, hop, hpad, mode,
                           np.cos(drad), -np.sin(drad),
                           1.0 / (2.0 * np.pi * float(kf)))

    in_specs = [
        pl.BlockSpec((2, TF, hop), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, HALO_FRAMES, hop),
                     lambda i: (0, jnp.maximum(i * (TF // HALO_FRAMES) - 1,
                                               0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, HALO_FRAMES, hop), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
         for b in bank_const + seam_const]

    call = pl.pallas_call(
        kern,
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=[
            # audio rides PACKED (TF, 2P): a P=64-lane output block would
            # force half-width relayouts on every epilogue op (measured
            # ~0.4 ms/block); lanes [P:) duplicate/garbage — callers read
            # [:, :P].  The extra write is ~16 MB/block (~25 us) vs the
            # ~0.4 ms saved.
            pl.BlockSpec((TF, 2 * P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles * TF, 2 * P), jnp.float32),
            jax.ShapeDtypeStruct((tiles * 8, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 * TF * (hop + hpad) * 2 * P * 2
                   * (3 if mode == "x3" else 1)) * tiles,
            bytes_accessed=2 * tiles * TF * hop * 4 + tiles * TF * P * 4,
            transcendentals=tiles * TF * P),
        interpret=interpret,
    )

    def run(xf, tailrow):
        return call(xf, xf, tailrow, *bank_const, *seam_const)

    return run
