"""Polyphase channelizer: M-channel critically-sampled analysis filter bank.

The wideband scale-out target (BASELINE.json config 5: 256-channel PFB
sharded across a pod slice).  Built on the same PFB decomposition as the
reference's fir/pfb.rs, extended with the DFT across branches:

    z[t, r] = sum_k h[k M + r] x[(t - k) M - r]
    Y[t, m] = sum_r z[t, r] e^{+2 pi i m r / M}   (one batched IDFT per step)

Channel m is the band centered at +m/M of the input rate, decimated by M.
The whole block is ONE reshape + K shifted multiply-adds + ONE batched
FFT (gather-free commutator form); the channel axis is the natural shard
axis for multi-chip (parallel.sharded).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..design import firdes
from ..utils.transfer import zeros_device, zeros_like_device

__all__ = ["channelizer_taps", "channelizer_init", "channelizer_apply",
           "channelizer_dft_bank", "channelizer_apply_planar",
           "fused_channelizer_init", "make_fused_channelizer",
           "PolyphaseChannelizer", "channelizer_synthesize",
           "synthesis_init", "PolyphaseSynthesizer",
           "os_channelizer_init", "os_channelizer_apply",
           "os_channelizer_synthesize", "os_reconstruction_taps",
           "OversampledChannelizer"]


def channelizer_taps(num_channels: int, taps_per_branch: int = 8,
                     attenuation: float = 80.0) -> np.ndarray:
    """Kaiser prototype lowpass for an M-channel bank (cutoff 1/(2M))."""
    n = num_channels * taps_per_branch
    h = firdes.firdes_kaiser(n, 0.5 / num_channels, attenuation, 0.0)
    return h * num_channels / np.sum(h)


def channelizer_init(num_channels: int, taps_per_branch: int,
                     dtype=jnp.complex64, batch_shape: tuple = ()):
    """Raw-sample tail of length K*M - 1."""
    from ..utils.transfer import zeros_device

    M, K = num_channels, taps_per_branch
    return zeros_device((*batch_shape, K * M - 1), dtype)


@partial(jax.jit, static_argnames=("num_channels",))
def channelizer_apply(taps, tail, x, num_channels: int):
    """One channelizer block.

    x: (..., L) with L a multiple of M.  Returns (Y, new_tail) where
    Y: (..., T, M) — T = L // M output steps of M channel samples.
    """
    M = num_channels
    K = taps.shape[-1] // M
    L = x.shape[-1]
    if L % M:
        raise ValueError("block length must be a multiple of the channel count")
    T = L // M
    x_ext = jnp.concatenate([tail, x], axis=-1)
    # Gather-free commutator form.  With base = K*M - 1 and the reshape
    # P[u, q] = x_ext[u*M + q], the branch sum
    #   z[t, r] = sum_k H[k, r] x_ext[base + (t-k)*M - r],  H[k,r]=taps[k*M+r]
    # becomes, substituting q = M-1-r and k' = K-1-k,
    #   z2[t, q] = sum_k' G[k', q] P[t + k', q]
    # where G = reverse(taps[:K*M]).reshape(K, M) — ONE tiny 1-D tap
    # reversal absorbs both index flips, and K static slices of P replace
    # the (T, K, M) gather (axon-unfriendly and HBM-wasteful).  The output
    # DFT over r then reads, with w = e^{+2 pi i / M} (a +c/M tone puts
    # e^{-2 pi i c r / M} across branches, so channel m extracts with
    # the inverse-DFT kernel w^{m r}):
    #   Y[t, m] = sum_r z[t,r] w^{m r} = w^{-m} * FFT_q(z2)[m].
    P = x_ext[..., : (T + K - 1) * M].reshape(*x_ext.shape[:-1], T + K - 1, M)
    G = taps[: K * M][::-1].reshape(K, M).astype(x.dtype)
    z2 = G[0] * P[..., 0:T, :]
    for k in range(1, K):
        z2 = z2 + G[k] * P[..., k: k + T, :]
    phase = np.exp(-2j * np.pi * np.arange(M) / M)
    Y = jnp.fft.fft(z2, axis=-1) * jnp.asarray(phase).astype(z2.dtype)
    return Y, x_ext[..., -(K * M - 1):]


def channelizer_dft_bank(num_channels: int, taps_per_branch: int,
                         taps: np.ndarray | None = None,
                         attenuation: float = 80.0) -> np.ndarray:
    """Host-side folded DFT bank for the PLANAR channelizer (2, M, 2M).

    The commutator algebra of :func:`channelizer_apply` (its docstring)
    gives Y[t, m] = fft_q(z2)[m] * e^{-2 pi i m / M}; folding the phase
    into the DFT matrix yields one bank W[q, m] = e^{-2 pi i (q+1) m / M},
    laid out for the plane-contracting matmul as [re-block | im-block]
    columns (ops/ddc.py::_fold_banks rationale — per-output interleaving
    lowers to a pathological gather on this backend).
    """
    M = int(num_channels)
    q = np.arange(M)[:, None]
    m = np.arange(M)[None, :]
    W = np.exp(-2j * np.pi * (q + 1) * m / M)
    B = np.zeros((2, M, 2 * M), np.float64)
    B[0, :, :M] = W.real
    B[0, :, M:] = W.imag
    B[1, :, :M] = -W.imag
    B[1, :, M:] = W.real
    return B


def channelizer_apply_planar(taps, bank, tail2, x2, num_channels: int,
                             precision: str = "x3"):
    """Planar channelizer block: branch conv + MXU matmul DFT.

    The TPU-headline formulation: input rides as (2, L) re/im float
    planes (complex64 is interleaved in HBM — plane slices are free,
    .real extraction is a strided pass), the K-branch prototype filter is
    K shifted multiply-adds over the free (2, T', M) frame reshape, and
    the M-point output DFT is ONE plane-folded MXU matmul instead of a
    batched FFT (measured weak FFT lowering on this backend,
    PERF_NOTES.md).  Output is (T, 2M) [re-block | im-block] columns —
    zero interleaving anywhere.

    Args:
      taps: CONCRETE prototype taps (numpy, design time).
      bank: (2, M, 2M) folded DFT bank from :func:`channelizer_dft_bank`.
      tail2: carried raw planes (2, K*M - 1).
      x2: input planes (2, L), L % M == 0.
      precision: "x3" (BF16_BF16_F32_X3, ~f32) | "default" (1-pass bf16)
        | "highest" (full f32 multi-pass) for the DFT matmul.

    ``taps`` and ``bank`` are compile-time constants (call this inside
    your own ``jax.jit``; it is not jitted here so the tap prep stays a
    host-side numpy computation).

    Returns (Y2, new_tail2): Y2[t, :M] = Re Y[t, :], Y2[t, M:] = Im Y[t, :]
    matching ``channelizer_apply`` to float rounding.
    """
    from ..ops.fir import _resolve_precision

    M = num_channels
    K = taps.shape[-1] // M
    L = x2.shape[-1]
    if L % M:
        raise ValueError("block length must be a multiple of the channel count")
    T = L // M
    rdtype = x2.dtype
    x_ext = jnp.concatenate([tail2, x2], axis=-1)
    P2 = x_ext[..., : (T + K - 1) * M].reshape(2, T + K - 1, M)
    G = np.asarray(taps)[: K * M].real[::-1].reshape(K, M)
    z2 = jnp.asarray(G[0], rdtype) * P2[:, 0:T, :]
    for k in range(1, K):
        z2 = z2 + jnp.asarray(G[k], rdtype) * P2[:, k: k + T, :]
    prec = _resolve_precision(precision)
    B = jnp.asarray(bank).astype(rdtype)
    Y2 = jax.lax.dot_general(z2, B, (((0, 2), (0, 1)), ((), ())),
                             precision=prec)
    return Y2, x_ext[..., -(K * M - 1):]


class PolyphaseChannelizer:
    """Stateful M-channel analysis channelizer.

    Backends:

    * ``"xla"`` (default) — the gather-free commutator formulation
      (reshape + K static slices + batched FFT); runs everywhere.
    * ``"fused"`` — the ONE-kernel Mosaic channelizer
      (:func:`make_fused_channelizer`): branch conv + MXU DFT in VMEM,
      the fastest measured path (41.0 Gs/s bf16 / 19.7 x3 at M=256,
      BENCH_ALL_r04.jsonl).  ``precision``: "x3" (~f32, >= 90 dB vs the
      commutator path) | "fast" (single-pass bf16, ~45-53 dB).  Block
      length must be a multiple of 8*M (the kernel's halo-tile quantum);
      off-TPU it runs in Mosaic interpret mode (slow — tests only).
    * ``"pallas"`` — DEPRECATED early front-end-only Mosaic kernel, kept
      for comparison; measured ~4x SLOWER than "xla" (its docstring
      carries the measurement).  Use "fused".
    """

    def __init__(self, num_channels: int, taps_per_branch: int = 8,
                 attenuation: float = 80.0, dtype=jnp.complex64,
                 backend: str = "xla", precision: str = "x3"):
        self.M = int(num_channels)
        self.K = int(taps_per_branch)
        if backend not in ("xla", "fused", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        if precision not in ("x3", "fast"):
            raise ValueError(f"unknown precision {precision!r}")
        self.backend = backend
        self.precision = precision
        taps_np = channelizer_taps(self.M, self.K, attenuation)
        self._taps_np = taps_np
        # taps stay HOST-side: an eager jnp.asarray of a complex array is
        # a complex device transfer the axon tunnel rejects (this exact
        # class lost its on-chip bench row to it); the jitted paths embed
        # them as closure constants instead
        self.taps = np.asarray(taps_np, dtype=np.dtype(dtype))
        self._dtype = dtype
        self._xla_fn = None
        if backend == "pallas":
            from ..ops.pallas_kernels import pfb_frontend_taps

            # taps stay host-side here: np.asarray(device_array) is a
            # device->host fetch the axon tunnel cannot do
            self._h_il = pfb_frontend_taps(taps_np, self.M)
            self._tail = zeros_device((self.K, self.M), jnp.complex64)
        elif backend == "fused":
            from ..ops.pallas_kernels import CHAN_HALO

            if self.K > CHAN_HALO:
                raise ValueError(
                    f"fused backend supports taps_per_branch <= {CHAN_HALO}")
            self._tail = fused_channelizer_init(self.M)
            self._fused_fns: dict = {}
        else:
            self._tail = channelizer_init(self.M, self.K, dtype)

    def _fused_fn(self, U: int):
        """Cached jitted complex-in/complex-out wrapper per frame count."""
        from ..ops.pallas_kernels import CHAN_HALO

        fn = self._fused_fns.get(U)
        if fn is None:
            if U % CHAN_HALO:
                raise ValueError(
                    f"fused backend needs block length a multiple of "
                    f"{CHAN_HALO * self.M} samples")
            TF = next(t for t in (512, 256, 128, 64, 32, 16, 8)
                      if U % t == 0)
            apply2 = make_fused_channelizer(self._taps_np, self.M, U,
                                            TF=TF, mode=self.precision)
            M = self.M

            @jax.jit
            def fn(tail, x):
                x2 = jnp.stack([jnp.real(x), jnp.imag(x)]
                               ).astype(jnp.float32)
                Y2, tail2 = apply2(tail, x2)
                Y = jax.lax.complex(Y2[:, :M], Y2[:, M:])
                return Y, tail2

            self._fused_fns[U] = fn
        return fn

    def execute_block(self, x):
        if self.backend == "pallas":
            from ..ops.pallas_kernels import channelizer_apply_pallas

            x = jnp.asarray(x, dtype=jnp.complex64)
            Y, self._tail = channelizer_apply_pallas(
                self._h_il, self._tail, x, self.M, self.K,
                interpret=jax.default_backend() != "tpu",
            )
            return Y
        if self.backend == "fused":
            x = jnp.asarray(x, dtype=jnp.complex64)
            if x.shape[-1] % self.M:
                raise ValueError(
                    "block length must be a multiple of the channel count")
            fn = self._fused_fn(int(x.shape[-1]) // self.M)
            Y, self._tail = fn(self._tail, x)
            return Y
        x = jnp.asarray(x, dtype=self._tail.dtype)
        if self._xla_fn is None:
            tn = self.taps  # host numpy -> jit closure constant

            @jax.jit
            def _run(tail, xx):
                return channelizer_apply(jnp.asarray(tn), tail, xx, self.M)

            self._xla_fn = _run
        Y, self._tail = self._xla_fn(self._tail, x)
        return Y

    def reset(self):
        self._tail = zeros_like_device(self._tail)

    def __repr__(self):
        return (f"PolyphaseChannelizer [M={self.M}] [K={self.K}] "
                f"[backend={self.backend}]")


# --------------------------------------------------------------------------
# synthesis bank: the transmit-side dual (M channels -> one wideband stream)
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("num_channels",))
def channelizer_synthesize(taps, tail_rows, Y, num_channels: int):
    """Polyphase synthesis bank: combine M channel streams into one
    wideband stream (the exact transpose of ``channelizer_apply``).

    Y: (..., T, M) channel samples (channel m lands at +m/M of the output
    rate); taps: the same prototype as analysis; tail_rows: (..., K, M)
    carry of the previous block's branch inputs.  Returns (x, new_tail)
    with x: (..., T*M).

        w[t, r] = sum_m Y[t, m] e^{+2 pi i m r / M}   (one batched IDFT)
        x[t*M + r] = sum_k h[k*M + r] * w[t - k, r]   (K shifted adds)

    The K-tap branch filtering is built from K shifted slices — no
    gathers, so it runs on the axon path too.
    """
    M = num_channels
    K = taps.shape[-1] // M
    H = taps[: K * M].reshape(K, M)
    T = Y.shape[-2]
    # batched IDFT across the channel axis (matches the analysis bank's
    # +m r / M kernel); ifft includes 1/M, cancel it
    w = jnp.fft.ifft(Y, axis=-1) * M  # (..., T, M)
    w_ext = jnp.concatenate([tail_rows.astype(w.dtype), w], axis=-2)
    acc = w_ext[..., K - 1: K - 1 + T, :] * H[0, :]
    for k in range(1, K):
        acc = acc + w_ext[..., K - 1 - k: K - 1 - k + T, :] * H[k, :]
    x = acc.reshape(*Y.shape[:-2], T * M)
    new_tail = w_ext[..., -(K - 1):, :] if K > 1 else w_ext[..., :0, :]
    return x, new_tail


def synthesis_init(num_channels: int, taps_per_branch: int,
                   dtype=jnp.complex64, batch_shape: tuple = ()):
    """Branch-input carry (K-1 rows of M); host-built (tunnel-safe)."""
    from ..utils.transfer import zeros_device

    return zeros_device((*batch_shape, taps_per_branch - 1, num_channels),
                        dtype)


class PolyphaseSynthesizer:
    """Stateful M-channel synthesis bank (transmit-side channelizer)."""

    def __init__(self, num_channels: int, taps_per_branch: int = 8,
                 attenuation: float = 80.0, dtype=jnp.complex64):
        self.M = int(num_channels)
        self.K = int(taps_per_branch)
        taps_np = channelizer_taps(self.M, self.K, attenuation)
        # host-side taps (closure constant; see PolyphaseChannelizer)
        self.taps = np.asarray(taps_np, dtype=np.dtype(dtype))
        self._tail = synthesis_init(self.M, self.K, dtype)
        tn = self.taps

        @jax.jit
        def _run(tail, Y):
            return channelizer_synthesize(jnp.asarray(tn), tail, Y, self.M)

        self._run = _run

    def execute_block(self, Y):
        Y = jnp.asarray(Y, self.taps.dtype)
        x, self._tail = self._run(self._tail, Y)
        return x

    def reset(self):
        self._tail = zeros_like_device(self._tail)

    def __repr__(self):
        return f"PolyphaseSynthesizer [M={self.M}] [K={self.K}]"


# ------------------------------------------------- 2x oversampled bank

def os_reconstruction_taps(num_channels: int, taps_per_branch: int = 16,
                           rolloff: float = 1.0) -> np.ndarray:
    """Root-Nyquist(1/M) prototype for analysis->synthesis roundtrips.

    The adjoint WOLA synthesis is near-perfect-reconstruction only when
    sum_m |H(f - m/M)|^2 is constant — the Nyquist power-tiling
    criterion, satisfied by a root-raised-cosine at "symbol rate" 1/M
    (any rolloff; truncation sets the floor).  Measured roundtrip SNR
    (random full-band input, M=16): K=8 -> 59 dB, K=12 -> 66 dB,
    K=16 -> 71 dB at rolloff 1.0.  The default Kaiser analysis
    prototype gives better adjacent-channel rejection but only ~14 dB
    reconstruction — choose by workload.
    """
    M, K = num_channels, taps_per_branch
    h = np.asarray(firdes.firdes_rrcos(M, K // 2, rolloff))[: M * K]
    return h * M / np.sum(h)


def os_channelizer_init(num_channels: int, taps_per_branch: int,
                        dtype=jnp.complex64, batch_shape: tuple = ()):
    """State: (raw tail of K*M - M/2 samples, global step parity)."""
    from ..utils.transfer import zeros_device

    M, K = num_channels, taps_per_branch
    return (zeros_device((*batch_shape, K * M - M // 2), dtype),
            zeros_device((), jnp.int32))


@partial(jax.jit, static_argnames=("num_channels",))
def os_channelizer_apply(taps, state, x, num_channels: int):
    """One block of the 2x-oversampled (WOLA) analysis bank.

    Channel m of the critically-sampled bank is decimated by M, so a
    signal reaching the channel edge (offset 0.5/M of input rate) folds
    onto the channel's Nyquist edge — adjacent-channel work (edge
    detection, perfect-reconstruction processing, per-channel resampling)
    needs headroom.  Here the commutator advances by R = M/2 per output
    step instead of M, doubling each channel's output rate:

        Y_p[m] = e^{+2 pi i m p R / M} * DFT_q( v_p )[m],
        v_p[q] = sum_k h[k M + q] x[p R - k M - q],

    where the leading twiddle is (-1)^{m p} for R = M/2 — the classic
    weighted-overlap-add phase correction, carried across blocks via the
    global step parity in the state.  Same prototype, same channel
    centers (+m/M), output rate 2/M of the input rate.

    x: (L,) with L a multiple of M (so parity bookkeeping stays block-
    size invariant).  Returns (Y, state) with Y: (T, M), T = 2 L / M.
    """
    M = num_channels
    R = M // 2
    if M % 2:
        raise ValueError("oversampled bank needs an even channel count")
    K = taps.shape[-1] // M
    L = x.shape[-1]
    if L % M:
        raise ValueError("block length must be a multiple of the channel count")
    tail, p0 = state
    x_ext = jnp.concatenate([tail, x], axis=-1)
    T = L // R
    # frames F_p = x_ext[p R : p R + K M]; prod[i] = h_rev[i] * F_p[i]
    # folds so that v_p[q] = fold(prod).reshape(K, M).sum(0)[M - 1 - q]
    hr = taps[: K * M][::-1].astype(x.dtype)
    # gather-free framing: hop R divides K*M, so frames are K*M // R
    # shifted length-R reshapes stacked on the last axis
    n_frames = T
    usable = (n_frames - 1) * R + K * M
    chunks = x_ext[..., :usable]
    k_slices = (K * M) // R
    pieces = [
        jax.lax.dynamic_slice_in_dim(
            chunks, j * R, (n_frames - 1) * R + R, axis=-1
        ).reshape(*x_ext.shape[:-1], n_frames, R)
        for j in range(k_slices)
    ]
    Fr = jnp.concatenate(pieces, axis=-1)          # (..., T, K*M)
    prod = Fr * hr
    S = prod.reshape(*prod.shape[:-1], K, M).sum(axis=-2)   # (..., T, M)
    v = S[..., ::-1]                               # v[q] = S[M-1-q]
    # +m/M channel centers like the critically-sampled bank -> inverse
    # DFT kernel across the fold (ifft carries 1/M, cancel it)
    Y = jnp.fft.ifft(v, axis=-1) * M
    # (-1)^{m p} with global p = p0 + local step index
    p_idx = (p0 + jnp.arange(T)) % 2               # (T,)
    m_sign = jnp.asarray(
        np.where(np.arange(M) % 2, -1.0, 1.0), Y.real.dtype)
    sign = jnp.where(p_idx[:, None] == 1, m_sign[None, :], 1.0)
    Y = Y * sign.astype(Y.dtype)
    new_tail = x_ext[..., -(K * M - R):]
    return Y, (new_tail, (p0 + T) % 2)


class OversampledChannelizer:
    """Stateful 2x-oversampled M-channel analysis bank (WOLA).

    ``prototype="kaiser"`` (default) maximizes adjacent-channel
    rejection for analysis work; ``prototype="rrc"`` uses the
    root-Nyquist design required for near-perfect reconstruction with
    ``synthesize`` (see os_reconstruction_taps).
    """

    def __init__(self, num_channels: int, taps_per_branch: int = 8,
                 attenuation: float = 80.0, dtype=jnp.complex64,
                 prototype: str = "kaiser", rolloff: float = 1.0):
        self.M = int(num_channels)
        self.K = int(taps_per_branch)
        if prototype == "kaiser":
            taps_np = channelizer_taps(self.M, self.K, attenuation)
        elif prototype == "rrc":
            taps_np = os_reconstruction_taps(self.M, self.K, rolloff)
        else:
            raise ValueError(f"unknown prototype {prototype!r}")
        self.prototype = prototype
        # host-side taps (closure constant; see PolyphaseChannelizer)
        self.taps = np.asarray(taps_np, dtype=np.dtype(dtype))
        self._state = os_channelizer_init(self.M, self.K, dtype)
        tn = self.taps

        @jax.jit
        def _run(state, x):
            return os_channelizer_apply(jnp.asarray(tn), state, x, self.M)

        self._run = _run

    def synthesize(self, Y):
        """Whole-block reconstruction from this bank's channel streams."""
        return os_channelizer_synthesize(jnp.asarray(self.taps),
                                         jnp.asarray(Y), self.M)

    @property
    def oversample(self) -> int:
        return 2

    def execute_block(self, x):
        x = jnp.asarray(x, self.taps.dtype)
        Y, self._state = self._run(self._state, x)
        return Y

    def reset(self):
        self._state = os_channelizer_init(self.M, self.K,
                                          self.taps.dtype)

    def __repr__(self):
        return (f"OversampledChannelizer [M={self.M}] [K={self.K}] "
                f"[os=2]")


@partial(jax.jit, static_argnames=("num_channels",))
def os_channelizer_synthesize(taps, Y, num_channels: int):
    """Reconstruct a wideband block from 2x-oversampled channel streams.

    Whole-block weighted-overlap-add synthesis: the exact ADJOINT of
    os_channelizer_apply's linear chain (sign -> FFT -> flip ->
    broadcast over the fold -> prototype multiply -> overlap-add),
    normalized per sample by the host-computed envelope
    d[n] = M * sum_p h_rev^2[n - p R] (the diagonal of A^H A), which the
    2x-oversampled prototype makes near-constant — the standard
    near-perfect-reconstruction WOLA synthesis.  Edge samples of the
    block carry partial-overlap transients; interior reconstruction
    error is set by the prototype (measured > 50 dB SNR for the default
    Kaiser design, see tests/test_os_channelizer.py).

    Y: (..., T, M) from os_channelizer_apply (T even, starting at even
    global step parity).  Returns x_hat: (..., T * M // 2,) aligned with
    the analysis input block (the K*M - M/2 tail region is trimmed).
    """
    M = num_channels
    R = M // 2
    K = taps.shape[-1] // M
    T = Y.shape[-2]
    hr = taps[: K * M][::-1]
    hr_j = jnp.asarray(hr).astype(Y.dtype)

    # adjoint of the (-1)^{m p} correction (block-local parity: the
    # class API always hands whole blocks starting at even parity)
    p_idx = jnp.arange(T) % 2
    m_sign = jnp.asarray(
        np.where(np.arange(M) % 2, -1.0, 1.0), Y.real.dtype)
    sign = jnp.where(p_idx[:, None] == 1, m_sign[None, :], 1.0)
    W = Y * sign.astype(Y.dtype)
    # adjoint of (ifft * M) is the forward FFT; then the flip and the
    # fold-broadcast
    v_adj = jnp.fft.fft(W, axis=-1)
    S_adj = v_adj[..., ::-1]
    prod_adj = jnp.tile(S_adj, (1,) * (S_adj.ndim - 1) + (K,))  # (...,T,K*M)
    Fr_adj = prod_adj * hr_j

    def _ola(frames):
        """Overlap-add rows of (..., T, K*M) at hop R (adjoint of the
        shifted-reshape framing): output length (T-1)*R + K*M."""
        ks = (K * M) // R
        n_chunks = T + ks - 1
        out = jnp.zeros((*frames.shape[:-2], n_chunks, R), frames.dtype)
        pieces = frames.reshape(*frames.shape[:-1], ks, R)
        for j in range(ks):
            out = out.at[..., j: j + T, :].add(pieces[..., j, :])
        return out.reshape(*frames.shape[:-2], n_chunks * R)

    x_acc = _ola(Fr_adj)
    # normalization envelope via the SAME overlap-add on |h|^2 (exact at
    # the block edges too); tiny static-shaped work, constant-folded by
    # XLA when the taps are compile-time constants
    h2 = jnp.real(hr_j * jnp.conj(hr_j)) * M
    env = jnp.real(_ola(jnp.tile(h2[None, :], (T, 1)).astype(Y.dtype)))
    x_hat = x_acc / (env + 1e-30).astype(Y.real.dtype)
    return x_hat[..., K * M - R: K * M - R + T * R]


def fused_channelizer_init(num_channels: int):
    """Tail-row carry for the FUSED Mosaic channelizer: the last
    CHAN_HALO frame rows of the previous block as (2, CHAN_HALO, M)
    planes (ops/pallas_kernels.py::make_pallas_channelizer)."""
    from ..ops.pallas_kernels import CHAN_HALO
    from ..utils.transfer import zeros_device

    return zeros_device((2, CHAN_HALO, int(num_channels)), jnp.float32)


def make_fused_channelizer(taps, num_channels: int, n_frames: int,
                           TF: int = 512, mode: str = "fast",
                           interpret: bool | None = None):
    """Build the fused-kernel channelizer ``apply(tail_rows, x2)``.

    ONE Mosaic kernel per block: the K+1-tap permuted branch filter
    (static sublane-shifted FMAs) and the M-point output DFT (plane-
    folded MXU matmul) run in VMEM — the branch products never touch
    HBM, unlike the XLA planar path.  Measured (v5e, M=256, K=8, 4M
    samples, device-loop, BENCH_ALL_r04.jsonl): 41.0 Gs/s bf16 /
    19.7 Gs/s x3 vs 19.8 / 13.7 for the XLA planar matmul-DFT path.

    Args:
      taps: CONCRETE prototype (numpy); num_channels: M; n_frames: the
        static frame count U = L // M per block (must divide by TF).
      mode: "fast" (1-pass bf16, ~53 dB) | "x3" (~f32, 108 dB measured
        vs the complex reference path).

    Returns apply(tail_rows, x2) -> (Y2, new_tail_rows):
      x2: (2, L) planes; Y2: (U, 2M) [re|im] columns matching
      ``channelizer_apply`` to the mode's accuracy; tail_rows as in
      :func:`fused_channelizer_init`.
    """
    from ..ops.pallas_kernels import CHAN_HALO, make_pallas_channelizer

    M = int(num_channels)
    U = int(n_frames)
    if U % TF:
        raise ValueError("n_frames must be a multiple of TF")
    kern = make_pallas_channelizer(np.asarray(taps), M, U // TF, TF=TF,
                                   mode=mode, interpret=interpret)

    def apply(tail_rows, x2):
        xf = x2.reshape(2, U, M)
        Y2 = kern(xf, tail_rows)
        new_tail = xf[:, U - CHAN_HALO:, :]
        return Y2, new_tail

    return apply
