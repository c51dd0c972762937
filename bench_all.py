"""Full benchmark sweep — one JSON line per headline workload.

``bench.py`` prints the single driver metric (rx-chain throughput);
this sweep covers the other headliners for humans/judges:

* rx_chain          — driver config 4 (same as bench.py)
* channelizer_xla   — 256-ch polyphase bank, fused gather+einsum path
* iir_bank_pallas   — 256-channel biquad cascade, sequential Mosaic kernel
* windowed_fft_4096 — config 2 spectral analysis (+ GFLOP/s)
* ... plus parity modes, non-pow2 FFT, front-end ops, modem ops, LDPC.

Each line: {"metric", "value", "unit", "vs_baseline"}.  Run on the TPU
(no platform override).

TIMING METHODOLOGY (see utils/benchtime.py): the tunneled PJRT client's
``block_until_ready`` can acknowledge before the device finishes, which
inflated earlier sweeps past hardware speed-of-light.  Every workload here
is measured by regression over iteration count with a trailing scalar
device->host fetch as the completion barrier: T(k) = latency + k*t_iter,
slope = true per-iteration time.  Each step threads a scalar checksum into
the next iteration so the device cannot reorder or elide work.  An HBM
read-bandwidth control is printed first — no workload's implied HBM
traffic may exceed it.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from solid_dsp_tpu.utils.benchtime import measure_apply_devloop, measure_step
from solid_dsp_tpu.utils.transfer import put_complex

# BENCH_SMOKE=1: tiny sizes + short ks, for CPU structural validation only
import os
SMOKE = bool(int(os.environ.get("BENCH_SMOKE", "0")))
if SMOKE and os.environ.get("JAX_PLATFORMS") == "cpu":
    # honor the CPU request under smoke: the image's sitecustomize
    # initializes the TPU plugin before env vars can take effect
    jax.config.update("jax_platforms", "cpu")
# Longer chains + 2 repetitions: with ~1 ms iterations the tunnel's
# round-trip jitter dominates 3-point slopes at small k (r02 sweep rows
# swung far above/below bench.py's repeated-run numbers).
KS = (1, 2, 3) if SMOKE else (4, 16, 48)
REPS = 1 if SMOKE else 2


def _size(bits: int) -> int:
    return 1 << (14 if SMOKE else bits)


def _retried(fn, attempts: int = 3, sleep_s: float = 45.0):
    """The axon tunnel intermittently returns UNIMPLEMENTED for ordinary
    ops; quiet retry with a cool-down usually succeeds."""
    for i in range(attempts):
        try:
            return fn()
        except Exception:
            if i == attempts - 1:
                raise
            time.sleep(sleep_s)


def _measure(step, s0, ks=KS, reps=REPS):
    r = _retried(lambda: measure_step(step, s0, ks=ks, reps=reps, warmup=3))
    return r["t_iter"]


# HBM streaming speed of light for the %-of-SOL column: the measured
# plain-XLA reduction rate on this chip (PERF_NOTES.md #15; the live
# control row hbm_read_control is printed alongside every sweep so the
# constant is re-validated per run).
HBM_SOL_GBPS = 790.0


def _row(metric, sps, unit="Msamples/s", bps=None):
    """One sweep row; ``bps`` = minimum HBM bytes per input sample
    (ingest + egress) adds the roofline columns: achieved GB/s of
    MINIMUM traffic and % of the streaming speed of light (a fused
    kernel can at best reach 100%; XLA pipelines with materialized
    intermediates sit proportionally lower)."""
    r = {"metric": metric, "value": round(sps / 1e6, 1), "unit": unit,
         "vs_baseline": round(sps / 1e9, 3)}
    if bps is not None:
        gbps = sps * bps / 1e9
        r["min_GBps"] = round(gbps, 1)
        r["pct_sol"] = round(100.0 * gbps / HBM_SOL_GBPS, 1)
    return r


def _tone_np(L):
    k = np.arange(L)
    return (0.1 * np.exp(2j * np.pi * 0.033 * k)).astype(np.complex64)


def _tone(L):
    # put_complex: top-level complex h2d can poison the tunnel client —
    # ship real/imag f32 and rebuild on device (utils/transfer.py)
    return put_complex(_tone_np(L))


def _noise(shape, seed=0):
    rng = np.random.default_rng(seed)
    return put_complex((rng.standard_normal(shape)
                        + 1j * rng.standard_normal(shape)
                        ).astype(np.complex64))


def _chain_step(apply, x):
    # x is passed as a runtime ARGUMENT, never closed over inside jit:
    # embedding a committed device array as an MLIR constant forces a
    # device->host fetch that poisons the axon tunnel client.
    @jax.jit
    def g(st, x):
        out, st2 = apply(st, x)
        return jnp.sum(out), st2

    def step(carry):
        chk, st = carry
        c2, st2 = g(st, x)
        return c2, (c2, st2)

    return step


def _measure_chain_devloop(apply, st, x, n):
    """Fast chains (< ~1 ms/block) via the device-side iteration loop:
    per-dispatch chaining is host-enqueue-bound over the tunnel and
    under-reports them (PERF_NOTES.md #14).  Slow chains (parity modes)
    keep per-dispatch timing — enqueue is negligible there."""
    iters = 4 if SMOKE else 16
    r = _retried(lambda: measure_apply_devloop(
        apply, st, x, iters=iters,
        ks=(1, 2, 3) if SMOKE else (1, 2, 4), reps=1 if SMOKE else 3))
    return n / r["t_iter"]


def _stateless_step(f, x):
    """Chain iterations through the CHECKSUM only.

    The previous form threaded the checksum into the input
    (``x + 0.0*chk``) — that forces a full read+write copy of the input
    every iteration (~0.76 ms per 128 MB at the measured HBM bandwidth),
    which DEFLATED every stateless measurement; it capped kernels at
    ~16 Gs/s regardless of their real speed (PERF_NOTES.md #8).
    Summing into the carry is sound: k sequential dispatches of the same
    executable cannot be elided or CSE'd across calls, and a single
    TensorCore serializes their execution.

    NOTE (measurement semantics): because the ITERATION'S INPUT no longer
    depends on the previous iteration's output, the scheduler may overlap
    the tail of dispatch k with the head of dispatch k+1 — rows measured
    through this helper are PIPELINED-throughput numbers (the honest
    serving-rate figure), not isolated-latency ones.  State-carrying
    chains use _chain_step / the devloop (true data dependency)."""
    @jax.jit
    def g(chk, x):
        return chk + jnp.sum(jnp.abs(f(x)))

    def step(chk):
        c2 = g(chk, x)
        return c2, c2

    return step


def bench_hbm_control():
    # the one shared speed-of-light control (utils/benchtime.py) —
    # methodology changes there apply to this gate automatically
    from solid_dsp_tpu.utils.benchtime import hbm_read_control

    r = hbm_read_control(_size(26) * 4)  # 256 MB (tiny under SMOKE)
    return {"metric": "hbm_read_control", "value": round(r["gbps"], 1),
            "unit": "GB/s", "vs_baseline": 0.0}


def bench_rx_chain():
    from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain

    cfg = RxChainConfig(carrier_freq=0.2, decimation=4, fir_taps=64,
                        agc_mode="block", demod="fm", nco_mode="exact",
                        fir_precision="x3", dtype=jnp.complex64)
    init, apply = make_rx_chain(cfg)
    L = _size(24)
    x = _tone(L)
    st = _retried(init)
    sps = _measure_chain_devloop(apply, st, x, L)
    return _row("rx_chain_throughput", sps, bps=8.25)


def _bench_chain_cfg(metric, L, ks=KS, **cfg_overrides):
    from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain

    cfg = RxChainConfig(carrier_freq=0.2, decimation=4, fir_taps=64,
                        demod="fm", dtype=jnp.complex64, **cfg_overrides)
    init, apply = make_rx_chain(cfg)
    x = _tone(L)
    step = _chain_step(apply, x)
    st = _retried(init)
    t = _measure(step, (jnp.zeros(()), st), ks=ks)
    return _row(metric, L / t)


def bench_rx_chain_stream():
    """One-dispatch stream driver: n_blocks chain blocks per dispatch
    (fori_loop + output buffer since r5 — PERF_NOTES #25/#27).  Same x3
    precision as the flagship so the row isolates the STREAMING cost,
    not a precision mismatch (the r4 row compounded both)."""
    from solid_dsp_tpu.models.rx_chain import (RxChainConfig,
                                               make_rx_chain_stream)

    cfg = RxChainConfig(carrier_freq=0.2, decimation=4, fir_taps=64,
                        agc_mode="block", demod="fm", nco_mode="exact",
                        fir_precision="x3", dtype=jnp.complex64)
    NB, L = 8, _size(23)
    init, apply_s = make_rx_chain_stream(cfg, L)
    xs = _tone(NB * L)
    step = _chain_step(apply_s, xs)
    st = _retried(init)
    t = _measure(step, (jnp.zeros(()), st), ks=(1, 2, 3) if SMOKE else (1, 4, 8))
    return _row("rx_chain_stream_8blk", NB * L / t)


def _bench_chain_planar(metric, prec):
    """Fused-DDC planar chain (the headline config, see bench.py)."""
    from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain

    cfg = RxChainConfig(carrier_freq=0.2, decimation=4, fir_taps=64,
                        agc_mode="block", demod="fm", nco_mode="exact",
                        input_format="planar", fused_ddc="on",
                        fir_precision=prec, dtype=jnp.complex64)
    init, apply = make_rx_chain(cfg)
    L = _size(24)
    k = np.arange(L)
    sig = 0.1 * np.exp(2j * np.pi * (0.2 / (2 * np.pi) + 0.001) * k)
    x = jax.device_put(np.stack([sig.real, sig.imag]).astype(np.float32))
    st = _retried(init)
    sps = _measure_chain_devloop(apply, st, x, L)
    return _row(metric, sps, bps=8.25)


def bench_rx_chain_planar_x3():
    """Headline: fused DDC, planar ingest, x3 (~f32) MXU precision."""
    return _bench_chain_planar("rx_chain_fused_planar_x3", "x3")


def bench_rx_chain_planar_bf16():
    """Fastest mode: fused DDC + native single-pass bf16 (~45 dB)."""
    return _bench_chain_planar("rx_chain_fused_planar_bf16", "default")


def bench_rx_chain_ci16_ingest():
    """Raw int16 IQ ingest converted on-device: half the HBM ingest bytes
    per sample vs cf32 (the chain is ingest-bandwidth-bound)."""
    from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain

    cfg = RxChainConfig(carrier_freq=0.2, decimation=4, fir_taps=64,
                        agc_mode="block", demod="fm", nco_mode="exact",
                        fir_precision="x3", dtype=jnp.complex64,
                        input_format="ci16")
    init, apply = make_rx_chain(cfg)
    L = _size(24)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-20000, 20000, size=(L, 2), dtype=np.int16))
    st = _retried(init)
    sps = _measure_chain_devloop(apply, st, x, L)
    return _row("rx_chain_ci16_ingest", sps, bps=4.25)


def bench_rx_chain_qpsk():
    """Config 4's QPSK half: fused-DDC front end + block carrier recovery.

    QPSK is carrier-coherent, so the decimated-rate rotation cannot
    collapse into the demod the way FM/AM do (ops/ddc.py epilogue
    algebra); the chain takes the rotated path — DDC body kernel, then
    rotation + AGC + 4th-power carrier recovery at the DECIMATED rate."""
    from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain

    cfg = RxChainConfig(carrier_freq=0.2, decimation=4, fir_taps=64,
                        agc_mode="block", demod="qpsk", nco_mode="exact",
                        input_format="planar", fused_ddc="on",
                        fir_precision="x3", dtype=jnp.complex64)
    init, apply = make_rx_chain(cfg)
    L = _size(24)
    rng = np.random.default_rng(3)
    M = int(cfg.decimation)
    sym = np.exp(1j * (np.pi / 4 + np.pi / 2
                       * rng.integers(0, 4, L // M)))
    bb = 0.5 * np.repeat(sym, M)  # rect-pulse QPSK at the symbol rate
    k = np.arange(L)
    sig = bb * np.exp(2j * np.pi * (0.2 / (2 * np.pi) + 1e-5) * k)
    x = jax.device_put(np.stack([sig.real, sig.imag]).astype(np.float32))
    st = _retried(init)
    sps = _measure_chain_devloop(apply, st, x, L)
    return _row("rx_chain_qpsk_fused_planar_x3", sps, bps=10.0)


def bench_rx_chain_parity_parallel():
    """EXACT reference AGC semantics (Newton solve) + LUT-parity NCO."""
    return _bench_chain_cfg("rx_chain_parity_parallel_agc_lut_nco", _size(23),
                            agc_mode="parallel", nco_mode="lut")


def bench_rx_chain_parity_scan():
    """EXACT reference AGC via the sequential scan — the honesty number.

    Small block: the per-sample scan is the poster-child sequential
    bottleneck and would take minutes at 16M samples."""
    return _bench_chain_cfg("rx_chain_parity_scan_agc_lut_nco", _size(18) if not SMOKE else 1 << 12,
                            ks=(1, 2, 4), agc_mode="exact", nco_mode="lut")


def bench_channelizer():
    from solid_dsp_tpu.models.channelizer import (
        channelizer_apply, channelizer_init, channelizer_taps)

    M, K = 256, 8
    # 4M samples: the measured sweet spot (1M-sample blocks are
    # dispatch-bound; > 8M degrades XLA's fusion — PERF_NOTES.md #19)
    L = M * (64 if SMOKE else 16384)
    x = _noise(L)
    taps = np.asarray(channelizer_taps(M, K), dtype=np.complex64)

    def ch_apply(tail, x):
        Y, tail2 = channelizer_apply(taps, tail, x, M)
        return jnp.abs(Y), tail2

    tail = channelizer_init(M, K, jnp.complex64)
    sps = _measure_chain_devloop(ch_apply, tail, x, L)
    return _row("channelizer_256ch", sps, bps=16.0)


def bench_channelizer_planar():
    """Planar matmul-DFT channelizer (round-4 formulation): re/im float
    planes end to end, output DFT on the MXU instead of the weak batched
    FFT lowering.  Two precision modes, like the rx chain."""
    from solid_dsp_tpu.models.channelizer import (
        channelizer_apply_planar, channelizer_dft_bank, channelizer_taps)

    M, K = 256, 8
    L = M * (64 if SMOKE else 16384)   # sweet-spot block (see above)
    rng = np.random.default_rng(0)
    sig = (rng.standard_normal(L) + 1j * rng.standard_normal(L))
    x2 = jax.device_put(np.stack([sig.real, sig.imag]).astype(np.float32))
    taps = channelizer_taps(M, K)
    bank = channelizer_dft_bank(M, K)
    out = []
    for prec, tag in (("x3", "x3"), ("default", "bf16")):
        def ch_apply(tail, x2, _prec=prec):
            return channelizer_apply_planar(taps, bank, tail, x2, M,
                                            precision=_prec)

        tail = jax.device_put(np.zeros((2, K * M - 1), np.float32))
        sps = _measure_chain_devloop(ch_apply, tail, x2, L)
        out.append(_row(f"channelizer_planar_{tag}_256ch", sps, bps=16.0))
    return out


def bench_channelizer_fused():
    """ONE-kernel Mosaic channelizer: branch conv + MXU DFT in VMEM
    (models/channelizer.make_fused_channelizer) — the branch products
    never touch HBM, unlike the XLA planar path."""
    from solid_dsp_tpu.models.channelizer import (
        channelizer_taps, fused_channelizer_init, make_fused_channelizer)

    M, K = 256, 8
    L = M * (64 if SMOKE else 16384)
    rng = np.random.default_rng(0)
    sig = (rng.standard_normal(L) + 1j * rng.standard_normal(L))
    x2 = jax.device_put(np.stack([sig.real, sig.imag]).astype(np.float32))
    taps = channelizer_taps(M, K)
    TF = 16 if SMOKE else 512
    out = []
    for mode, tag in (("fast", "bf16"), ("x3", "x3")):
        apply = make_fused_channelizer(taps, M, L // M, TF=TF, mode=mode)
        tail = _retried(lambda: fused_channelizer_init(M))
        sps = _measure_chain_devloop(apply, tail, x2, L)
        out.append(_row(f"channelizer_fused_{tag}_256ch", sps, bps=16.0))
    return out


def bench_channelizer_product_fused():
    """The PRODUCT path to the flagship kernel: PolyphaseChannelizer
    (backend="fused") — complex in, complex out, including the
    plane-split/merge the class does for the user (round-5 wiring; the
    r04 flagship number was only reachable from the bench harness)."""
    from solid_dsp_tpu.models.channelizer import PolyphaseChannelizer

    M, K = 256, 8
    L = M * (64 if SMOKE else 16384)
    x = _noise(L)
    out = []
    for prec, tag in (("fast", "bf16"), ("x3", "x3")):
        ch = PolyphaseChannelizer(M, K, backend="fused", precision=prec)
        fn = ch._fused_fn(L // M)     # jitted (tail, x) -> (Y, tail)
        tail = _retried(lambda: ch._tail)
        sps = _measure_chain_devloop(fn, tail, x, L)
        out.append(_row(f"channelizer_product_fused_{tag}_256ch", sps, bps=16.0))
    return out


def bench_os_channelizer():
    """2x-oversampled WOLA bank (twice the FFT + fold work per sample)."""
    from solid_dsp_tpu.models.channelizer import (
        channelizer_taps, os_channelizer_apply, os_channelizer_init)

    M, K = 256, 8
    L = M * (64 if SMOKE else 4096)
    x = _noise(L)
    taps = np.asarray(channelizer_taps(M, K), dtype=np.complex64)

    @jax.jit
    def g(state, x):
        Y, state2 = os_channelizer_apply(taps, state, x, M)
        return jnp.sum(jnp.abs(Y)), state2

    def step(carry):
        chk, state = carry
        c2, state2 = g(state, x)
        return c2, (c2, state2)

    t = _measure(step, (jnp.zeros(()), os_channelizer_init(M, K)))
    return _row("os_channelizer_256ch", L / t)


def bench_iir_bank():
    from solid_dsp_tpu.ops.pallas_kernels import iir_bank_apply, iir_bank_init

    sos = np.array([[0.0675, 0.1349, 0.0675, -1.1430, 0.4128],
                    [0.25, 0.5, 0.25, -0.9, 0.3]], np.float32)
    T, C = (1024 if SMOKE else 65536), 256
    x = _noise((T, C))

    # Mosaic kernels only run compiled on TPU; SMOKE (CPU structural
    # validation) uses interpret mode
    interp = SMOKE and jax.default_backend() != "tpu"

    @jax.jit
    def g(st, x):
        y, st2 = iir_bank_apply(jnp.asarray(sos), st, x, interpret=interp)
        return jnp.sum(jnp.abs(y)), st2

    def step(carry):
        chk, st = carry
        c2, st2 = g(st, x)
        return c2, (c2, st2)

    st = iir_bank_init(2, C)
    t = _measure(step, (jnp.zeros(()), st))
    return _row("iir_bank_pallas_256ch", T * C / t, "Mchannel-samples/s")


def bench_fft():
    F, N = (64 if SMOKE else 4096), 4096
    x = _noise((F, N))
    w = np.hamming(N).astype(np.float32)
    flops = F * 5 * N * np.log2(N)
    out = []
    step = _stateless_step(
        lambda a: jnp.fft.fft(a * jnp.asarray(w).astype(a.dtype), axis=-1), x)
    t = _measure(step, jnp.zeros(()))
    row = _row("windowed_fft_4096", flops / t, "GFLOP/s")
    row["value"] = round(flops / t / 1e9, 1)
    row["vs_baseline"] = round(F * N / t / 1e9, 3)
    row["min_GBps"] = round(F * N * 16.0 / t / 1e9, 1)
    row["pct_sol"] = round(100.0 * F * N * 16.0 / t / 1e9 / HBM_SOL_GBPS, 1)
    out.append(row)

    # round-5: the VMEM-fused Mosaic 4-step (window + both DFT stages +
    # twiddle in one pass, ops/pallas_fft.py), the product windowed_fft
    # auto route for batched 4096-pt frames on TPU
    from solid_dsp_tpu.ops.fft import windowed_fft

    step = _stateless_step(
        lambda a: windowed_fft(a, "hamming", backend="fused"), x)
    t = _measure(step, jnp.zeros(()))
    row = _row("windowed_fft_4096_fused", flops / t, "GFLOP/s")
    row["value"] = round(flops / t / 1e9, 1)
    row["vs_baseline"] = round(F * N / t / 1e9, 3)
    row["min_GBps"] = round(F * N * 16.0 / t / 1e9, 1)
    row["pct_sol"] = round(100.0 * F * N * 16.0 / t / 1e9 / HBM_SOL_GBPS, 1)
    out.append(row)

    # planar contract (the layout spectral consumers actually want):
    # skips the complex split/combine passes — the kernel's own rate
    from solid_dsp_tpu.ops.fft import windowed_fft_planar

    rng = np.random.default_rng(0)
    x2 = jax.device_put(rng.standard_normal((2, F, N)).astype(np.float32))
    step = _stateless_step(lambda a: windowed_fft_planar(a, "hamming"), x2)
    t = _measure(step, jnp.zeros(()))
    row = _row("windowed_fft_4096_fused_planar", flops / t, "GFLOP/s")
    row["value"] = round(flops / t / 1e9, 1)
    row["vs_baseline"] = round(F * N / t / 1e9, 3)
    row["min_GBps"] = round(F * N * 16.0 / t / 1e9, 1)
    row["pct_sol"] = round(100.0 * F * N * 16.0 / t / 1e9 / HBM_SOL_GBPS, 1)
    out.append(row)
    return out


def bench_fused_halo_channelizer():
    """Fused RDMA-halo Mosaic kernel, compiled on chip (mesh of 1)."""
    from jax.sharding import Mesh

    from solid_dsp_tpu.parallel.pallas_halo import (
        make_fused_channelizer_frontend)

    M, K = 256, 8
    mesh = Mesh(np.array(jax.devices()[:1]), ("time",))
    apply_fused = make_fused_channelizer_frontend(mesh, M, K)
    L = M * 4096
    x = _noise(L)
    # complex closure constants force a complex transfer at trace time;
    # ship the zero tail as planar floats rebuilt on device (review r2)
    tail0_dev = put_complex(np.zeros((K, M), np.complex64))

    @jax.jit
    def g(chk, tail, x):
        # checksum-only chaining (input-copy chaining deflates,
        # PERF_NOTES.md #8); tail rides as an ARGUMENT — closing over a
        # committed device array embeds it as an MLIR constant, whose
        # device->host fetch the tunnel rejects (this exact bench lost
        # its r03 row to that)
        y = jnp.fft.fft(apply_fused(tail, x)[0], axis=-1)
        return chk + jnp.sum(jnp.abs(y))

    def step(chk):
        c2 = g(chk, tail0_dev, x)
        return c2, c2

    t = _measure(step, jnp.zeros(()))
    return _row("fused_halo_channelizer_mesh1", L / t)


def bench_frontend_ops():
    """Round-2 front-end blocks: CIC decimator and Farrow resampler."""
    from solid_dsp_tpu.ops.cic import cic_kernel
    from solid_dsp_tpu.ops.farrow import FarrowResampler
    from solid_dsp_tpu.ops.fir import conv1d_mxu
    from solid_dsp_tpu.ops.halfband import firdes_halfband, halfband_decimate

    L = _size(22)
    x = _noise(L)
    out = []

    # CIC via its equivalent-FIR boxcar^N conv (the shipped fast path).
    # Constants stay NUMPY so jit embeds host-side values, not committed
    # device arrays (whose embedding poisons the tunnel client).
    taps = np.asarray(cic_kernel(8, 4), np.float32)
    pad = np.zeros((taps.shape[-1] - 1,), np.complex64)
    step = _stateless_step(
        lambda a: conv1d_mxu(jnp.concatenate([jnp.asarray(pad), a]),
                             jnp.asarray(taps), stride=8), x)
    t = _measure(step, jnp.zeros(()))
    out.append(_row("cic_decim_R8N4", L / t, bps=9.0))

    # halfband decimate-by-2 stage (phase-split kernel)
    hb = np.asarray(firdes_halfband(8, 60.0), np.float32)
    hb_tail = np.zeros((hb.shape[-1] - 1,), np.complex64)
    step = _stateless_step(
        lambda a: halfband_decimate(jnp.asarray(hb), jnp.asarray(hb_tail),
                                    a)[0], x)
    t = _measure(step, jnp.zeros(()))
    out.append(_row("halfband_decim2_m8", L / t, bps=12.0))

    # Farrow arbitrary-ratio resampler — round-5 jittable grid engine
    # (exact device positions, im2col + row-take windows, one dispatch)
    from solid_dsp_tpu.ops.farrow import make_farrow_resampler

    init_f, apply_f, _plan = make_farrow_resampler(48000 / 44100, L)

    def fapply(state, x):
        y, n_valid, st2 = apply_f(state, x)
        return y, st2

    st = _retried(init_f)
    sps = _measure_chain_devloop(fapply, st, x, L)
    out.append(_row("farrow_48k_44k1", sps, bps=15.4))
    return out


def bench_fft_nonpow2():
    """Non-pow2/prime sizes through the auto path (Bluestein on TPU)."""
    from solid_dsp_tpu.ops.fft import fft as sfft

    out = []
    for N in (1000, 1009, 4095, 10007):
        Fb = max(1, ((1 << 14) if SMOKE else (1 << 22)) // N)
        x = _noise((Fb, N), seed=N)
        step = _stateless_step(lambda a, n=N: sfft(a, n), x)
        t = _measure(step, jnp.zeros(()))
        out.append(_row(f"fft_nonpow2_{N}", Fb * N / t))
    return out


def bench_ldpc():
    """Batched min-sum LDPC decode (matmul-routed message passing)."""
    from solid_dsp_tpu.models import ldpc

    rng = np.random.default_rng(0)
    code = ldpc.wifi_ldpc_648()
    F = 32 if SMOKE else 512
    llr = jnp.asarray(rng.normal(size=(F, code.n)).astype(np.float32) * 3.0)
    step = _stateless_step(lambda l: code.decode(l, n_iters=25)[0], llr)
    t = _measure(step, jnp.zeros(()), ks=(1, 2, 3) if SMOKE else (1, 4, 8))
    bps = F * code.k / t
    return _row("ldpc_decode_648_25it", bps, "Minfobits/s")


def bench_modem_frontend():
    """LLR demap + preamble correlation (the always-on receive path)."""
    from solid_dsp_tpu.models import framesync as fs
    from solid_dsp_tpu.models import linear_mod as lm
    from solid_dsp_tpu.utils import sequences as seq

    rng = np.random.default_rng(0)
    out = []
    pts = lm.constellation("qam", 64)
    T = _size(21)
    ysym = _noise(T)
    step = _stateless_step(lambda a: lm.demap_soft(a, pts, 0.1), ysym)
    t = _measure(step, jnp.zeros(()))
    out.append(_row("llr_demap_qam64", T / t, "Msymbols/s"))

    p = seq.zadoff_chu(5, 127)
    L = _size(22)
    x = _noise(L)
    step = _stateless_step(
        lambda a: fs.preamble_correlate(a, jnp.asarray(
            p.astype(np.complex64)))[0], x)
    t = _measure(step, jnp.zeros(()))
    out.append(_row("preamble_correlate_127", L / t, bps=20.0))
    return out


def bench_polar():
    from solid_dsp_tpu.models.polar import PolarCode

    code = PolarCode(256, 128)
    B = 64 if SMOKE else 2048
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (B, 128)).astype(np.int32)
    x = np.asarray(code.encode(jnp.asarray(bits)))
    llr = jnp.asarray(((1 - 2.0 * x) * 4
                       + rng.standard_normal(x.shape)).astype(np.float32))
    frozen = jnp.asarray(code.frozen_mask)

    from solid_dsp_tpu.models.polar import polar_decode_bp
    step = _stateless_step(
        lambda l: polar_decode_bp(l, frozen, n_iters=15)[0].astype(
            jnp.float32), llr)
    t = _measure(step, jnp.zeros(()))
    return _row("polar_bp_decode_256_15it", B * 128 / t, "Minfobits/s")


def bench_cyclo():
    """Cyclostationary alpha-grid scan (batched STFT cross-products)."""
    from solid_dsp_tpu.analysis.cyclo import cycle_profile

    N = _size(16 if SMOKE else 20)
    A = 8 if SMOKE else 64
    x = _noise(N)  # complex h2d poisons the tunnel client — ship planar
    alphas = jnp.asarray(np.linspace(0.03, 0.4, A).astype(np.float32))
    step = _stateless_step(
        lambda a: cycle_profile(a, alphas, nfft=256, hop=64), x)
    t = _measure(step, jnp.zeros(()), ks=(1, 2, 3) if SMOKE else (1, 4, 8))
    return _row("cyclo_scan_64alpha", A * N / t, "Malpha-samples/s")


def bench_turbo():
    """Batched 6-iteration max-log-MAP turbo decode (state-vectorized)."""
    from solid_dsp_tpu.models.turbo import TurboCode

    tc = TurboCode(1024, n_iter=6)
    B = 8 if SMOKE else 128
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (tc.K,))
    cw = np.asarray(tc.encode(bits))
    llr = np.tile((1 - 2.0 * cw) * 4, (B, 1))
    llr += rng.standard_normal(llr.shape)
    llr_j = jnp.asarray(llr.astype(np.float32))
    dec = jax.vmap(lambda l: tc.decode(l)[1])
    step = _stateless_step(dec, llr_j)
    t = _measure(step, jnp.zeros(()), ks=(1, 2, 3) if SMOKE else (1, 4, 8))
    return _row("turbo_decode_1024_6it", B * tc.K / t, "Minfobits/s")


def bench_tx_dsp():
    """r2 additions: memory-polynomial DPD apply + CFR clip-and-filter."""
    from solid_dsp_tpu.models.cfr import band_mask, cfr_icf
    from solid_dsp_tpu.models.dpd import mp_apply

    out = []
    L = _size(22)
    rng = np.random.default_rng(0)
    x = put_complex(0.2 * (rng.standard_normal(L)
                           + 1j * rng.standard_normal(L)).astype(np.complex64))
    K, Q = 7, 3
    c = put_complex(np.r_[1.0, np.full(K * Q - 1, 1e-3)].astype(np.complex64))

    # device arrays ride as ARGUMENTS — a jit closure over a committed
    # device array embeds it as an MLIR constant, whose device->host
    # fetch poisons the tunnel client (this bench lost its rows to that)
    @jax.jit
    def g_dpd(chk, c, a):
        return chk + jnp.sum(jnp.abs(mp_apply(c, a, K, Q)))

    def step(chk):
        c2 = g_dpd(chk, c, x)
        return c2, c2

    t = _measure(step, jnp.zeros(()))
    out.append(_row("dpd_mp_apply_k7q3", L / t))

    mask = jnp.asarray(band_mask(L, 0.25))

    @jax.jit
    def g_cfr(chk, a, m):
        return chk + jnp.sum(jnp.abs(cfr_icf(a, 0.35, m, iters=4)))

    def step2(chk):
        c2 = g_cfr(chk, x, mask)
        return c2, c2

    t = _measure(step2, jnp.zeros(()))
    out.append(_row("cfr_icf_4iter", L / t))
    return out


def bench_tracking():
    """r2 additions: parallel LTI Kalman tracker + block-RLS equalizer."""
    from solid_dsp_tpu.models.equalizer import make_rls
    from solid_dsp_tpu.ops.kalman import cv_model, make_kalman_lti, \
        steady_state_gain

    out = []
    L = _size(22)
    rng = np.random.default_rng(1)
    K, F = steady_state_gain(*cv_model(1.0, 0.05, 1.0))
    z = jnp.asarray(rng.standard_normal(L).astype(np.float32))
    x0 = jnp.asarray(np.zeros(2, np.float32))   # tunnel-safe build
    # modal chunked evaluation (ops/kalman.make_kalman_lti): the MXU path
    # replacing the tiny-matrix associative scan (26.7 Ms/s in r04)
    kal = make_kalman_lti(K, F)
    step = _stateless_step(lambda a: kal(x0, a)[0], z)
    t = _measure(step, jnp.zeros(()))
    out.append(_row("kalman_lti_chunked_2state", L / t))

    Lr = _size(20)
    n = 32
    init, rstep = make_rls(n, 0.9999, 1e-2)
    R0, p0, tail0 = init()
    xr = put_complex((rng.standard_normal(Lr) + 1j * rng.standard_normal(Lr)
                      ).astype(np.complex64))
    d = put_complex((rng.standard_normal(Lr) + 1j * rng.standard_normal(Lr)
                     ).astype(np.complex64))

    @jax.jit
    def g(carry, xr, d):
        chk, R, p, tail = carry
        y, R2, p2, tail2 = rstep(R, p, tail, xr, d)
        return chk + jnp.sum(jnp.abs(y)), R2, p2, tail2

    def step(carry):
        c2, R2, p2, tail2 = g(carry, xr, d)
        return c2, (c2, R2, p2, tail2)

    t = _measure(step, (jnp.zeros(()), R0, p0, tail0))
    out.append(_row("rls_equalizer_32tap", Lr / t))
    return out


def bench_detection():
    """r2 additions: wavelet denoising + CA-CFAR detection throughput."""
    from solid_dsp_tpu.models.radar import cfar_ca
    from solid_dsp_tpu.ops.wavelet import denoise_soft

    out = []
    L = _size(21)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal(L).astype(np.float32))
    step = _stateless_step(lambda a: denoise_soft(a, "db4", levels=4), xr)
    t = _measure(step, jnp.zeros(()))
    out.append(_row("wavelet_denoise_db4_l4", L / t, bps=8.0))

    P = jnp.asarray(rng.exponential(1.0, L).astype(np.float32))
    step = _stateless_step(
        lambda a: cfar_ca(a, guard=2, train=16, pfa=1e-4)[0].astype(
            jnp.float32), P)
    t = _measure(step, jnp.zeros(()))
    out.append(_row("cfar_ca_g2t16", L / t))
    return out


def bench_rx_chain_bf16_fir():
    """Config-4 chain with the FIR stage in the MXU's native single-pass
    bf16 mode (fir_precision="default") vs the full-accuracy multi-pass
    contraction bench_rx_chain measures — the documented fast path."""
    from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain

    cfg = RxChainConfig(carrier_freq=0.2, decimation=4, fir_taps=64,
                        agc_mode="block", demod="fm", nco_mode="exact",
                        fir_precision="default", dtype=jnp.complex64)
    init, apply = make_rx_chain(cfg)
    L = _size(24)
    x = _tone(L)
    step = _chain_step(apply, x)
    st = _retried(init)
    t = _measure(step, (jnp.zeros(()), st), reps=2)
    return _row("rx_chain_bf16_fir", L / t)


def bench_resample():
    """r2 additions: PFB arbitrary resampler + zoom FFT throughput."""
    from solid_dsp_tpu.ops.czt import zoom_fft
    from solid_dsp_tpu.ops.resample import ArbitraryResampler

    out = []
    from solid_dsp_tpu.ops.resample import make_arb_resampler

    for rate, tag in ((0.37, "decim_0p37"), (2.5, "interp_2p5")):
        L = _size(21 if rate > 1 else 22)
        x = _tone(L)
        # round-5: the fully jittable grid engine (exact fixed-point
        # positions on device, one dispatch per block) replaces the
        # host-staged execute_block that bounded these rows at 1-3 Ms/s
        init, apply_g, n_pad = make_arb_resampler(rate, L)

        def apply2(state, x, _a=apply_g):
            y, n_valid, st2 = _a(state, x)
            return y, st2

        st = _retried(init)
        sps = _measure_chain_devloop(apply2, st, x, L)
        out.append(_row(f"arb_resample_{tag}", sps,
                         bps=8.0 + 8.0 * rate))

    B, N = (4, 1 << 10) if SMOKE else (256, 1 << 14)
    xb = put_complex(np.tile(_tone_np(N), (B, 1)))
    step = _stateless_step(
        lambda a: zoom_fft(a, 0.2, 0.3, 1024, fs=1.0), xb)
    t = _measure(step, jnp.zeros(()))
    out.append(_row("zoom_fft_16k_to_1k_x256", B * N / t))
    return out


def bench_rational_resampler():
    """Config 3: polyphase rational resampler at (3/2) and (1/8) — the
    gather-free fused commutator bank (ops/fir.py::RationalResampler),
    one stride-Q0 multi-output Toeplitz matmul per block."""
    from solid_dsp_tpu.design import firdes
    from solid_dsp_tpu.ops.fir import RationalResampler, fir_init

    out = []
    for Pq, tag in (((3, 2), "3_2"), ((1, 8), "1_8")):
        P, Q = Pq
        L = _size(22)
        x = _tone(L)
        taps = firdes.firdes_kaiser(48 * max(P, 1), 0.4 / max(P, Q),
                                    60.0, 0.0)
        rs = RationalResampler(taps, P, Q, dtype=jnp.complex64)
        apply = rs._make_fn(0)          # jitted (tail, x) -> (y, tail)
        tail = fir_init(rs._B_np.shape[0], dtype=jnp.complex64)
        sps = _measure_chain_devloop(apply, tail, x, L)
        out.append(_row(f"rational_resample_{tag}", sps,
                         bps=8.0 * (1.0 + P / Q)))
    return out


BENCHES = None  # filled below (after all defs)


def _bench_list():
    return (bench_hbm_control, bench_rx_chain,
            bench_rx_chain_planar_x3, bench_rx_chain_planar_bf16,
            bench_rx_chain_stream,
            bench_rx_chain_ci16_ingest,
            bench_rx_chain_qpsk,
            bench_rx_chain_parity_parallel,
            bench_rx_chain_parity_scan, bench_channelizer,
            bench_channelizer_planar,
            bench_channelizer_fused,
            bench_channelizer_product_fused,
            bench_os_channelizer,
            bench_fused_halo_channelizer, bench_iir_bank, bench_fft,
            bench_fft_nonpow2, bench_frontend_ops,
            bench_modem_frontend, bench_ldpc, bench_polar, bench_turbo,
            bench_cyclo, bench_tx_dsp,
            bench_tracking, bench_detection, bench_resample,
            bench_rational_resampler,
            bench_rx_chain_bf16_fir)


def _run_inline(picks, exact=False):
    for fn in _bench_list():
        if picks and not any((p == fn.__name__) if exact else (p in fn.__name__)
                             for p in picks):
            continue
        try:
            res = fn()
            for row in (res if isinstance(res, list) else [res]):
                print(json.dumps(row), flush=True)
        except Exception as e:  # keep sweeping even if one workload trips
            print(json.dumps({"metric": fn.__name__, "error": str(e)[:120]}),
                  flush=True)


def _run_isolated(picks):
    """One CHILD PROCESS per bench: a single UNIMPLEMENTED from the axon
    tunnel poisons the whole PJRT client, so an in-process sweep loses
    every bench after the first failure (observed: 17 of 25 rows lost).
    A fresh process per bench = a fresh client; stragglers get one retry
    after a cool-down."""
    import subprocess
    import sys

    for fn in _bench_list():
        if picks and not any(p in fn.__name__ for p in picks):
            continue
        got = False
        for attempt in range(2):
            try:
                out = subprocess.run(
                    [sys.executable, "-u", __file__, fn.__name__,
                     "--inline", "--exact"],
                    capture_output=True, text=True, timeout=900)
            except subprocess.TimeoutExpired:
                if attempt == 0:
                    time.sleep(60)
                continue
            for line in out.stdout.splitlines():
                try:
                    row = json.loads(line)
                except ValueError:
                    continue
                if "value" in row:
                    print(line, flush=True)
                    got = True
            if got:
                break
            if attempt == 0:
                time.sleep(60)
        if not got:
            print(json.dumps({"metric": fn.__name__,
                              "error": "no result after 2 child attempts"}),
                  flush=True)


def main():
    import sys
    picks = [a for a in sys.argv[1:] if not a.startswith("-")]
    if "--inline" in sys.argv or SMOKE:
        _run_inline(picks, exact="--exact" in sys.argv)
    else:
        _run_isolated(picks)


if __name__ == "__main__":
    main()
