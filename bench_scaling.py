"""Scaling ladder benchmark: sharded rx chain over an N-device mesh.

BASELINE.md asks for a 1-chip / 1-host / N-host ladder with >= 0.9
weak-scaling efficiency.  This harness runs the shard_map'd chain on
whatever devices exist (real TPUs on a pod slice; fake CPU devices under
``XLA_FLAGS=--xla_force_host_platform_device_count=N`` for plumbing
validation) and reports per-mesh throughput + efficiency vs 1 device.

On the single-chip driver environment this exercises the full collective
path (halos, psums) on one device; on a real slice the same script measures
true weak scaling — halos ride the ICI, channels span hosts over DCN.

Usage: python bench_scaling.py [--channels-per-shard 2] [--samples 1048576]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def run_mesh(channel: int, time_: int, cps: int, samples_per_shard: int):
    from solid_dsp_tpu import parallel
    from solid_dsp_tpu.models.rx_chain import RxChainConfig

    cfg = RxChainConfig(carrier_freq=0.2, decimation=4, fir_taps=64,
                        agc_mode="block", demod="fm", nco_mode="exact",
                        dtype=jnp.complex64)
    mesh = parallel.make_mesh(channel=channel, time=time_)
    C = cps * channel
    L = samples_per_shard * time_
    init, apply = parallel.make_sharded_rx_chain(cfg, mesh)
    state = init(C)
    k = np.arange(L, dtype=np.float64)
    row = (0.1 * np.exp(2j * np.pi * (0.2 / (2 * np.pi) + 0.001) * k)
           ).astype(np.complex64)
    x = jnp.asarray(np.broadcast_to(row, (C, L)).copy())

    # TWO warmups: the first apply compiles for the fresh (unsharded) state
    # layout; its output state carries the shard_map out_specs sharding, so
    # the second call compiles the steady-state executable.  Timing after a
    # single warmup measures a recompile, not the chain (~100000x error on
    # a slow-compile backend).
    out, state = apply(state, x)
    out, state = apply(state, x)
    jax.block_until_ready((out, state))
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out, state = apply(state, x)
    jax.block_until_ready((out, state))
    dt = (time.perf_counter() - t0) / iters
    total = C * L
    return {"mesh": f"{channel}x{time_}", "devices": channel * time_,
            "channels": C, "samples_per_block": total,
            "msps_total": round(total / dt / 1e6, 1),
            "msps_per_device": round(total / dt / 1e6 / (channel * time_), 1)}


def run_overhead(cps: int, samples: int):
    """mesh(1) sharded chain vs the plain single-chip chain: quantifies
    the shard_map/collective plumbing overhead on one device.

    Round 4: both sides run the SAME fused engine (the sharded chain now
    calls ops/ddc.py / ops/pallas_ddc.py directly) in the headline planar
    single-stream configuration, and both are measured with the
    chained-iteration slope regression (utils/benchtime.py) — wall-clock
    loops over the tunnel's block_until_ready read early."""
    from solid_dsp_tpu import parallel
    from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain
    from solid_dsp_tpu.utils.benchtime import measure_apply_devloop

    cfg = RxChainConfig(carrier_freq=0.2, decimation=4, fir_taps=64,
                        agc_mode="block", demod="fm", nco_mode="exact",
                        input_format="planar", fused_ddc="on",
                        fir_precision="x3", dtype=jnp.complex64)
    k = np.arange(samples, dtype=np.float64)
    sig = (0.1 * np.exp(2j * np.pi * (0.2 / (2 * np.pi) + 0.001) * k))
    x = jax.device_put(np.stack([sig.real, sig.imag]).astype(np.float32))

    def timed(apply, st):
        # device-side iteration loop: per-dispatch chains under-report
        # fast blocks over the tunnel (PERF_NOTES.md #14)
        r = measure_apply_devloop(apply, st, x, iters=16, ks=(1, 2, 4),
                                  reps=3)
        return samples / r["t_iter"] / 1e6

    init1, apply1 = make_rx_chain(cfg)
    unsharded = timed(apply1, init1())

    mesh = parallel.make_mesh(channel=1, time=1)
    init_s, apply_s = parallel.make_sharded_rx_chain(cfg, mesh)
    sharded = timed(apply_s, init_s())

    return {"mesh": "1x1_overhead", "config": "planar_fused_x3",
            "unsharded_msps": round(unsharded, 1),
            "sharded_msps": round(sharded, 1),
            "shard_map_overhead_vs_unsharded": round(
                1.0 - sharded / unsharded, 3)}


def run_overhead_channelizer(samples: int):
    """mesh(1) sharded channelizer vs the single-chip paths (config 5's
    deployment shape): quantifies the psum-per-block front end the
    round-4 verdict flagged as unmeasured, for both the XLA tap-parallel
    frontend and the round-5 fused-kernel frontend."""
    from solid_dsp_tpu import parallel
    from solid_dsp_tpu.models.channelizer import (
        channelizer_apply, channelizer_init, channelizer_taps)
    from solid_dsp_tpu.parallel.sharded import make_sharded_channelizer
    from solid_dsp_tpu.utils.benchtime import measure_apply_devloop
    from solid_dsp_tpu.utils.transfer import put_complex

    M, K = 256, 8
    L = (samples // M) * M
    rng = np.random.default_rng(0)
    x = put_complex((rng.standard_normal(L) + 1j * rng.standard_normal(L)
                     ).astype(np.complex64))
    taps = np.asarray(channelizer_taps(M, K), np.complex64)

    def timed(apply, st):
        r = measure_apply_devloop(apply, st, x, iters=8, ks=(1, 2, 4),
                                  reps=3)
        return L / r["t_iter"] / 1e6

    def ch1(tail, xx):
        Y, t2 = channelizer_apply(jnp.asarray(taps), tail, xx, M)
        return jnp.abs(Y), t2

    single = timed(ch1, channelizer_init(M, K, jnp.complex64))

    mesh = parallel.make_mesh(channel=1, time=1)
    init_s, apply_s = make_sharded_channelizer(M, K, mesh=mesh)
    shard_xla = timed(apply_s, init_s())

    init_f, apply_f = make_sharded_channelizer(M, K, mesh=mesh,
                                               frontend="fused",
                                               precision="x3")
    shard_fused = timed(apply_f, init_f())

    return {"mesh": "1x1_overhead_channelizer", "M": M, "K": K,
            "single_chip_xla_msps": round(single, 1),
            "sharded_xla_msps": round(shard_xla, 1),
            "sharded_fused_x3_msps": round(shard_fused, 1),
            "xla_overhead_vs_single": round(1.0 - shard_xla / single, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels-per-shard", type=int, default=2)
    ap.add_argument("--samples", type=int, default=1 << 20,
                    help="stream samples per time shard")
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="force CPU backend with N fake devices "
                         "(plumbing-efficiency ladder)")
    ap.add_argument("--overhead", action="store_true",
                    help="measure mesh(1x1) sharded-vs-unsharded overhead "
                         "instead of the ladder")
    ap.add_argument("--overhead-channelizer", action="store_true",
                    help="measure mesh(1x1) sharded-channelizer overhead "
                         "(config 5 deployment shape)")
    args = ap.parse_args()

    if args.cpu:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.cpu}"
            ).strip()
        jax.config.update("jax_platforms", "cpu")

    if args.overhead:
        print(json.dumps(run_overhead(1, args.samples)))
        return
    if args.overhead_channelizer:
        print(json.dumps(run_overhead_channelizer(args.samples)))
        return

    n = len(jax.devices())
    ladder = [(1, 1)]
    if n >= 2:
        ladder.append((1, 2))
    if n >= 4:
        ladder.append((2, 2))
    if n >= 8:
        ladder.append((2, 4))

    results = []
    for ch, tm in ladder:
        results.append(run_mesh(ch, tm, args.channels_per_shard,
                                args.samples))
    base = results[0]["msps_per_device"]
    for r in results:
        r["weak_scaling_eff"] = round(r["msps_per_device"] / base, 3)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
