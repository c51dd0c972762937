"""Headline benchmark: flagship rx-chain throughput on one chip.

Driver config 4 (BASELINE.json): NCO downconvert -> 64-tap decimating FIR
-> AGC -> FM demod on a complex64 stream.  Baseline target is the driver-set
north star: 1 Gsample/s complex per chip (the reference publishes no numbers
— SURVEY.md §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SPS = 1.0e9  # north-star: 1 Gsample/s per chip


def _run_with_retries(fn, attempts: int = 3, sleep_s: float = 30.0):
    """The axon TPU tunnel intermittently returns UNIMPLEMENTED for ordinary
    ops (observed after rapid client reconnects / mid-stall kills); a quiet
    retry succeeds.  Benchmarks must not die to that."""
    for i in range(attempts):
        try:
            return fn()
        except Exception:
            if i == attempts - 1:
                raise
            time.sleep(sleep_s)


def main() -> None:
    from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain

    cfg = RxChainConfig(
        carrier_freq=0.2,
        decimation=4,
        fir_taps=64,
        agc_mode="block",
        demod="fm",
        nco_mode="exact",
        dtype=jnp.complex64,
    )
    init, apply = make_rx_chain(cfg)

    L = 1 << 22  # 4M samples per block
    k = np.arange(L)
    x = jnp.asarray(
        0.1 * np.exp(2j * np.pi * (0.2 / (2 * np.pi) + 0.001) * k),
        dtype=jnp.complex64,
    )
    state = _run_with_retries(init)

    # warmup / compile
    def _warm():
        out, st = apply(state, x)
        jax.block_until_ready((out, st))
    _run_with_retries(_warm)

    # The tunneled-TPU environment shows large run-to-run throughput
    # variance (observed 19-34 Gs/s for identical configs); best-of-trials
    # reports the hardware's capability rather than tunnel weather.
    iters, trials = 10, 3
    best_dt = float("inf")
    st = state
    for _ in range(trials):
        def _trial(st=st):
            t0 = time.perf_counter()
            s = st
            for _ in range(iters):
                out, s = apply(s, x)
            jax.block_until_ready((out, s))
            return time.perf_counter() - t0, s

        dt, st = _run_with_retries(_trial)
        best_dt = min(best_dt, dt)

    sps = L * iters / best_dt
    print(json.dumps({
        "metric": "rx_chain_throughput",
        "value": round(sps / 1e6, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(sps / BASELINE_SPS, 4),
    }))


if __name__ == "__main__":
    main()
