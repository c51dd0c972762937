"""Headline benchmark: flagship rx-chain throughput on one chip.

Driver config 4 (BASELINE.json): NCO downconvert -> 64-tap decimating FIR
-> AGC -> FM demod on a complex64 stream.  Baseline target is the driver-set
north star: 1 Gsample/s complex per chip (the reference publishes no numbers
— SURVEY.md §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

TIMING METHODOLOGY (utils/benchtime.py): the tunneled PJRT client's
``block_until_ready`` can acknowledge before the device finishes, which
inflates naive loop timing past hardware speed-of-light.  We instead time
k chained iterations (each consumes the previous state, so the device
cannot overlap or elide them) ending in ONE scalar device->host fetch,
for several k, and report the least-squares slope of T(k) — the true
per-iteration device time with the tunnel round-trip in the intercept.
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
    from solid_dsp_tpu.utils.benchtime import measure_step

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

    L = 1 << 24  # 16M samples per block
    k = np.arange(L)
    x = jnp.asarray(
        0.1 * np.exp(2j * np.pi * (0.2 / (2 * np.pi) + 0.001) * k),
        dtype=jnp.complex64,
    )
    state = _run_with_retries(init)

    # x is a runtime ARGUMENT, not a jit closure: embedding a committed
    # device array as a constant forces a device->host fetch that poisons
    # the tunneled client.
    @jax.jit
    def g(st, x):
        out, st2 = apply(st, x)
        return jnp.sum(out), st2

    def step(carry):
        _, st = carry
        chk, st2 = g(st, x)
        return chk, (chk, st2)

    r = _run_with_retries(
        lambda: measure_step(step, (jnp.zeros(()), state),
                             ks=(2, 10, 18), reps=2, warmup=3))
    sps = L / r["t_iter"]
    print(json.dumps({
        "metric": "rx_chain_throughput",
        "value": round(sps / 1e6, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(sps / BASELINE_SPS, 4),
    }))


if __name__ == "__main__":
    main()
