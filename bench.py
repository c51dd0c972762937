"""Headline benchmark: flagship rx-chain throughput on one chip.

Driver config 4 (BASELINE.json): NCO downconvert -> 64-tap decimating FIR
-> AGC -> FM demod on a complex64 stream.  Baseline target is the driver-set
north star: 1 Gsample/s complex per chip (the reference publishes no numbers
— SURVEY.md §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

TIMING METHODOLOGY (utils/benchtime.py): two tunnel artifacts to dodge.
``block_until_ready`` can acknowledge early (inflates naive loops), and
per-dispatch chains are HOST-enqueue-bound below ~1 ms/block
(under-reports fast chains — PERF_NOTES.md #14).  So: ONE dispatch runs
16 block applications chained on device (state carry + a salted input
element), several such dispatches are timed ending in ONE scalar fetch,
and the least-squares slope over dispatch count is the true time with
the round trip in the intercept.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_SPS = 1.0e9  # north-star: 1 Gsample/s per chip


def _canary_ok() -> bool:
    """Quick health gate: the tunnel sometimes degrades to TOTAL HANGS
    (every op blocks forever), in which case each full bench child would
    burn its whole 900 s timeout — 4 attempts could outlive the driver's
    patience before the fallback line ever prints.  A 180 s child doing
    one tiny f32 jit + one c64 add answers 'is the chip usable at all'
    first; on failure we go straight to the fallback (~3 min total)."""
    # NOTE: all wire transfers stay REAL-typed.  The tunnel can lose
    # complex transfers while complex compute still works (a complex
    # h2d/d2h poisons the whole client) — so the canary builds complex
    # on device with lax.complex and fetches a float, answering "is the
    # chip usable" without tripping the known transfer hole.
    code = ("import jax, jax.numpy as jnp\n"
            "a = jnp.arange(512, dtype=jnp.float32)\n"
            "print(float(jax.jit(lambda v: v.sum())(a)))\n"
            "c = jax.lax.complex(jnp.float32(1.0), jnp.float32(2.0))\n"
            "print(float(jnp.abs(c * c)))\n")
    try:
        out = subprocess.run([sys.executable, "-u", "-c", code],
                             capture_output=True, text=True, timeout=180)
        return out.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _supervise() -> None:
    """Process-level retry: one failed op poisons the whole PJRT client
    over the axon tunnel, so retrying means a FRESH process (fresh client)
    after a cool-down, not a try/except in this one.  Prints the child's
    single JSON line on success."""
    attempts = 4 if _canary_ok() else 0
    for attempt in range(attempts):
        env = dict(os.environ, BENCH_CHILD="1")
        try:
            out = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=900,
            )
        except subprocess.TimeoutExpired:
            if attempt < 3:
                time.sleep(150)
            continue
        for line in out.stdout.splitlines():
            try:
                row = json.loads(line)
            except ValueError:
                continue
            if "metric" in row and "value" in row:
                print(line)
                return
        if attempt < 3:
            time.sleep(150)
    # Tunnel down for the whole retry window: fall back to the newest
    # committed sweep artifact (any round) measured by the identical
    # methodology (bench_all's rx_chain_throughput row), clearly marked.
    try:
        import glob
        here = os.path.dirname(os.path.abspath(__file__))
        cands = sorted(glob.glob(os.path.join(here, "BENCH_ALL_r*.jsonl")))
        for path in reversed(cands):
            with open(path) as f:
                for line in f:
                    try:
                        row = json.loads(line)
                    except ValueError:
                        continue
                    if row.get("metric") == "rx_chain_throughput":
                        row["note"] = (
                            "axon tunnel unavailable at round end; value "
                            "re-reported from the most recent on-chip "
                            "sweep (%s)" % os.path.basename(path))
                        print(json.dumps(row))
                        return
    except OSError:
        pass
    print(json.dumps({"metric": "rx_chain_throughput", "value": 0.0,
                      "unit": "Msamples/s", "vs_baseline": 0.0,
                      "error": "tunnel unavailable (canary or all bench "
                               "attempts failed)"}))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain
    from solid_dsp_tpu.utils.benchtime import measure_apply_devloop

    # Fused-DDC fast path (ops/ddc.py): mix+FIR+decimate as one bandpass
    # Toeplitz matmul on planar re/im planes + a decimated-rate rotation.
    # fir_precision="x3" keeps ~f32 accuracy (>= 90 dB vs the unfused
    # exact chain, gated in tests/test_rx_chain_fused.py).
    cfg = RxChainConfig(
        carrier_freq=0.2,
        decimation=4,
        fir_taps=64,
        agc_mode="block",
        demod="fm",
        nco_mode="exact",
        input_format="planar",
        fused_ddc="on",
        fir_precision="x3",
        dtype=jnp.complex64,
    )
    init, apply = make_rx_chain(cfg)

    L = 1 << 24  # 16M samples per block
    k = np.arange(L)
    # planar (2, L) f32 planes: the TPU-native layout (and every wire
    # transfer stays real-typed — complex transfers poison the tunnel).
    sig = 0.1 * np.exp(2j * np.pi * (0.2 / (2 * np.pi) + 0.001) * k)
    x = jax.device_put(
        np.stack([sig.real, sig.imag]).astype(np.float32))
    state = init()

    # Device-side iteration loop (utils/benchtime.measure_apply_devloop):
    # per-dispatch timing over the tunnel is HOST-enqueue-bound below
    # ~1 ms/block and under-reports fast chains (PERF_NOTES.md #14); one
    # dispatch runs 16 chained block applications, salted so they cannot
    # be elided, and the outer regression removes the round trip.
    r = measure_apply_devloop(apply, state, x, iters=16,
                              ks=(1, 2, 4), reps=3)
    sps = L / r["t_iter"]
    print(json.dumps({
        "metric": "rx_chain_throughput",
        "value": round(sps / 1e6, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(sps / BASELINE_SPS, 4),
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") == "1":
        main()
    else:
        _supervise()
