"""Regenerate the README performance table from a bench sweep artifact.

Reads a BENCH_ALL_*.jsonl (the fixed-harness sweep) and prints the
markdown table between the README's PERF-TABLE markers.  Keeps README
numbers mechanically tied to a committed measurement artifact — no
hand-copied values.

Usage:
  python tools/gen_perf_table.py BENCH_ALL_r04.jsonl            # print
  python tools/gen_perf_table.py BENCH_ALL_r04.jsonl --apply    # rewrite README.md
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

# metric -> (display name, note).  Rows appear in this order; metrics not
# listed fall into the trailing "additional workloads" section.
HEADLINE = [
    ("rx_chain_fused_planar_x3",
     "RX chain (config 4, fused DDC+FM, planar, x3 ~f32)",
     "the headline; driver bench.py config"),
    ("rx_chain_fused_planar_bf16",
     "RX chain (fused, planar, single-pass bf16)", "~45 dB fast mode"),
    ("rx_chain_throughput",
     "RX chain (cf32 complex ingest)", "plane split on device (free: "
     "complex64 is planar internally)"),
    ("rx_chain_ci16_ingest",
     "RX chain (raw int16 IQ ingest)", "half the ingest bytes"),
    ("rx_chain_qpsk_fused_planar_x3",
     "RX chain, QPSK demod (config 4's coherent half)",
     "rotated path + block carrier recovery"),
    ("rx_chain_parity_parallel_agc_lut_nco",
     "RX chain, exact-parity mode (Newton AGC + LUT NCO)",
     "reference semantics, sample-exact (11x faster in r4)"),
    ("rx_chain_parity_scan_agc_lut_nco",
     "RX chain, sequential-scan AGC (honesty row)",
     "the per-sample reference recurrence"),
    ("channelizer_256ch", "256-ch polyphase channelizer (complex, FFT)",
     "config 5"),
    ("channelizer_planar_x3_256ch",
     "256-ch channelizer (planar, MXU matmul DFT, x3)", "config 5, r4"),
    ("channelizer_planar_bf16_256ch",
     "256-ch channelizer (planar, matmul DFT, bf16)", ""),
    ("channelizer_fused_bf16_256ch",
     "256-ch channelizer (ONE Mosaic kernel, bf16)",
     "branch conv + MXU DFT in VMEM"),
    ("channelizer_fused_x3_256ch",
     "256-ch channelizer (ONE Mosaic kernel, x3 ~f32)", ""),
    ("os_channelizer_256ch", "2x-oversampled WOLA bank", ""),
    ("fused_halo_channelizer_mesh1",
     "Fused RDMA-halo channelizer front end (mesh of 1)",
     "validated remote-DMA pattern, not a throughput path"),
    ("iir_bank_pallas_256ch", "256-channel IIR biquad bank (Mosaic)",
     "loop-carried latency bound; 18x the XLA assoc-scan"),
    ("windowed_fft_4096", "Windowed 4096-pt FFT (config 2)", ""),
    ("windowed_fft_4096_fused", "Windowed 4096-pt FFT (fused Mosaic 4-step)",
     "window + both DFT stages + twiddle in VMEM"),
    ("channelizer_product_fused_bf16_256ch",
     "256-ch channelizer via PolyphaseChannelizer(backend=\"fused\")",
     "the flagship kernel from the product class (r5)"),
    ("channelizer_product_fused_x3_256ch",
     "256-ch channelizer, product class, x3", ""),
    ("rational_resample_3_2", "Rational resampler 3/2 (config 3)",
     "fused commutator bank, one strided matmul"),
    ("rational_resample_1_8", "Rational resampler 1/8 (config 3)", ""),
    ("arb_resample_decim_0p37", "Arbitrary resampler x0.37 (msresamp)",
     "jittable grid engine (r5); ratio quantized < 0.5 ppm"),
    ("arb_resample_interp_2p5", "Arbitrary resampler x2.5", ""),
    ("farrow_48k_44k1", "Farrow 48k->44.1k (cubic)",
     "jittable grid engine (r5)"),
    ("halfband_decim2_m8", "Halfband decimate-by-2 (m=8)",
     "one strided Toeplitz conv (r5)"),
    ("preamble_correlate_127", "127-tap preamble matched filter",
     "two-bank complex Toeplitz (r5)"),
    ("kalman_lti_chunked_2state", "Steady-state Kalman tracker (modal chunked)",
     "MXU chunked recurrence (r5)"),
]


def load(path: Path):
    rows = {}
    for line in path.read_text().splitlines():
        try:
            r = json.loads(line)
        except ValueError:
            continue
        if "metric" in r:
            rows[r["metric"]] = r
    return rows


def fmt_value(r):
    v, unit = r.get("value"), r.get("unit", "")
    if v is None:
        return f"FAILED ({r.get('error', '?')[:40]})"
    if unit == "Msamples/s":
        return f"{v / 1000:.2f} Gs/s" if v >= 1000 else f"{v:.1f} Ms/s"
    if unit == "Mchannel-samples/s":
        return f"{v / 1000:.1f} Gcs/s"
    if unit == "GFLOP/s":
        return f"{v:.0f} GFLOP/s"
    if unit == "Minfobits/s":
        return f"{v:.0f} Mb/s"
    if unit == "GB/s":
        return f"{v:.0f} GB/s"
    if unit == "Msymbols/s":
        return f"{v:.0f} Msym/s"
    return f"{v} {unit}"


def build(rows, artifact: str):
    used = set()
    out = [
        f"Measured on one TPU v5e chip via the fixed slope-regression "
        f"harness (`utils/benchtime.py`); every number below is a row of "
        f"[`{artifact}`]({artifact}) — regenerate this table with "
        f"`python tools/gen_perf_table.py {artifact} --apply`.",
        "",
        "| Workload | Measured | % of HBM SOL | Note |",
        "|---|---|---|---|",
    ]
    for metric, name, note in HEADLINE:
        r = rows.get(metric)
        if r is None:
            continue
        used.add(metric)
        sol = (f"{r['pct_sol']:.0f}%" if "pct_sol" in r else "-")
        out.append(f"| {name} | **{fmt_value(r)}** | {sol} | {note} |")
    rest = [m for m in rows if m not in used
            and m != "hbm_read_control" and "value" in rows[m]]
    if rest:
        out += ["", "<details><summary>Additional workloads</summary>", "",
                "| Metric | Measured |", "|---|---|"]
        out += [f"| `{m}` | {fmt_value(rows[m])} |" for m in sorted(rest)]
        out += ["", "</details>"]
    hbm = rows.get("hbm_read_control")
    if hbm:
        out += ["", f"HBM read-bandwidth control: {fmt_value(hbm)} — no "
                "workload's implied traffic exceeds it.  \"% of HBM SOL\" "
                "= the row's MINIMUM ingest+egress traffic as a fraction of "
                "the measured streaming speed of light (bench_all.py "
                "HBM_SOL_GBPS); fused single-pass kernels can approach "
                "100%, staged XLA pipelines sit lower by their number of "
                "materialized passes."]
    return "\n".join(out)


def main():
    path = Path(sys.argv[1])
    table = build(load(path), path.name)
    if "--apply" in sys.argv:
        readme = Path(__file__).resolve().parent.parent / "README.md"
        text = readme.read_text()
        pat = re.compile(r"(<!-- PERF-TABLE-START -->\n).*?"
                         r"(\n<!-- PERF-TABLE-END -->)", re.S)
        if not pat.search(text):
            sys.exit("README.md lacks PERF-TABLE markers")
        readme.write_text(pat.sub(lambda m: m.group(1) + table + m.group(2),
                                  text))
        print("README.md updated")
    else:
        print(table)


if __name__ == "__main__":
    main()
