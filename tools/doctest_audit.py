"""Doctest-parity audit: reference doctests -> repo test coverage table.

The reference's entire test corpus is ~150 doctest blocks embedded in
`///` doc comments (SURVEY.md §4).  This tool

1. extracts every fenced doctest block from /root/reference/src/**/*.rs,
   recording file:line, the documented item (the fn/struct the doc
   comment precedes), and every `assert*` line inside the block;
2. joins each block against the hand-curated MAPPING table below, which
   names the repo test(s) (tests/test_*.py::test_id) that cover the same
   assertion semantics, or a justification for blocks that need none
   (no-assert usage examples, compile-only snippets);
3. emits PARITY_DOCTESTS.md — one row per doctest block — and exits
   nonzero if any block is uncovered and unjustified.

Run:  python tools/doctest_audit.py [--write]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REF = Path("/root/reference/src")
OUT = Path(__file__).resolve().parent.parent / "PARITY_DOCTESTS.md"

ITEM_RE = re.compile(
    r"^\s*(?:pub\s+)?(?:fn|struct|enum|union|trait|impl)\s+([A-Za-z0-9_]+)")


def extract_blocks():
    """Yield dicts: file, line, item, n_asserts, asserts (list of str)."""
    blocks = []
    for path in sorted(REF.rglob("*.rs")):
        rel = str(path.relative_to(REF.parent))
        lines = path.read_text().splitlines()
        i = 0
        while i < len(lines):
            stripped = lines[i].strip()
            if (stripped.startswith("///") or stripped.startswith("//!")) \
                    and "```" in stripped:
                start = i + 1
                body = []
                i += 1
                while i < len(lines):
                    s = lines[i].strip()
                    if (s.startswith("///") or s.startswith("//!")) \
                            and "```" in s:
                        break
                    body.append(s.lstrip("/!").lstrip())
                    i += 1
                # find the documented item: next non-comment, non-attr line
                item = "?"
                j = i + 1
                while j < len(lines):
                    s = lines[j].strip()
                    if s.startswith("///") or s.startswith("//!") \
                            or s.startswith("#[") or not s:
                        j += 1
                        continue
                    m = ITEM_RE.match(s)
                    item = m.group(1) if m else s[:40]
                    break
                asserts = [b for b in body if "assert" in b]
                blocks.append({
                    "file": rel, "line": start, "item": item,
                    "asserts": asserts, "n": len(asserts),
                })
            i += 1
    return blocks


# ---------------------------------------------------------------------------
# Curated mapping: (reference file, documented item) -> coverage.
#
# Key granularity is per documented item (a doc comment's single doctest
# block); multi-block items use (file, item, k) with k = 0,1,... in file
# order.  Values: ("test", "tests/...::id[, more]") or ("none", "why no
# repo assertion is required").
# ---------------------------------------------------------------------------

MAPPING = {}


def M(file, item, kind, what, k=None):
    MAPPING[(file, item) if k is None else (file, item, k)] = (kind, what)


DTP = "tests/test_doctest_parity.py"
TNA = "tests/test_nco_agc.py"
TDG = "tests/test_design_golden.py"
TIR = "tests/test_iir.py"
TFR = "tests/test_fir.py"

# ---- auto_gain_control/mod.rs ---------------------------------------------
A = "src/auto_gain_control/mod.rs"
M(A, "use super::math::complex::{Conj, Real};", "test",
  f"{TNA}::test_agc_convergence_golden (|out| -> 1±0.02, RSSI golden)")
M(A, "new", "test", f"{DTP}::test_agc_new_doctest_signal_level")
M(A, "reset", "test", f"{TNA}::test_agc_reset")
M(A, "execute", "test", f"{TNA}::test_agc_first_sample_passthrough")
M(A, "execute_block", "test",
  f"{TNA}::test_agc_convergence_golden + test_agc_randomized_vs_reference "
  "(len preservation + gain action, two-block split)")
M(A, "lock", "test", f"{DTP}::test_agc_lock_unlock_is_unlocked_quirk; "
  f"{TNA}::test_agc_lock_freezes_gain")
M(A, "is_unlocked", "test", f"{DTP}::test_agc_lock_unlock_is_unlocked_quirk "
  "(inverted-flag quirk kept)")
M(A, "get_bandwidth", "test", f"{TNA}::test_agc_accessors")
M(A, "set_bandwidth", "test", f"{TNA}::test_agc_accessors")
M(A, "get_signal_level", "test", f"{TNA}::test_agc_accessors")
M(A, "set_signal_level", "test", f"{TNA}::test_agc_accessors")
M(A, "get_rssi", "test", f"{TNA}::test_agc_accessors")
M(A, "set_rssi", "test", f"{TNA}::test_agc_accessors")
M(A, "get_gain", "test", f"{TNA}::test_agc_accessors")
M(A, "set_gain", "test", f"{TNA}::test_agc_accessors")
M(A, "get_scale", "test", f"{TNA}::test_agc_accessors")
M(A, "set_scale", "test", f"{TNA}::test_agc_accessors")
M(A, "init", "test", f"{TNA}::test_agc_init_signal_level_golden")

# ---- circular_buffer/mod.rs ------------------------------------------------
C = "src/circular_buffer/mod.rs"
M(C, "extern crate alloc;", "none",
  "module usage example, no asserts; construction covered by "
  f"{DTP} buffer tests + tests/test_runtime.py (native ring)")
M(C, "new", "none", "construction example, no asserts")
M(C, "from_vec", "test", f"{DTP}::test_buffer_from_vec_len")
M(C, "from_slice", "test", f"{DTP}::test_buffer_from_vec_len "
  "(Python has one constructor for both Vec and slice)")
M(C, "as_ptr", "none", "raw-pointer accessor is Rust-specific; zero-init "
  f"contents asserted via {DTP}::test_buffer_linearize_raw_indexing raw "
  "indexing")
M(C, "as_mut_ptr", "none", "raw-pointer accessor is Rust-specific (see "
  "as_ptr)")
M(C, "linearize", "test", f"{DTP}::test_buffer_linearize_raw_indexing "
  "(full 7-assert sequence incl. Deref raw-storage quirk)")
M(C, "to_vec", "test", f"{DTP}::test_buffer_to_vec_oldest_first")
M(C, "reset", "test", f"{DTP}::test_buffer_reset_len_capacity_reserved; "
  "tests/test_runtime.py::test_reset (native)")
M(C, "len", "test", f"{DTP}::test_buffer_reset_len_capacity_reserved")
M(C, "capacity", "test", f"{DTP}::test_buffer_reset_len_capacity_reserved")
M(C, "reserved", "test", f"{DTP}::test_buffer_reset_len_capacity_reserved")
M(C, "is_empty", "test", f"{DTP}::test_buffer_is_empty_is_full")
M(C, "is_full", "test", f"{DTP}::test_buffer_is_empty_is_full")
M(C, "read_index", "test", f"{DTP}::test_buffer_read_write_index")
M(C, "write_index", "test", f"{DTP}::test_buffer_read_write_index")
M(C, "push", "test", f"{DTP}::test_buffer_push_full_error; "
  "tests/test_runtime.py::test_full_error (native)")
M(C, "append", "test", f"{DTP}::test_buffer_append_not_enough_error; "
  "tests/test_runtime.py::test_append_overflow_error (native)")
M(C, "pop", "test", f"{DTP}::test_buffer_pop_empty_error_then_value; "
  "tests/test_runtime.py::test_empty_error (native)")
M(C, "release", "test", f"{DTP}::test_buffer_release_error_codes "
  "(NegativeBuffer + NotEnoughBuffer codes)")

# ---- dot_product -----------------------------------------------------------
M("src/dot_product/execute.rs", "execute", "test",
  f"{DTP}::test_dotprod_execute_golden (15.0)")
M("src/dot_product/mod.rs", "pub mod execute;", "test",
  f"{DTP}::test_dotprod_execute_golden")
M("src/dot_product/mod.rs", "new", "none", "construction example, no asserts")
M("src/dot_product/mod.rs", "coefficents", "test",
  f"{DTP}::test_dotprod_coefficients_storage_order (stored-order quirk); "
  f"{TFR}::test_fir_coefficients_reversed_parity")
M("src/dot_product/mod.rs", "len", "test", f"{DTP}::test_dotprod_len_is_empty")
M("src/dot_product/mod.rs", "is_empty", "test",
  f"{DTP}::test_dotprod_len_is_empty")

# ---- auto_correlator -------------------------------------------------------
AC = "src/filter/auto_correlator/mod.rs"
M(AC, "use super::super::math::complex::Real;", "none",
  "usage example, no asserts; end-to-end covered by tests/test_autocorr.py")
M(AC, "new", "none", "construction example, no asserts")
M(AC, "reset", "test", "tests/test_autocorr.py::test_reset (adds asserts "
  "the reference example lacks)")
M(AC, "push", "test", "tests/test_autocorr.py::test_randomized_vs_reference "
  "(push semantics vs per-sample reference sim)")
M(AC, "write", "test", "tests/test_autocorr.py::test_window_delay_line_parity")
M(AC, "execute", "test", "tests/test_autocorr.py::test_execute_without_push")
M(AC, "execute_block", "test",
  "tests/test_autocorr.py::test_randomized_vs_reference")
M(AC, "get_energy", "test", "tests/test_autocorr.py::test_energy_golden "
  "(0.0125 golden) + test_energy_tracks_reference")

# ---- fir -------------------------------------------------------------------
FD = "src/filter/fir/decim.rs"
M(FD, "new", "none", "construction example, no asserts")
M(FD, "set_scale", "test", f"{DTP}::test_decim_fir_accessors")
M(FD, "get_scale", "test", f"{DTP}::test_decim_fir_accessors")
M(FD, "get_decimation", "test", f"{DTP}::test_decim_fir_accessors")
M(FD, "push", "none", "state-mutation example, no asserts; push semantics "
  f"covered by {TFR}::test_decim_fir_randomized_vs_reference")
M(FD, "write", "none", "state-mutation example, no asserts (same coverage "
  "as push)")
M(FD, "len", "test", f"{DTP}::test_decim_fir_accessors")
M(FD, "is_empty", "test", f"{DTP}::test_decim_fir_accessors")
M(FD, "coefficients", "test", f"{DTP}::test_decim_fir_accessors "
  "(reversed-storage quirk)")
M(FD, "execute", "test", f"{DTP}::test_decim_fir_per_sample_cadence "
  "([] then [28.28] cadence)")
M(FD, "execute_block", "test", f"{TFR}::test_decim_fir_golden "
  "([28.28, 21.39] golden)")
M("src/filter/fir/interp.rs", "new", "none",
  "construction example, no asserts; interpolator behavior covered by "
  f"{TFR}::test_interp_fir_length_law + "
  "test_interp_fir_randomized_vs_reference")
FM = "src/filter/fir/mod.rs"
M(FM, "use super::super::dot_product::{execute:", "none",
  "module usage example, no asserts")
M(FM, "new", "none", "construction example, no asserts")
M(FM, "set_scale", "test", f"{DTP}::test_fir_scale_accessors_plain; "
  f"{TFR}::test_fir_scale_accessors")
M(FM, "get_scale", "test", f"{DTP}::test_fir_scale_accessors_plain")
M(FM, "len", "test", f"{DTP}::test_fir_len_is_empty")
M(FM, "is_empty", "test", f"{DTP}::test_fir_len_is_empty")
M(FM, "coefficients", "test", f"{TFR}::test_fir_coefficients_reversed_parity")
M(FM, "execute", "test", f"{TFR}::test_fir_single_sample_golden (10.1)")
M(FM, "execute_block", "test", f"{TFR}::test_fir_block_golden (60.03)")
M(FM, "frequency_response", "test",
  f"{DTP}::test_fir_frequency_response_notch_dc; "
  f"{TFR}::test_fir_freq_response_golden")
M(FM, "group_delay", "test", f"{TFR}::test_fir_group_delay_golden "
  "(floor(delay+0.5)==12)")
M("src/filter/fir/pfb.rs", "new", "none",
  "construction example, no asserts; PFB behavior covered by "
  f"{TFR}::test_pfb_branches_match_reference_decomposition + "
  "test_pfb_per_sample_api")

# ---- firdes ----------------------------------------------------------------
FDS = "src/filter/firdes/mod.rs"
M(FDS, "estimate_required_filter_length", "test",
  f"{TDG}::test_herrmann_length_estimate (15)")
M(FDS, "estimate_required_filter_stop_band_attenuation", "test",
  f"{TDG}::test_stop_band_estimate (101)")
M(FDS, "estimate_required_filter_transition", "test",
  f"{TDG}::test_transition_estimate (35)")
M(FDS, "firdes_kaiser", "test", f"{TDG}::test_firdes_kaiser_len")
M(FDS, "firdes_notch", "test", f"{TDG}::test_firdes_notch_len")
M(FDS, "firdes_doppler", "test", f"{TDG}::test_firdes_doppler_len")
M(FDS, "filter_autocorrelation", "test",
  f"{TDG}::test_filter_autocorrelation (symmetry + 0.047983058)")
M(FDS, "filter_crosscorrelation", "test",
  f"{TDG}::test_filter_crosscorrelation (0.92825377)")
M(FDS, "filter_isi", "test", f"{TDG}::test_filter_isi "
  "(rms 0.02509764, max 0.061966006)")
M(FDS, "filter_energy", "test", f"{TDG}::test_filter_energy (0.3152318)")

# ---- iir -------------------------------------------------------------------
ID = "src/filter/iir/decim.rs"
M(ID, "new", "none", "construction example, no asserts")
M(ID, "get_decimation", "test", f"{DTP}::test_decim_iir_accessors_and_cadence")
M(ID, "numerator_coefs", "test",
  f"{DTP}::test_decim_iir_accessors_and_cadence (ratio preserved)")
M(ID, "denominator_coefs", "test",
  f"{DTP}::test_decim_iir_accessors_and_cadence (via "
  "test_iir_normal_coef_accessors ratio semantics)")
M(ID, "second_order_filters", "test",
  f"{DTP}::test_decim_iir_accessors_and_cadence")
M(ID, "iir_type", "test", f"{DTP}::test_decim_iir_accessors_and_cadence")
M(ID, "execute", "test", f"{DTP}::test_decim_iir_accessors_and_cadence "
  "([] then 0.05816769596076701)")
M(ID, "execute_block", "test", f"{TIR}::test_decim_iir_golden "
  "([0.119535296293297, 0.2518701895942824])")
M(ID, "frequency_response", "test",
  f"{DTP}::test_decim_iir_accessors_and_cadence (SecondOrder 0-response "
  "quirk)")
M(ID, "group_delay", "test", f"{DTP}::test_decim_iir_accessors_and_cadence "
  "(19.6774211296624)")
II = "src/filter/iir/interp.rs"
M(II, "new", "none", "construction example, no asserts")
M(II, "get_interpolation", "test",
  f"{DTP}::test_interp_iir_accessors_and_golden")
M(II, "numerator_coefs", "test",
  f"{DTP}::test_interp_iir_accessors_and_golden")
M(II, "denominator_coefs", "test",
  f"{DTP}::test_interp_iir_accessors_and_golden (ratio semantics)")
M(II, "second_order_filters", "test",
  f"{DTP}::test_interp_iir_accessors_and_golden")
M(II, "iir_type", "test", f"{DTP}::test_interp_iir_accessors_and_golden")
M(II, "execute", "test", f"{DTP}::test_interp_iir_accessors_and_golden "
  "([0.05816..., 0.11953...])")
M(II, "execute_block", "test", f"{TIR}::test_interp_iir_length_law")
M(II, "frequency_response", "test",
  f"{DTP}::test_interp_iir_accessors_and_golden (0-response quirk)")
M(II, "group_delay", "test", f"{DTP}::test_interp_iir_accessors_and_golden")
IM = "src/filter/iir/mod.rs"
M(IM, "pub mod sos;", "none", "module usage example, no asserts")
M(IM, "new", "none", "construction example, no asserts")
M(IM, "numerator_coefs", "test", f"{DTP}::test_iir_normal_coef_accessors")
M(IM, "denominator_coefs", "test", f"{DTP}::test_iir_normal_coef_accessors "
  "(a0-dropped store)")
M(IM, "second_order_filters", "test",
  f"{DTP}::test_iir_second_order_sections_and_type")
M(IM, "iir_type", "test", f"{DTP}::test_iir_second_order_sections_and_type")
M(IM, "execute", "test", f"{TIR}::test_sos_step_golden "
  "(0.05816769596076701 via the SOS it delegates to) + "
  "test_iir_block_golden[0]")
M(IM, "execute_block", "test", f"{TIR}::test_iir_block_golden "
  "(full 5-value golden vector)")
M(IM, "frequency_response", "test",
  f"{TIR}::test_iir_cascade_freq_response_quirk (always-0 quirk)")
M(IM, "group_delay", "test", f"{TIR}::test_iir_group_delay_golden "
  "(19.6774211296624)")
IS = "src/filter/iir/sos.rs"
M(IS, "new", "none", "construction example, no asserts")
M(IS, "execute", "test", f"{TIR}::test_sos_step_golden")
M(IS, "numerator_coefs", "test", f"{TIR}::test_sos_coef_stores_swapped_parity "
  "(0.99999840000128 — swapped-store quirk)")
M(IS, "denominator_coefs", "test",
  f"{TIR}::test_sos_coef_stores_swapped_parity (0.003199997440002048)")
M(IS, "frequency_response", "test",
  f"{TIR}::test_iir_normal_vs_sos_same_filter (nonzero response asserted "
  "via value comparison)")
M(IS, "group_delay", "test", f"{TIR}::test_iir_group_delay_golden "
  "(17.6774211296624)")

# ---- iirdes ----------------------------------------------------------------
IDS = "src/filter/iirdes/mod.rs"
M(IDS, "frequency_pre_warp", "test", f"{TDG}::test_frequency_pre_warp "
  "(1.9626)")
M(IDS, "bilinear_analog_to_digital", "test", f"{TDG}::test_bilinear_a2d")
M(IDS, "bilinear_numerator_denominator", "test",
  f"{TDG}::test_bilinear_numden")
M(IDS, "digital_filter_flip_pass", "test", f"{TDG}::test_flip_pass")
M(IDS, "digital_filter_shift", "test", f"{TDG}::test_digital_filter_shift")
M(IDS, "stable", "test", f"{TDG}::test_stable (true and false cases)")
M("src/filter/iirdes/pll/mod.rs", "active_lag", "test",
  f"{TDG}::test_pll_active_lag (num[1]==4000.0)")
M("src/filter/iirdes/pll/mod.rs", "active_proportional_integral", "test",
  f"{TDG}::test_pll_active_pi")

# ---- group_delay / math / resources ---------------------------------------
M("src/group_delay/mod.rs", "use super::math::complex::Conj;", "none",
  "usage example with no asserts; exact FIR/IIR group-delay forms carry "
  f"goldens in {TFR}::test_fir_group_delay_golden and "
  f"{TIR}::test_iir_group_delay_golden")
PY = "src/math/poly.rs"
M(PY, "find_roots", "test", f"{TDG}::test_find_roots_sorted "
  "(root set {-3,-1,-1/3,1/2,2})")
M(PY, "find_roots_bairstow", "test", f"{TDG}::test_find_roots_bairstow_order")
M(PY, "find_roots_bairstow_recursion", "test",
  f"{TDG}::test_bairstow_recursion (incl. final u,v pair)")
M(PY, "find_roots_bairstow_persistent", "test",
  f"{TDG}::test_bairstow_persistent")
M(PY, "expand_binomial", "test", f"{TDG}::test_expand_binomial")
M(PY, "expand_binomial_pm", "test", f"{TDG}::test_expand_binomial_pm")
RS = "src/resources/mod.rs"
M(RS, "msb_index", "test", f"{TDG}::test_msb_index")
M(RS, "factor", "test", f"{TDG}::test_factor")
M(RS, "modpow", "test", f"{TDG}::test_modpow")
M(RS, "primitive_root_prime", "test", f"{TDG}::test_primitive_root_prime")

# ---- windows ---------------------------------------------------------------
for wf, wn in (("blackman_harris.rs", "blackman_harris"),
               ("blackman_harris.rs", "blackman_harris7"),
               ("flattop.rs", "flattop"), ("hamming.rs", "hamming"),
               ("hann.rs", "hann"), ("kaiser.rs", "kaiser"),
               ("kaiser_bessel.rs", "kaiser_bessel"),
               ("rcostaper.rs", "rcostaper"),
               ("triangular.rs", "triangular")):
    M(f"src/windows/{wf}", wn, "test",
      f"{TDG}::test_windows_nonzero[{wn}] (+ exact-tap goldens: "
      "test_kaiser_window_known_value, test_kaiser_bessel, "
      "test_hann_endpoints)")


def main():
    blocks = extract_blocks()
    # assign per-(file,item) indices for multi-block items
    seen = {}
    rows = []
    uncovered = 0
    for b in blocks:
        key2 = (b["file"], b["item"])
        k = seen.get(key2, 0)
        seen[key2] = k + 1
        entry = MAPPING.get((b["file"], b["item"], k)) or MAPPING.get(key2)
        if entry is None:
            status, what = "UNCOVERED", ""
            uncovered += 1
        else:
            kind, what = entry
            status = {"test": "covered", "none": "n/a"}[kind]
        rows.append((b, k, status, what))

    if "--skeleton" in sys.argv:
        for b, k, status, what in rows:
            if status == "UNCOVERED":
                ks = f", {k}" if seen[(b['file'], b['item'])] > 1 else ""
                a = b["asserts"][0][:70] if b["asserts"] else "(no asserts)"
                print(f'M("{b["file"]}", "{b["item"]}"{ks}, "test", "")'
                      f'  # :{b["line"]} n={b["n"]} {a}')
        return

    lines = [
        "# PARITY_DOCTESTS — reference doctest coverage audit",
        "",
        "Generated by `python tools/doctest_audit.py --write` "
        "(regenerate after adding tests).",
        "",
        f"Reference doctest blocks: **{len(blocks)}** "
        f"({sum(b['n'] for b in blocks)} assertions). "
        f"Uncovered: **{uncovered}**.",
        "",
        "Status: `covered` = the named repo test(s) assert the same "
        "semantics (usually the exact golden constant); `n/a` = the block "
        "contains no assertion to port (construction/usage example) — the "
        "justification column says what, if anything, stands in for it.",
        "",
        "| Reference doctest (file:line) | Item | Asserts | Status | "
        "Repo coverage / justification |",
        "|---|---|---|---|---|",
    ]
    for b, k, status, what in rows:
        loc = f"{b['file']}:{b['line']}"
        lines.append(
            f"| {loc} | `{b['item']}` | {b['n']} | {status} | {what} |")
    text = "\n".join(lines) + "\n"
    if "--write" in sys.argv:
        OUT.write_text(text)
        print(f"wrote {OUT} ({len(blocks)} blocks, {uncovered} uncovered)")
    else:
        print(text)
    sys.exit(1 if uncovered else 0)


if __name__ == "__main__":
    main()
