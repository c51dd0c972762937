"""IIR golden + randomized parity tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.design import iirdes
from solid_dsp_tpu.ops import iir
from ref_sim import RefIIRNormal, RefSOS


def _pll_filter():
    return iirdes.pll_active_lag(0.02, 1.0 / np.sqrt(2.0), 1000.0)


def test_sos_step_golden():
    # ref iir/sos.rs:80-91: first step output
    num, den = _pll_filter()
    f = iir.SecondOrderFilter(num, den)
    out = f.execute(1.0)
    assert abs(float(np.real(out)) - 0.05816769596076701) < 1e-15


def test_sos_coef_stores_swapped_parity():
    # ref iir/sos.rs:118-155: numerator_coefs()[1] and denominator_coefs()[1]
    num, den = _pll_filter()
    f = iir.SecondOrderFilter(num, den)
    assert abs(f.numerator_coefs()[1] - 0.99999840000128) < 1e-14
    assert abs(f.denominator_coefs()[1] - 0.003199997440002048) < 1e-15


def test_iir_block_golden():
    # ref iir/mod.rs:290-309
    num, den = _pll_filter()
    f = iir.IIRFilter(num, den, iir.IIRFilterType.SECOND_ORDER)
    out = np.real(np.asarray(f.execute_block(jnp.array([1.0, 0.0, 1.0, 0.0, 1.0]))))
    expect = [0.05816769596076701, 0.119535296293297, 0.18410279587774706,
              0.2518701895942824, 0.32283747232307686]
    np.testing.assert_allclose(out, expect, rtol=0, atol=1e-14)


def test_iir_group_delay_golden():
    # ref iir/mod.rs:369-390: cascade 19.677..., sos.rs:195-206: 17.677...
    num, den = _pll_filter()
    f = iir.IIRFilter(num, den, iir.IIRFilterType.SECOND_ORDER)
    assert abs(f.group_delay(0.0) - 19.6774211296624) < 1e-10
    s = iir.SecondOrderFilter(num, den)
    assert abs(s.group_delay(0.0) - 17.6774211296624) < 1e-10


def test_iir_cascade_freq_response_quirk():
    # ref iir/mod.rs:336-366 doctest: SecondOrder response is always 0
    num, den = _pll_filter()
    f = iir.IIRFilter(num, den, iir.IIRFilterType.SECOND_ORDER)
    assert f.frequency_response(0.0) == 0.0


@pytest.mark.parametrize("method", ["scan", "parallel"])
def test_iir_normal_randomized_vs_reference(method):
    rng = np.random.default_rng(5)
    # a stable random filter: poles well inside the unit circle
    b = rng.standard_normal(4)
    a = np.array([1.0, -0.4, 0.22, -0.05])
    x = rng.standard_normal(200)
    ref = np.real(RefIIRNormal(b, a).execute_block(x))
    f = iir.IIRFilter(b, a, iir.IIRFilterType.NORMAL, method=method,
                      dtype=jnp.float64)
    got = np.concatenate([
        np.asarray(f.execute_block(jnp.asarray(x[:77]))),
        np.asarray(f.execute_block(jnp.asarray(x[77:]))),
    ])
    np.testing.assert_allclose(got, ref, atol=1e-10)


@pytest.mark.parametrize("method", ["scan", "parallel"])
def test_sos_randomized_vs_reference(method):
    rng = np.random.default_rng(6)
    num, den = _pll_filter()
    x = rng.standard_normal(150) + 1j * rng.standard_normal(150)
    ref = RefSOS(num, den).execute_block(x)
    f = iir.SecondOrderFilter(num, den)
    f.method = method
    got = np.concatenate([
        np.asarray(f.execute_block(jnp.asarray(x[:50]))),
        np.asarray(f.execute_block(jnp.asarray(x[50:]))),
    ])
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_multi_section_cascade():
    # two cascaded biquads vs sequential reference sections
    rng = np.random.default_rng(7)
    num1, den1 = _pll_filter()
    num2, den2 = iirdes.pll_active_lag(0.05, 0.9, 500.0)
    ff = np.concatenate([num1, num2])
    fb = np.concatenate([den1, den2])
    x = rng.standard_normal(100)
    s1, s2 = RefSOS(num1, den1), RefSOS(num2, den2)
    ref = s2.execute_block(s1.execute_block(x))
    f = iir.IIRFilter(ff, fb, iir.IIRFilterType.SECOND_ORDER)
    got = np.asarray(f.execute_block(jnp.asarray(x)))
    np.testing.assert_allclose(np.real(got), np.real(ref), atol=1e-10)


def test_decim_iir_golden():
    # ref iir/decim.rs:200-219: [0.119535296293297, 0.2518701895942824]
    num, den = _pll_filter()
    f = iir.DecimatingIIRFilter(num, den, iir.IIRFilterType.SECOND_ORDER, 2)
    out = np.real(np.asarray(f.execute_block(jnp.array([1.0, 0.0, 1.0, 0.0]))))
    np.testing.assert_allclose(
        out, [0.119535296293297, 0.2518701895942824], atol=1e-14
    )


def test_interp_iir_length_law():
    # ref iir/interp.rs:196-214: out.len == in.len * interp
    num, den = _pll_filter()
    f = iir.InterpolatingIIRFilter(num, den, iir.IIRFilterType.SECOND_ORDER, 4)
    out = f.execute_block(jnp.arange(5.0))
    assert out.shape[-1] == 20


def test_iir_normal_vs_sos_same_filter():
    # Normal form on the same (3,3) coefficients must match the SOS form
    num, den = _pll_filter()
    x = np.random.default_rng(8).standard_normal(64)
    fa = iir.IIRFilter(num, den, iir.IIRFilterType.NORMAL)
    fb = iir.IIRFilter(num, den, iir.IIRFilterType.SECOND_ORDER)
    ya = np.asarray(fa.execute_block(jnp.asarray(x)))
    yb = np.real(np.asarray(fb.execute_block(jnp.asarray(x))))
    np.testing.assert_allclose(ya, yb, atol=1e-10)


# ------------------------------------------- stability-boundary hardening
def _snr_db(ref, test):
    ref = np.asarray(ref)
    err = ref - np.asarray(test)
    return 10 * np.log10(np.mean(np.abs(ref) ** 2)
                         / (np.mean(np.abs(err) ** 2) + 1e-300))


def _pole_pair(r, theta=0.3):
    return np.array([1.0, -2 * r * np.cos(theta), r * r])


@pytest.mark.parametrize("r", [0.99, 0.999, 0.9999])
def test_parallel_scan_agreement_near_unit_circle_f64(r):
    """64-bit parallel stays exact (>=120 dB) arbitrarily close to |z|=1."""
    rng = np.random.default_rng(int(r * 1e4))
    T = 1 << 18
    a = _pole_pair(r)
    b = np.array([1.0, 0.0, 0.0])
    x = jnp.asarray(rng.standard_normal(T))
    ys, _ = iir.iir_apply(jnp.asarray(b), jnp.asarray(a[1:]),
                          jnp.zeros(2), x, method="scan")
    yp, _ = iir.iir_apply(jnp.asarray(b), jnp.asarray(a[1:]),
                          jnp.zeros(2), x, method="parallel")
    assert _snr_db(ys, yp) >= 120.0


def test_parallel_safe_radius_guarantee_f32():
    """Documented guarantee: f32 parallel >= 90 dB up to radius 0.99."""
    rng = np.random.default_rng(5)
    T = 1 << 20
    r = iir.PARALLEL_SAFE_RADIUS_32BIT
    a = _pole_pair(r)
    b = np.array([1.0, 0.0, 0.0])
    x = rng.standard_normal(T)
    y_true, _ = iir.iir_apply(jnp.asarray(b), jnp.asarray(a[1:]),
                              jnp.zeros(2), jnp.asarray(x), method="scan")
    yp, _ = iir.iir_apply(jnp.asarray(b, jnp.float32),
                          jnp.asarray(a[1:], jnp.float32),
                          jnp.zeros(2, jnp.float32),
                          jnp.asarray(x, jnp.float32), method="parallel")
    assert _snr_db(y_true, yp) >= 90.0


def test_auto_method_selection():
    """auto: parallel for 64-bit or safe poles; scan for f32 near |z|=1."""
    safe = _pole_pair(0.9)
    risky = _pole_pair(0.9999)
    b3 = [1.0, 0.0, 0.0]
    # 64-bit: always parallel
    assert iir.IIRFilter(b3, list(safe)).method == "parallel"
    assert iir.IIRFilter(b3, list(risky)).method == "parallel"
    # 32-bit: radius-gated
    f = iir.IIRFilter(b3, list(safe), dtype=jnp.float32)
    assert f.method == "parallel"
    f = iir.IIRFilter(b3, list(risky), dtype=jnp.float32)
    assert f.method == "scan"
    # explicit override wins
    f = iir.IIRFilter(b3, list(risky), dtype=jnp.float32, method="parallel")
    assert f.method == "parallel"


def test_auto_method_pll_active_lag_is_scan_in_f32():
    """The bw=0.02 PLL loop filter has a pole AT |z|=1 (integrator) —
    exactly the dangerous regime; auto must take the scan in 32-bit."""
    from solid_dsp_tpu.design import iirdes

    num, den = iirdes.pll_active_lag(0.02, 1 / np.sqrt(2), 1000.0)
    assert iir.max_pole_radius(np.asarray(den) / den[0]) > 0.999
    f = iir.IIRFilter(num, den, iir.IIRFilterType.SECOND_ORDER,
                      dtype=jnp.float32)
    assert all(s.method == "scan" for s in f.second_order_filters())
    f64 = iir.IIRFilter(num, den, iir.IIRFilterType.SECOND_ORDER)
    assert all(s.method == "parallel" for s in f64.second_order_filters())


def test_auto_method_output_accuracy_risky_poles_f32():
    """End-to-end: f32 auto (scan) output stays >= 80 dB vs f64 truth on a
    1M-sample block with pole radius 0.9999."""
    rng = np.random.default_rng(6)
    T = 1 << 20
    a = _pole_pair(0.9999)
    b = np.array([0.01, 0.0, 0.0])  # keep output amplitude sane
    x = rng.standard_normal(T)
    truth, _ = iir.iir_apply(jnp.asarray(b), jnp.asarray(a[1:]),
                             jnp.zeros(2), jnp.asarray(x), method="scan")
    f = iir.IIRFilter(list(b), list(a), dtype=jnp.float32)
    assert f.method == "scan"
    y = f.execute_block(jnp.asarray(x, jnp.float32))
    assert _snr_db(truth, y) >= 80.0
