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
