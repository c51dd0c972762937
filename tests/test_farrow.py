"""Farrow arbitrary-ratio resampler tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.ops.farrow import FarrowResampler, lagrange_coeffs


def test_lagrange_basis_exactness():
    # cubic Lagrange must reproduce polynomials up to degree 3 exactly
    for mu in (0.0, 0.25, 0.5, 0.9):
        c = np.asarray(lagrange_coeffs(jnp.asarray([mu])))[0]
        pts = np.array([-1.0, 0.0, 1.0, 2.0])
        for deg in range(4):
            vals = pts ** deg
            np.testing.assert_allclose(np.dot(c, vals), mu ** deg,
                                       atol=1e-12)


@pytest.mark.parametrize("ratio", [48000 / 44100, 0.75, 1.0, 2.5,
                                   np.pi / 2])
def test_tone_resampling_snr(ratio):
    """Resampled tone matches the analytically evaluated tone >= 60 dB."""
    f0 = 0.02  # cycles per INPUT sample — well inside the cubic's band
    n = 1 << 14
    x = np.exp(2j * np.pi * f0 * np.arange(n))
    rs = FarrowResampler(ratio, dtype=jnp.complex128)
    y = np.asarray(rs.execute_block(jnp.asarray(x)))
    assert len(y) > 0
    # output m sits at input position t_m + 1 + (stencil offset) - 3 tail
    # samples; equivalently input-coords position u_m = m*ratio - 2
    u = np.arange(len(y)) * ratio - 2.0
    want = np.exp(2j * np.pi * f0 * u)
    # skip the zero-tail transient (first few outputs use tail zeros)
    skip = int(np.ceil(3.0 / ratio)) + 2
    err = y[skip:] - want[skip:]
    snr = 10 * np.log10(np.mean(np.abs(want[skip:]) ** 2)
                        / (np.mean(np.abs(err) ** 2) + 1e-300))
    assert snr >= 60.0, (ratio, snr)


def test_streaming_continuity():
    ratio = 1.1234567
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(4000) + 1j * rng.standard_normal(4000))
    r1 = FarrowResampler(ratio, dtype=jnp.complex128)
    full = np.asarray(r1.execute_block(jnp.asarray(x)))
    r2 = FarrowResampler(ratio, dtype=jnp.complex128)
    parts = [np.asarray(r2.execute_block(jnp.asarray(x[i: i + 700])))
             for i in range(0, 4000, 700)]
    split = np.concatenate(parts)
    n = min(len(full), len(split))
    np.testing.assert_allclose(split[:n], full[:n], atol=1e-12)


def test_output_rate():
    ratio = 48000 / 44100
    n = 1 << 15
    rs = FarrowResampler(ratio, dtype=jnp.complex128)
    y = rs.execute_block(jnp.zeros(n, jnp.complex128))
    assert abs(len(y) - n / ratio) <= 2


def test_ratio_validation():
    with pytest.raises(ValueError):
        FarrowResampler(0.0)
