"""CIC decimator/interpolator tests vs the textbook integrator-comb form."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.ops import cic


def _cic_decim_ref(x, R, N, M=1):
    """Per-sample textbook CIC: N integrators -> decimate R -> N combs."""
    ints = np.zeros(N, dtype=np.complex128)
    combs = np.zeros((N, M), dtype=np.complex128)
    out = []
    for n, v in enumerate(np.asarray(x, np.complex128)):
        acc = v
        for i in range(N):
            ints[i] += acc
            acc = ints[i]
        if n % R == R - 1:  # emit at the end of each R-group
            y = acc
            for c in range(N):
                y_new = y - combs[c, -1]
                combs[c] = np.roll(combs[c], 1)
                combs[c, 0] = y
                y = y_new
            out.append(y)
    return np.asarray(out)


@pytest.mark.parametrize("R,N,M", [(4, 3, 1), (8, 4, 1), (5, 2, 2)])
def test_kernel_equals_integrator_comb(R, N, M):
    rng = np.random.default_rng(R * N)
    x = rng.standard_normal(40 * R) + 1j * rng.standard_normal(40 * R)
    want = _cic_decim_ref(x, R, N, M)
    d = cic.CICDecimator(R, N, M, normalize=False, dtype=jnp.complex128)
    got = np.asarray(d.execute_block(jnp.asarray(x)))
    n = min(len(got), len(want))
    scale = float(np.max(np.abs(want))) + 1e-30
    err = float(np.max(np.abs(got[:n] - want[:n]))) / scale
    assert err < 1e-10  # relative: unnormalized DC gain is (RM)^N


def test_decimator_streaming_continuity():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
    d1 = cic.CICDecimator(4, 3, dtype=jnp.complex128)
    full = np.asarray(d1.execute_block(jnp.asarray(x)))
    d2 = cic.CICDecimator(4, 3, dtype=jnp.complex128)
    a = np.asarray(d2.execute_block(jnp.asarray(x[:1000])))
    b = np.asarray(d2.execute_block(jnp.asarray(x[1000:])))
    np.testing.assert_allclose(np.concatenate([a, b]), full, atol=1e-10)


def test_normalized_dc_gain():
    x = np.ones(1024, np.complex128)
    d = cic.CICDecimator(8, 4, dtype=jnp.complex128)
    y = np.asarray(d.execute_block(jnp.asarray(x)))
    assert abs(y[-1] - 1.0) < 1e-9  # unity DC gain after settling
    u = cic.CICInterpolator(8, 4, dtype=jnp.complex128)
    z = np.asarray(u.execute_block(jnp.asarray(x)))
    assert abs(z[-1] - 1.0) < 1e-9


def test_interpolator_length_and_image_rejection():
    # a slow tone interpolated 8x: images around k/R are suppressed by
    # the sinc^N response
    R, N = 8, 4
    n = 512
    f0 = 0.01
    x = np.exp(2j * np.pi * f0 * np.arange(n))
    u = cic.CICInterpolator(R, N, dtype=jnp.complex128)
    y = np.asarray(u.execute_block(jnp.asarray(x)))
    assert y.shape == (n * R,)
    Y = np.fft.fft(y[len(y) // 2:])  # steady-state half
    L = len(Y)
    sig = np.abs(Y[int(round(f0 / R * L))])
    img = np.abs(Y[int(round((1 / R - f0 / R) * L))])
    assert 20 * np.log10(img / sig) < -45.0


def test_frequency_response_closed_form():
    R, N, M = 8, 4, 1
    h = cic.cic_kernel(R, N, M)
    for f in (0.001, 0.01, 0.03, 0.06):
        # DTFT of the kernel at f vs the sin-ratio closed form
        w = np.exp(-2j * np.pi * f * np.arange(len(h)))
        dtft = abs(np.dot(h, w))
        closed = cic.cic_frequency_response(f, R, N, M)
        np.testing.assert_allclose(dtft, closed, rtol=1e-9)


def test_alias_rejection_at_decimated_band_edges():
    """CIC nulls sit at multiples of 1/(RM): tones there are crushed."""
    R, N = 4, 4
    d = cic.CICDecimator(R, N, dtype=jnp.complex128)
    k = np.arange(1 << 14)
    x_null = np.exp(2j * np.pi * (1.0 / R) * k)  # exactly on the first null
    y = np.asarray(d.execute_block(jnp.asarray(x_null)))
    assert np.max(np.abs(y[100:])) < 1e-9
