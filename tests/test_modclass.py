"""Moment/cumulant hypothesis-test modulation classifier."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models.linear_mod import constellation
from solid_dsp_tpu.models.modclass import (
    class_moment_table,
    classify,
    signal_moments,
)


def _symbols(scheme, m, n, snr_db, seed=0, phase=0.0, scale=1.0):
    rng = np.random.default_rng(seed)
    pts = np.asarray(constellation(scheme, m))
    pts = pts / np.sqrt(np.mean(np.abs(pts) ** 2))
    s = pts[rng.integers(0, m, n)] * np.exp(1j * phase)
    npow = 10 ** (-snr_db / 10)
    s = s + np.sqrt(npow / 2) * (rng.standard_normal(n)
                                 + 1j * rng.standard_normal(n))
    return (scale * s).astype(np.complex64)


def test_class_moment_table_known_values():
    t = class_moment_table()
    by = dict(zip([("psk", 2), ("psk", 4), ("psk", 8),
                   ("qam", 16), ("qam", 64)], t))
    # PSK: constant modulus -> ka = k6 = 1
    np.testing.assert_allclose(by[("psk", 2)], [1, 1, 1, 2], atol=1e-9)
    np.testing.assert_allclose(by[("psk", 4)], [1, 1, 0, 1], atol=1e-9)
    np.testing.assert_allclose(by[("psk", 8)], [1, 1, 0, 0], atol=1e-9)
    # 16QAM: ka = 1.32, |C40| = 0.68
    np.testing.assert_allclose(by[("qam", 16)][0], 1.32, atol=1e-9)
    np.testing.assert_allclose(by[("qam", 16)][3], 0.68, atol=1e-9)


@pytest.mark.parametrize("scheme,m", [("psk", 2), ("psk", 4), ("psk", 8),
                                      ("qam", 16), ("qam", 64)])
def test_classify_at_15db(scheme, m):
    x = _symbols(scheme, m, 100_000, 15.0, seed=m, phase=0.3)
    label, scores = classify(jnp.asarray(x))
    assert label == (scheme, m), (label, scores)


@pytest.mark.parametrize("scheme,m", [("psk", 2), ("psk", 4), ("qam", 16)])
def test_classify_at_10db(scheme, m):
    x = _symbols(scheme, m, 200_000, 10.0, seed=10 + m)
    label, scores = classify(jnp.asarray(x))
    assert label == (scheme, m), (label, scores)


def test_rotation_and_scale_invariance():
    x = _symbols("qam", 16, 100_000, 18.0, seed=3, phase=0.41)
    l1, _ = classify(jnp.asarray(x))
    l2, _ = classify(jnp.asarray(37.0 * x))
    assert l1 == l2 == ("qam", 16)


def test_noise_rejected():
    rng = np.random.default_rng(5)
    z = ((rng.standard_normal(100_000) + 1j * rng.standard_normal(100_000))
         / np.sqrt(2)).astype(np.complex64)
    label, _ = classify(jnp.asarray(z))
    assert label == "noise"


def test_qpsk_not_confused_with_qam16_and_vice_versa():
    """The documented failure mode of naive normalized-cumulant features."""
    q = _symbols("psk", 4, 200_000, 12.0, seed=7)
    a = _symbols("qam", 16, 200_000, 12.0, seed=8)
    assert classify(jnp.asarray(q))[0] == ("psk", 4)
    assert classify(jnp.asarray(a))[0] == ("qam", 16)
