"""Array processing vs synthetic ULA ground truth."""

import jax.numpy as jnp
import numpy as np

from solid_dsp_tpu.models.array_proc import (
    esprit_doa,
    root_music_doa,
    bartlett_spectrum,
    beamform,
    mrc_weights,
    music_doa,
    music_spectrum,
    mvdr_weights,
    spatial_covariance,
    ula_steering,
)


def _ula_snapshots(n_ant, thetas_deg, powers, T, noise_pow, seed=0,
                   spacing=0.5):
    rng = np.random.default_rng(seed)
    k = np.arange(n_ant)[:, None]
    X = np.zeros((n_ant, T), np.complex128)
    sigs = []
    for th, p in zip(thetas_deg, powers):
        a = np.exp(2j * np.pi * spacing * np.sin(np.deg2rad(th)) * k)
        s = np.sqrt(p / 2) * (rng.standard_normal(T)
                              + 1j * rng.standard_normal(T))
        sigs.append(s)
        X += a * s[None, :]
    X += np.sqrt(noise_pow / 2) * (rng.standard_normal((n_ant, T))
                                   + 1j * rng.standard_normal((n_ant, T)))
    return X.astype(np.complex64), sigs


def test_steering_shape_and_phase():
    a = np.asarray(ula_steering(8, 0.0))
    np.testing.assert_allclose(a, np.ones(8), atol=1e-6)   # broadside
    a30 = np.asarray(ula_steering(8, np.deg2rad(30.0)))
    expect = np.exp(2j * np.pi * 0.5 * 0.5 * np.arange(8))  # sin30 = 0.5
    np.testing.assert_allclose(a30, expect, rtol=1e-5)


def test_music_finds_two_sources():
    X, _ = _ula_snapshots(8, [-20.0, 35.0], [1.0, 1.0], 4096, 0.1, seed=1)
    R = spatial_covariance(jnp.asarray(X))
    doa = np.rad2deg(music_doa(R, n_sources=2))
    np.testing.assert_allclose(np.sort(doa), [-20.0, 35.0], atol=0.5)


def test_music_beats_bartlett_resolution():
    """Two sources 6 deg apart: MUSIC resolves (two peaks), Bartlett with
    an 8-element array (beamwidth ~13 deg) cannot."""
    X, _ = _ula_snapshots(8, [0.0, 6.0], [1.0, 1.0], 8192, 0.05, seed=2)
    R = spatial_covariance(jnp.asarray(X))
    doa = np.rad2deg(music_doa(R, n_sources=2))
    assert len(doa) == 2
    np.testing.assert_allclose(np.sort(doa), [0.0, 6.0], atol=1.0)
    th = jnp.asarray(np.deg2rad(np.linspace(-15, 21, 721)))
    bart = np.asarray(bartlett_spectrum(R, th))
    # Bartlett: single merged lobe -> exactly one local max in the window
    interior = (bart[1:-1] > bart[:-2]) & (bart[1:-1] > bart[2:])
    assert int(interior.sum()) == 1


def test_mvdr_nulls_interferer():
    """MVDR steered at s1 suppresses a 10x stronger interferer; compare
    output SINR against the matched (delay-and-sum) beamformer."""
    n, T = 8, 8192
    X, sigs = _ula_snapshots(n, [10.0, -30.0], [1.0, 10.0], T, 0.1, seed=3)
    R = spatial_covariance(jnp.asarray(X))
    a1 = ula_steering(n, np.deg2rad(10.0))
    w = mvdr_weights(R, a1)
    y = np.asarray(beamform(jnp.asarray(X), w))
    s1 = sigs[0]
    g = np.vdot(s1, y) / np.vdot(s1, s1)       # signal gain (~1, distortionless)
    err = y - g * s1
    sinr_mvdr = float(np.abs(g) ** 2 * np.vdot(s1, s1).real
                      / np.vdot(err, err).real)
    wb = np.asarray(a1) / n                     # conventional beamformer
    yb = np.asarray(beamform(jnp.asarray(X), jnp.asarray(wb)))
    gb = np.vdot(s1, yb) / np.vdot(s1, s1)
    errb = yb - gb * s1
    sinr_das = float(np.abs(gb) ** 2 * np.vdot(s1, s1).real
                     / np.vdot(errb, errb).real)
    assert abs(abs(g) - 1.0) < 0.05             # distortionless constraint
    assert sinr_mvdr > 10 * sinr_das            # interferer nulled
    assert 10 * np.log10(sinr_mvdr) > 10.0


def test_mrc_achieves_sum_snr():
    """MRC post-combining SNR ~= sum of per-branch SNRs."""
    rng = np.random.default_rng(4)
    n, T = 4, 200_000
    h = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2)
    s = (rng.standard_normal(T) + 1j * rng.standard_normal(T)) / np.sqrt(2)
    noise_pow = 0.5
    noise = np.sqrt(noise_pow / 2) * (rng.standard_normal((n, T))
                                      + 1j * rng.standard_normal((n, T)))
    X = (h[:, None] * s[None, :] + noise).astype(np.complex64)
    w = mrc_weights(jnp.asarray(h.astype(np.complex64)))
    y = np.asarray(beamform(jnp.asarray(X), w))
    g = np.vdot(s, y) / np.vdot(s, s)
    err = y - g * s
    snr_out = float(np.abs(g) ** 2 * np.vdot(s, s).real
                    / np.vdot(err, err).real)
    snr_expect = float(np.sum(np.abs(h) ** 2) / noise_pow)
    assert abs(snr_out - snr_expect) / snr_expect < 0.1


def test_music_spectrum_jit_batch():
    """Spectrum evaluation is a jitted matmul over the whole angle grid."""
    X, _ = _ula_snapshots(8, [15.0], [1.0], 2048, 0.2, seed=5)
    R = spatial_covariance(jnp.asarray(X))
    th = jnp.asarray(np.linspace(-np.pi / 2, np.pi / 2, 512))
    spec = np.asarray(music_spectrum(R, th, n_sources=1))
    assert spec.shape == (512,)
    peak = np.rad2deg(float(th[int(np.argmax(spec))]))
    assert abs(peak - 15.0) < 1.0


def test_esprit_doa_two_sources():
    X, _ = _ula_snapshots(8, [-23.0, 14.0], [1.0, 1.0], 4000, 0.01,
                          seed=7)
    R = spatial_covariance(jnp.asarray(X))
    got = np.rad2deg(esprit_doa(R, 2))
    np.testing.assert_allclose(got, [-23.0, 14.0], atol=0.5)


def test_root_music_doa_two_sources():
    X, _ = _ula_snapshots(8, [-23.0, 14.0], [1.0, 1.0], 4000, 0.01,
                          seed=7)
    R = spatial_covariance(jnp.asarray(X))
    got = np.rad2deg(root_music_doa(R, 2))
    np.testing.assert_allclose(got, [-23.0, 14.0], atol=0.5)


def test_gridless_estimators_resolve_close_sources():
    # 4 degrees apart at 20 dB SNR: below a 8-element Bartlett beamwidth;
    # subspace methods should still separate them
    X, _ = _ula_snapshots(8, [8.0, 12.0], [1.0, 1.0], 8000, 0.01, seed=8)
    R = spatial_covariance(jnp.asarray(X))
    for est in (esprit_doa, root_music_doa):
        got = np.rad2deg(est(R, 2))
        assert got.shape == (2,)
        np.testing.assert_allclose(got, [8.0, 12.0], atol=1.5)


def test_gridless_validation_and_agreement_with_music():
    X, _ = _ula_snapshots(8, [-30.0], [1.0], 4000, 0.1, seed=9)
    R = spatial_covariance(jnp.asarray(X))
    e = np.rad2deg(esprit_doa(R, 1))
    rm = np.rad2deg(root_music_doa(R, 1))
    mu = np.rad2deg(music_doa(R, 1))
    np.testing.assert_allclose(e, mu, atol=0.5)
    np.testing.assert_allclose(rm, mu, atol=0.5)
    import pytest
    with pytest.raises(ValueError):
        esprit_doa(R, 8)
    with pytest.raises(ValueError):
        root_music_doa(R, 8)
