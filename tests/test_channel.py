"""Channel models + BER-vs-theory validation.

The theory gates are the independent anchors for the modem stack: measured
uncoded BER over the device-side AWGN channel must land on the closed-form
textbook curves (exact for BPSK/QPSK, nearest-neighbor approximation for
16-QAM).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models import channel as ch
from solid_dsp_tpu.models import linear_mod as lm


def test_awgn_hits_requested_snr():
    key = jax.random.PRNGKey(0)
    x = jnp.ones(200_000, jnp.complex128)
    y = ch.awgn(key, x, snr_db=10.0)
    p_noise = float(jnp.mean(jnp.abs(y - x) ** 2))
    assert abs(10.0 * np.log10(1.0 / p_noise) - 10.0) < 0.1


def test_awgn_absolute_noise_var():
    key = jax.random.PRNGKey(1)
    y = ch.awgn(key, jnp.zeros(200_000, jnp.complex128), noise_var=0.25)
    assert abs(float(jnp.mean(jnp.abs(y) ** 2)) - 0.25) < 0.005
    # per-quadrature split
    assert abs(float(jnp.mean(y.real ** 2)) - 0.125) < 0.005


def test_awgn_rejects_ambiguous_args():
    with pytest.raises(ValueError):
        ch.awgn(jax.random.PRNGKey(0), jnp.ones(4), 10.0, 0.1)
    with pytest.raises(ValueError):
        ch.awgn(jax.random.PRNGKey(0), jnp.ones(4))


def test_apply_cfo_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=64) + 1j * rng.normal(size=64)
    got = np.asarray(ch.apply_cfo(jnp.asarray(x), 0.01, 0.3))
    want = x * np.exp(1j * (2 * np.pi * 0.01 * np.arange(64) + 0.3))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_multipath_matches_numpy_convolve():
    rng = np.random.default_rng(1)
    x = rng.normal(size=300) + 1j * rng.normal(size=300)
    h = np.array([1.0, 0.4 - 0.2j, 0.1j])
    got = np.asarray(ch.multipath_apply(jnp.asarray(x), jnp.asarray(h)))
    want = np.convolve(x, h)[: len(x)]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_phase_noise_is_random_walk():
    key = jax.random.PRNGKey(2)
    x = jnp.ones(50_000, jnp.complex128)
    lw = 1e-3
    y = np.asarray(ch.phase_noise(key, x, lw))
    np.testing.assert_allclose(np.abs(y), 1.0, atol=1e-9)  # pure rotation
    dphi = np.angle(y[1:] * np.conj(y[:-1]))
    assert abs(np.std(dphi) - 2 * np.pi * lw) / (2 * np.pi * lw) < 0.05


def test_rayleigh_fading_statistics():
    key = jax.random.PRNGKey(3)
    n, fd = 1 << 16, 0.01
    g = np.asarray(ch.rayleigh_doppler_fading(key, n, fd, jnp.complex128))
    # unit average power
    assert abs(np.mean(np.abs(g) ** 2) - 1.0) < 1e-6
    # spectrum confined to |f| < fd
    G = np.abs(np.fft.fft(g)) ** 2
    freqs = np.fft.fftfreq(n)
    out_of_band = G[np.abs(freqs) > 1.5 * fd].sum() / G.sum()
    assert out_of_band < 1e-9
    # Rayleigh envelope: E[r] = sqrt(pi/4) * sqrt(E[r^2])
    assert abs(np.mean(np.abs(g)) - np.sqrt(np.pi / 4)) < 0.05
    with pytest.raises(ValueError):
        ch.rayleigh_doppler_fading(key, 64, 0.7)


# ------------------------------------------------- BER vs theory gates

def _measure_ber(scheme, m, ebn0_db, n_bits, seed):
    """Uncoded symbol-mapped AWGN link (no pulse shaping: symbol-rate
    channel, the textbook model the closed forms describe)."""
    rng = np.random.default_rng(seed)
    k = int(np.log2(m))
    bits = rng.integers(0, 2, n_bits - (n_bits % k))
    pts = lm.constellation(scheme, m)
    syms = lm.bits_to_symbols(bits, k)
    tx = lm.modulate_symbols(syms, jnp.asarray(pts)).astype(jnp.complex128)
    nv = ch.ebn0_to_noise_var(ebn0_db, k)
    rx = ch.awgn(jax.random.PRNGKey(seed), tx, noise_var=nv)
    got = np.asarray(lm.symbols_to_bits(lm.slice_symbols(rx, pts), k))
    return float(np.mean(got != bits))


@pytest.mark.parametrize("scheme,m,ebn0_db,tol", [
    ("psk", 2, 4.0, 0.10),
    ("psk", 4, 4.0, 0.10),
    ("psk", 4, 6.0, 0.15),
    ("qam", 16, 8.0, 0.15),   # union-bound approx: looser gate
])
def test_uncoded_ber_matches_theory(scheme, m, ebn0_db, tol):
    ber = _measure_ber(scheme, m, ebn0_db, 400_000, seed=11)
    want = float(ch.ber_theory(scheme, m, ebn0_db))
    assert want > 0
    assert abs(ber - want) / want < tol, (ber, want)


def test_ber_theory_known_values():
    # Q(sqrt(2 * 10^0.4)) at 4 dB: the classic 1.25e-2
    assert abs(float(ch.ber_theory("psk", 4, 4.0)) - 0.0125) < 3e-4
    # BPSK == QPSK per-bit
    np.testing.assert_allclose(ch.ber_theory("psk", 2, 6.0),
                               ch.ber_theory("psk", 4, 6.0))
    with pytest.raises(ValueError):
        ch.ber_theory("qam", 32, 8.0)


def test_fading_then_equalized_by_known_gain():
    """Flat-fading sanity: dividing out the (known) gain restores the
    AWGN-channel BER at the faded samples' instantaneous SNR."""
    key = jax.random.PRNGKey(5)
    n = 100_000
    pts = lm.constellation("psk", 4)
    rng = np.random.default_rng(6)
    bits = rng.integers(0, 2, 2 * n)
    tx = lm.modulate_symbols(lm.bits_to_symbols(bits, 2),
                             jnp.asarray(pts)).astype(jnp.complex128)
    g = ch.rayleigh_doppler_fading(key, n, 0.005, jnp.complex128)
    rx = ch.awgn(jax.random.PRNGKey(7), tx * g,
                 noise_var=ch.ebn0_to_noise_var(15.0, 2))
    eq = rx / g  # ideal CSI
    got = np.asarray(lm.symbols_to_bits(lm.slice_symbols(eq, pts), 2))
    ber = float(np.mean(got != bits))
    # Rayleigh average BER at 15 dB: ~ 1/(4*Eb/N0) = 7.9e-3 (deep fades
    # dominate); far above the 6.9e-7 AWGN value — assert the band
    assert 3e-3 < ber < 2e-2


class TestTDLFading:
    def test_profiles_quantize_to_unit_power(self):
        from solid_dsp_tpu.models.channel import TDL_PROFILES, tdl_taps
        for name in TDL_PROFILES:
            d, a = tdl_taps(name, 30.72e6)
            assert d[0] == 0 and np.all(np.diff(d) > 0)
            np.testing.assert_allclose(float((a ** 2).sum()), 1.0,
                                       rtol=1e-12)
        # sub-sample taps merge in power at a low rate
        d1, a1 = tdl_taps("epa", 1e6)   # all delays < 1 sample -> 1 tap
        assert len(d1) == 1 and abs(float(a1[0]) - 1.0) < 1e-12
        import pytest
        with pytest.raises(ValueError):
            tdl_taps("bogus", 1e6)

    def test_statistics_and_selectivity(self):
        import jax

        from solid_dsp_tpu.models.channel import tdl_fading_channel
        rng = np.random.default_rng(0)
        n = 1 << 16
        x = ((rng.standard_normal(n) + 1j * rng.standard_normal(n))
             / np.sqrt(2)).astype(np.complex64)
        y, h = tdl_fading_channel(jax.random.PRNGKey(0), jnp.asarray(x),
                                  "etu", 30.72e6, 3e-4)
        y = np.asarray(y)
        assert np.asarray(h).shape == (9, n)
        # unit-power channel preserves average power (fading ensemble)
        p = float(np.mean(np.abs(y) ** 2) / np.mean(np.abs(x) ** 2))
        assert 0.5 < p < 2.0
        # frequency selectivity: per-band received power varies >= 1.5x
        Y = np.abs(np.fft.fft(y.reshape(16, 4096), axis=-1)) ** 2
        band = Y.mean(axis=0).reshape(32, 128).mean(axis=1)
        assert band.max() / band.min() > 1.5
        # per-tap gains fade slowly at small doppler: adjacent-sample
        # correlation near 1
        g0 = np.asarray(h)[0]
        c = np.abs(np.vdot(g0[1:], g0[:-1])) / np.vdot(g0, g0).real
        assert c > 0.99

    def test_custom_profile_and_ground_truth_reconstruction(self):
        import jax

        from solid_dsp_tpu.models.channel import (tdl_fading_channel,
                                                  tdl_taps)
        prof = ((0, 0.0), (2000, -3.0))
        d, a = tdl_taps(prof, 1e6)       # 2 us at 1 MHz -> 2 samples
        np.testing.assert_array_equal(d, [0, 2])
        rng = np.random.default_rng(1)
        n = 4096
        x = (rng.standard_normal(n)
             + 1j * rng.standard_normal(n)).astype(np.complex64)
        y, h = tdl_fading_channel(jax.random.PRNGKey(1), jnp.asarray(x),
                                  prof, 1e6, 1e-3)
        # reconstruct y from the returned ground-truth tap gains
        h = np.asarray(h)
        xd = np.concatenate([np.zeros(2, np.complex64), x[:-2]])
        y_ref = h[0] * x + h[1] * xd
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)
