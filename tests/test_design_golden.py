"""Golden tests for the design layer against reference doctest constants.

Every constant here is lifted from BASELINE.md §B / the reference's doctests
(file:line cited per test).
"""

import numpy as np
import pytest

from solid_dsp_tpu.design import firdes, iirdes, polymath, resources, specialfn, windows


# ---------------------------------------------------------------- resources
def test_msb_index():
    # ref resources/mod.rs doctests
    assert resources.msb_index(0b1) == 1
    assert resources.msb_index(129) == 8


def test_factor():
    assert sorted(resources.factor(12)) == [2, 2, 3]


def test_modpow():
    assert resources.modpow(5, 5, 3) == 2


def test_primitive_root_prime():
    assert resources.primitive_root_prime(43) == 3


# ---------------------------------------------------------------- poly
def test_find_roots_sorted():
    # ref math/poly.rs:38-49
    roots = polymath.find_roots([6.0, 11.0, -33.0, -33.0, 11.0, 6.0])
    expect = np.array([-3.0, -1.0, -1.0 / 3.0, 0.5, 2.0], dtype=np.complex128)
    np.testing.assert_allclose(roots, expect, atol=1e-9)


def test_find_roots_bairstow_order():
    # ref math/poly.rs:86-93 (deflation order)
    roots = polymath.find_roots_bairstow([6.0, 11.0, -33.0, -33.0, 11.0, 6.0])
    expect = [-1.0 / 3.0, -1.0, 2.0, -3.0, 0.5]
    np.testing.assert_allclose(np.array(roots), np.array(expect), atol=1e-9)


def test_bairstow_recursion():
    # ref math/poly.rs:224-231
    reduced, u, v = polymath.find_roots_bairstow_recursion([6.0, -9.0, -9.0, 6.0], -1.5, -1.5)
    np.testing.assert_allclose(reduced, [-3.0, 6.0], atol=1e-9)
    assert abs(u - (-1.0)) < 1e-9 and abs(v - (-2.0)) < 1e-9


def test_bairstow_persistent():
    # ref math/poly.rs:262-272
    reduced, u, v = polymath.find_roots_bairstow_persistent(
        [6.0, 11.0, -33.0, -33.0, 11.0, 6.0], 1.8333333333333333, -5.5
    )
    np.testing.assert_allclose(reduced, [18.0, -39.0, 3.0, 6.0], atol=1e-8)
    np.testing.assert_allclose([u, v], [4.0 / 3.0, 1.0 / 3.0], atol=1e-10)


def test_expand_binomial():
    np.testing.assert_array_equal(
        polymath.expand_binomial(5), [1.0, 5.0, 10.0, 10.0, 5.0, 1.0]
    )


def test_expand_binomial_pm():
    np.testing.assert_array_equal(
        polymath.expand_binomial_pm(4, 3),
        [1.0, 1.0, -3.0, -3.0, 3.0, 3.0, -1.0, -1.0],
    )


# ---------------------------------------------------------------- firdes
def test_herrmann_length_estimate():
    # ref firdes/mod.rs:59-70
    assert firdes.estimate_required_filter_length(
        0.35, 100.0, firdes.EstimationMethod.HERRMANN
    ) == 15


def test_stop_band_estimate():
    # ref firdes/mod.rs:105-116
    est = firdes.estimate_required_filter_stop_band_attenuation(
        0.35, 16, firdes.EstimationMethod.HERRMANN
    )
    assert int(est) == 101


def test_transition_estimate():
    # ref firdes/mod.rs:153-167
    est = firdes.estimate_required_filter_transition(
        101.0, 16, firdes.EstimationMethod.HERRMANN
    )
    assert int((est + 0.005) * 100.0) == 35


def test_firdes_kaiser_len():
    taps = firdes.firdes_kaiser(8, 0.35, 120.0, 0.0)
    assert len(taps) == 8


def test_firdes_notch_len():
    taps = firdes.firdes_notch(8, 0.35, 120.0)
    assert len(taps) == 17


def test_firdes_doppler_len():
    taps = firdes.firdes_doppler(51, 0.1, 2.0, 0.0)
    assert len(taps) == 51


def test_filter_autocorrelation():
    # ref firdes/mod.rs:426-442
    taps = firdes.firdes_notch(25, 0.2, 30.0)
    ac = firdes.filter_autocorrelation(taps, 3)
    rac = firdes.filter_autocorrelation(taps, -3)
    assert ac == rac
    assert np.float32(ac) == np.float32(0.047983058)


def test_filter_crosscorrelation():
    # ref firdes/mod.rs:463-485
    h = firdes.firdes_kaiser(51, 0.35, 120.0, 0.0)
    g = firdes.firdes_notch(25, 0.20, 30.0)
    cc = firdes.filter_crosscorrelation(h, g, 0)
    assert np.float32(cc) == np.float32(0.92825377)


def test_filter_isi():
    # ref firdes/mod.rs:534-551
    h = firdes.firdes_notch(25, 0.20, 30.0)
    rms, mx = firdes.filter_isi(h, 1, 25)
    assert np.float32(rms) == np.float32(0.02509764)
    assert np.float32(mx) == np.float32(0.061966006)


def test_filter_energy():
    # ref firdes/mod.rs:585-601
    h = firdes.firdes_notch(25, 0.20, 30.0)
    e = firdes.filter_energy(h, 0.35, 128)
    assert np.float32(e) == np.float32(0.3152318)


# ---------------------------------------------------------------- iirdes
def test_frequency_pre_warp():
    # ref iirdes/mod.rs:53-61
    f = iirdes.frequency_pre_warp(0.35, 0.0, iirdes.BandType.LOWPASS)
    assert round(f * 10000.0) / 10000.0 == 1.9626


def test_bilinear_a2d():
    # ref iirdes/mod.rs:88-107
    pre_warp = iirdes.frequency_pre_warp(0.35, 0.0, iirdes.BandType.LOWPASS)
    zeros = [complex(-0.1, 4.0), complex(1.0, 0.1), complex(3000.0, -2.0)]
    poles = [complex(0.0, 3.0), complex(2.1, 3.1), complex(0.0, 0.0)]
    dz, dp, dg = iirdes.bilinear_analog_to_digital(
        zeros, poles, complex(1.21, 0.717), pre_warp
    )
    assert len(dz) == 3 and len(dp) == 3
    assert dg == complex(0.0, 0.0)


def test_bilinear_numden():
    # ref iirdes/mod.rs:152-162
    pre_warp = iirdes.frequency_pre_warp(0.35, 0.0, iirdes.BandType.LOWPASS)
    nums = [complex(1.0), complex(2.0), complex(3.0)]
    dens = [complex(0.0, 1.0), complex(0.0, 2.0), complex(0.0, 3.0)]
    zp = iirdes.bilinear_numerator_denominator(nums, dens, pre_warp)
    np.testing.assert_allclose(zp.zeros, [complex(0, -1), complex(0, -1)], atol=1e-12)
    np.testing.assert_allclose(zp.poles, [complex(1, 0), complex(1, 0)], atol=1e-12)


def test_flip_pass():
    zp = iirdes.digital_filter_flip_pass([complex(1, -1)], [complex(2, -2)])
    np.testing.assert_array_equal(zp.zeros, [complex(-1, 1)])
    np.testing.assert_array_equal(zp.poles, [complex(-2, 2)])


def test_digital_filter_shift():
    # ref iirdes/mod.rs:254-272
    zeros = [0.9, 0.9, 0.3, 0.1, -0.5]
    poles = [0.0] * 5
    zp = iirdes.digital_filter_shift(zeros, poles, 0.5)
    assert abs(zp.zeros[8] - complex(0.5, 0.0)) < 1e-12
    assert len(zp.poles) == 10


def test_stable():
    # ref iirdes/mod.rs:311-326
    assert iirdes.stable([0.3, 0.9, 0.3], [0.2, 0.2, 0.2]) is True
    assert iirdes.stable([0.3, 0.9, 0.3], [0.2, 0.78, 0.2]) is False


def test_pll_active_lag():
    # ref iirdes/pll/mod.rs:15-23 + BASELINE num[1] == 4000
    num, den = iirdes.pll_active_lag(0.35, 1.0 / np.sqrt(2.0), 1000.0)
    assert num[1] == 4000.0


def test_pll_active_pi():
    num, den = iirdes.pll_active_proportional_integral(0.35, 1.0 / np.sqrt(2.0), 1000.0)
    assert num[1] == 4000.0


# ---------------------------------------------------------------- windows
@pytest.mark.parametrize(
    "name,args",
    [
        ("kaiser", (8.6,)),
        ("hamming", ()),
        ("blackman_harris", ()),
        ("blackman_harris7", ()),
        ("flattop", ()),
        ("triangular", (26,)),
        ("rcostaper", (12,)),
    ],
)
def test_windows_nonzero(name, args):
    # ref windows/*.rs doctests all assert every tap != 0 for n=25
    w = windows.get_window(name, 25, *args)
    assert w.shape == (25,)
    assert np.all(w != 0.0)


def test_hann_endpoints():
    # ref windows/hann.rs doctest sentinel is -10 (endpoints are exactly 0)
    w = windows.hann(25)
    assert w[0] == 0.0 and w[24] == 0.0
    assert np.all(w != -10.0)
    assert abs(w[12] - 1.0) < 1e-12


def test_kaiser_bessel():
    # ref windows/kaiser_bessel.rs doctest: n=24, beta from kaiser_beta(0.35)
    beta = firdes.kaiser_beta(0.35)
    w = windows.kaiser_bessel(24, beta)
    assert w.shape == (24,)
    assert np.all(w != -10.0)
    np.testing.assert_allclose(w, w[::-1], atol=1e-15)  # symmetric


def test_kaiser_window_known_value():
    # kaiser center tap is 1.0 by construction
    w = windows.kaiser(25, 8.6)
    assert abs(w[12] - 1.0) < 1e-12


# ---------------------------------------------------------------- specialfn
def test_sinc_small_x_quirk():
    # the reference's |x| < 0.01 cosine-product branch (math/mod.rs:20-24)
    x = 0.005
    expect = (
        np.cos(np.pi * x / 2) * np.cos(np.pi * x / 4) * np.cos(np.pi * x / 8)
    )
    assert specialfn.sinc(x) == expect
    assert specialfn.sinc(0.0) == 1.0


def test_besseli_basic():
    assert specialfn.besseli(0.0, 0.0) == 1.0
    assert specialfn.besseli(0.0, 1.0) == 0.0
    # I_0(1) ~ 1.26606587775; the reference's lngamma-based series is only
    # ~1e-8 accurate (its Stirling form, math/mod.rs:177-183) — we match IT
    assert abs(specialfn.besseli(1.0, 0.0) - 1.2660658777520082) < 1e-7


def test_besselj_basic():
    assert specialfn.besselj(0.0, 0.0) == 1.0
    # J_0(1) ~ 0.76519768656; same ~1e-8 reference accuracy bound
    assert abs(specialfn.besselj(1.0, 0.0) - 0.7651976865579666) < 1e-7


def test_gamma():
    assert abs(specialfn.gamma(5.0) - 24.0) < 1e-6  # reference lngamma accuracy


def test_csqrt():
    z = specialfn.csqrt(4.0)
    assert abs(z - 2.0) < 1e-12
    z = specialfn.csqrt(-4.0)
    assert abs(z - 2j) < 1e-12


# ---------------------------------------------- LS / equiripple designers
class TestLsEquirippleDesign:
    BANDS = [(0.0, 0.10), (0.16, 0.5)]
    DESIRED = [1.0, 0.0]

    @staticmethod
    def _resp(h, f):
        w = np.exp(-2j * np.pi * np.outer(f, np.arange(len(h))))
        return np.abs(w @ h)

    def test_ls_meets_basic_spec(self):
        h = firdes.firdes_ls(63, self.BANDS, self.DESIRED)
        fp = np.linspace(0.0, 0.10, 60)
        fs = np.linspace(0.16, 0.5, 120)
        assert np.max(np.abs(self._resp(h, fp) - 1.0)) < 0.02
        assert 20 * np.log10(np.max(self._resp(h, fs))) < -40.0

    def test_equiripple_flattens_stopband_ripple(self):
        """Lawson IRLS equalizes the error: the stopband peaks all sit at
        the same level (unlike LS, whose error decays away from the edge)."""
        h_ls = firdes.firdes_ls(63, self.BANDS, self.DESIRED)
        h_eq = firdes.firdes_equiripple(63, self.BANDS, self.DESIRED)
        fs = np.linspace(0.17, 0.5, 400)
        r_ls = 20 * np.log10(self._resp(h_ls, fs) + 1e-12)
        r_eq = 20 * np.log10(self._resp(h_eq, fs) + 1e-12)

        def peak_spread(r):
            # local maxima of the ripple lobes
            pk = [r[i] for i in range(1, len(r) - 1)
                  if r[i] > r[i - 1] and r[i] > r[i + 1]]
            return max(pk) - min(pk)

        assert peak_spread(r_eq) < 6.0          # near-uniform lobes
        assert peak_spread(r_ls) > 15.0         # LS decays many dB

    def test_equiripple_beats_kaiser_at_same_length(self):
        """Equiripple's whole point: more stopband attenuation for the
        same length and transition width."""
        n = 63
        h_eq = firdes.firdes_equiripple(n, self.BANDS, self.DESIRED,
                                        weights=[1.0, 10.0])
        # kaiser with the same cutoff/transition
        h_k = firdes.firdes_kaiser(n, 0.13, 60.0, 0.0)
        h_k = h_k / np.sum(h_k)
        fs = np.linspace(0.17, 0.5, 300)
        atten_eq = -20 * np.log10(np.max(self._resp(h_eq, fs)) + 1e-12)
        atten_k = -20 * np.log10(np.max(self._resp(h_k, fs)) + 1e-12)
        assert atten_eq > atten_k + 5.0, (atten_eq, atten_k)
        # and the passband still holds
        fp = np.linspace(0.0, 0.10, 60)
        assert np.max(np.abs(self._resp(h_eq, fp) - 1.0)) < 0.02

    def test_bandpass_design(self):
        bands = [(0.0, 0.08), (0.12, 0.22), (0.27, 0.5)]
        desired = [0.0, 1.0, 0.0]
        h = firdes.firdes_equiripple(85, bands, desired)
        f_mid = np.linspace(0.13, 0.21, 50)
        assert np.max(np.abs(self._resp(h, f_mid) - 1.0)) < 0.03
        f_lo = np.linspace(0.0, 0.07, 40)
        f_hi = np.linspace(0.28, 0.5, 60)
        assert 20 * np.log10(np.max(self._resp(h, f_lo))) < -35.0
        assert 20 * np.log10(np.max(self._resp(h, f_hi))) < -35.0

    def test_even_ntaps_promoted_to_odd(self):
        h = firdes.firdes_ls(64, self.BANDS, self.DESIRED)
        assert len(h) == 65
        np.testing.assert_allclose(h, h[::-1], atol=1e-12)  # linear phase


# ------------------------------------------------------- r2: Savitzky-Golay


def test_savgol_matches_scipy():
    from scipy.signal import savgol_coeffs

    from solid_dsp_tpu.design.firdes import firdes_savgol
    for W, p, d in [(5, 2, 0), (9, 3, 0), (11, 4, 1), (7, 3, 2)]:
        mine = firdes_savgol(W, p, d)
        # scipy returns convolution order (reversed) with use="conv"
        ref = savgol_coeffs(W, p, deriv=d, use="dot")
        np.testing.assert_allclose(mine, ref, atol=1e-12, err_msg=f"{W,p,d}")


def test_savgol_smoother_preserves_polynomials():
    """A degree-p polynomial passes through unchanged at the center."""
    from solid_dsp_tpu.design.firdes import firdes_savgol
    t = np.linspace(-1, 1, 101)
    sig = 1.0 - 2 * t + 0.5 * t**2 + 0.3 * t**3
    taps = firdes_savgol(11, 3)
    sm = np.convolve(sig, taps[::-1], mode="valid")
    np.testing.assert_allclose(sm, sig[5:-5], atol=1e-12)


def test_savgol_validation():
    import pytest

    from solid_dsp_tpu.design.firdes import firdes_savgol
    with pytest.raises(ValueError):
        firdes_savgol(8, 2)
    with pytest.raises(ValueError):
        firdes_savgol(5, 5)
    with pytest.raises(ValueError):
        firdes_savgol(5, 2, deriv=3)
