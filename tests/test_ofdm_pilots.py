"""Pilot-aided OFDM channel estimation / equalization end-to-end."""

import numpy as np
import pytest

from solid_dsp_tpu.models import ofdm, ofdm_pilots as op
from solid_dsp_tpu.models import linear_mod as lm

NFFT, CP, NACT = 128, 16, 96


def _qam_grid(rng, T, D, m=16):
    pts = lm.constellation("qam", m)
    return pts[rng.integers(0, m, (T, D))].astype(np.complex64)


def test_comb_indices_cover_and_disjoint():
    pil, dat = op.comb_pilot_indices(NACT, 8, 3)
    assert pil[0] == 0 and pil[-1] == NACT - 1
    assert len(np.intersect1d(pil, dat)) == 0
    assert len(pil) + len(dat) == NACT


def test_interp_matrix_vs_numpy_interp():
    pil, _ = op.comb_pilot_indices(NACT, 6)
    W = op.interp_matrix(pil, NACT)
    assert np.allclose(W.sum(axis=1), 1.0)
    rng = np.random.default_rng(0)
    hp = rng.standard_normal(len(pil)) + 1j * rng.standard_normal(len(pil))
    got = W @ hp
    want = (np.interp(np.arange(NACT), pil, hp.real)
            + 1j * np.interp(np.arange(NACT), pil, hp.imag))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_flat_channel_perfect_recovery():
    rng = np.random.default_rng(1)
    pil, dat = op.comb_pilot_indices(NACT, 8)
    pv = op.pilot_values(len(pil))
    W = op.interp_matrix(pil, NACT)
    data = _qam_grid(rng, 6, len(dat))
    grid = np.asarray(op.insert_pilots(data, pv, pil, dat, NACT))
    h = 0.7 * np.exp(1j * 1.1)
    rx = grid * h
    got, H, ph = op.ofdm_pilot_receive(rx, pv, pil, dat, W)
    np.testing.assert_allclose(np.asarray(H), h, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got), data, rtol=1e-3, atol=1e-3)


def test_multipath_channel_time_domain_end_to_end():
    """Modulate -> physical multipath conv -> demod -> pilot EQ; the
    estimated per-carrier channel must match the taps' DFT.  Pilots and
    interpolation run in signed-frequency coordinates (the active vector
    is not frequency-ordered)."""
    rng = np.random.default_rng(2)
    coords = op.active_carrier_coords(NFFT, NACT)
    pil, dat = op.comb_pilot_indices(NACT, 6, coords=coords)
    pv = op.pilot_values(len(pil))
    W = op.interp_matrix(pil, NACT, coords=coords)
    T = 8
    data = _qam_grid(rng, T, len(dat))
    grid = op.insert_pilots(data, pv, pil, dat, NACT)
    x = np.asarray(ofdm.ofdm_modulate(grid, NFFT, CP, NACT))
    taps = np.array([1.0, 0.0, 0.35 - 0.2j, 0.0, 0.1j], np.complex64)
    y = np.convolve(x, taps)[: x.size]  # CP absorbs the 4-sample spread
    rx_grid = np.asarray(ofdm.ofdm_demodulate(y, NFFT, CP, NACT))
    got, H, _ = op.ofdm_pilot_receive(rx_grid, pv, pil, dat, W,
                                      snr_linear=1e6)
    # true channel = DFT of taps at the active carriers
    Hfull = np.fft.fft(taps, NFFT)
    idx = ofdm.active_carrier_indices(NFFT, NACT)
    evm = np.sqrt(np.mean(np.abs(np.asarray(got) - data) ** 2)
                  / np.mean(np.abs(data) ** 2))
    assert evm < 0.03, evm
    np.testing.assert_allclose(np.asarray(H)[0], Hfull[idx], rtol=0.12,
                               atol=0.03)


def test_cpe_tracking_removes_common_phase():
    rng = np.random.default_rng(3)
    pil, dat = op.comb_pilot_indices(NACT, 8)
    pv = op.pilot_values(len(pil))
    W = op.interp_matrix(pil, NACT)
    T = 10
    data = _qam_grid(rng, T, len(dat))
    grid = np.asarray(op.insert_pilots(data, pv, pil, dat, NACT))
    phases = rng.uniform(-0.3, 0.3, (T, 1))
    rx = grid * np.exp(1j * phases)
    # channel estimated from the FIRST symbol only (pre-rotation), as a
    # preamble would; CPE must absorb the per-symbol rotation
    H0 = np.ones(NACT, np.complex64)
    ph = np.asarray(op.common_phase_error(rx, H0, pv, pil))
    np.testing.assert_allclose(ph, phases[:, 0], atol=1e-2)
    got, H, ph2 = op.ofdm_pilot_receive(rx, pv, pil, dat, W)
    evm = np.sqrt(np.mean(np.abs(np.asarray(got) - data) ** 2))
    assert evm < 0.02


def test_mmse_beats_zf_in_nulls():
    """Deep-null channel + noise: MMSE EVM <= ZF EVM."""
    rng = np.random.default_rng(4)
    pil, dat = op.comb_pilot_indices(NACT, 6)
    pv = op.pilot_values(len(pil))
    W = op.interp_matrix(pil, NACT)
    data = _qam_grid(rng, 20, len(dat))
    grid = np.asarray(op.insert_pilots(data, pv, pil, dat, NACT))
    k = np.arange(NACT)
    h = (0.1 + 0.9 * np.abs(np.sin(np.pi * k / 24))).astype(np.complex64)
    noise = 0.03 * (rng.standard_normal(grid.shape)
                    + 1j * rng.standard_normal(grid.shape))
    rx = grid * h + noise.astype(np.complex64)
    snr = 1.0 / 0.03 ** 2 / 2
    got_m, _, _ = op.ofdm_pilot_receive(rx, pv, pil, dat, W, snr_linear=snr)
    got_z, _, _ = op.ofdm_pilot_receive(rx, pv, pil, dat, W, snr_linear=1e9)
    evm_m = np.mean(np.abs(np.asarray(got_m) - data) ** 2)
    evm_z = np.mean(np.abs(np.asarray(got_z) - data) ** 2)
    assert evm_m <= evm_z * 1.001


def test_validation():
    with pytest.raises(ValueError, match="offset"):
        op.comb_pilot_indices(96, 8, 9)
    with pytest.raises(ValueError, match="spacing"):
        op.comb_pilot_indices(96, 1)


def test_coords_interp_handles_wrap():
    """Carriers near the +/- band boundary interpolate within their own
    side in frequency space, not across the vector wrap."""
    coords = op.active_carrier_coords(NFFT, NACT)
    pil, _ = op.comb_pilot_indices(NACT, 8, coords=coords)
    W = op.interp_matrix(pil, NACT, coords=coords)
    # a linear-in-frequency channel must be reproduced exactly
    h = (coords.astype(np.float64) * 0.01 + 0.5) + 0.0j
    np.testing.assert_allclose(W @ h[pil], h, rtol=1e-5, atol=1e-6)
