"""Symbol timing recovery: O&M estimator accuracy + end-to-end QPSK SER."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.design.firdes import firdes_rrcos
from solid_dsp_tpu.models import qpsk
from solid_dsp_tpu.models.timing import (
    fractional_delay_taps,
    oerder_meyr_offset,
    symbol_sync_block,
)
from solid_dsp_tpu.ops.fir import conv1d_mxu


def _best_aligned_ser(tx_idx, got, max_lag=20, margin=10):
    """Min SER over integer alignments in both directions (the filter-chain
    delay is deterministic but direction depends on head-trim bookkeeping)."""
    best = 1.0
    for lag in range(max_lag):
        n = min(len(got), len(tx_idx) - lag) - margin
        if n > 0:
            best = min(best, float(qpsk.symbol_error_rate(
                jnp.asarray(tx_idx[lag: lag + n]), jnp.asarray(got[:n]))))
        n = min(len(tx_idx), len(got) - lag) - margin
        if n > 0:
            best = min(best, float(qpsk.symbol_error_rate(
                jnp.asarray(tx_idx[:n]), jnp.asarray(got[lag: lag + n]))))
    return best


def _tx_rx(n_sym, sps, tau_frac, rolloff=0.35, delay=6, seed=0):
    """QPSK -> RRC upsample -> fractional delay -> RRC matched filter."""
    rng = np.random.default_rng(seed)
    syms_idx = rng.integers(0, 4, n_sym)
    syms = np.asarray(qpsk.qpsk_modulate_symbols(jnp.asarray(syms_idx)))

    rrc = firdes_rrcos(sps, delay, rolloff)
    # ideal zero-stuffed pulse shaping (the class InterpolatingFIRFilter
    # reproduces the reference's reversed-branch quirk, which adds a
    # branch-dependent fractional shift — see its docstring)
    up = np.zeros(len(syms) * sps, np.complex128)
    up[::sps] = syms
    tx = np.asarray(conv1d_mxu(
        jnp.asarray(np.concatenate([np.zeros(len(rrc) - 1), up])),
        jnp.asarray(rrc)))

    # channel: pure fractional delay
    if tau_frac:
        h = np.asarray(fractional_delay_taps(jnp.asarray(float(tau_frac)),
                                             33), np.complex128)
        tx = np.convolve(tx, h)[16: 16 + len(tx)]

    # matched filter
    rx = np.asarray(conv1d_mxu(
        jnp.asarray(np.concatenate([np.zeros(len(rrc) - 1), tx])),
        jnp.asarray(rrc)))
    return syms_idx, rx


@pytest.mark.parametrize("tau", [0.0, 0.3, -0.35])
def test_oerder_meyr_estimates_fractional_offset(tau):
    sps = 4
    _, rx = _tx_rx(4000, sps, tau)
    est = float(oerder_meyr_offset(jnp.asarray(rx), sps))
    # the total timing offset includes the known integer filter delays;
    # compare the fractional parts modulo 1 symbol period... integer part
    # of the chain delay is a multiple of 1 sample, so est - (-tau) must be
    # near an integer number of samples
    d = (est - tau) % 1.0
    d = min(d, 1.0 - d)
    assert d < 0.05, f"tau={tau} est={est}"


@pytest.mark.parametrize("tau", [0.0, 0.3, -0.35])
def test_symbol_sync_block_ser(tau):
    sps = 4
    tx_idx, rx = _tx_rx(4000, sps, tau)
    syms, tau_hat = symbol_sync_block(jnp.asarray(rx, jnp.complex64), sps)
    got = np.asarray(qpsk.qpsk_slice(syms))

    best = _best_aligned_ser(tx_idx, got)
    assert best < 0.01, f"tau={tau} best SER={best}"


def test_gardner_scan_tracks():
    from solid_dsp_tpu.models.timing import gardner_scan

    sps = 4
    tx_idx, rx = _tx_rx(3000, sps, 0.25, seed=3)
    syms, mu = gardner_scan(jnp.asarray(rx, jnp.complex64), sps,
                            bandwidth=0.05)
    got = np.asarray(qpsk.qpsk_slice(syms))
    best = _best_aligned_ser(tx_idx[200:], got[200:])  # skip acquisition
    assert best < 0.02, f"best SER={best}"
