"""CP-OFDM link tests: mod/demod round-trip, Schmidl-Cox sync + CFO,
multipath with one-tap equalization."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models import ofdm, qpsk

NFFT, CP, NACT = 64, 16, 48


def _payload(T, seed=0):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 4, (T, NACT))
    return idx, np.asarray(qpsk.qpsk_modulate_symbols(jnp.asarray(idx)))


def test_mod_demod_roundtrip():
    idx, syms = _payload(8)
    x = ofdm.ofdm_modulate(jnp.asarray(syms, jnp.complex64), NFFT, CP, NACT)
    assert x.shape == (8 * (NFFT + CP),)
    # unit average power
    assert abs(float(jnp.mean(jnp.abs(x) ** 2)) - 1.0) < 0.25
    Y = ofdm.ofdm_demodulate(x, NFFT, CP, NACT)
    np.testing.assert_allclose(np.asarray(Y), syms, atol=1e-5)


def test_cp_absorbs_multipath():
    """With a channel shorter than the CP, one-tap EQ restores symbols."""
    idx, syms = _payload(10, seed=1)
    pilot = np.asarray(qpsk.qpsk_modulate_symbols(
        jnp.asarray(np.zeros(NACT, np.int64))))
    tx_syms = np.concatenate([pilot[None], syms], axis=0)
    x = np.asarray(ofdm.ofdm_modulate(jnp.asarray(tx_syms, jnp.complex64),
                                      NFFT, CP, NACT))
    h = np.array([1.0, 0.0, 0.4 - 0.2j, 0.0, 0.0, 0.15j])
    rx = np.convolve(x, h)[: len(x)].astype(np.complex64)

    Y = ofdm.ofdm_demodulate(jnp.asarray(rx), NFFT, CP, NACT)
    H = ofdm.estimate_channel(Y[0], jnp.asarray(pilot, jnp.complex64))
    eq = np.asarray(ofdm.equalize(Y[1:], H))
    got = np.asarray(qpsk.qpsk_slice(jnp.asarray(eq)))
    assert (got == idx).mean() > 0.999


@pytest.mark.parametrize("offset,cfo", [(0, 0.0), (137, 0.0),
                                        (137, 0.0015), (23, -0.002)])
def test_schmidl_cox_sync_and_cfo(offset, cfo):
    """Full receiver driven by the ESTIMATED sync: find preamble, correct
    the estimated CFO, back off CP/2 into the prefix, pilot-equalize (the
    residual timing offset becomes a per-carrier phase ramp the one-tap EQ
    absorbs), slice."""
    pre = ofdm.schmidl_cox_preamble(NFFT, CP)
    idx, syms = _payload(6, seed=2)
    pilot = np.asarray(qpsk.qpsk_modulate_symbols(
        jnp.asarray(np.zeros(NACT, np.int64))))
    tx_syms = np.concatenate([pilot[None], syms], axis=0)
    x = np.asarray(ofdm.ofdm_modulate(jnp.asarray(tx_syms, jnp.complex64),
                                      NFFT, CP, NACT))
    stream = np.concatenate([
        0.01 * (np.random.default_rng(3).standard_normal(offset)
                + 1j * np.random.default_rng(4).standard_normal(offset)),
        pre, x,
        np.zeros(64, np.complex64),
    ]).astype(np.complex64)
    if cfo:
        stream = stream * np.exp(2j * np.pi * cfo * np.arange(len(stream)))

    start, cfo_hat = ofdm.schmidl_cox_sync(jnp.asarray(stream), NFFT, CP)
    true_body = offset + CP  # first sample of the preamble body
    assert abs(int(start) - true_body) <= CP // 2
    assert abs(float(cfo_hat) - cfo) < 2e-4

    # receiver path driven entirely by the estimates
    derot = stream * np.exp(-2j * np.pi * float(cfo_hat)
                            * np.arange(len(stream)))
    frame0 = int(start) + NFFT - CP // 2  # CP/2 back-off into the prefix
    payload = derot[frame0:]
    Y = ofdm.ofdm_demodulate(jnp.asarray(payload[: 7 * (NFFT + CP)]),
                             NFFT, CP, NACT)
    H = ofdm.estimate_channel(Y[0], jnp.asarray(pilot, jnp.complex64))
    got = np.asarray(qpsk.qpsk_slice(ofdm.equalize(Y[1:], H)))
    assert (got == idx).mean() > 0.99


def test_schmidl_cox_two_frames_locks_one():
    """Two frames in one buffer: the estimate centers on ONE preamble
    (argmax-windowed plateau) instead of averaging the two."""
    pre = ofdm.schmidl_cox_preamble(NFFT, CP)
    _, syms = _payload(4, seed=5)
    x = np.asarray(ofdm.ofdm_modulate(jnp.asarray(syms, jnp.complex64),
                                      NFFT, CP, NACT))
    frame = np.concatenate([pre, x])
    stream = np.concatenate([frame, frame,
                             np.zeros(64, np.complex64)]).astype(np.complex64)
    start, _ = ofdm.schmidl_cox_sync(jnp.asarray(stream), NFFT, CP)
    bodies = [CP, len(frame) + CP]
    assert min(abs(int(start) - b) for b in bodies) <= CP // 2


def test_active_carriers_validation():
    with pytest.raises(ValueError):
        ofdm.active_carrier_indices(64, 63)  # odd
    with pytest.raises(ValueError):
        ofdm.active_carrier_indices(64, 64)  # too many
