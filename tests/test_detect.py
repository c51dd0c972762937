"""Burst/energy detection tests incl. the associative hysteresis trick."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models import detect


def _hysteresis_ref(e_db, hi, lo, init_on):
    """Per-sample reference state machine."""
    on = init_on
    out = np.empty(len(e_db), dtype=bool)
    for i, e in enumerate(e_db):
        if e > hi:
            on = True
        elif e < lo:
            on = False
        out[i] = on
    return out


def test_sliding_energy_matches_numpy():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(500) + 1j * rng.standard_normal(500)
         ).astype(np.complex64)
    W = 16
    e_db, _ = detect.sliding_energy_db(jnp.asarray(x),
                                       jnp.zeros(W, jnp.complex64), W)
    ext = np.concatenate([np.zeros(W, np.complex64), x])
    want = np.array([np.mean(np.abs(ext[i + 1: i + 1 + W]) ** 2)
                     for i in range(500)])
    np.testing.assert_allclose(np.asarray(e_db),
                               10 * np.log10(want + 1e-30), atol=1e-3)


def test_sliding_energy_streaming_continuity():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(400) + 1j * rng.standard_normal(400)
         ).astype(np.complex64)
    W = 32
    t0 = jnp.zeros(W, jnp.complex64)
    full, _ = detect.sliding_energy_db(jnp.asarray(x), t0, W)
    a, tmid = detect.sliding_energy_db(jnp.asarray(x[:150]), t0, W)
    b, _ = detect.sliding_energy_db(jnp.asarray(x[150:]), tmid, W)
    np.testing.assert_allclose(np.concatenate([a, b]), np.asarray(full),
                               atol=1e-4)


@pytest.mark.parametrize("init_on", [False, True])
def test_hysteresis_gate_matches_state_machine(init_on):
    rng = np.random.default_rng(2)
    # wander across both thresholds incl. long HOLD stretches
    e = np.cumsum(rng.standard_normal(2000)) * 0.5
    gate, final = detect.hysteresis_gate(jnp.asarray(e), 3.0, -3.0,
                                         jnp.asarray(init_on))
    want = _hysteresis_ref(e, 3.0, -3.0, init_on)
    np.testing.assert_array_equal(np.asarray(gate), want)
    assert bool(final) == want[-1]


def test_burst_detector_end_to_end():
    rng = np.random.default_rng(3)
    n = 4096
    x = 0.001 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    # two bursts at known positions
    for start, length in [(500, 300), (2000, 600)]:
        k = np.arange(length)
        x[start:start + length] += np.exp(2j * np.pi * 0.05 * k)
    det = detect.BurstDetector(window=64, high_db=-10.0, low_db=-13.0,
                               dtype=jnp.complex128)
    r = det.execute_block(x)
    rises = [int(v) for v in np.asarray(r["rises"]) if v >= 0]
    falls = [int(v) for v in np.asarray(r["falls"]) if v >= 0]
    assert len(rises) == 2 and len(falls) == 2
    # rise within a window-length of the true burst starts
    assert abs(rises[0] - 500) <= 64 and abs(rises[1] - 2000) <= 64
    assert abs(falls[0] - 800) <= 80 and abs(falls[1] - 2600) <= 80


def test_burst_spanning_block_boundary_not_double_counted():
    n = 2048
    x = 0.001 * np.ones(n, np.complex128)
    x[900:1300] += 1.0  # burst spans the split at 1024
    det = detect.BurstDetector(window=32, high_db=-10.0, low_db=-13.0,
                               dtype=jnp.complex128)
    r1 = det.execute_block(x[:1024])
    r2 = det.execute_block(x[1024:])
    rises = ([int(v) for v in np.asarray(r1["rises"]) if v >= 0]
             + [int(v) for v in np.asarray(r2["rises"]) if v >= 0])
    falls = ([int(v) for v in np.asarray(r1["falls"]) if v >= 0]
             + [int(v) for v in np.asarray(r2["falls"]) if v >= 0])
    assert len(rises) == 1  # ONE burst: no re-rise after the block split
    assert len(falls) == 1


def test_hysteresis_gate_batched_channels():
    rng = np.random.default_rng(7)
    e = np.cumsum(rng.standard_normal((5, 800)), axis=-1) * 0.5
    init = np.array([False, True, False, True, False])
    gate, final = detect.hysteresis_gate(jnp.asarray(e), 2.0, -2.0,
                                         jnp.asarray(init))
    for c in range(5):
        want = _hysteresis_ref(e[c], 2.0, -2.0, bool(init[c]))
        np.testing.assert_array_equal(np.asarray(gate[c]), want, err_msg=str(c))
        assert bool(final[c]) == want[-1]


def test_channel_bank_squelch_mutes_idle_channels():
    from solid_dsp_tpu.models.channel_bank import ChannelBank

    M = 16
    L = M * 512
    rng = np.random.default_rng(8)
    # tones in channels 3 and 9, noise floor ~-50 dB elsewhere
    k = np.arange(L)
    x = (3e-3 * (rng.standard_normal(L) + 1j * rng.standard_normal(L)))
    for ch in (3, 9):
        x = x + np.exp(2j * np.pi * (ch / M) * k)
    bank = ChannelBank(M, squelch_high_db=-20.0)
    Y = np.asarray(bank.execute_block(x.astype(np.complex64)))
    steady = Y[Y.shape[0] // 2:]  # skip filter/energy-window transients
    power = 10 * np.log10(np.mean(np.abs(steady) ** 2, axis=0) + 1e-30)
    active = set(int(i) for i in np.where(power > -40)[0])
    assert active == {3, 9}, (active, power.round(1).tolist())
    # idle channels are EXACT zeros in the steady region (muted, not low)
    idle = [c for c in range(M) if c not in (3, 9)]
    assert np.all(steady[:, idle] == 0)
    gate = np.asarray(bank.last_gate)
    assert gate.shape == (M, Y.shape[0])


def test_channel_bank_squelch_threshold_validation():
    from solid_dsp_tpu.models.channel_bank import ChannelBank

    with pytest.raises(ValueError):
        ChannelBank(8, squelch_high_db=-30.0, squelch_low_db=-20.0)
    with pytest.raises(ValueError):
        ChannelBank(8, squelch_low_db=-40.0)
