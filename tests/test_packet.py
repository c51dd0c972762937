"""PacketModem end-to-end framed-link tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models import channel as ch
from solid_dsp_tpu.models.packet import PacketModem


def _embed(burst, offset, n_total, rng, sigma):
    x = np.zeros(n_total, complex)
    x[offset: offset + len(burst)] = np.asarray(burst)
    return x + sigma * (rng.normal(size=n_total) +
                        1j * rng.normal(size=n_total))


def test_packet_roundtrip_clean():
    pm = PacketModem(payload_bytes=32, dtype=jnp.complex128)
    data = bytes(range(32))
    iq = pm.transmit(data)
    assert iq.shape == (pm.frame_samples,)
    got, info = pm.receive(iq)
    assert info["crc_ok"] and got == data


def test_packet_through_impaired_channel():
    pm = PacketModem(payload_bytes=48, dtype=jnp.complex128)
    rng = np.random.default_rng(0)
    data = bytes(rng.integers(0, 256, 48, dtype=np.uint8))
    iq = pm.transmit(data)
    x = _embed(iq, 517, len(iq) + 1200, rng, sigma=0.0)
    x = np.array(ch.apply_cfo(jnp.asarray(x), 6e-4, 1.1))
    x += 0.09 * (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x)))
    got, info = pm.receive(jnp.asarray(x))
    assert info["crc_ok"], info
    assert int(info["start"]) == 517
    assert got == data


def test_packet_crc_flags_garbage():
    pm = PacketModem(payload_bytes=16, dtype=jnp.complex128)
    rng = np.random.default_rng(1)
    noise = rng.normal(size=pm.frame_samples + 300) \
        + 1j * rng.normal(size=pm.frame_samples + 300)
    got, info = pm.receive(jnp.asarray(noise))
    assert not info["crc_ok"]


def test_packet_qam16_roundtrip():
    pm = PacketModem(payload_bytes=40, scheme="qam", m=16,
                     dtype=jnp.complex128)
    rng = np.random.default_rng(2)
    data = bytes(rng.integers(0, 256, 40, dtype=np.uint8))
    x = _embed(pm.transmit(data), 91, pm.frame_samples + 400, rng,
               sigma=0.02)
    got, info = pm.receive(jnp.asarray(x))
    assert info["crc_ok"] and got == data


def test_packet_rejects_wrong_size():
    pm = PacketModem(payload_bytes=8)
    with pytest.raises(ValueError):
        pm.transmit(b"short")


def test_packet_ldpc_roundtrip_impaired():
    pm = PacketModem(payload_bytes=64, fec_scheme="ldpc",
                     dtype=jnp.complex128)
    assert pm.n_coded % pm.code.n == 0
    rng = np.random.default_rng(3)
    data = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
    iq = pm.transmit(data)
    x = _embed(iq, 233, len(iq) + 800, rng, sigma=0.0)
    x = np.array(ch.apply_cfo(jnp.asarray(x), -4e-4, 0.6))
    x += 0.12 * (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x)))
    got, info = pm.receive(jnp.asarray(x))
    assert info["crc_ok"], info
    assert got == data


def test_packet_fec_scheme_validation():
    with pytest.raises(ValueError):
        PacketModem(payload_bytes=8, fec_scheme="hamming")


def test_pilot_tracking_rescues_phase_noise():
    """A slowly drifting oscillator (Wiener phase noise) integrates to
    large rotations over the burst; pilot-aided tracking follows it while
    the pilot-free config loses the packet on the SAME waveform."""
    import jax as _jax

    rng = np.random.default_rng(9)
    data = bytes(rng.integers(0, 256, 48, dtype=np.uint8))
    pm_p = PacketModem(payload_bytes=48, pilot_every=16,
                       dtype=jnp.complex128)
    pm_n = PacketModem(payload_bytes=48, pilot_every=0,
                       dtype=jnp.complex128)

    def channel_fn(iq):
        x = _embed(iq, 147, len(iq) + 500, rng, sigma=0.02)
        return np.asarray(ch.phase_noise(_jax.random.PRNGKey(3),
                                         jnp.asarray(x), 3e-3))

    got_p, info_p = pm_p.receive(jnp.asarray(channel_fn(pm_p.transmit(data))))
    got_n, info_n = pm_n.receive(jnp.asarray(channel_fn(pm_n.transmit(data))))
    assert info_p["crc_ok"] and got_p == data
    assert not info_n["crc_ok"]          # same impairment sinks it


def test_pilot_layout_properties():
    pm = PacketModem(payload_bytes=32, pilot_every=16)
    # every 16th slot is a pilot, data capacity preserved exactly
    assert len(pm.data_pos) == pm.n_data_symbols
    assert set(pm.pilot_pos) | set(pm.data_pos) == set(range(pm.n_symbols))
    assert np.all(pm.pilot_pos % 16 == 0)
    with pytest.raises(ValueError):
        PacketModem(payload_bytes=8, pilot_every=1)


def test_packet_polar_roundtrip_impaired():
    pm = PacketModem(payload_bytes=64, fec_scheme="polar",
                     dtype=jnp.complex128)
    assert pm.n_coded % pm.code.n == 0
    rng = np.random.default_rng(9)
    data = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
    iq = pm.transmit(data)
    x = _embed(iq, 233, len(iq) + 800, rng, sigma=0.0)
    x = np.array(ch.apply_cfo(jnp.asarray(x), -4e-4, 0.6))
    x += 0.12 * (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x)))
    got, info = pm.receive(jnp.asarray(x))
    assert info["crc_ok"], info
    assert got == data


def test_receive_stream_multiple_bursts():
    rng = np.random.default_rng(21)
    pm = PacketModem(payload_bytes=32)
    payloads = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
                for _ in range(3)]
    parts = [np.zeros(500, np.complex64)]
    for p in payloads:
        parts += [np.asarray(pm.transmit(p)),
                  np.zeros(int(rng.integers(200, 800)), np.complex64)]
    s = np.concatenate(parts)
    s = s + 0.05 * (rng.standard_normal(len(s))
                    + 1j * rng.standard_normal(len(s)))
    res = pm.receive_stream(jnp.asarray(s.astype(np.complex64)))
    assert len(res) == 3
    for (d, info), p in zip(res, payloads):
        assert info["crc_ok"] and d == p
    offs = [info["offset"] for _, info in res]
    assert offs == sorted(offs)
    # quiet stream yields nothing
    q = 0.05 * (rng.standard_normal(3000)
                + 1j * rng.standard_normal(3000))
    assert pm.receive_stream(jnp.asarray(q.astype(np.complex64))) == []


def test_packet_golay_roundtrip_noisy():
    pm = PacketModem(payload_bytes=32, fec_scheme="g2412",
                     dtype=jnp.complex128)
    assert pm.n_coded == pm.n_frames * 24
    rng = np.random.default_rng(11)
    data = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    iq = pm.transmit(data)
    x = _embed(iq, 301, len(iq) + 900, rng, sigma=0.0)
    x = np.array(ch.apply_cfo(jnp.asarray(x), 3e-4, 0.4))
    x += 0.10 * (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x)))
    got, info = pm.receive(jnp.asarray(x))
    assert info["crc_ok"], info
    assert got == data


def test_packet_uncoded_and_hamming_roundtrip():
    for scheme in ("none", "h128"):
        pm = PacketModem(payload_bytes=16, fec_scheme=scheme,
                         dtype=jnp.complex128)
        rng = np.random.default_rng(13)
        data = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
        x = _embed(pm.transmit(data), 77, pm.frame_samples + 500, rng,
                   sigma=0.03)
        got, info = pm.receive(jnp.asarray(x))
        assert info["crc_ok"] and got == data, scheme
