"""OFDMModem byte-level link tests.

Golden truth: exact payload recovery with CRC confirmation through
delay + multipath + CFO + AWGN, across constellations; heavy noise must
be FLAGGED (crc_ok False), never silently wrong.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models.ofdm_link import OFDMModem


def _channel(tx, rng, delay=300, cfo=0.0012, snr_db=25.0,
             multipath=True):
    s = np.concatenate([np.zeros(delay, np.complex64), np.asarray(tx),
                        np.zeros(200, np.complex64)])
    if multipath:
        h = np.array([1.0, 0, 0.3 - 0.2j, 0, 0.1j])
        s = np.convolve(s, h)[: len(s)]
    s = s * np.exp(2j * np.pi * cfo * np.arange(len(s)))
    p = np.mean(np.abs(np.asarray(tx)) ** 2)
    sigma = np.sqrt(p * 10 ** (-snr_db / 10) / 2)
    s = s + sigma * (rng.standard_normal(len(s))
                     + 1j * rng.standard_normal(len(s)))
    return jnp.asarray(s.astype(np.complex64))


def test_clean_loopback_qam16():
    rng = np.random.default_rng(0)
    mm = OFDMModem(payload_bytes=64, m=16)
    data = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    tx = mm.transmit(data)
    assert int(np.asarray(tx).shape[0]) == mm.frame_samples
    out, info = mm.receive(_channel(tx, rng, cfo=0.0, snr_db=80.0,
                                    multipath=False))
    assert info["crc_ok"] and out == data
    assert abs(info["cfo"]) < 1e-5


@pytest.mark.parametrize("scheme,m,snr", [("psk", 4, 14.0),
                                          ("qam", 16, 20.0),
                                          ("qam", 64, 27.0)])
def test_through_multipath_cfo_awgn(scheme, m, snr):
    rng = np.random.default_rng(m)
    mm = OFDMModem(payload_bytes=48, scheme=scheme, m=m)
    for trial in range(3):
        data = rng.integers(0, 256, 48, dtype=np.uint8).tobytes()
        rx = _channel(mm.transmit(data), rng,
                      delay=int(rng.integers(100, 600)),
                      cfo=float(rng.uniform(-2e-3, 2e-3)), snr_db=snr)
        out, info = mm.receive(rx)
        assert info["crc_ok"] and out == data, (trial, info)
        # CFO estimate within S&C accuracy
        assert abs(info["cfo"]) < 3e-3


def test_cfo_estimate_accuracy():
    rng = np.random.default_rng(5)
    mm = OFDMModem(payload_bytes=32, m=4, scheme="psk")
    data = bytes(range(32))
    cfo = 0.0017
    rx = _channel(mm.transmit(data), rng, cfo=cfo, snr_db=30.0)
    out, info = mm.receive(rx)
    assert info["crc_ok"] and out == data
    assert abs(info["cfo"] - cfo) < 2e-4


def test_heavy_noise_flagged_not_silent():
    rng = np.random.default_rng(6)
    mm = OFDMModem(payload_bytes=64, m=64)
    data = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    rx = _channel(mm.transmit(data), rng, snr_db=2.0)  # hopeless for 64QAM
    out, info = mm.receive(rx)
    assert not (info["crc_ok"] and out == data)


def test_payload_validation_and_snr_report():
    mm = OFDMModem(payload_bytes=16, m=4, scheme="psk")
    with pytest.raises(ValueError):
        mm.transmit(b"short")
    rng = np.random.default_rng(7)
    data = bytes(16)
    rx = _channel(mm.transmit(data), rng, snr_db=20.0)
    out, info = mm.receive(rx)
    assert info["crc_ok"]
    assert 14.0 < info["snr_db"] < 27.0   # reported near the true 20 dB


def test_through_3gpp_tdl_fading():
    # EPA frequency-selective fading at slow doppler: the full-pilot
    # channel estimate + comb-pilot phase tracking carry the burst
    import jax

    from solid_dsp_tpu.models.channel import tdl_fading_channel

    rng = np.random.default_rng(9)
    mm = OFDMModem(payload_bytes=48, m=4, scheme="psk")
    data = rng.integers(0, 256, 48, dtype=np.uint8).tobytes()
    tx = np.asarray(mm.transmit(data))
    s = np.concatenate([np.zeros(300, np.complex64), tx,
                        np.zeros(200, np.complex64)])
    ok = 0
    for seed in range(5):
        y, _ = tdl_fading_channel(jax.random.PRNGKey(seed),
                                  jnp.asarray(s), "epa", 20e6, 1e-5)
        y = np.asarray(y) + 0.02 * (rng.standard_normal(len(s))
                                    + 1j * rng.standard_normal(len(s)))
        out, info = mm.receive(jnp.asarray(y.astype(np.complex64)))
        ok += int(info["crc_ok"] and out == data)
    assert ok >= 4, ok   # deep-fade realizations may legitimately fail


def test_ldpc_scheme_through_channel():
    rng = np.random.default_rng(11)
    mm = OFDMModem(payload_bytes=64, m=16, fec_scheme="ldpc")
    data = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    rx = _channel(mm.transmit(data), rng, snr_db=18.0)
    out, info = mm.receive(rx)
    assert info["crc_ok"] and out == data
    with pytest.raises(ValueError):
        OFDMModem(fec_scheme="bogus")


def test_receive_stream_multiple_bursts():
    rng = np.random.default_rng(12)
    mm = OFDMModem(payload_bytes=32, m=4, scheme="psk")
    payloads = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
                for _ in range(3)]
    parts = [np.zeros(400, np.complex64)]
    for p in payloads:
        parts += [np.asarray(mm.transmit(p)),
                  np.zeros(int(rng.integers(300, 900)), np.complex64)]
    s = np.concatenate(parts)
    s = s + 0.03 * (rng.standard_normal(len(s))
                    + 1j * rng.standard_normal(len(s)))
    res = mm.receive_stream(jnp.asarray(s.astype(np.complex64)))
    assert len(res) == 3
    for (d, info), p in zip(res, payloads):
        assert info["crc_ok"] and d == p
    # offsets increase and roughly track the layout
    offs = [info["offset"] for _, info in res]
    assert offs == sorted(offs)
    # quiet stream: nothing found
    q = 0.03 * (rng.standard_normal(4000)
                + 1j * rng.standard_normal(4000))
    assert mm.receive_stream(jnp.asarray(q.astype(np.complex64))) == []


def test_sample_clock_offset_tolerance():
    # 100 ppm TX/RX clock skew (simulated by fractional resampling):
    # the short frame + comb-pilot CPE tracking absorb the drift
    from solid_dsp_tpu.ops.resample import PfbArbitraryResampler

    rng = np.random.default_rng(13)
    mm = OFDMModem(payload_bytes=64, m=16)
    data = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    s = np.concatenate([np.zeros(300, np.complex64),
                        np.asarray(mm.transmit(data)),
                        np.zeros(300, np.complex64)])
    r = PfbArbitraryResampler(1.0 + 100e-6, dtype=jnp.complex128)
    y = np.asarray(r.execute_block(jnp.asarray(s.astype(np.complex128))))
    y = y + 0.01 * (rng.standard_normal(len(y))
                    + 1j * rng.standard_normal(len(y)))
    out, info = mm.receive(jnp.asarray(y.astype(np.complex64)))
    assert info["crc_ok"] and out == data
