"""AIS receiver: framing/CRC units + full GMSK link round trip."""

import numpy as np
import pytest

from solid_dsp_tpu.models.ais import (
    ais_build_frame,
    ais_find_frames,
    ais_receive,
    ais_transmit,
    build_type1_payload,
    crc16_x25_bits,
    hdlc_destuff,
    hdlc_stuff,
    nrzi_decode,
    nrzi_encode,
    parse_type123,
)


def test_crc16_x25_known_vector():
    """X-25 of ascii '123456789' = 0x906E (standard check value)."""
    data = b"123456789"
    bits = np.unpackbits(np.frombuffer(data, np.uint8)[:, None],
                         axis=1, bitorder="little").reshape(-1)
    fcs = crc16_x25_bits(bits.astype(np.int8))
    val = int(np.sum(fcs.astype(np.int64) << np.arange(16)))
    assert val == 0x906E, hex(val)


def test_nrzi_roundtrip():
    rng = np.random.default_rng(0)
    b = rng.integers(0, 2, 200).astype(np.int8)
    np.testing.assert_array_equal(nrzi_decode(nrzi_encode(b)), b)


def test_hdlc_stuffing_roundtrip_and_no_flag_mimicry():
    rng = np.random.default_rng(1)
    for _ in range(20):
        b = rng.integers(0, 2, 150).astype(np.int8)
        st = hdlc_stuff(b)
        np.testing.assert_array_equal(hdlc_destuff(st), b)
        # no six consecutive ones anywhere in the stuffed body
        runs = np.convolve(st, np.ones(6), mode="valid")
        assert runs.max() < 6
    # worst case: all ones
    ones = np.ones(25, np.int8)
    st = hdlc_stuff(ones)
    assert len(st) == 30
    np.testing.assert_array_equal(hdlc_destuff(st), ones)


def test_frame_find_and_crc_gate():
    rng = np.random.default_rng(2)
    payload = rng.integers(0, 2, 168).astype(np.int8)
    wire = ais_build_frame(payload)
    frames = ais_find_frames(wire[24:])        # skip training
    assert len(frames) == 1
    got, ok = frames[0]
    assert ok
    np.testing.assert_array_equal(got, payload)
    # corrupt one payload bit -> CRC fails
    bad = wire.copy()
    bad[24 + 8 + 3] ^= 1
    frames = ais_find_frames(bad[24:])
    assert frames and not frames[0][1]


def test_full_gmsk_link_roundtrip():
    payload = build_type1_payload(mmsi=244660123, lat_deg=52.371,
                                  lon_deg=4.895, sog_knots=12.3,
                                  cog_deg=87.5)
    iq = ais_transmit(payload, sps=8)
    rng = np.random.default_rng(3)
    noisy = iq + 0.05 * (rng.standard_normal(len(iq))
                         + 1j * rng.standard_normal(len(iq)))
    # arbitrary constant phase offset (discriminator is noncoherent)
    noisy = noisy * np.exp(1j * 1.1)
    frames = ais_receive(noisy.astype(np.complex64), sps=8)
    ok = [p for p, good in frames if good]
    assert len(ok) == 1
    msg = parse_type123(ok[0])
    assert msg["type"] == 1
    assert msg["mmsi"] == 244660123
    assert abs(msg["lat_deg"] - 52.371) < 1e-5
    assert abs(msg["lon_deg"] - 4.895) < 1e-5
    assert abs(msg["sog_knots"] - 12.3) < 0.05
    assert abs(msg["cog_deg"] - 87.5) < 0.05


def test_two_frames_in_one_stream():
    p1 = build_type1_payload(111111111, 10.0, 20.0)
    p2 = build_type1_payload(222222222, -33.9, 151.2)
    iq1, iq2 = ais_transmit(p1, sps=8), ais_transmit(p2, sps=8)
    gap = np.zeros(400, np.complex64)
    stream = np.concatenate([gap, iq1, gap, iq2, gap]).astype(np.complex64)
    frames = ais_receive(stream, sps=8)
    good = [parse_type123(p)["mmsi"] for p, ok in frames if ok]
    assert sorted(good) == [111111111, 222222222]
