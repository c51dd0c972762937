"""CCSDS concatenated-code tests.

Golden truth: exact payload recovery at the standard's operating point
(~2.5-3 dB Eb/N0) and the interleaver's burst-protection contrast
(depth 4 heals a 400-bit channel burst that breaks depth 1).
"""

import numpy as np
import pytest

from solid_dsp_tpu.models.ccsds import CCSDSLink


def _payload(link, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 256, link.payload_bytes, dtype=np.uint8)
            .tobytes())


def test_noiseless_roundtrip_and_rate():
    link = CCSDSLink(4)
    data = _payload(link)
    tx = np.asarray(link.encode(data))
    dec, ok = link.decode(1.0 - 2.0 * tx)
    assert ok and dec == data
    rate = len(data) * 8 / len(tx)
    assert 0.42 < rate < 0.45          # 0.5 * 223/255 minus tails


def test_awgn_at_ccsds_operating_point():
    link = CCSDSLink(4)
    data = _payload(link, 1)
    tx = np.asarray(link.encode(data))
    rng = np.random.default_rng(2)
    R = len(data) * 8 / len(tx)
    ebn0 = 10 ** (2.8 / 10)
    sigma = np.sqrt(1 / (2 * R * ebn0))
    y = (1 - 2.0 * tx) + sigma * rng.standard_normal(len(tx))
    dec, ok = link.decode((2 * y / sigma ** 2).astype(np.float32))
    assert ok and dec == data


def test_interleaver_burst_protection():
    # a 400-bit channel burst overwhelms the Viterbi stage locally; the
    # byte interleaver spreads the resulting byte burst across 4 RS
    # codewords (<= t each), while depth 1 concentrates it in one (> t)
    link4 = CCSDSLink(4)
    d4 = _payload(link4, 3)
    t4 = np.asarray(link4.encode(d4))
    bad4 = t4.copy()
    bad4[5000:5400] ^= 1
    dec, ok = link4.decode(1.0 - 2.0 * bad4)
    assert ok and dec == d4

    link1 = CCSDSLink(1)
    d1 = _payload(link1, 0)
    t1 = np.asarray(link1.encode(d1))
    bad1 = t1.copy()
    bad1[1000:1400] ^= 1
    dec1, ok1 = link1.decode(1.0 - 2.0 * bad1)
    assert not (ok1 and dec1 == d1)


def test_validation():
    link = CCSDSLink(2)
    with pytest.raises(ValueError):
        link.encode(b"short")
    with pytest.raises(ValueError):
        link.decode(np.zeros(100, np.float32))
    with pytest.raises(ValueError):
        CCSDSLink(0)
