"""POCSAG: BCH(31,21) coding + full FSK link round trip."""

import numpy as np
import pytest

from solid_dsp_tpu.models.pocsag import (
    IDLE_WORD,
    SYNC_WORD,
    bch3121_encode,
    bch3121_syndrome_decode,
    pocsag_decode_bits,
    pocsag_encode,
    pocsag_receive,
    pocsag_transmit,
)


def test_bch_known_constants():
    """The standard sync and idle words are valid BCH codewords."""
    for w in (SYNC_WORD, IDLE_WORD):
        data, ok = bch3121_syndrome_decode(w)
        assert ok
        assert bch3121_encode(data) == w


def test_bch_corrects_up_to_two_errors():
    rng = np.random.default_rng(0)
    for _ in range(50):
        data = int(rng.integers(0, 1 << 21))
        cw = bch3121_encode(data)
        for n_err in (0, 1, 2):
            pos = rng.choice(31, n_err, replace=False)
            bad = cw
            for p in pos:
                bad ^= 1 << (int(p) + 1)       # flip inside the BCH part
            got, ok = bch3121_syndrome_decode(bad)
            assert ok and got == data, (data, n_err)


def test_bits_roundtrip_with_errors():
    bits = pocsag_encode(1300123, "HELLO POCSAG", function=2)
    rng = np.random.default_rng(1)
    # one random bit error inside each of three codewords
    bad = bits.copy()
    for w in (1, 3, 5):
        bad[576 + 32 * w + int(rng.integers(1, 31))] ^= 1
    pages = pocsag_decode_bits(bad[500:])       # arbitrary head offset
    assert len(pages) == 1
    pg = pages[0]
    assert pg["address"] == 1300123
    assert pg["function"] == 2
    assert pg["message"] == "HELLO POCSAG"


def test_address_range_validated():
    with pytest.raises(ValueError, match="21 bits"):
        pocsag_encode(1 << 21, "X")


def test_full_fsk_link():
    iq = pocsag_transmit(2080774, "PAGE ME", sps=8)
    rng = np.random.default_rng(2)
    noisy = (iq + 0.1 * (rng.standard_normal(len(iq))
                         + 1j * rng.standard_normal(len(iq)))
             ) * np.exp(1j * 0.6)
    pages = pocsag_receive(noisy.astype(np.complex64), sps=8)
    assert len(pages) == 1
    assert pages[0]["address"] == 2080774
    assert pages[0]["message"] == "PAGE ME"


def test_three_errors_mostly_flagged_not_miscorrected():
    """The post-correction parity check catches the 3-error patterns the
    bare 2-error syndrome table would silently miscorrect."""
    rng = np.random.default_rng(4)
    silent_wrong = 0
    trials = 500
    for _ in range(trials):
        data = int(rng.integers(0, 1 << 21))
        cw = bch3121_encode(data)
        pos = rng.choice(31, 3, replace=False)
        bad = cw
        for p in pos:
            bad ^= 1 << (int(p) + 1)
        got, ok = bch3121_syndrome_decode(bad)
        if ok and got != data:
            silent_wrong += 1
    # parity catches every odd-weight residual error: zero silent passes
    assert silent_wrong == 0, silent_wrong


def test_message_capacity_validated():
    with pytest.raises(ValueError, match="codewords"):
        pocsag_encode(7, "X" * 50)          # slot 7: tiny capacity
