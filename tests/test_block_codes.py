"""Short block codes: Hamming/SECDED/Golay/repetition.

Exhaustive-where-feasible: every dataword x every single error for the
Hamming family, every weight-<=2 pattern for SECDED detection, all 2048
weight-<=3 patterns for the perfect Golay code (sampled datawords), plus
randomized weight-4 detection for the extended code.
"""

import itertools

import numpy as np
import pytest

from solid_dsp_tpu.models.block_codes import (
    SCHEMES, BlockCode, block_decode, block_encode, golay_tables,
    hamming_matrices)

RNG = np.random.default_rng(7)


def _rand_data(nblocks, k):
    return RNG.integers(0, 2, size=(nblocks, k)).astype(np.int32)


@pytest.mark.parametrize("scheme", list(SCHEMES))
def test_roundtrip_clean(scheme):
    k, n, _ = SCHEMES[scheme]
    data = _rand_data(32, k)
    coded = np.array(block_encode(data, scheme))
    assert coded.shape == (32, n)
    dec, fail = block_decode(coded, scheme)
    np.testing.assert_array_equal(np.asarray(dec), data)
    assert not np.asarray(fail).any()


@pytest.mark.parametrize("scheme", ["rep3", "rep5", "h74", "h84", "h128",
                                    "g2312", "g2412", "secded2216",
                                    "secded3932", "secded7264"])
def test_single_error_corrected_every_position(scheme):
    k, n, _ = SCHEMES[scheme]
    data = _rand_data(n, k)                      # one block per error position
    coded = np.array(block_encode(data, scheme))
    coded[np.arange(n), np.arange(n)] ^= 1
    dec, fail = block_decode(coded, scheme)
    np.testing.assert_array_equal(np.asarray(dec), data)
    assert not np.asarray(fail).any()


def test_h74_exhaustive_datawords():
    data = np.array(list(itertools.product([0, 1], repeat=4)), np.int32)
    coded = np.array(block_encode(data, "h74"))
    # all 16 codewords distinct, min distance 3
    packed = coded @ (1 << np.arange(7))
    assert len(set(packed.tolist())) == 16
    dists = [(coded[i] ^ coded[j]).sum()
             for i in range(16) for j in range(i + 1, 16)]
    assert min(dists) == 3
    for pos in range(7):
        bad = coded.copy()
        bad[:, pos] ^= 1
        dec, fail = block_decode(bad, "h74")
        np.testing.assert_array_equal(np.asarray(dec), data)


@pytest.mark.parametrize("scheme", ["h84", "secded2216", "secded3932",
                                    "secded7264"])
def test_secded_detects_all_double_errors(scheme):
    k, n, _ = SCHEMES[scheme]
    data = _rand_data(1, k)
    coded = np.array(block_encode(data, scheme))[0]
    pairs = list(itertools.combinations(range(n), 2))
    bad = np.tile(coded, (len(pairs), 1))
    for row, (i, j) in enumerate(pairs):
        bad[row, i] ^= 1
        bad[row, j] ^= 1
    _, fail = block_decode(bad, scheme)
    assert np.asarray(fail).all()


def test_golay_perfect_cover():
    _, _, lut = golay_tables()
    w = lut.sum(axis=1)
    assert lut.shape == (2048, 23)
    assert w.max() == 3 and (w == 0).sum() == 1    # identity + 2047 patterns


def test_g2312_corrects_all_weight_le3():
    data = _rand_data(1, 12)
    coded = np.array(block_encode(data, "g2312"))[0]
    patterns = [p for w in (1, 2, 3)
                for p in itertools.combinations(range(23), w)]
    bad = np.tile(coded, (len(patterns), 1))
    for row, pos in enumerate(patterns):
        for p in pos:
            bad[row, p] ^= 1
    dec, fail = block_decode(bad, "g2312")
    np.testing.assert_array_equal(
        np.asarray(dec), np.tile(data, (len(patterns), 1)))
    assert not np.asarray(fail).any()


def test_g2412_corrects_3_detects_4():
    data = _rand_data(1, 12)
    coded = np.array(block_encode(data, "g2412"))[0]
    # all weight-3 corrected (sampled), including patterns hitting the
    # overall parity bit
    tri = [p for p in itertools.combinations(range(24), 3)][::7]
    bad = np.tile(coded, (len(tri), 1))
    for row, pos in enumerate(tri):
        for p in pos:
            bad[row, p] ^= 1
    dec, fail = block_decode(bad, "g2412")
    np.testing.assert_array_equal(
        np.asarray(dec), np.tile(data, (len(tri), 1)))
    assert not np.asarray(fail).any()
    # weight-4 detected, never silently wrong (sampled)
    quads = [tuple(sorted(RNG.choice(24, size=4, replace=False)))
             for _ in range(300)]
    bad4 = np.tile(coded, (len(quads), 1))
    for row, pos in enumerate(quads):
        for p in pos:
            bad4[row, p] ^= 1
    _, fail4 = block_decode(bad4, "g2412")
    assert np.asarray(fail4).all()


def test_h128_unused_syndrome_flags():
    # a double error whose syndrome lands on an UNUSED column of the
    # shortened code must be flagged, not silently miscorrected
    k, n, _ = SCHEMES["h128"]
    _, _, cols = hamming_matrices(4, 8)
    used = set(int(c) for c in cols)
    data = _rand_data(1, k)
    coded = np.array(block_encode(data, "h128"))[0]
    flagged = 0
    for i, j in itertools.combinations(range(n), 2):
        if (int(cols[i]) ^ int(cols[j])) not in used:
            bad = coded.copy()
            bad[i] ^= 1
            bad[j] ^= 1
            _, fail = block_decode(bad[None, :], "h128")
            assert np.asarray(fail).all()
            flagged += 1
    assert flagged > 0


def test_blockcode_class_and_flat_api():
    code = BlockCode("g2412")
    assert code.rate == pytest.approx(0.5)
    bits = RNG.integers(0, 2, size=120).astype(np.int32)   # 10 blocks
    coded = np.array(code.encode(bits))
    assert coded.shape == (240,)
    coded[5] ^= 1
    coded[40] ^= 1
    dec, fail = code.decode(coded)
    np.testing.assert_array_equal(np.asarray(dec), bits)
    assert not np.asarray(fail).any()
    assert "g2412" in repr(code)
    with pytest.raises(ValueError):
        BlockCode("nope")
    with pytest.raises(ValueError):
        code.encode(bits[:7])


def test_repetition_majority():
    bits = np.array([0, 1, 1, 0], np.int32)
    coded = np.array(block_encode(bits, "rep5")).reshape(-1)
    coded[1] ^= 1   # 1 of 5 flipped in block 0
    coded[6] ^= 1   # 2 of 5 flipped in block 1
    coded[8] ^= 1
    dec, _ = block_decode(coded, "rep5")
    np.testing.assert_array_equal(np.asarray(dec).reshape(-1), bits)
