"""Sequence generator tests: the defining correlation properties."""

import numpy as np
import pytest

from solid_dsp_tpu.utils import sequences as seq


def _circ_corr(a, b):
    return np.fft.ifft(np.fft.fft(a) * np.conj(np.fft.fft(b)))


@pytest.mark.parametrize("root,L", [(1, 63), (25, 139), (29, 839)])
def test_zadoff_chu_cazac(root, L):
    x = seq.zadoff_chu(root, L)
    np.testing.assert_allclose(np.abs(x), 1.0, atol=1e-12)  # CA
    r = np.abs(_circ_corr(x, x))
    assert r[0] > L - 1e-6
    assert np.max(r[1:]) < 1e-6 * L  # ZAC: zero off-peak autocorrelation


def test_zadoff_chu_cross_roots_low():
    L = 139  # prime: |xcorr| = sqrt(L) between distinct roots
    a, b = seq.zadoff_chu(3, L), seq.zadoff_chu(4, L)
    r = np.abs(_circ_corr(a, b))
    np.testing.assert_allclose(r, np.sqrt(L), atol=1e-6)


def test_zadoff_chu_validation():
    with pytest.raises(ValueError):
        seq.zadoff_chu(7, 63)  # gcd 7


@pytest.mark.parametrize("nbits", [5, 7, 10])
def test_m_sequence_properties(nbits):
    s = seq.m_sequence(nbits)
    L = (1 << nbits) - 1
    assert len(s) == L
    assert s.sum() == (L + 1) // 2           # balance: one extra 1
    bip = 1.0 - 2.0 * s.astype(np.float64)
    r = np.real(_circ_corr(bip, bip))
    assert abs(r[0] - L) < 1e-6
    np.testing.assert_allclose(r[1:], -1.0, atol=1e-6)  # two-valued


def test_m_sequence_period_is_maximal():
    s = seq.m_sequence(6)
    L = len(s)
    # no smaller period divides it
    for p in (3, 7, 9, 21):
        assert not np.array_equal(s, np.roll(s, p))


def test_gold_family_cross_correlation_bounded():
    nbits = 7
    fam = seq.gold_codes(nbits, count=10)
    L = (1 << nbits) - 1
    bound = 2 ** ((nbits + 2) // 2) + 1  # 17 for n=7: the Gold bound
    for i in range(len(fam)):
        for j in range(i + 1, len(fam)):
            a = 1.0 - 2.0 * fam[i].astype(np.float64)
            b = 1.0 - 2.0 * fam[j].astype(np.float64)
            r = np.abs(np.real(_circ_corr(a, b)))
            assert np.max(r) <= bound + 1e-6, (i, j, np.max(r))


def test_gold_family_size_and_distinct():
    fam = seq.gold_codes(5)
    assert fam.shape == (33, 31)  # 2^n + 1 codes
    assert len({tuple(row) for row in fam}) == 33
