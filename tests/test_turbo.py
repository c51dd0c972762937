"""Turbo codes: encoder vs independent RSC simulator, QPP, BER gates."""

import jax
import numpy as np
import pytest

from solid_dsp_tpu.models.turbo import (
    LTE_QPP,
    TurboCode,
    qpp_permutation,
    turbo_decode,
    turbo_encode,
)


def _ref_rsc(bits):
    """Independent bit-at-a-time LTE RSC: g0=1+D^2+D^3, g1=1+D+D^3.

    Register [s1, s2, s3] holds the previous feedback-resolved bits
    a_{k-1}, a_{k-2}, a_{k-3}.  Returns (parity, tail_sys, tail_par)
    and asserts the trellis lands in state 0 after termination.
    """
    s = [0, 0, 0]
    par = []
    for u in bits:
        a = int(u) ^ s[1] ^ s[2]          # feedback taps D^2, D^3
        par.append(a ^ s[0] ^ s[2])       # feedforward taps D^0, D^1, D^3
        s = [a, s[0], s[1]]
    tsys, tpar = [], []
    for _ in range(3):
        u = s[1] ^ s[2]                   # drives a = 0
        tsys.append(u)
        tpar.append(0 ^ s[0] ^ s[2])
        s = [0, s[0], s[1]]
    assert s == [0, 0, 0]
    return np.array(par), np.array(tsys), np.array(tpar)


def test_qpp_permutation_lte_40():
    pi = qpp_permutation(40)
    # pi(i) = (3 i + 10 i^2) mod 40
    assert pi[0] == 0 and pi[1] == 13 and pi[2] == 46 % 40
    assert sorted(pi.tolist()) == list(range(40))


def test_qpp_table_entries_are_bijections():
    for K in LTE_QPP:
        pi = qpp_permutation(K)
        assert np.unique(pi).size == K, f"K={K}"


def test_qpp_rejects_non_bijection():
    with pytest.raises(ValueError):
        qpp_permutation(40, 4, 10)  # even f1 shares a factor with K


def test_encoder_matches_reference_simulator():
    rng = np.random.default_rng(0)
    K = 64
    perm = qpp_permutation(K)
    bits = rng.integers(0, 2, K)
    cw = np.asarray(turbo_encode(bits, perm))
    assert cw.shape == (3 * K + 12,)
    p1, ts1, tp1 = _ref_rsc(bits)
    p2, ts2, tp2 = _ref_rsc(bits[perm])
    np.testing.assert_array_equal(cw[:K], bits)             # systematic
    np.testing.assert_array_equal(cw[K:2 * K], p1)          # parity 1
    np.testing.assert_array_equal(cw[2 * K:3 * K], p2)      # parity 2
    np.testing.assert_array_equal(cw[3 * K:].reshape(4, 3),
                                  np.stack([ts1, tp1, ts2, tp2]))


def test_noiseless_roundtrip():
    rng = np.random.default_rng(1)
    tc = TurboCode(40, n_iter=4)
    bits = rng.integers(0, 2, 40)
    llr = (1.0 - 2.0 * np.asarray(tc.encode(bits))) * 8.0
    dec, L = tc.decode(llr.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(dec), bits)
    # a-posteriori LLRs carry confident correct signs
    assert float(np.min(np.abs(np.asarray(L)))) > 1.0


def test_awgn_beats_uncoded_and_iterations_help():
    rng = np.random.default_rng(2)
    K = 104
    tc = TurboCode(K, n_iter=6)
    rate = tc.rate
    ebn0_db = 2.0
    sigma2 = 1.0 / (2 * rate * 10 ** (ebn0_db / 10))
    n_turbo = n_one = n_unc = nbits = 0
    for _ in range(12):
        b = rng.integers(0, 2, K)
        c = np.asarray(tc.encode(b))
        y = (1.0 - 2.0 * c) + rng.normal(0.0, np.sqrt(sigma2), c.size)
        llr = (2.0 * y / sigma2).astype(np.float32)
        d6, _ = tc.decode(llr)
        d1, _ = tc.decode(llr, n_iter=1)
        n_turbo += int(np.sum(np.asarray(d6) != b))
        n_one += int(np.sum(np.asarray(d1) != b))
        n_unc += int(np.sum((y[:K] < 0).astype(int) != b))
        nbits += K
    assert n_turbo < n_unc / 4, (n_turbo, n_unc)
    assert n_turbo <= n_one, (n_turbo, n_one)


def test_vmap_batch_matches_loop():
    rng = np.random.default_rng(3)
    K = 40
    tc = TurboCode(K, n_iter=3)
    B = 4
    llrs = np.empty((B, tc.n_coded), np.float32)
    bs = rng.integers(0, 2, (B, K))
    for i in range(B):
        c = np.asarray(tc.encode(bs[i]))
        llrs[i] = (1.0 - 2.0 * c) * 4.0 + rng.normal(0, 0.8, c.size)
    batched = jax.vmap(tc.decode)(llrs)
    for i in range(B):
        d, L = tc.decode(llrs[i])
        np.testing.assert_array_equal(np.asarray(batched[0][i]),
                                      np.asarray(d))
        np.testing.assert_allclose(np.asarray(batched[1][i]),
                                   np.asarray(L), rtol=1e-5, atol=1e-5)


def test_qpp_auto_search_untabulated_sizes():
    for K in (72, 296, 544):        # not in the LTE table
        assert K not in LTE_QPP
        pi = qpp_permutation(K)
        assert np.unique(pi).size == K
        # deterministic: independent constructions agree
        np.testing.assert_array_equal(pi, qpp_permutation(K))


def test_packet_modem_turbo_scheme():
    from solid_dsp_tpu.models.packet import PacketModem

    rng = np.random.default_rng(9)
    pm = PacketModem(payload_bytes=32, fec_scheme="turbo", turbo_iters=5)
    data = rng.bytes(32)
    tx = np.asarray(pm.transmit(data))
    rx = tx + 0.12 * (rng.standard_normal(tx.shape)
                      + 1j * rng.standard_normal(tx.shape)
                      ).astype(np.complex64)
    out, info = pm.receive(rx)
    assert info["crc_ok"] and out == data


def test_rate_and_repr():
    tc = TurboCode(512)
    assert tc.n_coded == 3 * 512 + 12
    assert abs(tc.rate - 512 / (3 * 512 + 12)) < 1e-12
    assert "TurboCode" in repr(tc)
