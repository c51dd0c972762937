"""Convolutional code + Viterbi tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models import fec


def _encode_ref(bits, polys, K):
    """Per-sample reference encoder, STANDARD convention: the register
    holds the newest bit at the MSB (as 802.11/CCSDS list their taps)."""
    reg = 0
    out = []
    for b in list(bits) + [0] * (K - 1):
        reg = ((reg >> 1) | (int(b) << (K - 1))) & ((1 << K) - 1)
        for p in polys:
            out.append(bin(reg & p).count("1") & 1)
    return np.array(out)


@pytest.mark.parametrize("polys,K", [((0o171, 0o133), 7), ((0o7, 0o5), 3)])
def test_encoder_matches_shift_register(polys, K):
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 200)
    got = np.asarray(fec.conv_encode(bits, polys, K))
    want = _encode_ref(bits, polys, K)
    np.testing.assert_array_equal(got, want)


def test_clean_roundtrip():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 500)
    code = fec.ConvCode()
    rx = code.encode(bits)
    got = np.asarray(code.decode(rx))
    np.testing.assert_array_equal(got, bits)


def test_corrects_bit_errors():
    """K=7 rate-1/2 corrects scattered channel errors (d_free = 10)."""
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 1000)
    code = fec.ConvCode()
    rx = np.asarray(code.encode(bits)).copy()
    # flip 4% of coded bits, scattered
    flips = rng.choice(len(rx), size=len(rx) // 25, replace=False)
    rx[flips] ^= 1
    got = np.asarray(code.decode(rx))
    ber = np.mean(got != bits)
    assert ber < 0.005, ber


def test_soft_decision_beats_hard():
    """At matched SNR, soft-decision decoding has fewer errors."""
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 4000)
    code = fec.ConvCode()
    tx = np.asarray(code.encode(bits)).astype(np.float64)
    # BPSK over AWGN: s = 1 - 2b; llr = +noisy favors bit 0 (the module's
    # soft convention), ~7.7% raw channel BER at sigma 0.7
    s = 1.0 - 2.0 * tx
    noisy = s + 0.7 * rng.standard_normal(len(s))
    hard = (noisy < 0).astype(np.int32)
    ber_h = np.mean(np.asarray(code.decode(hard)) != bits)
    ber_s = np.mean(np.asarray(code.decode(jnp.asarray(noisy), soft=True))
                    != bits)
    assert ber_s < ber_h
    assert ber_s < 0.001
    assert ber_h < 0.1


def test_short_constraint_roundtrip():
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, 300)
    code = fec.ConvCode(polys=(0o7, 0o5), constraint=3)
    rx = np.asarray(code.encode(bits)).copy()
    rx[10] ^= 1
    rx[100] ^= 1
    got = np.asarray(code.decode(rx))
    np.testing.assert_array_equal(got, bits)


def test_interleaver_roundtrip_and_burst_protection():
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 1200)
    code = fec.ConvCode()
    coded = np.asarray(code.encode(bits))
    rows, cols = 36, len(coded) // 36
    coded = coded[: rows * cols]
    il = np.asarray(fec.interleave(coded, rows, cols)).copy()
    # roundtrip identity
    np.testing.assert_array_equal(
        np.asarray(fec.deinterleave(il, rows, cols)), coded)
    # a 30-bit BURST after interleaving spreads out and gets corrected
    il[500:530] ^= 1
    rx = np.asarray(fec.deinterleave(il, rows, cols))
    got = np.asarray(code.decode(np.concatenate(
        [rx, np.asarray(code.encode(bits))[rows * cols:]])))
    n = rows * cols // 2 - 10
    ber = np.mean(got[:n] != bits[:n])
    assert ber < 0.005, ber
    # sanity: the same burst WITHOUT interleaving is fatal locally
    direct = np.asarray(code.encode(bits)).copy()
    direct[500:530] ^= 1
    got_d = np.asarray(code.decode(direct))
    local = got_d[230:280] != bits[230:280]  # region around the burst
    assert np.mean(local) >= 0.1  # burst damage without interleaving



def test_standard_impulse_response():
    """Interop anchor: the (171,133) impulse response must equal the
    textbook tap sequences 1111001 / 1011011 (MSB = newest-first)."""
    out = np.asarray(fec.conv_encode([1], (0o171, 0o133), 7))
    br0, br1 = out[0::2], out[1::2]
    np.testing.assert_array_equal(br0, [1, 1, 1, 1, 0, 0, 1])  # 0o171
    np.testing.assert_array_equal(br1, [1, 0, 1, 1, 0, 1, 1])  # 0o133


def test_viterbi_rejects_truncated_stream():
    with pytest.raises(ValueError, match="multiple"):
        fec.viterbi_decode(np.zeros(4001, np.int32))


class TestPuncturing:
    def test_all_standard_rates_noiseless_exact(self):
        from solid_dsp_tpu.models.fec import (
            PUNCTURE_2_3, PUNCTURE_3_4, PUNCTURE_5_6, PUNCTURE_7_8,
            conv_encode, depuncture, puncture, viterbi_decode)
        rng = np.random.default_rng(0)
        for pat in (PUNCTURE_2_3, PUNCTURE_3_4, PUNCTURE_5_6,
                    PUNCTURE_7_8):
            period = len(pat[0])
            nb = 40 * period
            while (nb + 6) % period:
                nb += 1
            bits = rng.integers(0, 2, nb)
            p = puncture(conv_encode(bits), pat)
            # higher code rate than the 1/2 mother code
            assert len(np.asarray(p)) < 2 * (nb + 6)
            soft = depuncture(np.asarray(p), pat, hard=True)
            dec = np.asarray(viterbi_decode(jnp.asarray(soft), soft=True))
            np.testing.assert_array_equal(dec, bits)

    def test_punctured_rate34_beats_uncoded_awgn(self):
        from scipy.special import erfc

        from solid_dsp_tpu.models.fec import (
            PUNCTURE_3_4, conv_encode, depuncture, puncture,
            viterbi_decode)
        rng = np.random.default_rng(1)
        nb = 3 * 6000 - 6
        bits = rng.integers(0, 2, nb)
        p = np.asarray(puncture(conv_encode(bits), PUNCTURE_3_4))
        ebn0 = 10 ** (5.0 / 10)
        sigma = np.sqrt(1 / (2 * 0.75 * ebn0))
        y = (1 - 2.0 * p) + sigma * rng.standard_normal(len(p))
        llr = (2 * y / sigma ** 2).astype(np.float32)
        dec = np.asarray(viterbi_decode(
            jnp.asarray(depuncture(llr, PUNCTURE_3_4)), soft=True))
        ber = float(np.mean(dec != bits))
        assert ber < 0.1 * 0.5 * erfc(np.sqrt(ebn0))  # >=10x vs uncoded

    def test_depuncture_inverts_puncture_positions(self):
        from solid_dsp_tpu.models.fec import depuncture, puncture
        pat = ((1, 0, 1), (1, 1, 0))
        x = np.arange(1, 25, dtype=np.float32)      # 12 pairs, T=12
        kept = np.asarray(puncture(x, pat))
        full = np.asarray(depuncture(kept, pat))
        mask = full != 0
        np.testing.assert_allclose(full[mask], x[mask])
        assert mask.sum() == len(kept)

    def test_validation(self):
        from solid_dsp_tpu.models.fec import depuncture, puncture
        with pytest.raises(ValueError):
            puncture(np.zeros(10), ((1, 0), (1,)))
        with pytest.raises(ValueError):
            puncture(np.zeros(10), ((0, 0), (0, 0)))
        with pytest.raises(ValueError):
            puncture(np.zeros(10), ((1, 0), (1, 1)))   # T not mult of 2
        with pytest.raises(ValueError):
            depuncture(np.zeros(7), ((1, 0), (1, 1)))
