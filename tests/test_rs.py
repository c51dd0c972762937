"""Reed-Solomon GF(256) codec tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models import rs


@pytest.fixture(scope="module")
def code():
    return rs.rs_255_223()


def test_dimensions(code):
    assert (code.n, code.k, code.t) == (255, 223, 16)
    short = rs.rs_204_188()
    assert (short.n, short.k, short.t) == (204, 188, 8)


def test_encode_systematic_and_valid(code):
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 256, (4, code.k))
    cw = np.asarray(code.encode(msg))
    assert cw.shape == (4, code.n)
    np.testing.assert_array_equal(cw[:, : code.k], msg)   # systematic
    assert not np.asarray(code.syndromes(cw)).any()       # valid words


def test_generator_poly_roots():
    """g(alpha^j) = 0 for j = 1..2t — the defining property."""
    exp, _ = rs._gf_tables()
    g = np.asarray(rs._generator_poly(32), np.int32)
    for j in range(1, 33):
        assert int(rs._gf_poly_eval(g, np.int32(exp[j]))) == 0


@pytest.mark.parametrize("n_err", [1, 2, 7, 15, 16])
def test_corrects_up_to_t_errors(code, n_err):
    rng = np.random.default_rng(n_err)
    msg = rng.integers(0, 256, code.k)
    cw = np.asarray(code.encode(msg))
    bad = cw.copy()
    pos = rng.choice(code.n, n_err, replace=False)
    bad[pos] ^= rng.integers(1, 256, n_err)
    dec, ok = code.decode(bad)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(dec), msg)


def test_beyond_t_flagged(code):
    rng = np.random.default_rng(99)
    msg = rng.integers(0, 256, code.k)
    cw = np.asarray(code.encode(msg))
    fails = 0
    for trial in range(5):
        bad = cw.copy()
        pos = rng.choice(code.n, 20, replace=False)
        bad[pos] ^= rng.integers(1, 256, 20)
        _, ok = code.decode(bad)
        fails += int(not bool(ok))
    # 20 errors exceed t=16: overwhelmingly detected (miscorrection odds
    # are ~1e-9-scale; all 5 trials must flag)
    assert fails == 5


def test_batched_decode(code):
    rng = np.random.default_rng(5)
    msg = rng.integers(0, 256, (6, code.k))
    cw = np.asarray(code.encode(msg))
    bad = cw.copy()
    bad[1, 10] ^= 0xAA                      # one block errored
    bad[4, 200] ^= 0x01
    bad[4, 7] ^= 0xFF
    dec, ok = code.decode(bad)
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(dec), msg)


def test_shortened_code_roundtrip():
    code = rs.rs_204_188()
    rng = np.random.default_rng(6)
    msg = rng.integers(0, 256, code.k)
    cw = np.asarray(code.encode(msg))
    assert not np.asarray(code.syndromes(cw)).any()
    bad = cw.copy()
    pos = rng.choice(code.n, code.t, replace=False)
    bad[pos] ^= rng.integers(1, 256, code.t)
    dec, ok = code.decode(bad)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(dec), msg)


def test_burst_error_correction(code):
    """16 consecutive corrupted bytes — the outer-code raison d'etre."""
    rng = np.random.default_rng(7)
    msg = rng.integers(0, 256, code.k)
    cw = np.asarray(code.encode(msg))
    bad = cw.copy()
    bad[50:66] ^= rng.integers(1, 256, 16)
    dec, ok = code.decode(bad)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(dec), msg)


def test_validation():
    with pytest.raises(ValueError):
        rs.RSCode(shorten=223)
    with pytest.raises(ValueError):
        rs.RSCode(nroots=33)
    code = rs.rs_255_223()
    with pytest.raises(ValueError):
        code.encode(np.zeros(10, np.int32))


def test_concatenated_rs_over_conv_dvb_style():
    """DVB-style concatenation: RS(204,188) outer + convolutional inner.

    A burst of inner-decoder errors (simulated by corrupting a contiguous
    bit span that survives Viterbi as clustered byte errors) is cleaned by
    the outer RS pass — the architecture's whole purpose."""
    import jax.numpy as jnp
    from solid_dsp_tpu.models import fec

    rng = np.random.default_rng(11)
    outer = rs.rs_204_188()
    inner = fec.ConvCode()

    msg = rng.integers(0, 256, outer.k)
    cw_bytes = np.asarray(outer.encode(msg))          # (204,) bytes
    bits = ((cw_bytes[:, None] >> np.arange(7, -1, -1)) & 1).reshape(-1)
    coded = np.asarray(inner.encode(jnp.asarray(bits)))

    # channel: random bit errors + one long burst the inner code cannot
    # fully clean
    bad = coded.copy()
    flips = rng.choice(len(bad), 40, replace=False)
    bad[flips] ^= 1
    bad[500:560] ^= 1                                  # 60-bit burst
    dec_bits = np.asarray(inner.decode(jnp.asarray(bad)))

    inner_bit_errs = int(np.sum(dec_bits != bits))
    rx_bytes = (dec_bits.reshape(-1, 8)
                << np.arange(7, -1, -1)).sum(-1)
    got, ok = outer.decode(rx_bytes)
    assert inner_bit_errs > 0          # the inner decoder did leave errors
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(got), msg)


class TestErasures:
    def _cw(self, rng):
        from solid_dsp_tpu.models.rs import rs_255_223
        rs = rs_255_223()
        msg = rng.integers(0, 256, 223)
        return rs, msg, np.asarray(rs.encode(msg))

    @pytest.mark.parametrize("mu,nu", [(32, 0), (10, 11), (2, 15),
                                       (30, 1), (16, 8)])
    def test_errors_and_erasures_to_full_budget(self, mu, nu):
        # decodes while 2*nu + mu <= 2t = 32
        rng = np.random.default_rng(mu * 100 + nu)
        rs, msg, cw = self._cw(rng)
        pos = rng.choice(255, mu + nu, replace=False)
        bad = cw.copy()
        bad[pos] ^= rng.integers(1, 256, mu + nu)
        mask = np.zeros(255, bool)
        mask[pos[:mu]] = True
        dec, ok = rs.decode(bad, erasures=mask)
        assert bool(ok)
        np.testing.assert_array_equal(np.asarray(dec), msg)

    def test_over_budget_flagged(self):
        rng = np.random.default_rng(7)
        rs, msg, cw = self._cw(rng)
        pos = rng.choice(255, 34, replace=False)
        bad = cw.copy()
        bad[pos] ^= rng.integers(1, 256, 34)
        mask = np.zeros(255, bool)
        mask[pos] = True
        dec, ok = rs.decode(bad, erasures=mask)
        assert not (bool(ok)
                    and np.array_equal(np.asarray(dec), msg))

    def test_shortened_code_and_batch(self):
        from solid_dsp_tpu.models.rs import rs_204_188
        rng = np.random.default_rng(8)
        rs = rs_204_188()
        msgs = rng.integers(0, 256, (3, 188))
        cws = np.asarray(rs.encode(msgs))
        bad = cws.copy()
        masks = np.zeros((3, 204), bool)
        for i in range(3):
            p = rng.choice(204, 16, replace=False)  # 2t = 16 erasures
            bad[i, p] ^= rng.integers(1, 256, 16)
            masks[i, p] = True
        dec, ok = rs.decode(bad, erasures=masks)
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(np.asarray(dec), msgs)
        with pytest.raises(ValueError):
            rs.decode(bad, erasures=masks[:, :100])
