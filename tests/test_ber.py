"""Link-level Monte-Carlo harness: BER sweeps and coded-link gates."""

import numpy as np
import pytest

from solid_dsp_tpu.models.ber import ber_sweep, link_sim
from solid_dsp_tpu.models import channel as ch
from solid_dsp_tpu.models import fec
from solid_dsp_tpu.models.block_codes import BlockCode


def test_ber_sweep_matches_theory_qpsk():
    grid = np.array([2.0, 4.0, 6.0])
    ber = ber_sweep(grid, scheme="psk", m=4, n_bits=400_000, seed=3)
    want = ch.ber_theory("psk", 4, grid)
    assert ber.shape == (3,)
    np.testing.assert_allclose(ber, want, rtol=0.15)
    assert (np.diff(ber) < 0).all()          # monotone in SNR


def test_ber_sweep_qam16_and_scalar_point():
    ber = ber_sweep(8.0, scheme="qam", m=16, n_bits=300_000, seed=5)
    want = float(ch.ber_theory("qam", 16, 8.0))
    assert ber.shape == (1,)
    assert abs(ber[0] - want) / want < 0.2


def test_ber_sweep_validates():
    with pytest.raises(ValueError):
        ber_sweep([4.0], m=4, n_bits=1)


def test_link_sim_golay_coding_gain():
    code = BlockCode("g2312")
    out = link_sim(lambda d: code.encode(np.asarray(d).reshape(-1)),
                   code.decode, code.k, code.n, [7.0],
                   n_blocks=1500, scheme="psk", m=2, soft=False, seed=9)
    uncoded = float(ch.ber_theory("psk", 2, 7.0))
    # hard-decision Golay at 7 dB sits well below uncoded BPSK theory
    assert out["ber"][0] < 0.5 * uncoded
    assert 0.0 <= out["bler"][0] <= 1.0
    assert out["bits_per_point"] == 1500 * 12


def test_link_sim_conv_soft_beats_hard():
    code = fec.ConvCode()
    k = 120
    n = (k + code.K - 1) * 2

    def enc(d):
        return np.stack([np.asarray(code.encode(row)) for row in np.asarray(d)])

    def dec_soft(obs):
        return np.stack([np.asarray(code.decode(row, soft=True))[:k]
                         for row in np.asarray(obs)])

    def dec_hard(obs):
        return np.stack([np.asarray(code.decode(row, soft=False))[:k]
                         for row in np.asarray(obs)])

    grid = [3.0]
    soft = link_sim(enc, dec_soft, k, n, grid, n_blocks=60, m=2,
                    soft=True, code_rate=0.5, seed=2)
    hard = link_sim(enc, dec_hard, k, n, grid, n_blocks=60, m=2,
                    soft=False, code_rate=0.5, seed=2)
    assert soft["ber"][0] <= hard["ber"][0]
    assert soft["ber"][0] < float(ch.ber_theory("psk", 2, 3.0))
