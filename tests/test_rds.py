"""RDS: checkword math, group coding, MPX-rate modem round trip."""

import numpy as np
import pytest

from solid_dsp_tpu.models.rds import (
    OFFSET_WORDS,
    block_sync_decode,
    encode_group,
    make_ps_groups,
    parse_groups,
    rds_checkword,
    rds_demodulate_bits,
    rds_modulate,
    rds_receive,
    rds_syndrome,
)


def test_checkword_syndrome_roundtrip():
    rng = np.random.default_rng(0)
    for off in OFFSET_WORDS:
        for _ in range(20):
            info = int(rng.integers(0, 1 << 16))
            blk = (info << 10) | rds_checkword(info, off)
            assert rds_syndrome(blk, off) == 0
            assert rds_syndrome(blk ^ (1 << int(rng.integers(0, 26))),
                                off) != 0


def test_group_encode_and_block_sync():
    rng = np.random.default_rng(1)
    bits = make_ps_groups(0x52A1, "SOLIDDSP")
    # arbitrary garbage before/after; sync must still find all 4 groups
    pre = rng.integers(0, 2, 37).astype(np.int8)
    post = rng.integers(0, 2, 23).astype(np.int8)
    groups = block_sync_decode(np.concatenate([pre, bits, post]))
    assert len(groups) == 4
    info = parse_groups(groups)
    assert info["pi"] == 0x52A1
    assert info["ps"] == "SOLIDDSP"


def test_mpx_modem_roundtrip():
    fs = 228000.0
    # broadcast RDS repeats its groups continuously; two repetitions make
    # the decode robust to the filter-warmup corruption of the first bit
    bits = np.tile(make_ps_groups(0xBEEF, "RADIO 99"), 2)
    sig = rds_modulate(bits, fs)
    # embed in a realistic MPX: pilot + mono audio + noise
    n = np.arange(len(sig))
    rng = np.random.default_rng(2)
    audio = 0.4 * np.sin(2 * np.pi * 1000.0 / fs * n)
    pilot = 0.1 * np.sin(2 * np.pi * 19000.0 / fs * n)
    mpx = (audio + pilot + 0.06 * sig
           + 0.002 * rng.standard_normal(len(sig))).astype(np.float32)
    out = rds_receive(mpx, fs)
    assert out["pi"] == 0xBEEF, out
    assert out["ps"] == "RADIO 99"
    assert out["n_groups"] >= 6


def test_modulate_validates_rate():
    with pytest.raises(ValueError):
        rds_modulate(np.zeros(104, np.int8), 200000.0)
