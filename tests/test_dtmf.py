"""DTMF generator/decoder tests."""

import numpy as np
import pytest

from solid_dsp_tpu.models.dtmf import (DTMF_COLS, DTMF_ROWS,
                                       dtmf_decode, dtmf_generate)


def test_all_16_keys_clean_and_noisy():
    rng = np.random.default_rng(0)
    seq = "123A456B789C*0#D"
    x = dtmf_generate(seq)
    assert dtmf_decode(x) == seq
    y = x + 0.05 * rng.standard_normal(len(x)).astype(np.float32)
    assert dtmf_decode(y) == seq


def test_repeated_digits_need_a_gap():
    # the re-arm logic: '55' keyed as two bursts decodes as two digits
    x = dtmf_generate("55")
    assert dtmf_decode(x) == "55"


def test_silence_and_single_tone_rejected():
    rng = np.random.default_rng(1)
    assert dtmf_decode(0.05 * rng.standard_normal(8000)
                       .astype(np.float32)) == ""
    # one tone alone (no valid column) must not register
    t = np.arange(4000) / 8000.0
    one = 0.5 * np.sin(2 * np.pi * DTMF_ROWS[0] * t).astype(np.float32)
    assert dtmf_decode(one) == ""


def test_excess_twist_rejected():
    # 20 dB level imbalance between the two tones exceeds Q.24 limits
    t = np.arange(2000) / 8000.0
    bad = (0.5 * np.sin(2 * np.pi * DTMF_ROWS[0] * t)
           + 0.05 * np.sin(2 * np.pi * DTMF_COLS[0] * t)
           ).astype(np.float32)
    assert dtmf_decode(np.concatenate([np.zeros(400, np.float32),
                                       bad])) == ""


def test_validation():
    with pytest.raises(ValueError):
        dtmf_generate("1z2")
