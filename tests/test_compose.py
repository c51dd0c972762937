"""Chain composition tests.

Golden truth: the hand-fused flagship RxChain — a composed
NCO -> decimating FIR -> AGC -> FM pipeline must be numerically
identical to make_rx_chain with the matching config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain
from solid_dsp_tpu.streaming.compose import (
    Stage, compose, stage_agc, stage_fir, stage_fir_decim, stage_fm_demod,
    stage_fn, stage_iir, stage_nco_mix_down, stage_nco_mix_up,
    stream_scan)
from solid_dsp_tpu.streaming.state import ChainState


def _tone(n, f=0.04):
    return jnp.asarray(0.1 * np.exp(2j * np.pi * f * np.arange(n)),
                       jnp.complex64)


def _rx_stages(cfg):
    taps = np.asarray(cfg.design_taps(), np.complex64)
    return (stage_nco_mix_down(cfg.carrier_freq, mode=cfg.nco_mode),
            stage_fir_decim(taps, cfg.decimation),
            stage_agc(cfg.agc_bandwidth),
            stage_fm_demod(cfg.fm_kf))


def test_composed_chain_matches_flagship():
    cfg = RxChainConfig(agc_mode="block", demod="fm", nco_mode="exact",
                        dtype=jnp.complex64)
    init, apply = compose(*_rx_stages(cfg))
    i2, a2 = make_rx_chain(cfg)
    x = _tone(16384)
    y1, st1 = jax.jit(apply)(init(), x)
    y2, _ = a2(i2(), x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_streaming_equals_one_shot_and_scan():
    cfg = RxChainConfig(agc_mode="block", demod="fm", nco_mode="exact",
                        dtype=jnp.complex64)
    init, apply = compose(*_rx_stages(cfg))
    x = _tone(16384)
    y_once, _ = apply(init(), x)
    # two sequential blocks
    st = init()
    ya, st = apply(st, x[:8192])
    yb, st = apply(st, x[8192:])
    np.testing.assert_allclose(np.concatenate([ya, yb]),
                               np.asarray(y_once), atol=1e-5)
    # one lax.scan dispatch over stacked blocks
    ys, _ = stream_scan(apply, init(), jnp.stack([x[:8192], x[8192:]]))
    np.testing.assert_allclose(np.asarray(ys).reshape(-1),
                               np.asarray(y_once), atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    cfg = RxChainConfig(agc_mode="block", demod="fm", dtype=jnp.complex64)
    init, apply = compose(*_rx_stages(cfg))
    x = _tone(8192)
    _, st = apply(init(), x)
    p = str(tmp_path / "ck")
    st.save(p)
    st2 = ChainState.load(p + ".npz", like=st)
    y1, _ = apply(st, x)
    y2, _ = apply(st2, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=0)


def test_name_dedup_and_nesting():
    f1 = stage_fn(lambda x: x * 2, name="gain")
    f2 = stage_fn(lambda x: x + 1, name="gain")
    init, apply = compose(f1, f2)
    st = init()
    assert sorted(st.keys()) == ["gain", "gain_2"]
    y, _ = apply(st, jnp.asarray([1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(y), [3.0, 5.0])
    # a composed pair is itself a stage body
    inner_init, inner_apply = compose(f1, f2)
    outer = Stage("inner", inner_init, inner_apply)
    init2, apply2 = compose(outer, stage_fn(jnp.abs, name="mag"))
    y2, _ = apply2(init2(), jnp.asarray([-2.0]))
    np.testing.assert_allclose(np.asarray(y2), [3.0])


def test_iir_and_plain_fir_stages():
    # stage adapters keep the framework's REFERENCE conventions: FIR
    # taps are newest-first (== scipy lfilter with reversed taps), IIR
    # is the reference DF-II (pinned by tests/test_iir.py).  Composition
    # must equal applying the functional cores manually.
    from scipy.signal import lfilter

    from solid_dsp_tpu.ops.fir import fir_apply, fir_init
    from solid_dsp_tpu.ops.iir import iir_apply, iir_init

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)
         ).astype(np.complex64)
    b = np.array([0.2, 0.3, 0.1])
    a = np.array([1.0, -0.5])
    h = np.array([0.5, 0.25, 0.25]).astype(np.complex64)
    init, apply = compose(stage_fir(h), stage_iir(b, a))
    y, _ = apply(init(), jnp.asarray(x))
    mid, _ = fir_apply(jnp.asarray(h), fir_init(3), jnp.asarray(x))
    ref, _ = iir_apply(jnp.asarray(b, jnp.complex64),
                       jnp.asarray(a[1:], jnp.complex64), iir_init(1),
                       mid)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-6)
    # and the FIR stage alone equals scipy with reversed taps
    y2, _ = compose(stage_fir(h))[1](compose(stage_fir(h))[0](),
                                     jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y2),
                               lfilter(h[::-1], [1.0], x), atol=1e-5)


def test_mix_up_down_inverse():
    init, apply = compose(stage_nco_mix_up(0.3), stage_nco_mix_down(0.3))
    x = _tone(4096)
    y, _ = apply(init(), x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_validation():
    with pytest.raises(ValueError):
        compose()
    with pytest.raises(ValueError):
        stage_agc(0.01, mode="bogus")
