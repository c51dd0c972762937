"""Fused-DDC rx chain vs the unfused chain: output parity and state carry.

The headline bench runs the fused configuration; these gates make the
fused fast path a verified equivalent of the reference-semantics chain
(>= 100 dB, far above the 60 dB BASELINE.json north-star bound).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain

RNG = np.random.default_rng(11)


def _run(cfg, blocks):
    init, apply = make_rx_chain(cfg)
    st = init()
    outs = []
    for b in blocks:
        out, st = apply(st, b)
        outs.append(np.asarray(out))
    return np.concatenate(outs), st


def _snr_db(got, ref):
    err = np.linalg.norm(got - ref)
    return -20.0 * np.log10(max(err / max(np.linalg.norm(ref), 1e-300),
                                1e-300))


def _tone_blocks(nblk=4, L=4096, f=0.033):
    k = np.arange(nblk * L)
    x = (0.1 * np.exp(2j * np.pi * f * k)
         + 0.001 * (RNG.standard_normal(nblk * L)
                    + 1j * RNG.standard_normal(nblk * L))).astype(np.complex64)
    return [jnp.asarray(x[i * L : (i + 1) * L]) for i in range(nblk)]


@pytest.mark.parametrize("agc_mode", ["block", "exact"])
@pytest.mark.parametrize("demod", ["fm", "am"])
def test_fused_matches_unfused_chain(agc_mode, demod):
    blocks = _tone_blocks()
    base = dict(agc_mode=agc_mode, demod=demod, nco_mode="exact",
                dtype=jnp.complex64)
    ref, st_ref = _run(RxChainConfig(fused_ddc="off", **base), blocks)
    got, st_got = _run(RxChainConfig(fused_ddc="on", **base), blocks)
    assert got.shape == ref.shape
    assert _snr_db(got, ref) >= 100.0
    # phase word carries identically (u32 arithmetic is exact)
    assert int(st_got.nco_theta) == int(st_ref.nco_theta)


def test_planar_input_matches_cf32():
    blocks = _tone_blocks()
    base = dict(agc_mode="block", demod="fm", nco_mode="exact",
                dtype=jnp.complex64, fused_ddc="on")
    ref, _ = _run(RxChainConfig(input_format="cf32", **base), blocks)
    pl_blocks = [jnp.stack([jnp.real(b), jnp.imag(b)]) for b in blocks]
    got, _ = _run(RxChainConfig(input_format="planar", **base), pl_blocks)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_fused_precisions_stay_above_gate():
    blocks = _tone_blocks()
    base = dict(agc_mode="block", demod="fm", nco_mode="exact",
                dtype=jnp.complex64)
    ref, _ = _run(RxChainConfig(fused_ddc="off", **base), blocks)
    for prec, bound in [("highest", 100.0), ("x3", 90.0)]:
        got, _ = _run(RxChainConfig(fused_ddc="on", fir_precision=prec,
                                    **base), blocks)
        assert _snr_db(got, ref) >= bound, prec


def test_auto_enables_for_exact_disables_for_lut():
    blocks = _tone_blocks(nblk=2, L=1024)
    ref, _ = _run(RxChainConfig(fused_ddc="off", nco_mode="exact"), blocks)
    auto, _ = _run(RxChainConfig(fused_ddc="auto", nco_mode="exact"), blocks)
    assert _snr_db(auto, ref) >= 100.0
    # lut parity mode must run the unfused reference-parity path unchanged
    lut_a, _ = _run(RxChainConfig(fused_ddc="auto", nco_mode="lut"), blocks)
    lut_o, _ = _run(RxChainConfig(fused_ddc="off", nco_mode="lut"), blocks)
    np.testing.assert_array_equal(lut_a, lut_o)
    with pytest.raises(ValueError):
        make_rx_chain(RxChainConfig(fused_ddc="on", nco_mode="lut"))


def test_fused_debug_checks_catch_nan():
    cfg = RxChainConfig(fused_ddc="on", nco_mode="exact", debug_checks=True)
    init, apply = make_rx_chain(cfg)
    st = init()
    x = np.zeros(4096, np.complex64)
    x[100] = np.nan
    with pytest.raises(FloatingPointError):
        apply(st, jnp.asarray(x))
