"""Pallas fused-DDC body (ops/pallas_ddc.py) parity vs the XLA path.

On CPU the kernel runs in Pallas interpreter mode — the identical kernel
code the chip compiles through Mosaic — so these tests gate the MATH of
the tiled interior + edge stitching, while on-chip accuracy/throughput
is measured by tools/proto_pallas_ddc.py (numbers in the module
docstring of ops/pallas_ddc.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from solid_dsp_tpu.ops import ddc as ddc_ops
from solid_dsp_tpu.ops import pallas_ddc


def _snr_db(ref, got):
    ref = np.asarray(ref, np.complex128)
    err = np.asarray(got, np.complex128) - ref
    e = np.sum(np.abs(err) ** 2)
    if e == 0:
        return np.inf
    return 10 * np.log10(np.sum(np.abs(ref) ** 2) / e)


def _run(engine, taps, dtheta, x2, M, tail2=None, theta0=0):
    n1 = len(taps) - 1
    if tail2 is None:
        tail2 = jnp.zeros((2, n1), jnp.float32)
    return ddc_ops.ddc_apply_planar(
        taps, dtheta, tail2, jnp.uint32(theta0), x2, M,
        precision="highest" if engine == "xla" else "x3",
        rot_mode="exact", engine=engine)


# big enough for >= 1 pallas tile: (TILES*TF + 8) * 64*M samples
def _sig(L, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((2, L)).astype(np.float32))


@pytest.mark.parametrize("n_taps,M", [(64, 4), (33, 2), (64, 1), (128, 4)])
def test_pallas_matches_xla(n_taps, M):
    rng = np.random.default_rng(1)
    taps = rng.standard_normal(n_taps) * 0.1
    hop = 64 * M
    L = (2 * 128 + 8) * hop + 5 * M          # 2 tiles + stragglers
    x2 = _sig(L)
    dtheta = np.uint32(0x2345_6789)
    re_x, im_x, t_x, th_x = _run("xla", taps, dtheta, x2, M)
    re_p, im_p, t_p, th_p = _run("pallas", taps, dtheta, x2, M)
    assert re_p.shape == re_x.shape
    ref = np.asarray(re_x) + 1j * np.asarray(im_x)
    got = np.asarray(re_p) + 1j * np.asarray(im_p)
    assert _snr_db(ref, got) > 100
    np.testing.assert_array_equal(np.asarray(t_x), np.asarray(t_p))
    assert int(th_x) == int(th_p)


def test_pallas_block_boundary_continuity():
    """Two pallas blocks == one double-length pallas block (tail carry
    through the stitched pallas+xla pieces)."""
    rng = np.random.default_rng(2)
    taps = rng.standard_normal(64) * 0.1
    M = 4
    hop = 64 * M
    L = (128 + 8) * hop                       # exactly 1 tile + halo frames
    x2a, x2b = _sig(L, 3), _sig(L, 4)
    dtheta = np.uint32(0x0abc_def0)

    re1, im1, tail, th = _run("pallas", taps, dtheta, x2a, M)
    re2, im2, _, _ = _run("pallas", taps, dtheta, x2b, M,
                          tail2=tail, theta0=int(th))
    got = np.concatenate([np.asarray(re1) + 1j * np.asarray(im1),
                          np.asarray(re2) + 1j * np.asarray(im2)])

    x2 = jnp.concatenate([x2a, x2b], axis=1)
    re, im, _, _ = _run("pallas", taps, dtheta, x2, M)
    ref = np.asarray(re) + 1j * np.asarray(im)
    assert _snr_db(ref, got) > 100


def test_unsupported_taps_fall_back():
    """n-1 > P*M: engine='pallas' silently keeps the XLA body (the
    support predicate gates the kernel)."""
    assert not pallas_ddc.pallas_body_supported(200, 1, 64)
    rng = np.random.default_rng(5)
    taps = rng.standard_normal(200) * 0.05
    L = 70000
    x2 = _sig(L, 6)
    re_x, im_x, _, _ = _run("xla", taps, np.uint32(123456), x2, 1)
    re_p, im_p, _, _ = _run("pallas", taps, np.uint32(123456), x2, 1)
    ref = np.asarray(re_x) + 1j * np.asarray(im_x)
    got = np.asarray(re_p) + 1j * np.asarray(im_p)
    assert _snr_db(ref, got) > 120


def test_small_block_no_tiles():
    """Blocks smaller than one tile skip the pallas piece entirely."""
    rng = np.random.default_rng(7)
    taps = rng.standard_normal(64) * 0.1
    x2 = _sig(4096, 8)
    re_x, im_x, _, _ = _run("xla", taps, np.uint32(99), x2, 4)
    re_p, im_p, _, _ = _run("pallas", taps, np.uint32(99), x2, 4)
    ref = np.asarray(re_x) + 1j * np.asarray(im_x)
    got = np.asarray(re_p) + 1j * np.asarray(im_p)
    assert _snr_db(ref, got) > 120


def test_chain_engine_pallas_matches_xla():
    """Full planar fused chain with ddc_engine='pallas' vs 'xla'."""
    from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain

    outs = {}
    for engine in ("xla", "pallas"):
        cfg = RxChainConfig(carrier_freq=0.2, decimation=4, fir_taps=64,
                            agc_mode="block", demod="fm", nco_mode="exact",
                            input_format="planar", fused_ddc="on",
                            fir_precision="x3", ddc_engine=engine,
                            dtype=jnp.complex64)
        init, apply = make_rx_chain(cfg)
        L = (128 + 8) * 256 * 2
        k = np.arange(L)
        sig = 0.1 * np.exp(2j * np.pi * 0.033 * k)
        x = jnp.asarray(np.stack([sig.real, sig.imag]).astype(np.float32))
        out, _ = apply(init(), x)
        outs[engine] = np.asarray(out)
    p = np.sum(outs["xla"] ** 2)
    e = np.sum((outs["pallas"] - outs["xla"]) ** 2)
    assert 10 * np.log10(p / max(e, 1e-30)) > 80


def test_engine_validation():
    from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain

    cfg = RxChainConfig(ddc_engine="nope")
    with pytest.raises(ValueError, match="ddc_engine"):
        make_rx_chain(cfg)


def test_iq_ingest_kernel_matches_planar_chain():
    """cf32/ci16 ingest through the ddc_engine='pallas' chain must match
    the planar-ingest chain (same kernel after the on-device
    complex->planar conversion; complex64 is stored planar internally on
    TPU, so the conversion is cheap — PERF_NOTES.md #20)."""
    from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain

    L = (4 * 128 + 0) * 256 * 2  # tiled exactly: F_all % TF == 0
    k = np.arange(L)
    sig = (0.1 * np.exp(2j * np.pi * (0.2 / (2 * np.pi) + 0.001) * k)
           ).astype(np.complex64)

    def run(input_format, x):
        cfg = RxChainConfig(carrier_freq=0.2, decimation=4, fir_taps=64,
                            agc_mode="block", demod="fm", nco_mode="exact",
                            input_format=input_format, fused_ddc="on",
                            fir_precision="x3", ddc_engine="pallas",
                            dtype=jnp.complex64)
        init, apply = make_rx_chain(cfg)
        st = init()
        out1, st = apply(st, x)
        out2, st = apply(st, x)   # second block exercises the carried tail
        return np.concatenate([np.asarray(out1), np.asarray(out2)]), st

    ref, st_p = run("planar",
                    jnp.asarray(np.stack([sig.real, sig.imag])))
    got_c, st_c = run("cf32", jnp.asarray(sig))
    err = got_c - ref
    snr = 10 * np.log10(np.mean(ref ** 2) / max(np.mean(err ** 2), 1e-30))
    assert snr > 80.0, f"cf32 iq chain SNR {snr:.1f} dB"
    np.testing.assert_allclose(np.asarray(st_c.fir_tail),
                               np.asarray(st_p.fir_tail), atol=1e-6)
    np.testing.assert_allclose(float(st_c.agc["gain"]),
                               float(st_p.agc["gain"]), rtol=1e-5)

    xi16 = np.round(np.stack([sig.real, sig.imag], axis=-1) * 32767.0
                    ).astype(np.int16)
    got_i, _ = run("ci16", jnp.asarray(xi16))
    # ci16 quantizes the INPUT; compare against the planar chain fed the
    # same quantized samples
    sq = (xi16.astype(np.float32) / 32767.0)
    ref_q, _ = run("planar", jnp.asarray(sq.T.copy()))
    err_i = got_i - ref_q
    snr_i = 10 * np.log10(np.mean(ref_q ** 2)
                          / max(np.mean(err_i ** 2), 1e-30))
    assert snr_i > 80.0, f"ci16 iq chain SNR {snr_i:.1f} dB"
