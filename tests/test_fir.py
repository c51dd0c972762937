"""FIR golden + randomized parity tests (vs reference semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.design import firdes
from solid_dsp_tpu.ops import fir
from ref_sim import RefFIR, RefDecimFIR, RefInterpFIR


def test_fir_single_sample_golden():
    # ref fir/mod.rs:196-207: first output = 10.1
    f = fir.FIRFilter([1.0, 2.0, 3.0, 4.0, 5.0], 1.0)
    out = f.execute(2.02 + 0j)
    assert abs(complex(out[0]) - (10.1 + 0j)) < 1e-12


def test_fir_block_golden():
    # ref fir/mod.rs:221-233: output[4] = 60.03
    f = fir.FIRFilter([1.0, 2.0, 3.0, 4.0, 5.0], 1.0)
    x = jnp.array([2.02, 4.04, 1.02, 0.23, 9.19], dtype=jnp.complex128)
    out = f.execute_block(x)
    assert abs(complex(out[4]) - (60.03 + 0j)) < 1e-12


def test_fir_scale_accessors():
    f = fir.FIRFilter([1.0, 2.0, 3.0, 4.0, 5.0], 1.0)
    assert f.get_scale() == 1.0
    f.set_scale(2.0)
    assert f.get_scale() == 2.0
    assert len(f) == 5
    assert not f.is_empty()


def test_fir_coefficients_reversed_parity():
    # ref quirk: coefficients() returns the DotProduct's reversed storage
    f = fir.FIRFilter([1.0, 2.0, 3.0], 1.0)
    np.testing.assert_array_equal(f.coefficients(), [3.0, 2.0, 1.0])


def test_fir_freq_response_golden():
    # ref fir/mod.rs:247-262: notch(25, 0.35, 120) response at 0 rounds to 1
    coefs = firdes.firdes_notch(25, 0.35, 120.0)
    f = fir.FIRFilter(coefs, 1.0)
    r = f.frequency_response(0.0)
    assert round(r.real) == 1.0
    assert abs(r.imag) < 1e-12


def test_fir_group_delay_golden():
    # ref fir/mod.rs:277-292: notch semi-len 12 -> delay ~ 12
    coefs = firdes.firdes_notch(12, 0.35, 120.0)
    f = fir.FIRFilter(coefs, 1.0)
    assert int(f.group_delay(0.0) + 0.5) == 12


@pytest.mark.parametrize("method", ["matmul", "fft"])
def test_fir_randomized_vs_reference(method):
    rng = np.random.default_rng(0)
    taps = rng.standard_normal(17)
    x = rng.standard_normal(301) + 1j * rng.standard_normal(301)
    ref = RefFIR(taps, scale=1.5).execute_block(x)

    f = fir.FIRFilter(taps, 1.5, method=method, dtype=jnp.float64)
    # stream in uneven blocks to exercise the tail carry
    got = np.concatenate([
        np.asarray(f.execute_block(x[:100])),
        np.asarray(f.execute_block(x[100:107])),
        np.asarray(f.execute_block(x[107:])),
    ])
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_fir_complex_taps():
    rng = np.random.default_rng(1)
    taps = rng.standard_normal(8) + 1j * rng.standard_normal(8)
    x = rng.standard_normal(64) + 1j * rng.standard_normal(64)
    ref = RefFIR(taps).execute_block(x)
    y, _ = fir.fir_apply(jnp.asarray(taps), fir.fir_init(8, jnp.complex128),
                         jnp.asarray(x), 1.0, "matmul")
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-12)


# ------------------------------------------------------------------ decim
def test_decim_fir_golden():
    # ref fir/decim.rs:206-258
    f = fir.DecimatingFIRFilter([1.0, 2.0, 3.0, 4.0, 5.0], 1.0, 2)
    x = jnp.array([2.02, 4.04, 1.02, 0.23], dtype=jnp.complex128)
    out = np.asarray(f.execute_block(x))
    np.testing.assert_allclose(out, [28.28 + 0j, 21.39 + 0j], atol=1e-12)
    assert f.get_decimation() == 2


def test_decim_fir_randomized_vs_reference():
    rng = np.random.default_rng(2)
    taps = rng.standard_normal(9)
    x = rng.standard_normal(120) + 1j * rng.standard_normal(120)
    ref = RefDecimFIR(taps, 1.0, 3).execute_block(x)
    f = fir.DecimatingFIRFilter(taps, 1.0, 3, dtype=jnp.float64)
    got = np.concatenate([
        np.asarray(f.execute_block(x[:60])),
        np.asarray(f.execute_block(x[60:])),
    ])
    np.testing.assert_allclose(got, ref, atol=1e-10)


# ------------------------------------------------------------------ interp
def test_interp_fir_length_law():
    # ref iir/interp doctests: out.len == in.len * interp
    f = fir.InterpolatingFIRFilter([1.0, 2.0, 3.0, 4.0, 5.0], 4)
    out = f.execute_block(jnp.arange(6, dtype=jnp.float64))
    assert out.shape[-1] == 24


def test_interp_fir_randomized_vs_reference():
    rng = np.random.default_rng(3)
    taps = rng.standard_normal(10)
    x = rng.standard_normal(50) + 1j * rng.standard_normal(50)
    ref = RefInterpFIR(taps, 4).execute_block(x)
    f = fir.InterpolatingFIRFilter(taps, 4, dtype=jnp.float64)
    got = np.concatenate([
        np.asarray(f.execute_block(x[:20])),
        np.asarray(f.execute_block(x[20:])),
    ])
    np.testing.assert_allclose(got, ref, atol=1e-10)


# ------------------------------------------------------------------ pfb
def test_pfb_branches_match_reference_decomposition():
    # pfb.rs:24-49: branch f coefficients are reversed strided sub-filters
    taps = np.arange(1.0, 11.0)
    bank = fir.PolyPhaseFilterBank(taps, 2, 1.0)
    coefs = bank.coefficients()
    np.testing.assert_array_equal(coefs[0], [9.0, 7.0, 5.0, 3.0, 1.0])
    np.testing.assert_array_equal(coefs[1], [10.0, 8.0, 6.0, 4.0, 2.0])
    assert len(bank) == 2


def test_rational_resampler():
    # 3/2 resampling of a tone: output length = L * 3 / 2
    rng = np.random.default_rng(4)
    taps = firdes.firdes_kaiser(24, 0.2, 60.0, 0.0) * 3
    rs = fir.RationalResampler(taps, 3, 2, dtype=jnp.float64)
    x = np.exp(2j * np.pi * 0.01 * np.arange(300))
    y = np.asarray(rs.execute_block(jnp.asarray(x)))
    assert y.shape[-1] == 450
    # interp-by-3 then decim-by-2 must equal the brute-force composition
    f = fir.InterpolatingFIRFilter(taps, 3, dtype=jnp.float64)
    up = np.asarray(f.execute_block(jnp.asarray(x)))
    np.testing.assert_allclose(y, up[::2], atol=1e-10)


def test_pfb_per_sample_api():
    """Reference pfb.rs surface: push + execute(index) per sample, matching
    the batched push_block branch values."""
    import numpy as np

    coefs = np.arange(1.0, 13.0)  # 12 taps, 4 branches, sub_len 3
    pfb = fir.PolyPhaseFilterBank(coefs, 4)
    pfb2 = fir.PolyPhaseFilterBank(coefs, 4)
    x = np.asarray([0.5, -1.0, 2.0, 0.25, -0.75], dtype=np.float64)

    block = np.asarray(pfb2.push_block(jnp.asarray(x)))  # (T, branches)
    for t, s in enumerate(x):
        pfb.push(s)
        per = np.asarray([complex(pfb.execute(i)).real for i in range(4)])
        np.testing.assert_allclose(per, block[t], atol=1e-12)
        np.testing.assert_allclose(np.asarray(pfb.execute_all()), block[t],
                                   atol=1e-12)
    with pytest.raises(ValueError):
        pfb.execute(4)


@pytest.mark.parametrize("ntaps,L", [(7, 1000), (64, 4096), (129, 5000),
                                     (511, 8191), (1, 300), (1024, 2048)])
def test_segmented_overlap_save_matches_matmul(ntaps, L):
    """Fixed-tile overlap-save == direct conv for awkward tap/length mixes
    (tile boundaries, partial last tile, kernel longer than one body)."""
    rng = np.random.default_rng(ntaps + L)
    taps = (rng.standard_normal(ntaps) + 1j * rng.standard_normal(ntaps)
            ).astype(np.complex128)
    x = (rng.standard_normal(L) + 1j * rng.standard_normal(L))
    ya, ta = fir.fir_apply(jnp.asarray(taps), fir.fir_init(ntaps, jnp.complex128),
                           jnp.asarray(x), method="fft")
    yb, tb = fir.fir_apply(jnp.asarray(taps), fir.fir_init(ntaps, jnp.complex128),
                           jnp.asarray(x), method="matmul")
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-9 * ntaps)
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))


def test_segmented_overlap_save_streaming_continuity():
    rng = np.random.default_rng(77)
    ntaps = 200
    taps = rng.standard_normal(ntaps)
    x = rng.standard_normal(6000)
    t0 = fir.fir_init(ntaps, jnp.float64)
    y_full, _ = fir.fir_apply(jnp.asarray(taps), t0, jnp.asarray(x), method="fft")
    ya, tmid = fir.fir_apply(jnp.asarray(taps), t0, jnp.asarray(x[:2500]), method="fft")
    yb, _ = fir.fir_apply(jnp.asarray(taps), tmid, jnp.asarray(x[2500:]), method="fft")
    np.testing.assert_allclose(np.concatenate([ya, yb]), np.asarray(y_full),
                               atol=1e-9)


def test_measure_method_picks_and_caches(monkeypatch):
    """method='measure' times both paths once and caches the winner."""
    fir._METHOD_CACHE.clear()
    rng = np.random.default_rng(9)
    taps = jnp.asarray(rng.standard_normal(600))
    x = jnp.asarray(rng.standard_normal(8192))
    tail = fir.fir_init(600, jnp.float64)
    y, _ = fir.fir_apply(taps, tail, x, method="measure")
    assert len(fir._METHOD_CACHE) == 1
    winner = next(iter(fir._METHOD_CACHE.values()))
    assert winner in ("matmul", "fft")
    yw, _ = fir.fir_apply(taps, tail, x, method=winner)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yw), atol=1e-9)
    # second call hits the cache (no growth)
    fir.fir_apply(taps, tail, x, method="measure")
    assert len(fir._METHOD_CACHE) == 1


def test_auto_under_jit_trace_is_static():
    """auto/measure inside a user jit cannot time — must still work."""
    rng = np.random.default_rng(10)
    taps = jnp.asarray(rng.standard_normal(600))
    tail = fir.fir_init(600, jnp.float64)

    @jax.jit
    def run(v):
        y, _ = fir.fir_apply(taps, tail, v, method="measure")
        return y

    x = jnp.asarray(rng.standard_normal(4096))
    y = run(x)
    yr, _ = fir.fir_apply(taps, tail, x, method="matmul")
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-9)
