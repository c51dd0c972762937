"""Fused DDC (ops/ddc.py) vs the unfused mix -> decimating FIR chain.

The fused path must match nco_mode="exact" mixing followed by
fir_decim_apply (decimator phase 0) to float-rounding accuracy, including
phase continuity across block boundaries (u32 word arithmetic).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.ops import ddc, fir as fir_ops, nco as nco_ops

RNG = np.random.default_rng(7)


def _unfused(taps, dtheta, x_blocks, M, dtype=jnp.complex64):
    """Reference: exact-mode mix at full rate, then decimating FIR."""
    n = len(taps)
    theta = jnp.uint32(0)
    tail = jnp.zeros(n - 1, dtype)
    phase = jnp.asarray(0, jnp.int32)
    outs = []
    for xb in x_blocks:
        mixed, theta = nco_ops.mix_down_block(
            jnp.asarray(xb, dtype), theta, dtheta, None, "exact")
        y, tail, phase = fir_ops.fir_decim_apply(
            jnp.asarray(taps, dtype), tail, phase, mixed,
            jnp.asarray(1.0, dtype), M, precision="highest")
        outs.append(np.asarray(y))
    return np.concatenate(outs)


def _fused(taps, dtheta, x_blocks, M, dtype=jnp.complex64, rot_mode="fast"):
    n = len(taps)
    theta = jnp.uint32(0)
    tail = jnp.zeros(n - 1, dtype)
    outs = []
    for xb in x_blocks:
        y, tail, theta = ddc.ddc_apply(
            taps, dtheta, tail, theta, jnp.asarray(xb, dtype), M,
            precision="highest", rot_mode=rot_mode)
        outs.append(np.asarray(y))
    return np.concatenate(outs)


def _snr_db(got, ref):
    err = np.linalg.norm(got - ref)
    return -20.0 * np.log10(max(err / np.linalg.norm(ref), 1e-300))


@pytest.mark.parametrize("M", [1, 2, 4, 5])
@pytest.mark.parametrize("rot_mode", ["fast", "exact"])
def test_fused_matches_unfused(M, rot_mode):
    taps = RNG.standard_normal(64).astype(np.float64)
    taps /= taps.sum()
    dtheta = nco_ops.constrain(0.2)
    L = 40 * M
    x_blocks = [
        (RNG.standard_normal(L) + 1j * RNG.standard_normal(L)).astype(
            np.complex64)
        for _ in range(3)
    ]
    ref = _unfused(taps, dtheta, x_blocks, M)
    got = _fused(taps, dtheta, x_blocks, M, rot_mode=rot_mode)
    assert got.shape == ref.shape
    assert _snr_db(got, ref) >= 100.0


def test_long_stream_phase_continuity():
    # many blocks: u32 phase wraparound must stay bit-consistent
    taps = RNG.standard_normal(32).astype(np.float64)
    dtheta = nco_ops.constrain(2.9)  # fast wrap
    M = 4
    x_blocks = [
        (RNG.standard_normal(256) + 1j * RNG.standard_normal(256)).astype(
            np.complex64)
        for _ in range(8)
    ]
    ref = _unfused(taps, dtheta, x_blocks, M)
    got = _fused(taps, dtheta, x_blocks, M)
    assert _snr_db(got, ref) >= 100.0


def test_small_blocks_and_short_filters():
    # exercises Th / body / straggler piece boundaries
    for n, M, L in [(4, 4, 16), (8, 2, 12), (3, 1, 9), (64, 4, 64)]:
        taps = RNG.standard_normal(n).astype(np.float64)
        dtheta = nco_ops.constrain(0.7)
        x_blocks = [
            (RNG.standard_normal(L) + 1j * RNG.standard_normal(L)).astype(
                np.complex64)
            for _ in range(4)
        ]
        ref = _unfused(taps, dtheta, x_blocks, M)
        got = _fused(taps, dtheta, x_blocks, M)
        assert got.shape == ref.shape, (n, M, L)
        assert _snr_db(got, ref) >= 95.0, (n, M, L)


def test_planar_entrypoint_matches_complex():
    taps = RNG.standard_normal(64).astype(np.float64)
    dtheta = nco_ops.constrain(0.2)
    x = (RNG.standard_normal(1024) + 1j * RNG.standard_normal(1024)).astype(
        np.complex64)
    tail = jnp.zeros(63, jnp.complex64)
    y_c, tail_c, th_c = ddc.ddc_apply(
        taps, dtheta, tail, jnp.uint32(0), jnp.asarray(x), 4)
    tail2 = jnp.zeros((2, 63), jnp.float32)
    x2 = jnp.stack([jnp.asarray(x.real), jnp.asarray(x.imag)])
    yr, yi, tail2_n, th_p = ddc.ddc_apply_planar(
        taps, dtheta, tail2, jnp.uint32(0), x2, 4)
    np.testing.assert_array_equal(np.asarray(y_c.real), np.asarray(yr))
    np.testing.assert_array_equal(np.asarray(y_c.imag), np.asarray(yi))
    assert int(th_c) == int(th_p)
