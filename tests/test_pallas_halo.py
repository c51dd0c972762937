"""Fused RDMA-halo channelizer front end vs the single-device kernel.

Runs the remote-DMA kernel in Pallas interpret mode on the fake 8-device
CPU mesh (the environment has one physical chip; SURVEY §4's fake-device
strategy applies to the pallas collectives too).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from solid_dsp_tpu.models.channelizer import channelizer_taps
from solid_dsp_tpu.ops.pallas_kernels import (
    channelizer_apply_pallas,
    pfb_frontend_taps,
)
from solid_dsp_tpu.parallel.pallas_halo import make_fused_channelizer_frontend

needs4 = pytest.mark.skipif(len(jax.devices()) < 4,
                            reason="needs 4 fake devices")


@needs4
@pytest.mark.parametrize("n_dev", [2, 4])
def test_fused_halo_matches_single_device(n_dev):
    M, K = 16, 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("time",))
    apply_fn = make_fused_channelizer_frontend(mesh, M, K, interpret=True)

    rng = np.random.default_rng(0)
    L = M * 32 * n_dev
    x = (rng.standard_normal(L) + 1j * rng.standard_normal(L)).astype(
        np.complex64)
    tail = jnp.zeros((K, M), jnp.complex64)

    z, new_tail = apply_fn(tail, jnp.asarray(x))
    Y = jnp.fft.fft(z, axis=-1)

    h_il = pfb_frontend_taps(channelizer_taps(M, K), M)
    Y_ref, tail_ref = channelizer_apply_pallas(
        h_il, tail, jnp.asarray(x), M, K, interpret=True)

    scale = np.abs(np.asarray(Y_ref)).max()
    np.testing.assert_allclose(np.asarray(Y), np.asarray(Y_ref),
                               atol=2e-5 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(new_tail), np.asarray(tail_ref),
                               atol=0)


@needs4
def test_fused_halo_streaming():
    """Carried tail flows into shard 0 on the next block."""
    M, K = 16, 8
    n_dev = 4
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("time",))
    apply_fn = make_fused_channelizer_frontend(mesh, M, K, interpret=True)

    rng = np.random.default_rng(1)
    L = M * 16 * n_dev
    x = (rng.standard_normal(2 * L) + 1j * rng.standard_normal(2 * L)).astype(
        np.complex64)
    tail = jnp.zeros((K, M), jnp.complex64)
    za, tail = apply_fn(tail, jnp.asarray(x[:L]))
    zb, _ = apply_fn(tail, jnp.asarray(x[L:]))

    from solid_dsp_tpu.ops.pallas_kernels import pfb_frontend

    h_il = pfb_frontend_taps(channelizer_taps(M, K), M)
    z_ref, _ = pfb_frontend(
        jnp.asarray(x), h_il, jnp.zeros((K, M), jnp.complex64), M, K,
        interpret=True)
    got = np.concatenate([np.asarray(za), np.asarray(zb)], axis=0)
    scale = np.abs(np.asarray(z_ref)).max()
    np.testing.assert_allclose(got, np.asarray(z_ref), atol=2e-5 * scale)
