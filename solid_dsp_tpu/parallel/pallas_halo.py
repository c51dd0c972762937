"""Fused halo-exchange + compute Pallas kernel (inter-chip RDMA).

``sharded.py`` exchanges overlap-save halos with ``lax.ppermute`` — a
separate collective the scheduler runs before the compute op.  This module
fuses the two: inside ONE kernel each device

1. starts an async RDMA of its block tail to its RIGHT neighbor
   (``pltpu.make_async_remote_copy`` over ICI),
2. computes every *interior* output row — the work that needs no halo —
   while the transfer is in flight,
3. waits on the receive semaphore and finishes the first K rows.

The compute half is the channelizer front end's lane-shuffle-free per-lane
convolution (see ops/pallas_kernels.py), so this is the multi-chip form of
driver config 5 with communication hidden behind MXU/VPU work — the
structural analog of ring-attention's overlapped halo pass.

Multi-chip hardware is not reachable from this environment; the kernel is
validated in Pallas interpret mode on a fake-device CPU mesh
(tests/test_pallas_halo.py) and compiles through Mosaic the same way the
single-chip kernels do.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pallas_kernels import pfb_frontend_taps

__all__ = ["make_fused_channelizer_frontend"]


def _fused_kernel(x_ref, tail_ref, h_ref, out_ref, halo_buf, send_sem,
                  recv_sem, *, K: int, U: int, axis: str,
                  use_barrier: bool = True):
    my = jax.lax.axis_index(axis)
    n_dev = jax.lax.axis_size(axis)

    if use_barrier:
        # Neighbor barrier before the remote write: both ring neighbors
        # must have entered the kernel (scratch allocated) before data
        # lands in their halo_buf; it is also what legitimizes
        # collective_id on the compiled Mosaic path (pallas_guide "Local
        # Barrier Between Neighbors").  Interpret mode cannot lower barrier
        # semaphores, so the interpret tests skip it (the interpreter
        # serializes devices anyway).
        barrier = pltpu.get_barrier_semaphore()
        left = jax.lax.rem(my - 1 + n_dev, jnp.int32(n_dev))
        right = jax.lax.rem(my + 1, jnp.int32(n_dev))
        pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, 2)

    # Fully-matched ring: EVERY device ships its tail to (my+1) mod n, so
    # every send has a receive and no conditional pairing can deadlock.
    # Shard 0's received halo (the wrap-around from the last shard) is
    # overwritten with the carried stream tail after the wait.
    rdma = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[pl.ds(U - K, K), :],
        dst_ref=halo_buf,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=jax.lax.rem(my + 1, jnp.int32(n_dev)),
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()

    # 2. interior rows j in [K, U): all inputs are local — overlaps the DMA
    acc = x_ref[pl.ds(0, U - K), :] * h_ref[K, :]
    for kp in range(K):
        acc = acc + x_ref[pl.ds(K - kp, U - K), :] * h_ref[kp, :]
    out_ref[pl.ds(K, U - K), :] = acc

    # 3. first K rows need the halo: left neighbor's RDMA (or, on the
    #    leftmost shard, the carried stream tail)
    rdma.wait_recv()

    @pl.when(my == 0)
    def _():
        halo_buf[:] = tail_ref[:]

    # ext rows: [halo (K) | x[:K]] — output j uses ext[K + j - kp]
    acc2 = jnp.zeros_like(x_ref[pl.ds(0, K), :])
    for kp in range(K + 1):
        lo = K - kp  # static: rows lo..lo+K of ext, split halo_buf / x
        if lo >= K:
            seg = x_ref[pl.ds(lo - K, K), :]
        elif lo + K <= K:
            seg = halo_buf[pl.ds(lo, K), :]
        else:
            seg = jnp.concatenate(
                [halo_buf[pl.ds(lo, K - lo), :], x_ref[pl.ds(0, lo), :]],
                axis=0,
            )
        acc2 = acc2 + seg * h_ref[kp, :]
    out_ref[pl.ds(0, K), :] = acc2

    # make sure my outgoing send completed before the kernel exits
    rdma.wait_send()


def make_fused_channelizer_frontend(mesh: Mesh, num_channels: int,
                                    taps_per_branch: int,
                                    attenuation: float = 80.0,
                                    interpret: bool | None = None,
                                    axis: str = "time"):
    """Build ``apply(tail_rows, x) -> (z, new_tail_rows)`` over the mesh.

    ``x``: (L,) complex64 sharded over ``axis``; per-shard length must be a
    multiple of M with at least K+1 rows.  Returns the branch products z
    (T, M) sharded the same way — ``jnp.fft.fft(z, axis=-1)`` gives the M
    channel outputs (see ops/pallas_kernels.py for the algebra).
    """
    from ..models.channelizer import channelizer_taps

    M = int(num_channels)
    K = int(taps_per_branch)
    if interpret is None:
        # compiled Mosaic on real TPUs; interpret only off-TPU (tests)
        interpret = jax.default_backend() != "tpu"
    h_il = pfb_frontend_taps(channelizer_taps(M, K, attenuation), M)
    n_dev = mesh.shape[axis]

    def local_fn(tail_rows, x):
        L_loc = x.shape[-1]
        if L_loc % M:
            raise ValueError("per-shard length must be a multiple of M")
        U = L_loc // M
        if U <= K:
            raise ValueError(f"per-shard rows ({U}) must exceed K ({K})")
        x2 = x.view(jnp.float32).reshape(U, 2 * M)
        tail2 = tail_rows.reshape(K * M).view(jnp.float32).reshape(K, 2 * M)

        zp = pl.pallas_call(
            partial(_fused_kernel, K=K, U=U, axis=axis,
                    use_barrier=not interpret),
            out_shape=jax.ShapeDtypeStruct((U, 2 * M), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((K, 2 * M), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=1,
            ),
        )(x2, tail2, h_il)

        z = zp.view(jnp.complex64)
        # new global tail = last shard's final K rows, replicated via psum
        idx = jax.lax.axis_index(axis)
        mine = x[(U - K) * M:].reshape(K, M)
        masked = jnp.where(idx == n_dev - 1, mine, jnp.zeros_like(mine))
        new_tail = jax.lax.psum(masked, axis)
        return z, new_tail

    mapped = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    return jax.jit(mapped)
