"""``shard_map``-ed DSP chains over a ``('channel', 'time')`` mesh.

Sharding layout (SURVEY.md §2 parallelism table):

* ``channel`` — independent streams (DP analog); for the channelizer it is a
  genuine TP axis: the prototype-filter tap dimension is split across it
  (partial products combined with ``psum``) and the output-channel DFT is
  split across it (each shard extracts its subset of channels).
* ``time``    — overlap-save time blocks (SP/CP analog); neighbor devices
  exchange ``ntaps - 1``-sample halos with ``lax.ppermute`` instead of
  carrying a sequential tail, so a 1M-sample stream filters in
  ``L / n_time`` time per device plus one neighbor hop.

Sequential recurrences (AGC gain, FM discriminator memory) follow the survey's
prescription: AGC runs in block mode with a globally ``pmean``-ed energy (one
gain per block, identical on every shard — the block-mode semantics are
preserved exactly); the FM discriminator needs only a 1-sample halo.  The NCO
phase is closed-form (theta0 + k * dtheta in u32), so time sharding needs no
sequential dependency at all: each shard starts at
``theta0 + shard_offset * dtheta``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models import fm as fm_mod
from ..models import qpsk as qpsk_mod
from ..models.channelizer import channelizer_taps
from ..models.rx_chain import RxChainConfig
from ..ops import agc as agc_ops
from ..ops import fir as fir_ops
from ..ops import nco as nco_ops

from ..streaming.state import ChainState
from .halo import from_last_shard, left_halo, time_offset

__all__ = ["sharded_fir", "make_sharded_rx_chain", "make_sharded_channelizer"]


# ---------------------------------------------------------------------------
# time-sharded FIR
# ---------------------------------------------------------------------------

def sharded_fir(taps, mesh: Mesh, scale=1.0):
    """Build a jitted sharded FIR ``apply(tail, x) -> (y, new_tail)``.

    ``x``: (C, L) — channels over the ``channel`` axis, time over ``time``.
    ``tail``: (C, ntaps-1) carried across calls (global stream history).
    Inside each block the halo comes from the left neighbor over ICI; only
    the leftmost time shard consumes the carried tail.
    """
    taps = np.asarray(taps)
    n = int(taps.shape[-1])

    def local_fn(tail, x):
        t_idx = jax.lax.axis_index("time")
        halo = left_halo(x[..., -(n - 1):], "time") if n > 1 else x[..., :0]
        eff_tail = jnp.where(t_idx == 0, tail, halo) if n > 1 else tail
        x_ext = jnp.concatenate([eff_tail, x], axis=-1)
        y = fir_ops.conv1d_mxu(x_ext, taps) * scale
        new_tail = (from_last_shard(x[..., -(n - 1):], "time")
                    if n > 1 else x[..., :0])
        return y, new_tail

    mapped = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("channel"), P("channel", "time")),
        out_specs=(P("channel", "time"), P("channel")),
    )
    return jax.jit(mapped)


# ---------------------------------------------------------------------------
# sharded rx chain (driver config 4 at scale)
# ---------------------------------------------------------------------------

def make_sharded_rx_chain(cfg: RxChainConfig, mesh: Mesh):
    """Multi-chip RxChain: NCO -> decimating FIR -> AGC -> FM demod.

    Returns ``(init, apply)``:

    * ``init(num_channels) -> ChainState`` with per-channel leaves,
    * ``apply(state, x) -> (out, state)`` jitted over the mesh; ``x`` has
      shape (C, L) sharded ``P('channel', 'time')`` and ``out`` has shape
      (C, L // decimation) with the same sharding.

    Per-shard semantics match the single-chip chain except AGC, which runs in
    block mode with the block energy ``pmean``-ed over the ``time`` axis —
    identical to single-chip *block-mode* AGC on the full block.
    """
    if cfg.demod not in ("fm", "qpsk", "am", "none"):
        raise ValueError(f"unknown demod {cfg.demod!r}")
    # host-side closure constants (see models/rx_chain.py note)
    taps = np.asarray(cfg.design_taps(), dtype=cfg.dtype)
    n = int(taps.shape[-1])
    M = int(cfg.decimation)
    dtheta = nco_ops.constrain(cfg.carrier_freq)
    lut = nco_ops.make_sine_lut(np.zeros(0, dtype=cfg.dtype).real.dtype)
    n_time = mesh.shape["time"]

    def init(num_channels: int) -> ChainState:
        rdtype = np.zeros(0, dtype=cfg.dtype).real.dtype
        return ChainState(
            nco_theta=jnp.uint32(0),
            fir_tail=fir_ops.fir_init(n, dtype=cfg.dtype,
                                      batch_shape=(num_channels,)),
            fir_phase=jnp.int32(0),
            agc=agc_ops.agc_init(rdtype, batch_shape=(num_channels,)),
            fm_prev=fm_mod.fm_demod_init(cfg.dtype,
                                         batch_shape=(num_channels,)),
        )

    def local_fn(state: ChainState, x):
        L_local = x.shape[-1]
        if L_local % M:
            raise ValueError(
                "per-shard block length must be a multiple of the decimation"
            )
        # 1. NCO downconvert — phase is closed-form, so each time shard
        #    starts at theta0 + offset * dtheta with zero communication.
        offset = time_offset("time", L_local)
        theta0_l = (state.nco_theta + offset * dtheta).astype(jnp.uint32)
        mixed, _ = nco_ops.mix_down_block(x, theta0_l, dtheta, lut,
                                          cfg.nco_mode)
        theta_end = (state.nco_theta
                     + jnp.uint32(n_time * L_local) * dtheta).astype(jnp.uint32)

        # 2. decimating FIR with neighbor halo instead of a carried tail.
        t_idx = jax.lax.axis_index("time")
        halo = left_halo(mixed[..., -(n - 1):], "time")
        eff_tail = jnp.where(t_idx == 0, state.fir_tail, halo)
        # L_local % M == 0 ⇒ every shard sees the same decimator phase.
        y, _, fir_phase = fir_ops.fir_decim_apply(
            taps, eff_tail, state.fir_phase, mixed,
            jnp.asarray(1.0, dtype=cfg.dtype), M,
            precision=cfg.fir_precision,
        )
        new_fir_tail = from_last_shard(mixed[..., -(n - 1):], "time")

        # 3. AGC — block mode with globally averaged energy.
        y, agc_state = _agc_block_sharded(state.agc, y, cfg.agc_bandwidth,
                                          "time")

        # 4. demod.  FM needs a 1-sample halo for the discriminator memory;
        #    AM envelope and passthrough are memoryless; QPSK carrier
        #    recovery estimates from the WHOLE block (4th-power spectral
        #    line), so the time shards all_gather the decimated stream, run
        #    the same estimator as the single-chip chain, and keep their own
        #    slice — semantics identical to qpsk_carrier_block on the full
        #    block, cost one (L/M)-sample all-gather over ICI.
        if cfg.demod == "fm":
            prev_halo = left_halo(y[..., -1], "time")
            fm_prev_l = jnp.where(t_idx == 0, state.fm_prev, prev_halo)
            out, _ = fm_mod.fm_demodulate(fm_prev_l, y, cfg.fm_kf)
        elif cfg.demod == "qpsk":
            y_full = jax.lax.all_gather(y, "time", axis=y.ndim - 1,
                                        tiled=True)
            out_full, _, _ = qpsk_mod.qpsk_carrier_block(y_full)
            lo = y.shape[-1]
            out = jax.lax.dynamic_slice_in_dim(
                out_full, t_idx * lo, lo, axis=out_full.ndim - 1)
        elif cfg.demod == "am":
            out = jnp.abs(y)
        else:
            out = y
        new_fm_prev = from_last_shard(y[..., -1], "time")

        new_state = ChainState(
            nco_theta=theta_end,
            fir_tail=new_fir_tail,
            fir_phase=fir_phase,
            agc=agc_state,
            fm_prev=new_fm_prev,
        )
        return out, new_state

    state_spec = ChainState(
        nco_theta=P(),
        fir_tail=P("channel"),
        fir_phase=P(),
        agc={"gain": P("channel"), "energy": P("channel"),
             "lock": P("channel"), "mode": P("channel"),
             "timer": P("channel")},
        fm_prev=P("channel"),
    )
    mapped = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(state_spec, P("channel", "time")),
        out_specs=(P("channel", "time"), state_spec),
    )
    return init, jax.jit(mapped)


def _agc_block_sharded(state, x, alpha, axis_name):
    """Block-mode AGC whose energy estimate is pmean-ed over ``axis_name``.

    Equal-size time shards ⇒ pmean of local means == full-block mean, so this
    reproduces single-chip ``agc_apply_block_mode`` exactly (both funnel
    through ``agc.block_gain_update``).
    """
    gain = state["gain"]
    out = x * gain[..., None].astype(x.dtype)
    ee_local = jnp.mean(jnp.real(out * jnp.conj(out)), axis=-1)
    ee = jax.lax.pmean(ee_local, axis_name)
    T = x.shape[-1] * jax.lax.axis_size(axis_name)
    return out, agc_ops.block_gain_update(state, ee, alpha, T)


# ---------------------------------------------------------------------------
# sharded channelizer (driver config 5)
# ---------------------------------------------------------------------------

def make_sharded_channelizer(num_channels: int, taps_per_branch: int = 8,
                             mesh: Mesh | None = None,
                             attenuation: float = 80.0,
                             dtype=jnp.complex64):
    """256-channel-class polyphase channelizer over a 2D mesh.

    2D decomposition:

    * ``time``    — the input stream is split into overlap-save blocks;
      each shard receives a ``K*M - 1`` raw-sample halo from its left
      neighbor (``ppermute``).
    * ``channel`` — genuine tensor parallelism: the K tap rows of the
      prototype polyphase matrix are split across the axis and the partial
      branch products combined with one ``psum``; then each shard extracts
      its own M / n_channel_shards output channels with a partial-IDFT
      matmul (MXU), so no shard ever materializes all M channels.

    Returns ``(init, apply)`` where ``apply(tail, x) -> (Y, new_tail)``:
    ``x``: (L,) sharded over time (replicated over ``channel``);
    ``Y``: (T, M) sharded ``P('time', 'channel')``.
    """
    M = int(num_channels)
    K = int(taps_per_branch)
    if mesh is None:
        raise ValueError("make_sharded_channelizer requires a mesh")
    n_cs = mesh.shape["channel"]
    if K % n_cs:
        raise ValueError(f"taps_per_branch ({K}) must divide by the channel "
                         f"axis size ({n_cs})")
    if M % n_cs:
        raise ValueError(f"num_channels ({M}) must divide by the channel "
                         f"axis size ({n_cs})")
    taps = np.asarray(channelizer_taps(M, K, attenuation), dtype=dtype)
    H = taps[: K * M].reshape(K, M)  # H[k, r] = h[k*M + r]
    K_loc = K // n_cs
    M_loc = M // n_cs
    # partial inverse-DFT extractor: W[r, m] = e^{+2 pi i r m / M} (times M
    # to match channelizer_apply's ifft * M convention).
    r = np.arange(M)[:, None]
    m = np.arange(M)[None, :]
    W_full = np.exp(2j * np.pi * r * m / M)
    halo_len = K * M - 1

    def init():
        return jnp.zeros(halo_len, dtype=dtype)

    def local_fn(tail, x):
        c_idx = jax.lax.axis_index("channel")
        t_idx = jax.lax.axis_index("time")
        L_loc = x.shape[-1]
        if L_loc % M:
            raise ValueError("per-shard length must be a multiple of M")
        T_loc = L_loc // M
        halo = left_halo(x[..., -halo_len:], "time")
        eff_tail = jnp.where(t_idx == 0, tail, halo)
        x_ext = jnp.concatenate([eff_tail, x], axis=-1)

        # tap-parallel front end: this shard sums its K_loc tap rows.
        k_loc = jax.lax.iota(jnp.int32, K_loc) + c_idx * K_loc
        t = jnp.arange(T_loc)[:, None, None]
        k = k_loc[None, :, None]
        rr = jnp.arange(M)[None, None, :]
        idx = halo_len + (t - k) * M - rr  # (T_loc, K_loc, M)
        V = x_ext[idx]
        H_loc = jax.lax.dynamic_slice_in_dim(H, c_idx * K_loc, K_loc, axis=0)
        z_part = jnp.einsum("tkr,kr->tr", V, H_loc.astype(x.dtype))
        z = jax.lax.psum(z_part, "channel")  # (T_loc, M)

        # channel-parallel output DFT: extract this shard's channel slice.
        W_loc = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(W_full, dtype=z.dtype), c_idx * M_loc, M_loc, axis=1
        )
        # ifft(z) * M  ==  z @ W  (channelizer_apply's convention)
        Y = z @ W_loc
        new_tail = from_last_shard(x[..., -halo_len:], "time")
        return Y, new_tail

    mapped = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P("time")),
        out_specs=(P("time", "channel"), P()),
    )
    return init, jax.jit(mapped)
