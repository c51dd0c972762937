"""Neighbor halo exchange over a mesh axis (inside ``shard_map``).

The reference's streaming ``Window`` state (window/mod.rs:63-71) becomes,
under time sharding, the halo a device must receive from its LEFT neighbor
before filtering its block — the exact structural analog of
ring-attention/context-parallel halo passing (SURVEY.md §5 "Long-context").

All functions here are collective: call them inside ``shard_map`` with the
named axis present.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["left_halo", "right_halo", "from_last_shard", "time_offset"]


def left_halo(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Receive ``x`` from the left neighbor along ``axis_name``.

    Shard ``i`` gets shard ``i-1``'s value; shard 0 gets zeros (ppermute
    semantics for unmatched targets).  Pass the tail slice you want to ship,
    e.g. ``left_halo(block[..., -(ntaps - 1):], 'time')``.
    """
    n = jax.lax.axis_size(axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


def right_halo(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Receive ``x`` from the right neighbor (last shard gets zeros)."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i + 1, i) for i in range(n - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


def from_last_shard(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Replicate the LAST shard's value of ``x`` to every shard.

    Used to turn per-shard carried state (e.g. the new FIR tail, which
    physically lives on the final time shard) into a replicated output that
    can seed the next block.  Implemented as a masked psum so it lowers to
    one collective.
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    masked = jnp.where(idx == n - 1, x, jnp.zeros_like(x))
    return jax.lax.psum(masked, axis_name)


def time_offset(axis_name: str, local_len: int) -> jnp.ndarray:
    """Global sample offset of this shard's block start (uint32)."""
    return jax.lax.axis_index(axis_name).astype(jnp.uint32) * jnp.uint32(local_len)
