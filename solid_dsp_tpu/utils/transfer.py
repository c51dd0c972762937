"""Tunnel-safe host<->device transfer helpers for complex arrays.

The axon-tunneled PJRT client (the way a remote TPU chip is reached in
this environment) can lose the ability to TRANSFER complex-typed buffers
while complex COMPUTE on device keeps working: a single complex
host->device or device->host copy fails with UNIMPLEMENTED and poisons
the whole client (every later transfer in the process fails too).

These helpers keep every wire transfer real-typed:

- ``put_complex(x)``   — ship ``x.real``/``x.imag`` as two float arrays
  and rebuild the complex array ON DEVICE with ``jax.lax.complex``.
- ``get_complex(x)``   — fetch ``x.real``/``x.imag`` as two float arrays
  (each computed on device) and rebuild the complex ndarray on host.
- ``fetch(x)``         — dtype-dispatching device->host fetch (complex
  arrays via ``get_complex``, everything else via ``np.asarray``).

They are no-ops semantically: on a healthy backend the results are
bit-identical to ``jnp.asarray`` / ``np.asarray``.  Benchmarks and any
tool that talks to the real chip should route complex I/O through here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["put_complex", "get_complex", "fetch", "put_tree", "put_array",
           "zeros_device", "zeros_like_device", "full_device",
           "astype_device", "ingest"]


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


def put_complex(x, dtype=None):
    """Host complex ndarray -> device complex array, real-only transfers.

    Raises when complex128 is requested while jax x64 is disabled: the
    float64 parts would be silently downcast to f32 by ``jnp.asarray``,
    violating the dtype-preserving contract (review r2 finding).
    """
    x = np.asarray(x)
    if dtype is None:
        dtype = jnp.complex64 if x.dtype != np.complex128 else jnp.complex128
        if (x.dtype == np.complex128
                and not jax.config.jax_enable_x64):
            dtype = jnp.complex64  # implicit default: downcast is expected
    elif (np.dtype(dtype) == np.complex128
            and not jax.config.jax_enable_x64):
        raise ValueError(
            "put_complex(dtype=complex128) requires jax_enable_x64; "
            "with x64 disabled the parts would silently land as float32")
    ftype = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    # NOTE: np.ascontiguousarray would promote 0-d to 1-d; np.asarray
    # keeps scalar shapes intact (jnp.asarray copies regardless of layout)
    re = jnp.asarray(np.asarray(x.real, ftype))
    im = jnp.asarray(np.asarray(x.imag, ftype))
    return _combine(re, im)


@jax.jit
def _split_ri(x):
    return jnp.real(x), jnp.imag(x)


def get_complex(x) -> np.ndarray:
    """Device complex array -> host complex ndarray, real-only transfers.

    The re/im split runs as ONE jitted executable: eager jnp.real/imag
    are device compute, which the tunnel rejects outright."""
    re, im = _split_ri(x)
    return np.asarray(re) + 1j * np.asarray(im)


def fetch(x) -> np.ndarray:
    """Device array -> host ndarray; complex goes via get_complex."""
    if jnp.iscomplexobj(x):
        return get_complex(x)
    return np.asarray(x)


def put_array(x, dtype=None):
    """Tunnel-safe host->device for ONE array: complex via put_complex,
    everything else as a plain transfer (``jnp.asarray`` of host data is
    a pure device_put — no eager device compute)."""
    x = np.asarray(x) if dtype is None else np.asarray(x, np.dtype(dtype))
    if np.iscomplexobj(x):
        return put_complex(x)
    return jnp.asarray(x)


def zeros_device(shape, dtype):
    """Tunnel-safe ``jnp.zeros``: the eager ``jnp.zeros`` lowers to a
    device-executed fill, which the axon tunnel rejects (UNIMPLEMENTED —
    and a failed eager op poisons the whole client).  Building the zeros
    host-side and transferring keeps every init path tunnel-clean."""
    return put_array(np.zeros(shape, np.dtype(dtype)))


def zeros_like_device(x):
    """Tunnel-safe ``jnp.zeros_like`` (see zeros_device)."""
    return zeros_device(x.shape, x.dtype)


def full_device(shape, value, dtype):
    """Tunnel-safe ``jnp.full`` (see zeros_device)."""
    return put_array(np.full(shape, value, np.dtype(dtype)))


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("dtype",))
def _astype_jit(x, dtype):
    return x.astype(dtype)


def astype_device(x, dtype):
    """Tunnel-safe dtype cast of a DEVICE array: an eager ``.astype`` is
    device compute the axon tunnel rejects; route it through one jitted
    executable (cached per dtype pair)."""
    dtype = jnp.dtype(dtype)
    if x.dtype == dtype:
        return x
    return _astype_jit(x, dtype)


def ingest(x):
    """Tunnel-safe input adoption for stateful wrappers: device arrays
    pass through; host data (lists, numpy — possibly complex) transfers
    via put_array (complex rides as re/im float pairs)."""
    if isinstance(x, jax.Array):
        return x
    return put_array(x)


def put_tree(tree):
    """``jax.device_put`` for a pytree, complex leaves via put_complex.

    Use instead of ``jax.device_put`` whenever a state pytree built
    host-side (numpy) may contain complex leaves and the target backend
    might be the axon tunnel.
    """
    def _put(leaf):
        leaf = np.asarray(leaf)
        if np.iscomplexobj(leaf):
            # dtype=None mirrors jax.device_put semantics: complex128
            # stays complex128 under x64, downcasts to complex64 otherwise
            return put_complex(leaf)
        return jnp.asarray(leaf)

    return jax.tree_util.tree_map(_put, tree)
