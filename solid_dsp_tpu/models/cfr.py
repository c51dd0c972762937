"""Crest-factor reduction (CFR): iterative clipping and filtering.

The transmit-side companion of DPD (models/dpd.py): a PA can only be
linearized inside its invertible range, so high-PAPR waveforms (OFDM,
multicarrier) are first peak-reduced.  Iterative clipping-and-filtering
(ICF) clips the envelope at a target threshold, then confines the clipping
noise to the occupied band with a frequency-domain mask, and repeats —
filtering regrows some peaks, so a few iterations converge.

All device work is elementwise envelope math + batched FFTs; the EVM cost
is bounded and measured by the tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["papr_db", "clip_envelope", "cfr_icf", "band_mask"]


@jax.jit
def papr_db(x: jnp.ndarray) -> jnp.ndarray:
    """Peak-to-average power ratio of a block, in dB."""
    p = jnp.real(x * jnp.conj(x))
    return 10.0 * jnp.log10(jnp.max(p, axis=-1)
                            / jnp.maximum(jnp.mean(p, axis=-1), 1e-30))


@jax.jit
def clip_envelope(x: jnp.ndarray, threshold) -> jnp.ndarray:
    """Polar clip: magnitudes above ``threshold`` are pulled onto the
    circle |x| = threshold, phases untouched."""
    r = jnp.abs(x)
    scale = jnp.minimum(1.0, threshold / jnp.maximum(r, 1e-30))
    return x * scale.astype(x.dtype)


def band_mask(n: int, occupied: float) -> np.ndarray:
    """0/1 FFT-bin mask keeping the centered ``occupied`` fraction of the
    band (two-sided, bins in fft order)."""
    m = np.zeros(n, np.float32)
    half = max(1, int(round(n * occupied / 2)))
    m[:half] = 1.0
    m[-half:] = 1.0
    return m


@partial(jax.jit, static_argnames=("iters",))
def cfr_icf(x: jnp.ndarray, threshold, mask: jnp.ndarray,
            iters: int = 4) -> jnp.ndarray:
    """Iterative clipping and filtering toward PAPR = threshold²/avg.

    ``threshold`` is the envelope clip level (same units as |x|); ``mask``
    is an FFT-order 0/1 in-band mask (see ``band_mask``) confining the
    clipping noise.  Each iteration: clip -> keep only in-band error.
    Out-of-band emissions stay at the original signal's level because the
    correction c = filt(clip(x) - x) is in-band by construction and the
    loop applies x + c.
    """
    mask = jnp.asarray(mask)

    def body(y, _):
        c = clip_envelope(y, threshold) - y
        C = jnp.fft.fft(c, axis=-1) * mask.astype(c.dtype)
        y2 = y + jnp.fft.ifft(C, axis=-1).astype(y.dtype)
        return y2, None

    y, _ = jax.lax.scan(body, x, None, length=iters)
    return y
