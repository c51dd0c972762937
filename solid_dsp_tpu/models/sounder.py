"""Channel sounder: Zadoff-Chu excitation -> impulse response estimate.

Propagation measurement the way LTE SRS / 5G does it: transmit a CAZAC
(Zadoff-Chu) sequence — constant envelope (PA-friendly) with an IDEAL
periodic autocorrelation (a delta) — and estimate the channel impulse
response by circular cross-correlation at the receiver.  Because the
excitation's autocorrelation is exactly a delta, the correlation IS the
CIR (no deconvolution step), computed as two FFTs on the device.

``sound`` builds the excitation (with cyclic prefix so linear
convolution looks circular over the body); ``estimate_cir`` recovers
the complex CIR, the multipath power-delay profile, and an SNR
estimate from the off-support correlation floor.  Validated against
ground-truth channels (incl. the 3GPP TDL profiles) in
tests/test_sounder.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.sequences import zadoff_chu

__all__ = ["sound", "estimate_cir"]


def sound(length: int = 255, root: int = 7, cp: int = 64,
          repeats: int = 1) -> jnp.ndarray:
    """Build the sounding waveform: [CP | ZC body] x repeats.

    length: ZC length (odd for ideal autocorrelation); cp: cyclic
    prefix covering the longest expected channel delay; repeats:
    coherent averaging factor (SNR gain 10 log10(repeats) dB).
    """
    if length % 2 == 0:
        raise ValueError("ZC length must be odd (ideal autocorrelation)")
    if not 0 <= cp < length:
        raise ValueError("cp in [0, length)")
    z = np.asarray(zadoff_chu(root, length))
    one = np.concatenate([z[length - cp:], z]) if cp else z
    return jnp.asarray(np.tile(one, max(int(repeats), 1)),
                       jnp.complex64)


def estimate_cir(rx, length: int = 255, root: int = 7, cp: int = 64,
                 repeats: int = 1, max_delay: int | None = None):
    """Received sounding burst -> (cir, info).

    rx: samples STARTING at the burst (synchronize upstream — e.g.
    framesync or a coarse correlation peak).  Returns cir (max_delay,)
    complex (tap k = gain at delay k samples) and info with the
    power-delay profile in dB, the estimated noise floor, and per-tap
    significance.  Coherent averaging across ``repeats`` bodies.
    """
    length = int(length)
    cp = int(cp)
    if repeats < 1:
        raise ValueError("repeats must be >= 1")
    max_delay = int(max_delay if max_delay is not None
                    else min(cp or 64, length // 2))
    if max_delay > length // 2:
        raise ValueError("max_delay must be <= length/2 (ZC ambiguity)")
    rx = jnp.asarray(rx)
    period = length + cp
    need = period * repeats
    if rx.shape[-1] < need:
        raise ValueError(f"need {need} samples, got {rx.shape[-1]}")
    cdt = jnp.result_type(rx.dtype, jnp.complex64)
    rx = rx.astype(cdt)
    z = jnp.asarray(np.asarray(zadoff_chu(root, length)), cdt)
    # average the bodies coherently, then ONE circular correlation:
    # corr = IFFT(FFT(body) * conj(FFT(z))) / length
    bodies = rx[: need].reshape(repeats, period)[:, cp:]
    body = jnp.mean(bodies, axis=0)
    C = jnp.fft.fft(body) * jnp.conj(jnp.fft.fft(z))
    corr = jnp.fft.ifft(C) / length
    cir = corr[:max_delay]
    # noise floor from the guaranteed-empty delay region (the second
    # half of the circle is the anti-causal side, empty after CP sync)
    floor_region = corr[length // 2: length // 2 + length // 4]
    noise = jnp.mean(jnp.abs(floor_region) ** 2)
    p = jnp.abs(cir) ** 2
    pdp_db = 10.0 * jnp.log10(jnp.maximum(p, 1e-30))
    info = {
        "pdp_db": np.asarray(pdp_db),
        "noise_floor_db": float(10.0 * np.log10(float(noise) + 1e-30)),
        "significant": np.asarray(p > 6.0 * noise),
        "snr_db": float(10.0 * np.log10(
            float(jnp.sum(p)) / (float(noise) * max_delay + 1e-30)
            + 1e-30)),
    }
    return np.asarray(cir), info
