"""RF transmitter/receiver measurements: ACPR, OBW, CCDF, SINAD, SFDR.

The standard bench measurements a production transmit chain is judged by —
the numbers a spectrum analyzer's one-button measurements report.  The
reference has nothing in this space (it stops at per-filter frequency_
response/group_delay analysis); these close the loop for the DPD/CFR
modules (models/dpd.py, models/cfr.py), whose whole purpose is trading
PAPR/CCDF against ACPR, and for quantizer/front-end validation
(ops/quantize.py) via SINAD/ENOB.

Everything is built on the Welch PSD (analysis/spectral.py) so the hot
work is the framed FFT; band selections are static masks over PSD bins.
Complex baseband convention: frequencies in the same units as ``fs``,
spectrum spans [-fs/2, fs/2).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .spectral import welch_psd

__all__ = ["channel_power", "acpr", "occupied_bandwidth", "papr_ccdf",
           "sinad_db", "enob", "sfdr_db"]


def _psd_and_freqs(x, fs: float, nfft: int, hop: int | None, window: str):
    hop = nfft // 2 if hop is None else hop
    p = welch_psd(jnp.asarray(x), nfft=nfft, hop=hop, window=window, fs=fs)
    f = np.fft.fftfreq(nfft, d=1.0 / fs)
    return p, f


def _band_mask(f: np.ndarray, f_lo: float, f_hi: float) -> np.ndarray:
    return (f >= f_lo) & (f < f_hi)


def channel_power(x, fs: float, f_center: float = 0.0,
                  bw: float | None = None, nfft: int = 1024,
                  hop: int | None = None, window: str = "hann"):
    """Integrated power (linear units) in [f_center - bw/2, f_center + bw/2).

    ``bw=None`` integrates the full span (≈ mean |x|² by Parseval).
    """
    p, f = _psd_and_freqs(x, fs, nfft, hop, window)
    df = fs / nfft
    if bw is None:
        return jnp.sum(p, axis=-1) * df
    m = _band_mask(f, f_center - bw / 2, f_center + bw / 2)
    if not m.any():
        raise ValueError("band contains no PSD bins; increase nfft")
    return jnp.sum(p * jnp.asarray(m, p.dtype), axis=-1) * df


def acpr(x, fs: float, bw: float, spacing: float | None = None,
         n_adjacent: int = 2, nfft: int = 2048, hop: int | None = None,
         window: str = "hann") -> dict:
    """Adjacent-channel power ratios of a 0-centered carrier.

    Measures the main channel (width ``bw`` at DC) and ``n_adjacent``
    offset channels on each side at multiples of ``spacing`` (default
    ``bw``), returning dB ratios *relative to the main channel* — the
    spectrum-analyzer ACPR convention (more negative = cleaner).

    Returns ``{"main_power", "lower_db", "upper_db", "offsets"}`` with
    one dB value per adjacent channel, nearest-first.
    """
    spacing = bw if spacing is None else float(spacing)
    p, f = _psd_and_freqs(x, fs, nfft, hop, window)
    df = fs / nfft
    need = bw / 2 + n_adjacent * spacing
    if need > fs / 2:
        raise ValueError(f"outermost channel edge {need:g} exceeds "
                         f"Nyquist {fs / 2:g}")
    def band(center):
        m = _band_mask(f, center - bw / 2, center + bw / 2)
        return float(jnp.sum(p * jnp.asarray(m, p.dtype)) * df)
    main = band(0.0)
    offsets = [(i + 1) * spacing for i in range(n_adjacent)]
    lower = [10.0 * np.log10(band(-o) / main) for o in offsets]
    upper = [10.0 * np.log10(band(+o) / main) for o in offsets]
    return {"main_power": main, "lower_db": np.array(lower),
            "upper_db": np.array(upper), "offsets": np.array(offsets)}


def occupied_bandwidth(x, fs: float, fraction: float = 0.99,
                       nfft: int = 2048, hop: int | None = None,
                       window: str = "hann") -> float:
    """x% occupied bandwidth: the narrowest centered-by-energy span
    holding ``fraction`` of total power (99% OBW by default).

    Spectrum-analyzer convention: walk the cumulative spectrum and cut
    (1-fraction)/2 of the energy off each edge.
    """
    if not 0.0 < fraction < 1.0:
        raise ValueError("fraction must be in (0, 1)")
    p, f = _psd_and_freqs(x, fs, nfft, hop, window)
    order = np.argsort(f)
    p_sorted = np.asarray(p)[order]
    f_sorted = f[order]
    c = np.cumsum(p_sorted)
    total = c[-1]
    if total <= 0:
        return 0.0
    tail = (1.0 - fraction) / 2.0
    lo = int(np.searchsorted(c, tail * total))
    hi = int(np.searchsorted(c, (1.0 - tail) * total))
    hi = min(hi, len(f_sorted) - 1)
    return float(f_sorted[hi] - f_sorted[lo])


def papr_ccdf(x, thresholds_db) -> np.ndarray:
    """CCDF of instantaneous power over mean: P[papr > threshold].

    The curve CFR is judged by (models/cfr.py reduces its tail).
    """
    x = jnp.asarray(x)
    p = jnp.real(x * jnp.conj(x))
    mean = jnp.mean(p)
    ratio_db = 10.0 * jnp.log10(jnp.maximum(p / mean, 1e-30))
    th = jnp.asarray(np.atleast_1d(np.asarray(thresholds_db, float)))
    return np.asarray(jnp.mean(ratio_db[None, :] > th[:, None], axis=-1))


def _tone_and_rest(x, fs: float, nfft: int, hop: int | None, window: str,
                   guard_bins: int):
    """(fundamental power, residual-per-bin array) from the PSD.

    Real inputs use the one-sided spectrum (the ADC-bench convention —
    otherwise the conjugate image of the fundamental would read as a
    0 dB "spur"); complex baseband uses the full span.
    """
    x = jnp.asarray(x)
    hop = nfft // 2 if hop is None else hop
    real_in = not jnp.iscomplexobj(x)
    p = welch_psd(x, nfft=nfft, hop=hop, window=window, fs=fs,
                  onesided=real_in)
    p = np.asarray(p).copy()
    df = fs / nfft
    # DC leakage is not distortion: blank a guard around 0 Hz first
    p[:guard_bins] = 0.0
    if not real_in:
        p[-guard_bins:] = 0.0
    k0 = int(np.argmax(p))
    lo, hi = max(k0 - guard_bins, 0), min(k0 + guard_bins + 1, len(p))
    fund = p[lo:hi].sum() * df
    p[lo:hi] = 0.0
    return fund, p, df


def sinad_db(x, fs: float = 1.0, nfft: int = 4096, hop: int | None = None,
             window: str = "blackman_harris", guard_bins: int = 8) -> float:
    """Signal to noise-and-distortion: fundamental vs everything else (dB).

    ``guard_bins`` must cover the analysis window's main lobe (the default
    suits the 4-term Blackman-Harris).
    """
    fund, rest, df = _tone_and_rest(x, fs, nfft, hop, window, guard_bins)
    return float(10.0 * np.log10(fund / max(rest.sum() * df, 1e-30)))


def enob(x, fs: float = 1.0, **kw) -> float:
    """Effective number of bits from SINAD: (SINAD - 1.76) / 6.02."""
    return (sinad_db(x, fs, **kw) - 1.76) / 6.02


def sfdr_db(x, fs: float = 1.0, nfft: int = 4096, hop: int | None = None,
            window: str = "blackman_harris", guard_bins: int = 8) -> float:
    """Spurious-free dynamic range: fundamental vs strongest spur (dB).

    The spur is integrated over the same ±guard_bins lobe as the
    fundamental so both tones are measured identically.
    """
    fund, rest, df = _tone_and_rest(x, fs, nfft, hop, window, guard_bins)
    ks = int(np.argmax(rest))
    lo, hi = max(ks - guard_bins, 0), min(ks + guard_bins + 1, len(rest))
    spur = rest[lo:hi].sum() * df
    return float(10.0 * np.log10(fund / max(spur, 1e-30)))
