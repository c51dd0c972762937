"""DDC — digital down-converter: the classic SDR front-end signal path.

    NCO mix-down -> CIC bulk decimation -> droop-compensating FIR
    (+ final decimation) -> optional Farrow fine-ratio resample

This is how every real receiver front end narrows a wideband capture to a
channel: the CIC does the cheap bulk rate change, the compensation FIR
flattens the CIC's sinc^N passband droop and provides the real channel
selectivity, and the Farrow stage absorbs non-integer rate offsets
(sample-clock tracking).  The reference has none of this composition;
every stage here is an existing block transform, so the DDC is pure glue
plus one new design function (the inverse-sinc compensator).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..design.windows import get_window
from ..ops import fir as fir_ops
from ..ops import nco as nco_ops
from ..ops.cic import CICDecimator, cic_frequency_response
from ..ops.farrow import FarrowResampler

__all__ = ["firdes_cic_compensation", "DDC"]


def firdes_cic_compensation(ntaps: int, cic_rate: int, cic_stages: int,
                            cutoff: float, cic_diff_delay: int = 1,
                            window: str = "hamming") -> np.ndarray:
    """Inverse-sinc^N compensator, designed at the CIC's OUTPUT rate.

    Desired response: 1/|H_cic(f_out / R)| in the passband (|f_out| <
    cutoff, normalized to the output rate), 0 in the stopband; realized by
    frequency sampling + windowing (linear phase, odd length enforced).
    """
    if ntaps % 2 == 0:
        ntaps += 1  # symmetric linear-phase design
    if not (0.0 < cutoff < 0.5):
        raise ValueError("cutoff must be in (0, 0.5) of the output rate")
    N = 1024
    f_out = np.fft.fftfreq(N)  # cycles per OUTPUT sample
    f_in = f_out / cic_rate
    mag_cic = cic_frequency_response(f_in, cic_rate, cic_stages,
                                     cic_diff_delay)
    mag_cic = mag_cic / mag_cic.max()  # normalize DC to 1
    desired = np.where(np.abs(f_out) < cutoff, 1.0 / mag_cic, 0.0)
    h = np.real(np.fft.ifft(desired))
    h = np.roll(h, ntaps // 2)[:ntaps]  # center the impulse response
    w = np.asarray(get_window(window, ntaps), dtype=np.float64)
    h = h * w
    return h / np.sum(h)  # unity DC gain


class DDC:
    """Streaming digital down-converter.

    Parameters
    ----------
    freq : carrier to remove, rad/sample at the INPUT rate.
    cic_rate / cic_stages : bulk CIC decimation.
    fir_decim : final FIR decimation factor (compensator runs before it).
    fir_taps / cutoff : compensator length and passband edge (normalized
        to the CIC output rate).
    ratio : optional extra Farrow ratio (input-per-output at the FIR
        output rate); None disables the stage.

    Total nominal decimation = cic_rate * fir_decim * (ratio or 1).
    """

    def __init__(self, freq: float, cic_rate: int = 8, cic_stages: int = 4,
                 fir_decim: int = 2, fir_taps: int = 64,
                 cutoff: float | None = None, ratio: float | None = None,
                 dtype=jnp.complex64):
        self.freq = float(freq)
        self.dtype = dtype
        rdtype = np.zeros(0, dtype=dtype).real.dtype
        self._dtheta = nco_ops.constrain(self.freq)
        self._lut = nco_ops.make_sine_lut(rdtype)
        self._theta = jnp.uint32(0)
        self.cic = CICDecimator(cic_rate, cic_stages, dtype=dtype)
        cutoff = cutoff if cutoff is not None else 0.4 / fir_decim
        comp = firdes_cic_compensation(fir_taps, cic_rate, cic_stages,
                                       cutoff)
        self._comp_taps = jnp.asarray(comp, dtype)
        self._fir_tail = fir_ops.fir_init(len(comp), dtype)
        self._fir_phase = jnp.int32(0)
        self.fir_decim = int(fir_decim)
        self.farrow = FarrowResampler(ratio, dtype=dtype) if ratio else None
        self.decimation = cic_rate * fir_decim * (ratio or 1.0)

    def execute_block(self, x):
        x = jnp.asarray(x, self.dtype)
        mixed, self._theta = nco_ops.mix_down_block(
            x, self._theta, self._dtheta, self._lut, "exact")
        y = self.cic.execute_block(mixed)
        y, self._fir_tail, self._fir_phase = fir_ops.fir_decim_apply(
            self._comp_taps, self._fir_tail, self._fir_phase, y,
            jnp.asarray(1.0, self.dtype), self.fir_decim)
        if self.farrow is not None:
            y = self.farrow.execute_block(y)
        return y

    def reset(self):
        self._theta = jnp.uint32(0)
        self.cic.reset()
        self._fir_tail = fir_ops.fir_init(self._comp_taps.shape[-1],
                                          self.dtype)
        self._fir_phase = jnp.int32(0)
        if self.farrow is not None:
            self.farrow.reset()

    def __repr__(self):
        return (f"DDC [freq={self.freq:.4f}] "
                f"[decim={self.decimation:.4f}]")
