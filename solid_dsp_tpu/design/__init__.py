"""Design-time math: windows, FIR/IIR designers, polynomials, special functions.

These mirror the reference's L0/L4 layers (src/math, src/windows,
src/filter/firdes, src/filter/iirdes, src/resources) and run on the host in
float64 — they execute once per chain construction, never per sample.
"""

from . import firdes, iirdes, polymath, resources, specialfn, windows  # noqa: F401
