"""Blind modulation classification via moment/cumulant hypothesis tests.

Spectrum-sensing capability (no counterpart in the reference): given a
block of matched-filtered symbol estimates in UNKNOWN noise, decide the
modulation among candidate constellations.  All statistics are one-pass
block reductions.

The naive recipe (normalize the Swami-Sadler cumulants by an M2M4 signal-
power estimate) silently fails for QAM: under a constant-modulus
assumption the estimated power absorbs exactly the kurtosis difference,
so C42/S_est^2 = -1 for EVERY constellation.  Instead each candidate
class is treated as a hypothesis:

1. fit the signal power from the 2nd/4th moments under the class's own
   kurtosis ka:  S^2 = (M4 - 2 M2^2) / (ka - 2),  N = M2 - S
   (negative N = infeasible hypothesis -> rejected);
2. validate with statistics NOT used in the fit: the 6th moment of
   |signal + circular noise|  (M6 = k6 S^3 + 9 ka S^2 N + 18 S N^2 + 6 N^3)
   and the 4th-order structure magnitudes |C20|, |C40| predicted from the
   constellation;
3. pick the feasible hypothesis with the smallest normalized residual.

Class moment ratios (ka = E|s|^4/S^2, k6 = E|s|^6/S^3, |c20|, |c40|) are
computed numerically from the framework's own constellations
(models/linear_mod.py), so the classifier extends to any added scheme.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .linear_mod import constellation

__all__ = ["signal_moments", "class_moment_table", "classify",
           "DEFAULT_CLASSES"]

DEFAULT_CLASSES = (("psk", 2), ("psk", 4), ("psk", 8),
                   ("qam", 16), ("qam", 64))


@jax.jit
def signal_moments(x):
    """One-pass complex moments: (M2, M4, M6, |C20|, |C40|).

    M2 = E|x|^2, M4 = E|x|^4, M6 = E|x|^6, C20 = E[x^2],
    C40 = E[x^4] - 3 E[x^2]^2 (magnitudes are rotation invariant).
    """
    x = jnp.asarray(x)
    ax2 = jnp.real(x * jnp.conj(x))
    m2 = jnp.mean(ax2, axis=-1)
    m4 = jnp.mean(ax2 * ax2, axis=-1)
    m6 = jnp.mean(ax2 * ax2 * ax2, axis=-1)
    m20 = jnp.mean(x * x, axis=-1)
    m40 = jnp.mean(x ** 4, axis=-1)
    c40 = m40 - 3.0 * m20 * m20
    return m2, m4, m6, jnp.abs(m20), jnp.abs(c40)


@lru_cache(maxsize=8)
def class_moment_table(classes=DEFAULT_CLASSES) -> np.ndarray:
    """(n_classes, 4) rows of (ka, k6, |c20|, |c40|) for unit-power
    constellations, computed numerically."""
    rows = []
    for scheme, m in classes:
        pts = np.asarray(constellation(scheme, m))
        pts = pts / np.sqrt(np.mean(np.abs(pts) ** 2))
        ka = float(np.mean(np.abs(pts) ** 4))
        k6 = float(np.mean(np.abs(pts) ** 6))
        c20 = abs(np.mean(pts ** 2))
        c40 = abs(np.mean(pts ** 4) - 3 * np.mean(pts ** 2) ** 2)
        rows.append([ka, k6, c20, c40])
    return np.asarray(rows, np.float64)


def classify(x, classes=DEFAULT_CLASSES):
    """Hypothesis-test classification in unknown noise.

    Returns (label, scores) where label is an entry of ``classes`` or
    ``"noise"``, and scores is the per-class normalized residual (np.inf
    where the hypothesis is infeasible).
    """
    m2, m4, m6, c20a, c40a = (float(np.asarray(v))
                              for v in signal_moments(jnp.asarray(x)))
    table = class_moment_table(tuple(classes))
    # noise hypothesis: S = 0 -> M4 = 2 M2^2, M6 = 6 M2^3, C20 = C40 = 0
    noise_resid = (abs(m4 - 2 * m2 * m2) / (m2 * m2)
                   + abs(m6 - 6 * m2 ** 3) / (m2 ** 3)
                   + c20a / m2 + c40a / (m2 * m2))

    scores = np.full(len(table), np.inf)
    fitted_s2 = np.zeros(len(table))
    for i, (ka, k6, c20r, c40r) in enumerate(table):
        s2 = (m4 - 2 * m2 * m2) / (ka - 2.0)
        if s2 <= 0:
            continue
        S = np.sqrt(s2)
        N = m2 - S
        if N < -0.02 * m2:                  # infeasible: needs negative noise
            continue
        N = max(N, 0.0)
        fitted_s2[i] = s2
        m6_pred = k6 * S ** 3 + 9 * ka * S * S * N + 18 * S * N * N \
            + 6 * N ** 3
        # validation residual: statistics not consumed by the (S, N) fit
        r = (abs(m6 - m6_pred) / (m2 ** 3)
             + abs(c20a - c20r * S) / m2
             + abs(c40a - c40r * s2) / (m2 * m2))
        scores[i] = r
    best = int(np.argmin(scores))
    # noise: either the S = 0 hypothesis fits best, or the winning class
    # only "detected" an insignificant signal fraction (fitted SNR < -13 dB
    # — pure-noise moment fluctuations land here, real signals far above)
    if noise_resid < np.min(scores) or fitted_s2[best] < 0.05 * m2:
        return "noise", scores
    return classes[best], scores
