"""Digital predistortion: MP identification + Saleh PA linearization."""

import jax.numpy as jnp
import numpy as np

from solid_dsp_tpu.models.dpd import (
    Predistorter,
    dpd_learn,
    mp_apply,
    mp_basis,
    mp_fit,
    saleh_pa,
)


def _multitone(n, seed=0, rms=0.12):
    """OFDM-like complex baseband with realistic envelope variation."""
    rng = np.random.default_rng(seed)
    X = np.zeros(n, np.complex128)
    used = np.arange(-n // 8, n // 8)
    X[used] = np.exp(2j * np.pi * rng.random(len(used)))
    x = np.fft.ifft(X) * np.sqrt(n / len(used))
    # rms 0.12 keeps the ~10 dB-PAPR peaks inside the Saleh PA's
    # invertible range (gain peaks at r = 1/sqrt(beta_a) ~= 0.93)
    return (rms * x / np.sqrt(np.mean(np.abs(x) ** 2))).astype(np.complex64)


def _evm_db(y, ref):
    g = np.vdot(ref, y) / np.vdot(ref, ref)
    e = y - g * ref
    return 10 * np.log10(np.real(np.vdot(e, e) / np.vdot(g * ref, g * ref)))


def test_mp_fit_recovers_known_coefficients():
    rng = np.random.default_rng(1)
    K, Q = 4, 3
    c_true = (rng.standard_normal(K * Q) + 1j * rng.standard_normal(K * Q)
              ) * (0.3 ** np.repeat(np.arange(Q), K))
    c_true[0] = 1.0
    x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)
         ).astype(np.complex64) * 0.4
    y = mp_apply(jnp.asarray(c_true, jnp.complex64), jnp.asarray(x), K, Q)
    c_hat = np.asarray(mp_fit(jnp.asarray(x), y, K, Q, ridge=1e-12))
    np.testing.assert_allclose(c_hat, c_true, rtol=2e-3, atol=2e-4)


def test_mp_basis_shapes_and_delay():
    x = jnp.asarray(np.arange(1, 9, dtype=np.complex64))
    Phi = np.asarray(mp_basis(x, order=2, memory=2))
    assert Phi.shape == (8, 4)
    np.testing.assert_allclose(Phi[:, 0], np.arange(1, 9))        # k0 q0
    np.testing.assert_allclose(Phi[:, 2], [0, 1, 2, 3, 4, 5, 6, 7])  # q=1
    np.testing.assert_allclose(Phi[:, 1], np.arange(1, 9.0) ** 3)  # |x|^2 x


def test_dpd_linearizes_saleh_pa():
    x = _multitone(1 << 14, seed=2)
    coefs, g = dpd_learn(saleh_pa, jnp.asarray(x), order=5, memory=1,
                         iters=3)
    y_raw = np.asarray(saleh_pa(jnp.asarray(x)))
    u = np.asarray(mp_apply(coefs, jnp.asarray(x), 5, 1))
    y_dpd = np.asarray(saleh_pa(jnp.asarray(u)))
    evm_raw = _evm_db(y_raw, x)
    evm_dpd = _evm_db(y_dpd, x)
    assert evm_dpd < evm_raw - 15.0, (evm_raw, evm_dpd)
    assert evm_dpd < -35.0, evm_dpd


def test_dpd_reduces_spectral_regrowth():
    """ACPR: out-of-band power of the PA output drops by > 10 dB with DPD."""
    from solid_dsp_tpu.analysis.spectral import welch_psd
    x = _multitone(1 << 15, seed=3)
    coefs, _ = dpd_learn(saleh_pa, jnp.asarray(x), order=5, memory=1,
                         iters=3)
    y_raw = saleh_pa(jnp.asarray(x))
    y_dpd = saleh_pa(mp_apply(coefs, jnp.asarray(x), 5, 1))

    def oob_power(sig):
        p = np.asarray(welch_psd(sig, nfft=1024, hop=512))
        p = np.fft.fftshift(p)
        n = len(p)
        inband = np.zeros(n, bool)
        inband[n // 2 - n // 7: n // 2 + n // 7] = True   # occupied 1/4 + guard
        return float(np.sum(p[~inband]))

    acpr_gain = 10 * np.log10(oob_power(y_raw) / oob_power(y_dpd))
    assert acpr_gain > 10.0, acpr_gain


def test_memory_pa_needs_memory_dpd():
    """A PA with memory (Wiener: FIR then Saleh) is linearized markedly
    better by a memory-Q=3 DPD than by a memoryless one."""
    h = jnp.asarray(np.array([1.0, 0.25, -0.1], np.complex64))

    def pa(v):
        vf = jnp.convolve(v, h)[: v.shape[-1]]
        return saleh_pa(vf)

    x = _multitone(1 << 14, seed=4)
    c0, _ = dpd_learn(pa, jnp.asarray(x), order=5, memory=1, iters=3)
    c3, _ = dpd_learn(pa, jnp.asarray(x), order=5, memory=3, iters=3)
    y0 = np.asarray(pa(mp_apply(c0, jnp.asarray(x), 5, 1)))
    y3 = np.asarray(pa(mp_apply(c3, jnp.asarray(x), 5, 3)))
    assert _evm_db(y3, x) < _evm_db(y0, x) - 6.0


def test_predistorter_streaming_continuity():
    rng = np.random.default_rng(5)
    c = jnp.asarray(np.r_[1.0, 0.1, -0.05 + 0.02j,
                          0.03, -0.01, 0.005].astype(np.complex64))
    x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)
         ).astype(np.complex64) * 0.3
    pd = Predistorter(c, order=2, memory=3)
    ya = np.asarray(pd.execute_block(x[:256]))
    yb = np.asarray(pd.execute_block(x[256:]))
    pd2 = Predistorter(c, order=2, memory=3)
    yf = np.asarray(pd2.execute_block(x))
    np.testing.assert_allclose(np.concatenate([ya, yb]), yf, atol=1e-6)
