"""Preamble frame sync + data-aided CFO/phase estimation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models import channel as ch
from solid_dsp_tpu.models import framesync as fs
from solid_dsp_tpu.models import linear_mod as lm
from solid_dsp_tpu.utils import sequences as seq


def _burst(preamble, payload, offset, n_total, rng, snr_db=15.0):
    frame = np.concatenate([preamble, payload])
    x = np.zeros(n_total, complex)
    x[offset: offset + len(frame)] = frame
    p_sig = np.mean(np.abs(frame) ** 2)
    sigma = np.sqrt(p_sig / 10 ** (snr_db / 10) / 2)
    return x + sigma * (rng.normal(size=n_total) +
                        1j * rng.normal(size=n_total))


def test_correlation_peak_is_exact_and_normalized():
    p = seq.zadoff_chu(5, 63)
    rng = np.random.default_rng(0)
    x = _burst(p, np.zeros(0), 200, 512, rng, snr_db=60.0)
    rho2, _ = fs.preamble_correlate(jnp.asarray(x), jnp.asarray(p))
    rho2 = np.asarray(rho2)
    assert rho2.shape == (512,)
    assert np.argmax(rho2) == 200
    assert rho2[200] > 0.98          # |rho| ~ 1 at the true alignment
    # scale invariance of the normalized metric
    rho2_scaled, _ = fs.preamble_correlate(jnp.asarray(37.0 * x),
                                           jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(rho2_scaled), rho2, rtol=1e-6)


def test_detect_under_noise_and_rotation():
    p = seq.zadoff_chu(7, 139)
    rng = np.random.default_rng(1)
    x = _burst(p, np.zeros(0), 421, 2048, rng, snr_db=0.0)
    x = x * np.exp(1j * 1.234)       # arbitrary common phase
    idx, peak, found = fs.detect_preamble(jnp.asarray(x), jnp.asarray(p),
                                          threshold=0.3)
    assert int(idx) == 421 and bool(found)


def test_no_preamble_not_found():
    rng = np.random.default_rng(2)
    x = rng.normal(size=1024) + 1j * rng.normal(size=1024)
    p = seq.zadoff_chu(3, 127)
    _, peak, found = fs.detect_preamble(jnp.asarray(x), jnp.asarray(p), 0.5)
    assert not bool(found)
    assert float(peak) < 0.2         # noise-only metric stays small


@pytest.mark.parametrize("cfo", [3e-4, -1.7e-3])
def test_moose_cfo_estimate(cfo):
    p = seq.zadoff_chu(5, 127)
    pp = np.concatenate([p, p])
    rng = np.random.default_rng(3)
    x = np.array(ch.apply_cfo(jnp.asarray(pp), cfo))
    x += 0.02 * (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x)))
    got = float(fs.estimate_cfo_repeated(jnp.asarray(x), len(p)))
    assert abs(got - cfo) < 3e-5


def test_kay_cfo_wide_range():
    p = seq.zadoff_chu(5, 127)
    cfo = 0.11                        # far outside the Moose +-1/(2L) range
    x = np.asarray(ch.apply_cfo(jnp.asarray(p.astype(complex)), cfo))
    got = float(fs.estimate_cfo_kay(jnp.asarray(x), jnp.asarray(p)))
    assert abs(got - cfo) < 1e-6


def test_framesync_end_to_end_qpsk():
    """Burst with unknown offset, CFO, phase, noise -> zero payload BER."""
    rng = np.random.default_rng(4)
    pts = lm.constellation("psk", 4)
    bits = rng.integers(0, 2, 400)
    payload = np.asarray(lm.modulate_symbols(
        lm.bits_to_symbols(bits, 2), jnp.asarray(pts)))
    p = seq.zadoff_chu(5, 127)
    sync = fs.FrameSync(p, payload_len=len(payload), threshold=0.4)
    frame = np.concatenate([sync.full_preamble(), payload])

    offset, cfo, phase = 313, 8e-4, 0.77
    n_total = 1200
    x = np.zeros(n_total, complex)
    x[offset: offset + len(frame)] = frame
    x = np.array(ch.apply_cfo(jnp.asarray(x), cfo, phase))
    x += 0.03 * (rng.normal(size=n_total) + 1j * rng.normal(size=n_total))

    got, info = sync.extract(jnp.asarray(x))
    assert bool(info["found"]) and int(info["start"]) == offset
    assert abs(float(info["cfo"]) - cfo) < 5e-5
    syms = lm.slice_symbols(jnp.asarray(got), pts)
    got_bits = np.asarray(lm.symbols_to_bits(syms, 2))
    assert np.array_equal(got_bits, bits)


def test_framesync_extract_is_jittable():
    p = seq.zadoff_chu(2, 63)
    sync = fs.FrameSync(p, payload_len=32)
    rng = np.random.default_rng(5)
    frame = np.concatenate([sync.full_preamble(),
                            np.exp(1j * rng.uniform(0, 6.28, 32))])
    x = np.zeros(400, complex)
    x[100:100 + len(frame)] = frame
    jitted = jax.jit(sync.extract)
    payload, info = jitted(jnp.asarray(x))
    assert int(info["start"]) == 100
    assert payload.shape == (32,)


def test_scan_bursts_detection_at_capture_end():
    # regression: a burst whose frame extends past the capture end must
    # not crash the scan (argmax-on-empty), and decodes what is there
    from solid_dsp_tpu.models.framesync import scan_bursts

    above = np.zeros(100, bool)
    above[90] = True                      # detection 10 from the end
    calls = []

    def decode(lo, hi):
        calls.append((lo, hi))
        return b"x", {}

    out = scan_bursts(above, frame_samples=50, margin=5, n_total=100,
                      decode_fn=decode)
    assert len(out) == 1
    assert calls == [(85, 100)]           # clipped to the capture
    assert out[0][1]["offset"] == 85
    # multiple detections respect the frame advance and max_bursts
    above2 = np.zeros(300, bool)
    above2[[10, 20, 200]] = True          # 20 is within frame of 10
    out2 = scan_bursts(above2, 100, 0, 300, decode, max_bursts=64)
    assert [o[1]["offset"] for o in out2] == [10, 200]
