"""AutoCorrelator golden + randomized parity tests."""

import jax.numpy as jnp
import numpy as np

from solid_dsp_tpu.ops import autocorr
from ref_sim import RefAutoCorrelator


def _tone(n=500, amp=0.05):
    k = np.arange(-n // 2, n // 2).astype(np.float64)
    return amp * np.cos(k) + 1j * amp * np.sin(k)


def test_energy_golden():
    # ref auto_correlator/mod.rs:186-210: energy*1e4 rounds to 125
    x = _tone()
    ac = autocorr.AutoCorrelator(5, 10)
    ac.execute_block(jnp.asarray(x))
    assert round(ac.get_energy() * 10000.0) == 125.0


def test_delay_ge_window_outputs_zero():
    # with delay >= window size the delayed window stays zero forever
    x = _tone(100)
    ac = autocorr.AutoCorrelator(5, 10)
    out = np.asarray(ac.execute_block(jnp.asarray(x)))
    np.testing.assert_array_equal(out, np.zeros_like(out))


def test_randomized_vs_reference():
    rng = np.random.default_rng(11)
    x = rng.standard_normal(200) + 1j * rng.standard_normal(200)
    ref = RefAutoCorrelator(8, 3).execute_block(x)
    ac = autocorr.AutoCorrelator(8, 3)
    got = np.concatenate([
        np.asarray(ac.execute_block(jnp.asarray(x[:81]))),
        np.asarray(ac.execute_block(jnp.asarray(x[81:]))),
    ])
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_energy_tracks_reference():
    rng = np.random.default_rng(12)
    x = rng.standard_normal(64) + 1j * rng.standard_normal(64)
    ref = RefAutoCorrelator(6, 2)
    ref.execute_block(x)
    ac = autocorr.AutoCorrelator(6, 2)
    ac.execute_block(jnp.asarray(x))
    assert abs(ac.get_energy() - ref.esum) < 1e-10


def test_execute_without_push():
    rng = np.random.default_rng(13)
    x = rng.standard_normal(50) + 1j * rng.standard_normal(50)
    ref = RefAutoCorrelator(8, 3)
    ref_out = ref.execute_block(x)
    ac = autocorr.AutoCorrelator(8, 3)
    block = np.asarray(ac.execute_block(jnp.asarray(x)))
    np.testing.assert_allclose(complex(ac.execute()), ref.execute(), atol=1e-10)
    np.testing.assert_allclose(block[-1], ref_out[-1], atol=1e-10)


def test_reset():
    ac = autocorr.AutoCorrelator(5, 1)
    ac.execute_block(jnp.asarray(_tone(50)))
    ac.reset()
    assert ac.get_energy() == 0.0


def test_window_delay_line_parity():
    """streaming.Window: exact reference semantics (window/mod.rs) — push
    never writes the delay slots, to_vec reads the DELAYED offset."""
    import numpy as np

    from solid_dsp_tpu.streaming import Window

    w = Window(3, delay=2)
    for i in range(1, 7):
        w.push(float(i))
    # buffer = [6, 5, 4, 0, 0]: delay slots never written
    assert w[0] == 6.0 and w[1] == 5.0 and w[2] == 4.0
    assert w[3] == 0.0 and w[4] == 0.0
    # to_vec = delayed view: [buf[2], buf[3], buf[4]] = [4, 0, 0]
    np.testing.assert_array_equal(w.to_vec(), [4, 0, 0])
    # zero delay: plain newest-first window
    w2 = Window(3)
    w2.write([1.0, 2.0, 3.0, 4.0])
    np.testing.assert_array_equal(w2.to_vec(), [4, 3, 2])
    w2.reset()
    assert not w2.to_vec().any()
