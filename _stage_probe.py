import sys, jax, jax.numpy as jnp, numpy as np
import solid_dsp_tpu.ops.nco as nco_ops
import solid_dsp_tpu.ops.fir as fir_ops
import solid_dsp_tpu.ops.agc as agc_ops
import solid_dsp_tpu.models.fm as fm_mod
from solid_dsp_tpu.models.rx_chain import RxChainConfig, rx_chain_init
from solid_dsp_tpu.utils.transfer import put_complex

stage = sys.argv[1]
cfg = RxChainConfig(dtype=jnp.complex64)
L = 1<<14
xnp = (0.1*np.exp(2j*np.pi*0.033*np.arange(L))).astype(np.complex64)
x = put_complex(xnp)
rdtype = np.float32
taps = np.asarray(cfg.design_taps(), np.complex64)
dtheta = nco_ops.constrain(cfg.carrier_freq)
lut = nco_ops.make_sine_lut(rdtype)
st = rx_chain_init(cfg)

if stage == 'nco':
    f = jax.jit(lambda th, x: jnp.sum(jnp.abs(nco_ops.mix_down_block(x, th, dtheta, lut, "exact")[0])))
    print('nco', float(f(st.nco_theta, x)))
elif stage == 'fir':
    def g(tail, ph, x):
        y, t2, p2 = fir_ops.fir_decim_apply(taps, tail, ph, x, jnp.asarray(1.0, jnp.complex64), 4, precision="highest")
        return jnp.sum(jnp.abs(y))
    f = jax.jit(g)
    print('fir', float(f(st.fir_tail, st.fir_phase, x)))
elif stage == 'agc':
    f = jax.jit(lambda a, y: jnp.sum(jnp.abs(agc_ops.agc_apply_block_mode(a, y, 0.01)[0])))
    print('agc', float(f(st.agc, x)))
elif stage == 'fm':
    f = jax.jit(lambda p, y: jnp.sum(fm_mod.fm_demodulate(p, y, 0.1)[0]))
    print('fm', float(f(st.fm_prev, x)))
