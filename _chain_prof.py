import jax, jax.numpy as jnp, numpy as np
from solid_dsp_tpu.utils.benchtime import measure_step
import solid_dsp_tpu.ops.nco as nco_ops
import solid_dsp_tpu.ops.fir as fir_ops
import solid_dsp_tpu.ops.agc as agc_ops
import solid_dsp_tpu.models.fm as fm_mod
from solid_dsp_tpu.models.rx_chain import RxChainConfig, rx_chain_init
from solid_dsp_tpu.utils.transfer import put_complex

L = 1 << 24
cfg = RxChainConfig(dtype=jnp.complex64)
xnp = (0.1*np.exp(2j*np.pi*0.033*np.arange(L))).astype(np.complex64)
x = put_complex(xnp)
taps = np.asarray(cfg.design_taps(), np.complex64)
dtheta = nco_ops.constrain(0.2)
lut = nco_ops.make_sine_lut(np.float32)
st = rx_chain_init(cfg)
KS = (4, 24, 44)

def run(tag, g, *args):
    gj = jax.jit(g)
    def step(chk):
        c = gj(chk, *args)
        return c, c
    t = measure_step(step, jnp.zeros(()), ks=KS, reps=1, warmup=2)["t_iter"]
    print(f"{tag}: t={t*1e3:.3f} ms  {L/t/1e9:.2f} Gs/s", flush=True)

run('nco mix exact', lambda chk, x: jnp.sum(jnp.abs(nco_ops.mix_down_block(x + (0.0*chk).astype(x.dtype), jnp.uint32(0), dtheta, lut, "exact")[0])), x)
run('fir decim4 64t', lambda chk, x: jnp.sum(jnp.abs(fir_ops.fir_decim_apply(taps, jnp.zeros(63, jnp.complex64), jnp.int32(0), x + (0.0*chk).astype(x.dtype), jnp.asarray(1.0, jnp.complex64), 4, precision="highest")[0])), x)
run('fir decim4 bf16', lambda chk, x: jnp.sum(jnp.abs(fir_ops.fir_decim_apply(taps, jnp.zeros(63, jnp.complex64), jnp.int32(0), x + (0.0*chk).astype(x.dtype), jnp.asarray(1.0, jnp.complex64), 4, precision="default")[0])), x)
y4 = x[: L // 4]
run('agc block    ', lambda chk, y: jnp.sum(jnp.abs(agc_ops.agc_apply_block_mode(jax.tree_util.tree_map(jnp.asarray, st.agc), y + (0.0*chk).astype(y.dtype), 0.01)[0])), y4)
run('fm demod     ', lambda chk, y: jnp.sum(fm_mod.fm_demodulate(jnp.ones((), jnp.complex64), y + (0.0*chk).astype(y.dtype), 0.1)[0]), y4)
