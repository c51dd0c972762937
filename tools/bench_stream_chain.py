import jax, jax.numpy as jnp, numpy as np, sys
from solid_dsp_tpu.utils.benchtime import measure_step
from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain_stream

NB = 4
B = 1 << 24
L = NB * B
KS = (2, 6, 10)

k = np.arange(L)
w = 0.2
xr = (0.1 * np.cos((w + 0.00628) * k)).astype(np.float32)
xi = (0.1 * np.sin((w + 0.00628) * k)).astype(np.float32)
x2 = jax.device_put(np.stack([xr, xi]))

for prec in (sys.argv[1:] or ("x3", "default")):
    cfg = RxChainConfig(carrier_freq=w, decimation=4, fir_taps=64,
                        agc_mode="block", demod="fm", nco_mode="exact",
                        input_format="planar", fused_ddc="on",
                        fir_precision=prec, dtype=jnp.complex64)
    init, stream = make_rx_chain_stream(cfg, B)
    st = init()

    @jax.jit
    def g(st, x):
        out, st2 = stream(st, x)
        return jnp.sum(out), st2

    def step(carry):
        _, s = carry
        chk, s2 = g(s, x2)
        return chk, (chk, s2)

    r = measure_step(step, (jnp.zeros(()), st), ks=KS, reps=2, warmup=2)
    t = r["t_iter"] / NB  # per 16M block
    print(f"stream chain prec={prec}: t={t*1e3:.3f} ms/blk  {B/t/1e9:.2f} Gs/s", flush=True)
