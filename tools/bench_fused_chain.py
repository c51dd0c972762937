import jax, jax.numpy as jnp, numpy as np, sys
from solid_dsp_tpu.utils.benchtime import measure_step
from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain

L = 1 << 24
KS = (4, 24, 44)

k = np.arange(L)
w = 0.2
xnp = (0.1 * np.exp(2j * np.pi * (w / (2 * np.pi) + 0.001) * k)).astype(np.complex64)
x2 = jax.device_put(np.stack([xnp.real, xnp.imag]).astype(np.float32))

for prec in (sys.argv[1:] or ("x3", "highest", "default")):
    cfg = RxChainConfig(carrier_freq=w, decimation=4, fir_taps=64,
                        agc_mode="block", demod="fm", nco_mode="exact",
                        input_format="planar", fused_ddc="on",
                        fir_precision=prec, dtype=jnp.complex64)
    init, apply = make_rx_chain(cfg)
    st = init()

    @jax.jit
    def g(st, x):
        out, st2 = apply(st, x)
        return jnp.sum(out), st2

    def step(carry):
        _, s = carry
        chk, s2 = g(s, x2)
        return chk, (chk, s2)

    r = measure_step(step, (jnp.zeros(()), st), ks=KS, reps=2, warmup=3)
    t = r["t_iter"]
    print(f"fused chain prec={prec}: t={t*1e3:.3f} ms  {L/t/1e9:.2f} Gs/s", flush=True)
