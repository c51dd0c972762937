import jax, jax.numpy as jnp, numpy as np, time
from solid_dsp_tpu.utils.benchtime import measure_step

for nbytes in (1<<24, 1<<26, 1<<28):
    a = jnp.ones((nbytes // 4,), jnp.float32)
    @jax.jit
    def red(a, seed):
        return jnp.sum(a) + 1e-12 * seed
    def step(seed):
        c = red(a, seed)
        return c, c
    r = measure_step(step, jnp.zeros((), jnp.float32), ks=(1,2,4,8,16), reps=1, warmup=2)
    print(f"{nbytes>>20} MB: t_iter={r['t_iter']*1e3:.3f} ms  latency={r['latency']*1e3:.1f} ms  -> {nbytes/r['t_iter']/1e9:.1f} GB/s  times={ {k: round(v*1e3,1) for k,v in r['times'].items()} }", flush=True)
