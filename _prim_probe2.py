import jax, jax.numpy as jnp, numpy as np
from solid_dsp_tpu.utils.benchtime import measure_step

L = 1 << 24   # 16M elements
re = jnp.asarray(np.random.default_rng(0).standard_normal(L).astype(np.float32))
im = jnp.asarray(np.random.default_rng(1).standard_normal(L).astype(np.float32))
KS = (4, 36, 68)

def mk(f):
    @jax.jit
    def g(chk, re, im):
        return jnp.sum(f(re + 0.0 * chk, im))
    def step(chk):
        c = g(chk, re, im)
        return c, c
    return step

def run(tag, f, nbytes):
    t = measure_step(mk(f), jnp.zeros(()), ks=KS, reps=1, warmup=2)["t_iter"]
    print(f"{tag}: t={t*1e3:.3f} ms  {L/t/1e9:.2f} Gelem/s  ({nbytes/t/1e9:.0f} GB/s)", flush=True)

run('f32 mul+sum        ', lambda re, im: re * im, L*8)
run('c64 mul            ', lambda re, im: jnp.abs(jax.lax.complex(re, im) * jax.lax.complex(im, re)), L*16)
def cfft(re, im):
    z = jax.lax.complex(re, im).reshape(4096, 4096)
    return jnp.abs(jnp.fft.fft(z, axis=-1))
run('c64 fft 4096x4096  ', cfft, L*8)
run('f32 rfft 4096x4096 ', lambda re, im: jnp.abs(jnp.fft.rfft((re+im).reshape(4096, 4096), axis=-1)), L*4)
