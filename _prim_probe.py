import jax, jax.numpy as jnp, numpy as np
from solid_dsp_tpu.utils.benchtime import measure_step

L = 1 << 22
re = jnp.asarray(np.random.default_rng(0).standard_normal(L).astype(np.float32))
im = jnp.asarray(np.random.default_rng(1).standard_normal(L).astype(np.float32))

def mk(f):
    @jax.jit
    def g(chk, re, im):
        r = f(re + 0.0 * chk, im)
        return jnp.sum(r)
    def step(chk):
        c = g(chk, re, im)
        return c, c
    return step

def run(tag, f, work_bytes):
    t = measure_step(mk(f), jnp.zeros(()), ks=(2, 8, 14), reps=1, warmup=2)["t_iter"]
    print(f"{tag}: {L/t/1e9:.2f} Gelem/s  ({work_bytes/t/1e9:.1f} GB/s)", flush=True)

# pure f32 elementwise (control)
run('f32 mul+sum        ', lambda re, im: re * im, L*8)
# complex build + elementwise mul
run('c64 mul            ', lambda re, im: jnp.abs(jax.lax.complex(re, im) * jax.lax.complex(im, re)), L*16)
# complex exp/rotate (NCO mix shape)
run('c64 rotate (sincos)', lambda re, im: jnp.abs(jax.lax.complex(re, im) * jax.lax.complex(jnp.cos(im), jnp.sin(im))), L*16)
# pow2 c64 FFT, batched 1024x4096
def cfft(re, im):
    z = jax.lax.complex(re, im).reshape(1024, 4096)
    return jnp.abs(jnp.fft.fft(z, axis=-1))
run('c64 fft 4096 batch ', cfft, L*8)
# rfft f32
run('f32 rfft 4096 batch', lambda re, im: jnp.abs(jnp.fft.rfft((re+im).reshape(1024, 4096), axis=-1)), L*4)
