"""Finer isolation of the pallas compile crash (one variant per run)."""
import json, sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096; TF = 16; F = 64

def run(tag, kernel, out_minor=N, in_block=None):
    x = np.random.default_rng(0).standard_normal((2, F, N)).astype(np.float32)
    b = np.random.default_rng(1).standard_normal((128, 128)).astype(np.float32)
    try:
        call = pl.pallas_call(
            kernel, grid=(F // TF,),
            in_specs=[pl.BlockSpec(in_block or (2, TF, N), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((128, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TF, out_minor), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, out_minor), jnp.float32),
        )
        y = jax.jit(call)(jax.device_put(x), jax.device_put(b))
        jax.block_until_ready(y)
        print(json.dumps({"variant": tag, "ok": True}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": tag, "err": str(e)[:120]}), flush=True)

def k_copy(x_ref, b_ref, o_ref):
    o_ref[:] = x_ref[0]

def k_reshape(x_ref, b_ref, o_ref):
    a = x_ref[0].reshape(TF * 32, 128)
    o_ref[:] = a.reshape(TF, N)

def k_dot128(x_ref, b_ref, o_ref):
    a = x_ref[0].reshape(TF * 32, 128)
    d = jnp.dot(a.astype(jnp.bfloat16), b_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    o_ref[:] = d.reshape(TF, N)

def k_dot128_f32(x_ref, b_ref, o_ref):
    a = x_ref[0].reshape(TF * 32, 128)
    d = jnp.dot(a, b_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = d.reshape(TF, N)

VAR = {"copy": k_copy, "reshape": k_reshape, "dot128": k_dot128,
       "dot128f": k_dot128_f32}

if __name__ == "__main__":
    for tag in (sys.argv[1:] or list(VAR)):
        run(tag, VAR[tag])
