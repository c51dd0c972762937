"""Round 3: swapaxes + lane-concat + restructured K=128 kernel."""
import json, sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096; N1 = N2 = 64; TF = 16; F = 64

def run(tag, kernel, bshape=(128, 128)):
    x = np.random.default_rng(0).standard_normal((2, F, N)).astype(np.float32)
    b = np.random.default_rng(1).standard_normal(bshape).astype(np.float32)
    try:
        call = pl.pallas_call(
            kernel, grid=(F // TF,),
            in_specs=[pl.BlockSpec((2, TF, N), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(bshape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TF, 2 * N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, 2 * N), jnp.float32),
        )
        y = jax.jit(call)(jax.device_put(x), jax.device_put(b))
        jax.block_until_ready(y)
        print(json.dumps({"variant": tag, "ok": True}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": tag, "err": str(e)[:120]}), flush=True)

def k_swap(x_ref, b_ref, o_ref):
    xr3 = jnp.swapaxes(x_ref[0].reshape(TF, N1, N2), 1, 2)
    xi3 = jnp.swapaxes(x_ref[1].reshape(TF, N1, N2), 1, 2)
    o_ref[:] = jnp.concatenate(
        [xr3.reshape(TF, N), xi3.reshape(TF, N)], axis=1)

def k_cat(x_ref, b_ref, o_ref):
    a = jnp.concatenate([x_ref[0].reshape(TF * N1, N2),
                         x_ref[1].reshape(TF * N1, N2)], axis=1)
    d = jnp.dot(a.astype(jnp.bfloat16), b_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    o_ref[:] = d.reshape(TF, 2 * N)

def k_full(x_ref, b_ref, o_ref):
    # restructured stage-pair: T1, fused-plane K=128 dot, T-out
    xr3 = jnp.swapaxes(x_ref[0].reshape(TF, N1, N2), 1, 2)
    xi3 = jnp.swapaxes(x_ref[1].reshape(TF, N1, N2), 1, 2)
    a = jnp.concatenate([xr3.reshape(TF * N2, N1),
                         xi3.reshape(TF * N2, N1)], axis=1)
    d = jnp.dot(a.astype(jnp.bfloat16), b_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)   # (TF*N2, 128)
    dr = d[:, :N1].reshape(TF, N2, N1)
    di = d[:, N1:].reshape(TF, N2, N1)
    dr = jnp.swapaxes(dr, 1, 2).reshape(TF, N)
    di = jnp.swapaxes(di, 1, 2).reshape(TF, N)
    o_ref[:] = jnp.concatenate([dr, di], axis=1)

VAR = {"swap": k_swap, "cat": k_cat, "full": k_full}
if __name__ == "__main__":
    for tag in (sys.argv[1:] or list(VAR)):
        run(tag, VAR[tag])
