"""On-chip probe: matmul 4-step DFT vs jnp.fft for batched frames.

Prints one JSON line per (n, impl) with Gs/s (complex samples/s) over a
fixed ~8M-sample batch.  Used to set the auto-routing policy in ops.fft
(which backend per size) — see PERF_NOTES.md for why FFT lowering is
weak on this backend.

Usage: python tools/bench_matfft.py [sizes...] [--smoke]
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from solid_dsp_tpu.ops.matfft import dft_mx_planar  # noqa: E402
from solid_dsp_tpu.utils.benchtime import measure_step  # noqa: E402
from solid_dsp_tpu.utils.transfer import put_complex  # noqa: E402

SMOKE = "--smoke" in sys.argv
TOTAL = 1 << (18 if SMOKE else 23)  # complex samples per iteration
KS = (1, 2, 3) if SMOKE else (2, 6, 10)


def _planar_step(fn, pr, pi):
    """Chained planar step: checksum feeds the next input (see
    bench_all._stateless_step for why the dependency chain matters)."""
    @jax.jit
    def g(chk, pr, pi):
        re, im = fn(pr + (0.0 * chk), pi)
        return jnp.sum(jnp.abs(re)) + jnp.sum(jnp.abs(im))

    def step(chk):
        c2 = g(chk, pr, pi)
        return c2, c2

    return step


def _complex_step(fn, x):
    @jax.jit
    def g(chk, x):
        y = fn(x + (0.0 * chk).astype(x.dtype))
        return jnp.sum(jnp.abs(y))

    def step(chk):
        c2 = g(chk, x)
        return c2, c2

    return step


def bench(n):
    b = max(TOTAL // n, 1)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
         ).astype(np.complex64)
    xd = put_complex(x)
    pr = jnp.real(xd)
    pi = jnp.imag(xd)
    jax.block_until_ready((pr, pi))

    cases = [
        ("jnp_fft", _complex_step(lambda v: jnp.fft.fft(v, axis=-1), xd)),
        ("matfft_x3",
         _planar_step(lambda r, i: dft_mx_planar(r, i, -1, "x3"), pr, pi)),
        ("matfft_highest",
         _planar_step(lambda r, i: dft_mx_planar(r, i, -1, "highest"),
                      pr, pi)),
    ]
    z = jnp.zeros((), jnp.float32)
    for name, step in cases:
        try:
            r = measure_step(step, z, ks=KS)
            print(json.dumps({"n": n, "batch": b, "impl": name,
                              "gsps": round(b * n / r["t_iter"] / 1e9, 2)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"n": n, "batch": b, "impl": name,
                              "error": str(e)[:160]}), flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sizes = ([int(a) for a in args] if args else
             [256, 1024, 4096, 8192, 16384, 65536, 1000, 4000, 12288])
    for n in sizes:
        bench(n)


if __name__ == "__main__":
    main()
