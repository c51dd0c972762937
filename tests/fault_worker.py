"""Crash-injection worker for tests/test_fault.py.

Processes NBLOCKS chain blocks with periodic checkpoints; if the file named
by CRASH_FLAG exists, deletes it and hard-exits at CRASH_AT — simulating a
mid-stream failure.  On relaunch it resumes from the newest checkpoint.
Writes each processed block's demod output to OUT_DIR/block_<i>.npy so the
test can verify the resumed stream is bit-identical to an uninterrupted
run.

Usage: python fault_worker.py <out_dir> <crash_flag_path>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")


def main() -> int:
    out_dir, crash_flag = sys.argv[1], sys.argv[2]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain
    from solid_dsp_tpu.parallel.fault import CheckpointManager

    NBLOCKS, B, CRASH_AT = 8, 1024, 4
    cfg = RxChainConfig(dtype=jnp.complex128, agc_mode="parallel",
                        demod="fm")
    init, apply = make_rx_chain(cfg)
    cm = CheckpointManager(os.path.join(out_dir, "ckpts"))

    state, start = cm.latest(like=init())
    if state is None:
        state = init()

    rng = np.random.default_rng(123)
    blocks = (0.1 * (rng.standard_normal((NBLOCKS, B))
                     + 1j * rng.standard_normal((NBLOCKS, B))))

    for i in range(start, NBLOCKS):
        if i == CRASH_AT and os.path.exists(crash_flag):
            os.remove(crash_flag)
            os._exit(17)  # simulated hard crash (no cleanup, no checkpoint)
        out, state = apply(state, jnp.asarray(blocks[i]))
        np.save(os.path.join(out_dir, f"block_{i}.npy"), np.asarray(out))
        cm.save(state, i)
    return 0


if __name__ == "__main__":
    sys.exit(main())
