"""Distributed crash-recovery worker: 2-process sharded chain with
per-process shard checkpoints and injected failure.

Each process owns 4 fake CPU devices of a ('channel'=2 across processes,
'time'=4 within) mesh and streams NCHUNKS blocks through the sharded
RxChain.  After every chunk it writes ONLY its addressable state shards
(fault.save_distributed).  If CRASH_FLAG exists, process 1 hard-exits at
chunk 2 — the supervisor gang-restarts both processes, which resume from
the newest COMPLETE (all-process) checkpoint step.  Every chunk's output
shards are verified against a locally recomputed single-chip reference, so
a resume that loses or corrupts state fails loudly.

Usage: python fault_worker_dist.py <pid> <port> <out_dir> <crash_flag>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_dir = sys.argv[3]
    crash_flag = sys.argv[4]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from solid_dsp_tpu import parallel
    from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain
    from solid_dsp_tpu.parallel import fault

    NCHUNKS, B, CRASH_AT = 4, 1024, 2
    C = 2
    # fused_ddc off: the sharded chain is the unfused algorithm, and this
    # test verifies sharding/checkpointing at 1e-9 — which needs the
    # single-chip reference to be the SAME algorithm bit-for-bit.
    cfg = RxChainConfig(dtype=jnp.complex128, nco_mode="exact",
                        agc_mode="block", demod="fm", fused_ddc="off")
    mesh = parallel.make_mesh(channel=2, time=4)
    init_s, apply_s = parallel.make_sharded_rx_chain(cfg, mesh)

    rng = np.random.default_rng(77)
    x_all = (0.1 * (rng.standard_normal((C, NCHUNKS * B))
                    + 1j * rng.standard_normal((C, NCHUNKS * B))))

    sh2 = NamedSharding(mesh, P("channel", "time"))

    def dist(arr):
        # identical host data on every process -> global array by index
        return jax.make_array_from_callback(arr.shape, sh2,
                                            lambda idx, a=arr: a[idx])

    def fresh_state():
        return jax.device_put(init_s(C), NamedSharding(mesh, P()))

    # template state with live shardings: one apply on a zero block
    zero = dist(np.zeros((C, B), dtype=np.complex128))
    _out, tmpl = apply_s(fresh_state(), zero)

    ckdir = os.path.join(out_dir, "dckpts")
    os.makedirs(ckdir, exist_ok=True)
    step = fault.latest_distributed_step(ckdir)
    if step >= 0:
        state = fault.load_distributed(ckdir, step, like=tmpl)
        start = step + 1
        print(f"proc{pid}: resumed at chunk {start}", flush=True)
    else:
        state = fresh_state()
        start = 0
        print(f"proc{pid}: cold start", flush=True)

    # single-chip reference, replayed deterministically from chunk 0
    init1, apply1 = make_rx_chain(cfg)
    ref_states = [init1() for _ in range(C)]
    ref_outs = []
    for i in range(NCHUNKS):
        outs = []
        for c in range(C):
            o, ref_states[c] = apply1(ref_states[c],
                                      jnp.asarray(x_all[c, i * B:(i + 1) * B]))
            outs.append(np.asarray(o))
        ref_outs.append(np.stack(outs))

    for i in range(start, NCHUNKS):
        if pid == 1 and i == CRASH_AT and os.path.exists(crash_flag):
            os.remove(crash_flag)
            print("proc1: simulated crash", flush=True)
            os._exit(21)
        out, state = apply_s(state, dist(x_all[:, i * B:(i + 1) * B].copy()))
        # verify my addressable output shards against the reference
        for shard in out.addressable_shards:
            got = np.asarray(shard.data)
            want = ref_outs[i][shard.index]
            np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11,
                                       err_msg=f"chunk {i}")
        fault.save_distributed(state, ckdir, i)

    with open(os.path.join(out_dir, f"PASS_proc{pid}"), "w") as f:
        f.write("ok")
    print(f"proc{pid}: PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
