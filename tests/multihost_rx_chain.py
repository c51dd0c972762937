"""Multi-host worker: run the sharded RxChain across 2 processes.

Each process owns 4 fake CPU devices; the global mesh is
('channel' = 2 hosts) x ('time' = 4 devices) — channels span hosts (DCN
analog: collectives ride gRPC between processes), time shards exchange
halos within a host, exactly the axis layout prescribed in parallel/mesh.py.

Each process verifies its ADDRESSABLE shards of the global output against a
redundantly-computed single-device reference and prints PASS/FAIL.

Launched by tests/test_multihost.py; also runnable by hand:
    python tests/multihost_rx_chain.py <process_id> <port>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pid = int(sys.argv[1])
    port = sys.argv[2] if len(sys.argv) > 2 else "29712"
    layout = sys.argv[3] if len(sys.argv) > 3 else "channel_across_hosts"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from solid_dsp_tpu import parallel
    from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain

    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    # fused_ddc off: single-chip reference must match the (unfused)
    # sharded algorithm bit-for-bit for the tight parity assert below.
    cfg = RxChainConfig(dtype=jnp.complex64, nco_mode="exact",
                        agc_mode="block", demod="fm", fused_ddc="off")
    if layout == "channel_across_hosts":
        # device rows = channel: each host holds one channel shard; halos
        # (time axis) stay within a host
        mesh = parallel.make_mesh(channel=2, time=4)
    else:
        # device columns = time: the 2 time shards sit on DIFFERENT hosts,
        # so every overlap-save halo ppermute crosses processes (DCN path)
        mesh = parallel.make_mesh(channel=4, time=2)
    C, L = 4, 2048
    rng = np.random.default_rng(0)
    k = np.arange(L)
    x_host = np.stack([
        (0.1 * np.exp(2j * np.pi * (0.2 / (2 * np.pi) + 0.001) * k)
         + 0.01 * (rng.standard_normal(L) + 1j * rng.standard_normal(L)))
        for _ in range(C)
    ]).astype(np.complex64)

    init, apply = parallel.make_sharded_rx_chain(cfg, mesh)
    state = init(C)
    sh2 = NamedSharding(mesh, P("channel", "time"))
    x = jax.make_array_from_callback(
        (C, L), sh2, lambda idx: x_host[idx]
    )
    # replicate the state pytree across the global mesh
    state = jax.device_put(state, NamedSharding(mesh, P()))

    out, new_state = apply(state, x)
    jax.block_until_ready(out)

    # redundant single-device reference (identical on every process)
    init1, apply1 = make_rx_chain(cfg)
    ref_outs, ref_state0 = [], None
    for c in range(C):
        out_c, st_c = apply1(init1(), jnp.asarray(x_host[c]))
        ref_outs.append(np.asarray(out_c))
        if c == 0:
            ref_state0 = st_c
    ref = np.stack(ref_outs)

    ok = True
    n_checked = 0
    for shard in out.addressable_shards:
        got = np.asarray(shard.data)
        want = ref[shard.index]
        if not np.allclose(got, want, rtol=1e-5, atol=1e-6):
            ok = False
        n_checked += 1
    # the carried NCO phase word must also agree globally
    theta = int(np.asarray(new_state.nco_theta.addressable_shards[0].data))
    ref_theta = int(np.asarray(ref_state0.nco_theta))
    if theta != ref_theta:
        ok = False

    # --- config-5 across hosts: sharded channelizer (TP psum over DCN
    # when channel spans processes; time halos over DCN otherwise) ---
    from solid_dsp_tpu.models.channelizer import (
        channelizer_apply, channelizer_init, channelizer_taps)
    from solid_dsp_tpu.parallel.sharded import make_sharded_channelizer

    M, K2 = 16, 8
    Lc = M * 16 * mesh.shape["time"]
    xc_host = (0.1 * (rng.standard_normal(Lc)
                      + 1j * rng.standard_normal(Lc))).astype(np.complex64)
    init_c, ch_apply = make_sharded_channelizer(M, K2, mesh=mesh)
    tail0 = init_c()
    sh_t = NamedSharding(mesh, P("time"))
    xc = jax.make_array_from_callback((Lc,), sh_t,
                                      lambda idx: xc_host[idx])
    tail_g = jax.device_put(tail0, NamedSharding(mesh, P()))
    Yc, _tail = ch_apply(tail_g, xc)
    jax.block_until_ready(Yc)

    taps_c = np.asarray(channelizer_taps(M, K2), np.complex64)
    Y_ref, _ = channelizer_apply(
        jnp.asarray(taps_c), channelizer_init(M, K2, jnp.complex64),
        jnp.asarray(xc_host), M)
    Y_ref = np.asarray(Y_ref)
    for shard in Yc.addressable_shards:
        got = np.asarray(shard.data)
        want = Y_ref[shard.index]
        if not np.allclose(got, want, rtol=1e-4, atol=1e-4):
            ok = False
        n_checked += 1

    print(f"[p{pid}] {layout}: {'PASS' if ok else 'FAIL'} "
          f"({n_checked} addressable shards checked)", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
