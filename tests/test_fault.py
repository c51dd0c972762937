"""Failure-detection / elastic-recovery tests (SURVEY §5).

A worker is killed mid-stream (simulated hard crash), the supervisor
detects the death and relaunches, and the resumed stream must be
bit-identical to an uninterrupted run.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from solid_dsp_tpu.parallel.fault import (
    CheckpointManager, SupervisorError, run_supervised)
from solid_dsp_tpu.streaming.state import ChainState

WORKER = os.path.join(os.path.dirname(__file__), "fault_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(WORKER)))


def _run_worker_gang(out_dir, crash: bool):
    crash_flag = os.path.join(out_dir, "crash_once")
    if crash:
        open(crash_flag, "w").close()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    def spawn(worker_id, attempt):
        return subprocess.Popen(
            [sys.executable, WORKER, out_dir, crash_flag],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

    return run_supervised(spawn, num_workers=1, max_restarts=2,
                          timeout=300.0)


@pytest.mark.slow
def test_crash_resume_bit_identical(tmp_path):
    clean = str(tmp_path / "clean")
    crashed = str(tmp_path / "crashed")
    os.makedirs(clean)
    os.makedirs(crashed)

    assert _run_worker_gang(clean, crash=False) == [0]
    # the crashing gang needs one restart; supervisor must report success
    assert _run_worker_gang(crashed, crash=True) == [0]

    for i in range(8):
        a = np.load(os.path.join(clean, f"block_{i}.npy"))
        b = np.load(os.path.join(crashed, f"block_{i}.npy"))
        np.testing.assert_array_equal(a, b, err_msg=f"block {i}")


def test_checkpoint_manager_rotation_and_atomicity(tmp_path):
    import jax.numpy as jnp

    cm = CheckpointManager(str(tmp_path), keep=2)
    st = ChainState(x=jnp.arange(4.0), g={"v": jnp.asarray(1.5)})
    for i in range(5):
        cm.save(st.replace(x=jnp.arange(4.0) + i), i)
    import glob

    files = sorted(glob.glob(str(tmp_path / "ckpt_*.npz")))
    assert len(files) == 2  # pruned to keep=2
    got, nxt = cm.latest(like=st)
    assert nxt == 5
    np.testing.assert_array_equal(np.asarray(got.x), np.arange(4.0) + 4)


def test_checkpoint_manager_skips_corrupt_latest(tmp_path):
    import jax.numpy as jnp

    cm = CheckpointManager(str(tmp_path), keep=3)
    st = ChainState(x=jnp.arange(3.0))
    cm.save(st, 0)
    cm.save(st.replace(x=jnp.arange(3.0) * 2), 1)
    # corrupt the newest checkpoint (torn write after rename — worst case)
    newest = sorted(os.listdir(tmp_path))[-1]
    with open(os.path.join(tmp_path, newest), "wb") as f:
        f.write(b"garbage")
    got, nxt = cm.latest(like=st)
    assert nxt == 1  # fell back to the older good checkpoint
    np.testing.assert_array_equal(np.asarray(got.x), np.arange(3.0))


def test_supervisor_gives_up_after_max_restarts(tmp_path):
    def spawn(worker_id, attempt):
        return subprocess.Popen([sys.executable, "-c", "import sys; sys.exit(3)"],
                                stdout=subprocess.PIPE, text=True)

    with pytest.raises(SupervisorError, match="failed after"):
        run_supervised(spawn, num_workers=1, max_restarts=1, timeout=60.0)


DIST_WORKER = os.path.join(os.path.dirname(__file__), "fault_worker_dist.py")


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_distributed_crash_gang_restart(tmp_path):
    """Kill one process of a 2-process jax.distributed mesh mid-stream;
    the supervisor gang-restarts both, which resume from the newest
    COMPLETE per-process shard checkpoint; every chunk's sharded output is
    verified in-worker against a single-chip reference."""
    out_dir = str(tmp_path)
    crash_flag = os.path.join(out_dir, "crash_once")
    open(crash_flag, "w").close()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    logs = []

    def spawn(worker_id, attempt):
        port = str(_free_port()) if worker_id == 0 else spawn.port
        if worker_id == 0:
            spawn.port = port
        p = subprocess.Popen(
            [sys.executable, DIST_WORKER, str(worker_id), spawn.port,
             out_dir, crash_flag],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        logs.append(p)
        return p

    codes = run_supervised(spawn, num_workers=2, max_restarts=2,
                           timeout=480.0)
    assert codes == [0, 0], [p.stdout.read() for p in logs if p.stdout]
    assert os.path.exists(os.path.join(out_dir, "PASS_proc0"))
    assert os.path.exists(os.path.join(out_dir, "PASS_proc1"))
    # the crash actually happened (flag consumed) and a restart occurred
    assert not os.path.exists(crash_flag)
    assert len(logs) == 4  # 2 workers x 2 attempts


def test_checkpoint_tmp_files_never_poison_recovery(tmp_path):
    """Code-review r2 finding: a crash mid-write leaves only a dot-prefixed
    temp that recovery globs/regexes never match, and prune clears it."""
    import glob

    import jax.numpy as jnp

    cm = CheckpointManager(str(tmp_path), keep=2)
    st = ChainState(x=jnp.arange(3.0))
    cm.save(st, 0)
    # simulate a crash mid-write of checkpoint 1: temp file left behind
    stray = os.path.join(str(tmp_path), ".tmp_ckpt_000000000001.npz")
    with open(stray, "wb") as f:
        f.write(b"torn")
    got, nxt = cm.latest(like=st)
    assert nxt == 1  # temp ignored; real ckpt 0 recovered
    # a subsequent save prunes the stray temp
    cm.save(st, 1)
    assert not glob.glob(os.path.join(str(tmp_path), ".tmp_*"))


def test_latest_distributed_step_ignores_temp_and_foreign_files(tmp_path):
    from solid_dsp_tpu.parallel.fault import latest_distributed_step

    d = str(tmp_path)
    # complete step 3 for the single process of this (non-distributed) test
    open(os.path.join(d, "step_000000000003_proc0.npz"), "wb").close()
    # torn step 5: only a leftover temp
    open(os.path.join(d, ".tmp_step_000000000005_proc0.npz"), "wb").close()
    # foreign name that sloppy parsing would have counted
    open(os.path.join(d, "step_000000000004_proc0.npz.bak"), "wb").close()
    assert latest_distributed_step(d) == 3


def test_qam_rejects_non_pow4_orders():
    from solid_dsp_tpu.models import linear_mod as lm

    with pytest.raises(ValueError):
        lm.qam_constellation(36)
    with pytest.raises(ValueError):
        lm.qam_constellation(100)


def test_stream_scan_ci16_ingest(tmp_path):
    """Code-review r2 finding: stream scan must handle (T, 2) int16."""
    import jax.numpy as jnp
    import numpy as np

    from solid_dsp_tpu.models.rx_chain import (
        RxChain, RxChainConfig, make_rx_chain_stream)

    rng = np.random.default_rng(61)
    B, NB = 1024, 3
    raw = rng.integers(-20000, 20000, size=(B * NB, 2), dtype=np.int16)
    cfg = RxChainConfig(dtype=jnp.complex128, agc_mode="block", demod="fm",
                        input_format="ci16")
    init, stream = make_rx_chain_stream(cfg, B)
    y_stream, _ = stream(init(), jnp.asarray(raw))

    chain = RxChain(cfg)
    y_blocks = np.concatenate(
        [np.asarray(chain.execute_block(raw[i * B:(i + 1) * B]))
         for i in range(NB)])
    np.testing.assert_allclose(np.asarray(y_stream), y_blocks, atol=1e-12)
