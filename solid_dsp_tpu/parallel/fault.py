"""Failure detection and elastic recovery for streaming chains.

SURVEY §5: the reference has no fault handling at all; a production
streaming framework needs two pieces, both host-side (the jitted compute
path stays error-free):

* ``CheckpointManager`` — atomic, rotating ChainState checkpoints tagged
  with the stream position.  Writes go to a temp file then ``os.replace``
  so a crash mid-write can never corrupt the newest good checkpoint.
* ``run_supervised`` — gang-restart supervision for an SPMD worker set:
  if ANY worker dies, the whole set is torn down and relaunched (the
  standard elastic-SPMD model — jax.distributed meshes cannot lose a
  member), and workers resume from the newest shared checkpoint.

The crash-resume path is validated by tests/test_fault.py: a worker killed
mid-stream resumes bit-identically from its checkpoint.
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import time

from ..streaming.state import ChainState

__all__ = [
    "CheckpointManager", "run_supervised", "SupervisorError",
    "save_distributed", "load_distributed", "latest_distributed_step",
]


class SupervisorError(RuntimeError):
    pass


class CheckpointManager:
    """Atomic rotating checkpoints of (ChainState, stream position)."""

    def __init__(self, directory: str, keep: int = 2):
        self.directory = directory
        self.keep = max(1, int(keep))
        os.makedirs(directory, exist_ok=True)

    def _path(self, block_idx: int) -> str:
        return os.path.join(self.directory, f"ckpt_{block_idx:012d}.npz")

    _NAME_RE = re.compile(r"^ckpt_(\d{12})\.npz$")

    def save(self, state: ChainState, block_idx: int) -> str:
        """Atomically write the checkpoint for ``block_idx`` and prune.

        ChainState.save goes through atomic_savez (dot-prefixed temp +
        os.replace), so a crash mid-write leaves only a temp file that the
        recovery glob/regex never matches.
        """
        path = self._path(block_idx)
        state.save(path)
        self._prune()
        return path

    def _ckpts(self):
        out = []
        for f in glob.glob(os.path.join(self.directory, "ckpt_*.npz")):
            m = self._NAME_RE.match(os.path.basename(f))
            if m:  # strict name check: never parse stray/temp files
                out.append((int(m.group(1)), f))
        return sorted(out)

    def _prune(self) -> None:
        for _, old in self._ckpts()[: -self.keep]:
            try:
                os.remove(old)
            except OSError:
                pass
        # clear any crash-leftover temp files too
        for stray in glob.glob(os.path.join(self.directory,
                                            ".tmp_ckpt_*.npz")):
            try:
                os.remove(stray)
            except OSError:
                pass

    def latest(self, like: ChainState):
        """Return (state, next_block_idx); (None, 0) when no checkpoint.

        A checkpoint that fails validation (structure drift, torn file) is
        skipped and the next-newest is tried — a bad checkpoint must not
        take down recovery.
        """
        for idx, path in reversed(self._ckpts()):
            try:
                state = ChainState.load(path, like=like)
            except Exception:
                continue
            return state, idx + 1
        return None, 0


def save_distributed(state, directory: str, step: int) -> str:
    """Per-process sharded checkpoint (orbax-style layout, zero gathers).

    Each process writes ONLY its addressable shards, keyed by device id —
    no cross-host gather, no device->host transfer of remote data.  Every
    process must call this (collective-free but symmetric).
    """
    import jax
    import numpy as np

    from ..streaming.state import ChainState, atomic_savez, treedef_bytes

    os.makedirs(directory, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    data = {
        "__version__": np.asarray(ChainState.CHECKPOINT_VERSION),
        "__treedef__": treedef_bytes(treedef),
    }
    for i, leaf in enumerate(leaves):
        arr = jax.numpy.asarray(leaf)
        for s in arr.addressable_shards:
            data[f"leaf{i}_dev{s.device.id}"] = np.asarray(s.data)
    path = os.path.join(
        directory,
        f"step_{step:012d}_proc{jax.process_index()}.npz")
    return atomic_savez(path, **data)


def load_distributed(directory: str, step: int, like):
    """Restore this process's shards of a distributed checkpoint.

    ``like`` supplies the global shapes and shardings (e.g. the output of
    one warm-up/init step on the live mesh).  Reassembles global arrays
    with ``jax.make_array_from_single_device_arrays``.
    """
    import jax
    import numpy as np

    from ..streaming.state import ChainState

    path = os.path.join(
        directory,
        f"step_{step:012d}_proc{jax.process_index()}.npz")
    data = np.load(path)
    version = int(data["__version__"]) if "__version__" in data else 0
    if version > ChainState.CHECKPOINT_VERSION:
        raise ValueError(
            f"distributed checkpoint {path!r} has version {version}, newer "
            f"than this build's {ChainState.CHECKPOINT_VERSION}")
    leaves, treedef = jax.tree_util.tree_flatten(like)
    if bytes(data["__treedef__"]).decode() != str(treedef):
        raise ValueError("distributed checkpoint structure mismatch")
    out = []
    for i, leaf in enumerate(leaves):
        arr = jax.numpy.asarray(leaf)
        singles = [
            jax.device_put(data[f"leaf{i}_dev{s.device.id}"], s.device)
            for s in arr.addressable_shards
        ]
        out.append(jax.make_array_from_single_device_arrays(
            arr.shape, arr.sharding, singles))
    return jax.tree_util.tree_unflatten(treedef, out)


def latest_distributed_step(directory: str) -> int:
    """Newest step for which EVERY process file set exists; -1 if none.

    A crash between the two processes' save() calls leaves a torn step —
    only steps with all per-process files are recoverable, so callers need
    the minimum over processes.  Cheap host-side glob; call on any process.
    """
    import jax

    n = jax.process_count()
    name_re = re.compile(r"^step_(\d+)_proc(\d+)\.npz$")
    steps: dict = {}
    for f in glob.glob(os.path.join(directory, "step_*_proc*.npz")):
        m = name_re.match(os.path.basename(f))
        if not m:  # strict: stray/temp files must not count as a save
            continue
        steps.setdefault(int(m.group(1)), set()).add(int(m.group(2)))
    good = [s for s, procs in steps.items() if len(procs) == n]
    return max(good) if good else -1


def run_supervised(spawn, num_workers: int, max_restarts: int = 3,
                   poll_interval: float = 0.2, timeout: float = 600.0):
    """Run an SPMD worker gang with death detection and gang restart.

    ``spawn(worker_id, attempt) -> subprocess.Popen`` launches one worker.
    If any worker exits nonzero, the remaining workers are terminated and
    the whole gang relaunched (workers are responsible for resuming from
    their CheckpointManager).  Returns the list of final return codes once
    every worker exits 0.  Raises SupervisorError after ``max_restarts``
    failed attempts or on timeout.
    """
    deadline = time.monotonic() + timeout
    for attempt in range(max_restarts + 1):
        procs = [spawn(i, attempt) for i in range(num_workers)]
        failed = False
        while True:
            if time.monotonic() > deadline:
                for p in procs:
                    p.kill()
                raise SupervisorError("supervision timeout")
            codes = [p.poll() for p in procs]
            if any(c is not None and c != 0 for c in codes):
                failed = True  # death detected: tear down the gang
                for p in procs:
                    if p.poll() is None:
                        p.terminate()
                for p in procs:
                    try:
                        p.wait(timeout=10)
                    except subprocess.TimeoutExpired:
                        p.kill()
                break
            if all(c == 0 for c in codes):
                return codes
            time.sleep(poll_interval)
        # the poll loop only exits via return (all zero), raise (timeout),
        # or break with failed=True -> restart the gang
    raise SupervisorError(
        f"worker gang failed after {max_restarts + 1} attempts")
