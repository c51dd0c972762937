"""ChainState — the explicit streaming-state pytree.

The reference holds streaming state in mutable objects (Window contents,
NCO (theta, delta_theta) nco/mod.rs:27-33, AGC (gain, energy, lock, squelch)
auto_gain_control/mod.rs:96-108, decimator counters fir/decim.rs:8).  Here all
of it lives in one explicit pytree so that it is simultaneously:

* the ``lax.scan`` carry for block streaming,
* the halo payload exchanged between neighbor devices (``parallel.halo``),
* the checkpoint format (``save`` / ``load``).
"""

from __future__ import annotations

import os
from typing import Any, Iterator, Mapping

import jax
import numpy as np


def treedef_bytes(treedef) -> np.ndarray:
    """Serialize a treedef repr as a uint8 array (shared by all
    checkpoint writers — single-device, rotating, and distributed)."""
    return np.frombuffer(str(treedef).encode(), dtype=np.uint8)


def atomic_savez(path: str, **data) -> str:
    """np.savez with crash-safety: write a dot-prefixed temp file in the
    same directory, then os.replace.  The temp name never matches the
    ``*.npz`` recovery globs, so a crash mid-write can neither brick
    recovery nor rotate away a good checkpoint.  Returns the final path
    (with .npz appended if missing, matching np.savez behavior)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    d = os.path.dirname(path) or "."
    tmp = os.path.join(d, ".tmp_" + os.path.basename(path))
    np.savez(tmp, **data)
    os.replace(tmp, path)
    return path


@jax.tree_util.register_pytree_node_class
class ChainState(Mapping):
    """An immutable string-keyed pytree of per-component states.

    Keys are component names (e.g. ``"fir0"``, ``"nco"``, ``"agc"``); values
    are arbitrary pytrees (tap tails, phase words, gain scalars, ...).
    """

    def __init__(self, **components: Any):
        self._d = dict(components)

    # Mapping interface -------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self._d[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._d)

    def __len__(self) -> int:
        return len(self._d)

    def __getattr__(self, key: str) -> Any:
        try:
            return self.__dict__["_d"][key]
        except KeyError:
            raise AttributeError(key) from None

    def replace(self, **updates: Any) -> "ChainState":
        d = dict(self._d)
        d.update(updates)
        return ChainState(**d)

    def __repr__(self) -> str:  # debug repr, in the spirit of the
        # reference's fmt::Display impls (e.g. nco/mod.rs:195-203)
        parts = ", ".join(
            f"{k}={jax.tree_util.tree_map(lambda a: getattr(a, 'shape', a), v)}"
            for k, v in self._d.items()
        )
        return f"ChainState({parts})"

    # pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        keys = sorted(self._d)
        return tuple(self._d[k] for k in keys), tuple(keys)

    @classmethod
    def tree_unflatten(cls, keys, values):
        return cls(**dict(zip(keys, values)))

    # checkpoint ----------------------------------------------------------
    CHECKPOINT_VERSION = 1

    def save(self, path: str) -> None:
        """Serialize every leaf to an .npz checkpoint (versioned, atomic)."""
        leaves, treedef = jax.tree_util.tree_flatten(self)
        atomic_savez(
            path,
            __version__=np.asarray(self.CHECKPOINT_VERSION),
            __treedef__=treedef_bytes(treedef),
            **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
        )

    @classmethod
    def load(cls, path: str, like: "ChainState") -> "ChainState":
        """Restore a checkpoint, validating it against ``like``.

        The saved treedef, leaf count, and per-leaf shapes/dtypes must all
        match ``like``'s structure; any drift (renamed components, changed
        filter orders, different chain config) fails with a clear message
        instead of silently mis-assigning leaves.
        """
        data = np.load(path)
        version = int(data["__version__"]) if "__version__" in data else 0
        if version > cls.CHECKPOINT_VERSION:
            raise ValueError(
                f"checkpoint {path!r} has version {version}, newer than "
                f"this build's {cls.CHECKPOINT_VERSION}"
            )
        saved_treedef = bytes(data["__treedef__"]).decode()
        like_leaves, like_treedef = jax.tree_util.tree_flatten(like)
        if saved_treedef != str(like_treedef):
            raise ValueError(
                "checkpoint structure mismatch:\n"
                f"  saved:    {saved_treedef}\n"
                f"  expected: {like_treedef}"
            )
        n_meta = sum(k in data for k in ("__version__", "__treedef__"))
        n_leaves = len(data.files) - n_meta
        if n_leaves != len(like_leaves):
            raise ValueError(
                f"checkpoint has {n_leaves} leaves, expected "
                f"{len(like_leaves)}"
            )
        leaves = []
        for i, want in enumerate(like_leaves):
            got = data[f"leaf_{i}"]
            want_shape = tuple(np.shape(want))
            want_dtype = np.asarray(want).dtype
            if tuple(got.shape) != want_shape:
                raise ValueError(
                    f"checkpoint leaf {i}: shape {tuple(got.shape)} != "
                    f"expected {want_shape}"
                )
            if got.dtype != want_dtype:
                raise ValueError(
                    f"checkpoint leaf {i}: dtype {got.dtype} != expected "
                    f"{want_dtype}"
                )
            leaves.append(got)
        return jax.tree_util.tree_unflatten(like_treedef, leaves)
