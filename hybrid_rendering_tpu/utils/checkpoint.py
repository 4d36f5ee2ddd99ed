"""Checkpoint / resume for renderer state.

The reference has NO persistence (SURVEY §5: temporal state is reset, not
saved). For a production framework, long progressive GT renders and warm
temporal state are worth resuming, so any pytree state (RenderState,
GroundTruthState, DDGIState) round-trips through a single .npz.
"""
from __future__ import annotations

import io
import pickle

import numpy as np
import jax


def save_state(path: str, state) -> None:
    """Serialize any jax pytree of arrays to an .npz (+ pickled treedef)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    buf = io.BytesIO()
    pickle.dump(treedef, buf)
    arrays["__treedef__"] = np.frombuffer(buf.getvalue(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_state(path: str, like=None):
    """Load a pytree saved by save_state. If `like` is given its treedef is
    used (robust across refactors of the pickled structure)."""
    data = np.load(path, allow_pickle=False)
    n = sum(1 for k in data.files if k.startswith("leaf_"))
    leaves = [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(n)]
    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
    else:
        treedef = pickle.loads(data["__treedef__"].tobytes())
    return jax.tree_util.tree_unflatten(treedef, leaves)
