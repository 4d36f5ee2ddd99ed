"""Checkpoint / resume for renderer state.

The reference has NO persistence (SURVEY §5: temporal state is reset, not
saved). For a production framework, long progressive GT renders and warm
temporal state are worth resuming, so any pytree state (RenderState,
GroundTruthState, DDGIState) round-trips through a single .npz.

Format: plain .npz of the flattened leaves plus a JSON list of key-path
strings (no pickled objects anywhere, so loading an untrusted file cannot
execute code). The tree *structure* is supplied at load time via `like` —
a template pytree with the same structure (e.g. `renderer.create_state()`).
"""
from __future__ import annotations

import json

import numpy as np
import jax


def _key_paths(state) -> list[str]:
    paths, _ = zip(*jax.tree_util.tree_flatten_with_path(state)[0]) \
        if jax.tree_util.tree_leaves(state) else ((), None)
    return [jax.tree_util.keystr(p) for p in paths]


def save_state(path: str, state) -> None:
    """Serialize any jax pytree of arrays to an .npz (leaves + JSON key
    paths; no pickle)."""
    leaves, _ = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    keys = json.dumps(_key_paths(state)).encode("utf-8")
    arrays["__keypaths_json__"] = np.frombuffer(keys, dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_state(path: str, like):
    """Load a pytree saved by save_state into the structure of `like`
    (a template pytree, e.g. `renderer.create_state()`). Key paths stored
    in the file are checked against the template so a refactored state
    layout fails loudly instead of silently misassigning leaves."""
    if like is None:
        raise ValueError(
            "load_state requires a template pytree `like` (e.g. "
            "renderer.create_state()); the file stores only leaves + key "
            "paths, never executable structure."
        )
    data = np.load(path, allow_pickle=False)
    n = sum(1 for k in data.files if k.startswith("leaf_"))
    leaves = [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(n)]
    treedef = jax.tree_util.tree_structure(like)
    if treedef.num_leaves != n:
        raise ValueError(
            f"checkpoint has {n} leaves but template expects "
            f"{treedef.num_leaves}"
        )
    if "__keypaths_json__" in data.files:
        saved = json.loads(bytes(data["__keypaths_json__"]).decode("utf-8"))
        current = _key_paths(like)
        if saved != current:
            mism = [f"{s} != {c}" for s, c in zip(saved, current) if s != c]
            raise ValueError(
                "checkpoint key paths do not match template: "
                + "; ".join(mism[:5])
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)
