"""Solver-state checkpoint/resume.

The reference only offers CSV record-and-replay of final trajectories
(EigenSerialize, utils.cpp:21-61); long-running batch fleets here get real
checkpointing: any pytree of solver state (controls, multipliers, penalties,
iteration counters, RNG keys) round-trips through one .npz file. Structure
is preserved by flattening with jax.tree_util and storing a
version-independent encoding of the leaf key paths; plain numpy is used so
checkpoints are portable and dependency-free.
"""

import json

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]


def _leaf_paths(tree):
    """Canonical, JAX-version-independent encoding of a pytree's leaf key
    paths (PyTreeDef repr is NOT stable across JAX versions, so the treedef
    string itself cannot be used for validation)."""
    paths = []
    for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]:
        enc = []
        for k in path:
            if hasattr(k, "key"):        # DictKey
                enc.append(["k", str(k.key)])
            elif hasattr(k, "idx"):      # SequenceKey
                enc.append(["i", int(k.idx)])
            elif hasattr(k, "name"):     # GetAttrKey
                enc.append(["a", str(k.name)])
            else:                         # FlattenedIndexKey or unknown
                enc.append(["x", str(k)])
        paths.append(enc)
    return paths


def save_checkpoint(path: str, state) -> None:
    """Save a pytree of arrays/scalars to `path` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    )
    arrays["__paths__"] = np.frombuffer(
        json.dumps(_leaf_paths(state)).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_checkpoint(path: str, like):
    """Load a checkpoint saved by save_checkpoint into the structure of
    `like` (a pytree with the same structure as the saved state).

    Raises ValueError when the stored structure does not match `like`'s —
    blind unflattening would silently mis-assign leaves. Validation compares
    the version-independent leaf-path encoding (older checkpoints without it
    fall back to a leaf-count check); the stored treedef repr is advisory
    only, since PyTreeDef repr is not stable across JAX versions.
    """
    with np.load(path, allow_pickle=False) as data:
        n_leaves = sum(1 for f in data.files if f.startswith("leaf_"))
        leaves = [data[f"leaf_{i}"] for i in range(n_leaves)]
        stored_def = json.loads(bytes(data["__treedef__"]).decode())
        stored_paths = (json.loads(bytes(data["__paths__"]).decode())
                        if "__paths__" in data.files else None)
    _, treedef = jax.tree_util.tree_flatten(like)
    if stored_paths is not None:
        like_paths = _leaf_paths(like)
        if like_paths != stored_paths:
            raise ValueError(
                "checkpoint structure mismatch (leaf key paths differ):\n"
                f"  stored: {stored_paths}\n"
                f"  like:   {like_paths}\n"
                f"  stored treedef (advisory): {stored_def}"
            )
    elif treedef.num_leaves != len(leaves):
        raise ValueError(
            "checkpoint structure mismatch: "
            f"{len(leaves)} stored leaves vs {treedef.num_leaves} in `like`\n"
            f"  stored treedef (advisory): {stored_def}"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)
