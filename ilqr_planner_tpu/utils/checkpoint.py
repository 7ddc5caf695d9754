"""Solver-state checkpoint/resume.

The reference only offers CSV record-and-replay of final trajectories
(EigenSerialize, utils.cpp:21-61); long-running batch fleets here get real
checkpointing: any pytree of solver state (controls, multipliers, penalties,
iteration counters, RNG keys) round-trips through one .npz file. Structure
is preserved by flattening with jax.tree_util and storing the treedef; plain
numpy is used so checkpoints are portable and dependency-free.
"""

import json

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(path: str, state) -> None:
    """Save a pytree of arrays/scalars to `path` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_checkpoint(path: str, like):
    """Load a checkpoint saved by save_checkpoint into the structure of
    `like` (a pytree with the same structure as the saved state).

    Raises ValueError when `like`'s treedef does not match the one stored in
    the checkpoint — blind unflattening would silently mis-assign leaves.
    """
    with np.load(path, allow_pickle=False) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files) - 1)]
        stored = json.loads(bytes(data["__treedef__"]).decode())
    _, treedef = jax.tree_util.tree_flatten(like)
    if str(treedef) != stored:
        raise ValueError(
            "checkpoint structure mismatch:\n"
            f"  stored: {stored}\n"
            f"  like:   {treedef}"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)
