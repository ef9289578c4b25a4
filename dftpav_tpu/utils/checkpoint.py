"""Pytree checkpointing for long batched runs.

The reference planner is stateless across replans and has no checkpointing
(SURVEY.md §5). The batched engine's checkpointable unit is a pytree —
scenario batches, SolveResults, RNG keys, replan-loop state — saved as a
flat .npz with a JSON treedef sidecar, so a 100k-scenario campaign can
resume mid-stream. NamedTuple/dataclass pytrees round-trip by structure.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax


def _flatten(tree):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save_pytree(path: str, tree, metadata: dict | None = None):
    """Save any pytree of arrays to `path` (.npz) + `path`.json (structure)."""
    leaves, treedef = _flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez_compressed(path, **arrays)
    side = dict(treedef=str(treedef), n_leaves=len(leaves),
                metadata=metadata or {})
    with open(path + ".json", "w") as f:
        json.dump(side, f)


def load_pytree(path: str, like):
    """Load a pytree saved by save_pytree; `like` provides the structure
    (an example pytree with the same treedef, e.g. the object being
    resumed). Returns (tree, metadata)."""
    if not path.endswith(".npz"):
        path_npz = path + ".npz" if os.path.exists(path + ".npz") else path
    else:
        path_npz = path
    data = np.load(path_npz)
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    _, treedef = _flatten(like)
    meta = {}
    side = path_npz[:-4] + ".npz.json" if path_npz.endswith(".npz") else \
        path_npz + ".json"
    for cand in (path_npz + ".json", side):
        if os.path.exists(cand):
            with open(cand) as f:
                meta = json.load(f).get("metadata", {})
            break
    return jax.tree.unflatten(treedef, leaves), meta
