"""Checkpoint / resume of the full sliding-window odometry state.

The reference has NO checkpointing (SURVEY §5 — output recording is
delegated to the external driver, reference src/utils/Config.hpp:27-54);
for a multi-host TPU deployment restartability is required, so this module
adds it: the complete BA window (BAState incl. the HM/bM marginalization
prior), the depth-filter states, the tracker pose window, and arbitrary
host-side scalars are saved as one pytree.

Orbax is used when importable (the production path: async, sharded,
multi-host safe); a numpy NPZ fallback keeps the feature alive in minimal
images. Both paths round-trip exact bit patterns for float arrays.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

try:                                     # production path
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:                        # pragma: no cover - minimal images
    ocp = None
    _HAS_ORBAX = False


def _flatten(tree) -> Dict[str, np.ndarray]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return ({f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
            treedef)


def save(path: str, tree: Any, metadata: Optional[dict] = None,
         use_orbax: Optional[bool] = None) -> str:
    """Save a state pytree (e.g. {'ba': BAState, 'filter': DepthFilterState,
    'step': k}) to `path`. Returns the concrete location written."""
    use_orbax = _HAS_ORBAX if use_orbax is None else use_orbax
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    if use_orbax and _HAS_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), jax.tree_util.tree_map(jnp.asarray, tree),
                   force=True)
        loc = path
    else:
        arrays, _ = _flatten(tree)
        loc = path if path.endswith(".npz") else path + ".npz"
        np.savez_compressed(loc, **arrays)
    if metadata is not None:
        with open(loc.rstrip("/") + ".meta.json", "w") as f:
            json.dump(metadata, f)
    return loc


def restore(path: str, example_tree: Any, use_orbax: Optional[bool] = None):
    """Restore into the structure of `example_tree` (shapes/dtypes must
    match what was saved — the fixed-capacity design guarantees this)."""
    use_orbax = _HAS_ORBAX if use_orbax is None else use_orbax
    if use_orbax and _HAS_ORBAX and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(os.path.abspath(path))
        leaves_r = jax.tree_util.tree_leaves(restored)
        treedef = jax.tree_util.tree_structure(example_tree)
        return jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(x) for x in leaves_r])
    loc = path if path.endswith(".npz") else path + ".npz"
    data = np.load(loc)
    _, treedef = _flatten(example_tree)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(data.files))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_metadata(path: str) -> Optional[dict]:
    for loc in (path, path + ".npz"):
        meta = loc.rstrip("/") + ".meta.json"
        if os.path.exists(meta):
            with open(meta) as f:
                return json.load(f)
    return None
