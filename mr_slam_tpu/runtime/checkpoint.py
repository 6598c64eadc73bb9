"""Checkpoint / restore of the whole SLAM state.

The reference only *saves* (g2o + per-keyframe dirs + PCDs on a
`/map_saving` signal — `global_manager.cpp:123-272`) and has no resume
path (SURVEY.md §5.4). Here any pytree (odometry state, keyframe
stores, factor graph, elevation maps) round-trips through orbax when
available, with a plain-npz fallback — which also provides the elastic
recovery story (§5.3): a crashed session restarts from the last
checkpoint.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save(path: str, tree: Any) -> None:
    """Save a pytree to `path` (npz + structure is implied by the
    template at restore time)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat, _ = _flatten_with_paths(tree)
    np.savez_compressed(path, **flat)


def restore(path: str, template: Any) -> Any:
    """Restore into the structure of `template` (shapes must match —
    fixed-capacity state makes this exact)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for pathk, leaf in flat:
        key = "/".join(str(p) for p in pathk)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = data[key]
        if tuple(arr.shape) != tuple(jnp.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {key}: {arr.shape} vs {jnp.shape(leaf)}"
            )
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_orbax(path: str, tree: Any) -> bool:
    """Orbax-backed save (async-capable, sharding-aware); returns False
    if orbax is unavailable."""
    try:
        import orbax.checkpoint as ocp
    except Exception:
        return False
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    return True


def restore_orbax(path: str, template: Any) -> Any | None:
    try:
        import orbax.checkpoint as ocp
    except Exception:
        return None
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path), item=template)
