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


# --------------------------------------------------------------------------
# full online-session checkpoint / resume
# --------------------------------------------------------------------------


def save_session(session, path: str) -> None:
    """Serialize a live `runtime.online.OnlineSlam` session: the batched
    store, per-robot odometry pytrees, factor graph, optimized poses,
    GEM grids/flushed submaps, loop records and the scheduler manifest.
    One npz + embedded JSON manifest — the `mapSaving` analogue
    (`global_manager.cpp:123-272`) PLUS the resume path the reference
    lacks (SURVEY §5.4 'elastic recovery')."""
    from ..geometry.se3 import Pose

    arrays: dict[str, np.ndarray] = {}

    def put(prefix: str, tree: Any) -> None:
        leaves = jax.tree_util.tree_leaves(tree)
        for i, leaf in enumerate(leaves):
            arrays[f"{prefix}.{i}"] = np.asarray(leaf)

    put("mstore", session.mstore)
    put("graph", session.graph)
    if session.opt_poses is not None:
        put("opt", session.opt_poses)
    robots_meta = {}
    for r, rs in session.robots.items():
        put(f"odo.{r}", rs["odo"])
        meta = {"frame": rs["frame"], "row": session.rows[r]}
        if "gem_local" in rs:
            put(f"gem.{r}", rs["gem_local"])
            if rs.get("gem_last_pose") is not None:
                put(f"gemlp.{r}", rs["gem_last_pose"])
                meta["has_gem_last"] = True
            fl = rs.get("gem_flushed", [])
            meta["gem_flushed_k"] = [int(k) for k, _ in fl]
            if fl:
                arrays[f"gemf.{r}.xyz"] = np.stack(
                    [np.asarray(c.xyz) for _, c in fl]
                )
                arrays[f"gemf.{r}.mask"] = np.stack(
                    [np.asarray(c.mask) for _, c in fl]
                )
        robots_meta[str(r)] = meta
    if session.loops:
        arrays["loops.R"] = np.stack(
            [np.asarray(l["rel"].R) for l in session.loops]
        )
        arrays["loops.t"] = np.stack(
            [np.asarray(l["rel"].t) for l in session.loops]
        )
    if session._inter_candidates:
        arrays["cands.R"] = np.stack(
            [np.asarray(l["rel"].R) for l in session._inter_candidates]
        )
        arrays["cands.t"] = np.stack(
            [np.asarray(l["rel"].t) for l in session._inter_candidates]
        )
    manifest = {
        "config": session.cfg.to_json(),
        "enable_gem": session.enable_gem,
        "loop_every": session.loop_every,
        "robots": robots_meta,
        "node_of": [[r, k, v] for (r, k), v in session.node_of.items()],
        "pending": [[r, k] for r, k in session._pending_kf],
        "has_opt": session.opt_poses is not None,
        "loops": [
            {k: v for k, v in l.items() if k != "rel"} for l in session.loops
        ],
        "inter_candidates": [
            {k: v for k, v in l.items() if k != "rel"}
            for l in session._inter_candidates
        ],
        "searched": [
            [ra, rb, sorted(map(list, pairs))]
            for (ra, rb), pairs in session._searched.items()
        ],
        "sched": {
            "loop": session._last_loop_stamp,
            "compose": session._last_compose_stamp,
            "tf": session._last_tf_stamp,
        },
    }
    arrays["manifest"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_session(path: str):
    """Rebuild an `OnlineSlam` from `save_session` output. The config is
    reconstructed FROM the manifest (no caller-side template needed);
    continuing the replay after `load_session` reproduces an
    uninterrupted run bit-for-bit (tests/test_session_resume.py)."""
    from ..geometry.se3 import Pose
    from ..ops.pointcloud import PointCloud
    from .config import SlamConfig
    from .online import OnlineSlam

    data = np.load(path if path.endswith(".npz") else path + ".npz")
    manifest = json.loads(bytes(data["manifest"]).decode())
    cfg = SlamConfig.from_json(manifest["config"])
    sess = OnlineSlam(cfg, enable_gem=manifest["enable_gem"])
    sess.loop_every = manifest["loop_every"]

    def get(prefix: str, template: Any) -> Any:
        leaves, treedef = jax.tree_util.tree_flatten(template)
        out = [jnp.asarray(data[f"{prefix}.{i}"]) for i in range(len(leaves))]
        return jax.tree_util.tree_unflatten(treedef, out)

    # register robots in row order so store rows line up
    metas = sorted(
        ((int(r), m) for r, m in manifest["robots"].items()),
        key=lambda rm: rm[1]["row"],
    )
    for r, meta in metas:
        sess.register_robot(r)
        assert sess.rows[r] == meta["row"], "row order mismatch"
    sess.mstore = get("mstore", sess.mstore)
    sess.graph = get("graph", sess.graph)
    if manifest["has_opt"]:
        sess.opt_poses = get("opt", sess.graph.poses)
    for r, meta in metas:
        rs = sess.robots[r]
        rs["odo"] = get(f"odo.{r}", rs["odo"])
        rs["frame"] = meta["frame"]
        if sess.enable_gem and f"gem.{r}.0" in data:
            rs["gem_local"] = get(f"gem.{r}", rs["gem_local"])
            if meta.get("has_gem_last"):
                rs["gem_last_pose"] = get(
                    f"gemlp.{r}", Pose(jnp.eye(3), jnp.zeros(3))
                )
            ks = meta.get("gem_flushed_k", [])
            if ks:
                xs = data[f"gemf.{r}.xyz"]
                ms = data[f"gemf.{r}.mask"]
                rs["gem_flushed"] = [
                    (k, PointCloud(jnp.asarray(xs[i]), jnp.asarray(ms[i])))
                    for i, k in enumerate(ks)
                ]
    sess.node_of = {(r, k): v for r, k, v in manifest["node_of"]}
    sess._pending_kf = [(r, k) for r, k in manifest["pending"]]
    loops = []
    for i, l in enumerate(manifest["loops"]):
        rel = Pose(
            jnp.asarray(data["loops.R"][i]), jnp.asarray(data["loops.t"][i])
        )
        loops.append({**l, "rel": rel})
    sess.loops = loops
    cands = []
    for i, l in enumerate(manifest.get("inter_candidates", [])):
        rel = Pose(
            jnp.asarray(data["cands.R"][i]), jnp.asarray(data["cands.t"][i])
        )
        cands.append({**l, "rel": rel})
    sess._inter_candidates = cands
    sess._searched = {
        (ra, rb): {tuple(p) for p in pairs}
        for ra, rb, pairs in manifest.get("searched", [])
    }
    sched = manifest.get("sched", {})
    sess._last_loop_stamp = sched.get("loop")
    sess._last_compose_stamp = sched.get("compose")
    sess._last_tf_stamp = sched.get("tf")
    return sess
