"""Map/graph saving with the reference's artifact layout.

Mirrors `mapSaving` (`global_manager.cpp:123-272`), triggered there by a
`/map_saving` Bool: write the pose graph as g2o before and after
optimization, one directory per keyframe with a gtsam-style `data` file
(stamp + 4x4 estimate) and `cloud.pcd`, and the merged map PCD. Plus
the resume path the reference lacks: `save_session`/`load_session`
checkpoint the full pipeline state.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..backend import factor_graph as fg
from ..eval import g2o as g2o_io
from ..eval import pcd as pcd_io
from ..geometry import se3
from . import checkpoint, pipeline as pipeline_mod


def save_artifacts(out_dir: str, result: "pipeline_mod.SlamResult") -> None:
    """Write the reference-layout artifact tree:

    out_dir/
      fullGraph.g2o            (pre-optimization, odometry poses)
      fullGraph_optimized.g2o  (post-optimization)
      map.pcd                  (merged optimized cloud)
      keyframes/<robot>_<k>/data, cloud.pcd
    """
    os.makedirs(out_dir, exist_ok=True)
    g2o_io.export_g2o(os.path.join(out_dir, "fullGraph.g2o"), result.graph)
    # optimized copy
    opt_graph = result.graph._replace(poses=result.opt_poses)
    g2o_io.export_g2o(
        os.path.join(out_dir, "fullGraph_optimized.g2o"), opt_graph
    )
    merged = pipeline_mod.compose_map(result)
    pcd_io.cloud_to_pcd(os.path.join(out_dir, "map.pcd"), merged)

    kf_root = os.path.join(out_dir, "keyframes")
    os.makedirs(kf_root, exist_ok=True)
    for r, rr in enumerate(result.robots):
        K = int(rr.store.count)
        for k in range(K):
            node = int(result.node_of[r, k])
            d = os.path.join(kf_root, f"{r}_{k}")
            os.makedirs(d, exist_ok=True)
            est = np.eye(4, dtype=np.float32)
            est[:3, :3] = np.asarray(result.opt_poses.R[node])
            est[:3, 3] = np.asarray(result.opt_poses.t[node])
            with open(os.path.join(d, "data"), "w") as f:
                f.write(f"stamp {float(rr.store.stamps[k]):.9f}\n")
                f.write("estimate\n")
                for row in est:
                    f.write(" ".join(f"{v:.9f}" for v in row) + "\n")
            xyz = np.asarray(rr.store.xyz[k])[np.asarray(rr.store.mask[k])]
            pcd_io.write_pcd(os.path.join(d, "cloud.pcd"), xyz)


def map_to_odom_transforms(result: "pipeline_mod.SlamResult"):
    """Per-robot map->odom correction transform — the `/map ->
    robot_N/odom` TF the reference publishes at 10 Hz (`publishTF`,
    `global_manager.cpp:2242-2276`): T_map_odom = T_opt(latest kf) *
    T_odom(latest kf)^-1."""
    out = []
    for r, rr in enumerate(result.robots):
        K = int(rr.store.count)
        if K == 0:
            out.append(se3.identity())
            continue
        node = int(result.node_of[r, K - 1])
        opt = se3.Pose(result.opt_poses.R[node], result.opt_poses.t[node])
        odo = se3.index(rr.store.poses, K - 1)
        out.append(se3.compose(opt, se3.inverse(odo)))
    return out


def save_session(path: str, state) -> None:
    """Checkpoint arbitrary pipeline state (pytree)."""
    checkpoint.save(path, state)


def load_session(path: str, template):
    return checkpoint.restore(path, template)
