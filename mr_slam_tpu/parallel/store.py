"""Sharded multi-robot map store — the array-native `RobotHandle`.

The reference's GlobalManager keeps a vector of mutex-guarded
`RobotHandle`s (submaps, trajectories, descriptor databases, kd-trees —
`global_manager.h:108-137`) fed by ROS subscribers. Here the whole
multi-robot state is ONE pytree with a leading robot axis, sharded over
the mesh's `robot` axis:

  * per-robot keyframe clouds/poses/stamps (a batched KeyframeStore),
  * per-robot descriptor databases (batched (K, ...) arrays),
  * writes are functional scatter updates, reads are gathers or
    collectives (all_gather replaces topic discovery + subscription).

Cross-robot queries (loop retrieval) run as: all_gather the compact
descriptor database across the robot axis, correlate the local query
batch against everything — one collective + one einsum instead of the
hub-and-spoke message fan (SURVEY.md §5.8).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..frontend import keyframes as kf
from ..geometry import se3
from ..geometry.se3 import Pose
from . import mesh as mesh_lib


class MultiRobotStore(NamedTuple):
    """All per-robot state, robot-major. Every leaf has leading dim R."""

    stores: kf.KeyframeStore       # batched over robots
    descriptors: jax.Array         # (R, K, D) flat descriptor database
    desc_valid: jax.Array          # (R, K)

    @property
    def n_robots(self) -> int:
        return self.descriptors.shape[0]

    @property
    def kf_capacity(self) -> int:
        return self.descriptors.shape[1]


def init(
    n_robots: int, kf_capacity: int, points_per_kf: int, desc_dim: int
) -> MultiRobotStore:
    single = kf.init(kf_capacity, points_per_kf)
    stores = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_robots, *x.shape)), single
    )
    return MultiRobotStore(
        stores=stores,
        descriptors=jnp.zeros((n_robots, kf_capacity, desc_dim), jnp.float32),
        desc_valid=jnp.zeros((n_robots, kf_capacity), bool),
    )


@jax.jit
def ingest(
    store: MultiRobotStore,
    robot: jax.Array,
    cloud_xyz: jax.Array,
    cloud_mask: jax.Array,
    pose: Pose,
    stamp: jax.Array,
    descriptor: jax.Array,
) -> MultiRobotStore:
    """Append one (already keyframe-gated, already voxelized) keyframe +
    descriptor for `robot` — the SubMap+DiSCO ingestion
    (`mapUpdate`/`discoUpdate`) as a pure scatter."""
    s = store.stores
    k = jnp.minimum(s.count[robot], store.kf_capacity - 1)
    ok = s.count[robot] < store.kf_capacity
    upd = lambda arr, val: arr.at[robot, k].set(jnp.where(ok, val, arr[robot, k]))
    new_stores = kf.KeyframeStore(
        xyz=upd(s.xyz, cloud_xyz),
        mask=upd(s.mask, cloud_mask),
        poses=Pose(upd(s.poses.R, pose.R), upd(s.poses.t, pose.t)),
        stamps=upd(s.stamps, stamp),
        count=s.count.at[robot].add(ok.astype(jnp.int32)),
        last_pose=Pose(
            s.last_pose.R.at[robot].set(pose.R),
            s.last_pose.t.at[robot].set(pose.t),
        ),
    )
    return MultiRobotStore(
        stores=new_stores,
        descriptors=upd(store.descriptors, descriptor),
        desc_valid=store.desc_valid.at[robot, k].set(
            store.desc_valid[robot, k] | ok
        ),
    )


def cross_robot_distances(
    store: MultiRobotStore, queries: jax.Array, axis_name: str | None = None
):
    """All-pairs descriptor distances: queries (R, Q, D) per robot
    against EVERY robot's database.

    Under `shard_map` over the robot axis, the local database is
    all-gathered across the axis (the collective replacing per-topic
    subscription); single-device callers get the plain einsum.

    Returns (R_local, Q, R_total, K) squared L2 distances with invalid
    entries +inf.
    """
    db = store.descriptors
    valid = store.desc_valid
    if axis_name is not None:
        db = jax.lax.all_gather(db, axis_name, axis=0, tiled=True)
        valid = jax.lax.all_gather(valid, axis_name, axis=0, tiled=True)
    # |q - d|^2 = |q|^2 + |d|^2 - 2 q.d ; contraction on the MXU
    q2 = jnp.sum(queries * queries, axis=-1)[..., None, None]
    d2 = jnp.sum(db * db, axis=-1)[None, None]
    qd = jnp.einsum("rqd,skd->rqsk", queries, db)
    dist = q2 + d2 - 2.0 * qd
    return jnp.where(valid[None, None], jnp.maximum(dist, 0.0), jnp.inf)
