"""Distance-gated keyframes in fixed-capacity ring buffers.

Replaces the per-robot submap publishers (`LIO_Publisher.cpp:128-172`,
`ALOAMSubmapPublisher.cpp:125-168`): accumulate registered clouds, and
once travelled distance exceeds `dist_thresh` emit a voxelized keyframe
cloud + pose. Here the "publish" is a functional append into a
`KeyframeStore` pytree — the array-native `RobotHandle`
(`global_manager.h:108-137`) holding keyframe clouds, poses and
timestamps for one robot. A leading robot axis shards this store over
the device mesh.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.se3 import Pose
from ..ops import pointcloud as pcl


class KeyframeStore(NamedTuple):
    """Fixed-capacity keyframe log for one robot (vmappable to many).

    xyz:    (K, P, 3) body-frame keyframe clouds (voxelized)
    mask:   (K, P)    per-point validity
    poses:  Pose with batch (K,) — odometry pose at capture
    stamps: (K,)      capture times (seconds)
    count:  ()        number of keyframes written
    last_pose: Pose   pose at the last accepted keyframe (gate anchor)
    """

    xyz: jax.Array
    mask: jax.Array
    poses: Pose
    stamps: jax.Array
    count: jax.Array
    last_pose: Pose

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def points_per_kf(self) -> int:
        return self.xyz.shape[1]

    def cloud(self, i) -> pcl.PointCloud:
        return pcl.PointCloud(self.xyz[i], self.mask[i])

    def valid_mask(self) -> jax.Array:
        """(K,) which slots hold real keyframes."""
        return jnp.arange(self.capacity) < self.count


def init(capacity: int, points_per_kf: int) -> KeyframeStore:
    return KeyframeStore(
        xyz=jnp.full((capacity, points_per_kf, 3), pcl.SENTINEL, jnp.float32),
        mask=jnp.zeros((capacity, points_per_kf), bool),
        poses=se3.identity((capacity,)),
        stamps=jnp.zeros((capacity,), jnp.float32),
        count=jnp.int32(0),
        last_pose=Pose(jnp.eye(3), jnp.full((3,), jnp.inf)),  # first frame always gates in
    )


@partial(jax.jit, static_argnames=("dist_thresh", "leaf"))
def maybe_add(
    store: KeyframeStore,
    cloud: pcl.PointCloud,
    pose: Pose,
    stamp: jax.Array,
    dist_thresh: float = 2.0,
    leaf: float = 0.2,
):
    """Distance gate + append (no-op when gate closed or store full).

    Mirrors `LIO_Publisher.cpp:128-152`: travelled distance since the
    last keyframe > `dis_th` -> voxelize (leaf 0.2) -> emit. Returns
    (new_store, added: bool array).
    """
    dist = jnp.linalg.norm(pose.t - store.last_pose.t)
    add = (dist > dist_thresh) & (store.count < store.capacity)
    ds = pcl.voxel_downsample(
        cloud, leaf, store.points_per_kf,
        bounds=((-150.0, -150.0, -150.0), (150.0, 150.0, 150.0)),
    )
    idx = jnp.minimum(store.count, store.capacity - 1)
    w = add

    def write(s):
        return KeyframeStore(
            xyz=s.xyz.at[idx].set(ds.xyz),
            mask=s.mask.at[idx].set(ds.mask),
            poses=Pose(
                s.poses.R.at[idx].set(pose.R), s.poses.t.at[idx].set(pose.t)
            ),
            stamps=s.stamps.at[idx].set(stamp),
            count=s.count + 1,
            last_pose=pose,
        )

    new_store = jax.lax.cond(w, write, lambda s: s, store)
    return new_store, add


@partial(jax.jit, static_argnames=("window",))
def merged_neighborhood(
    store: KeyframeStore, center_idx: jax.Array, window: int, poses: Pose | None = None
) -> pcl.PointCloud:
    """Concatenate keyframes [center-window, center+window] transformed
    into the world frame — `mergeNearestKeyframes`
    (`global_manager.cpp:1894-1939`) for loop verification. `poses`
    overrides stored odometry poses (e.g. optimized estimates)."""
    if poses is None:
        poses = store.poses
    K = store.capacity
    offs = jnp.arange(-window, window + 1)
    idx = jnp.clip(center_idx + offs, 0, K - 1)
    in_range = (center_idx + offs >= 0) & (center_idx + offs < store.count)
    sel_pose = Pose(poses.R[idx], poses.t[idx])
    pts = jnp.einsum("kij,kpj->kpi", sel_pose.R, store.xyz[idx]) + sel_pose.t[:, None, :]
    mask = store.mask[idx] & in_range[:, None]
    return pcl.park(
        pcl.PointCloud(pts.reshape(-1, 3), mask.reshape(-1))
    )
