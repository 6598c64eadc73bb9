"""A-LOAM-style feature odometry: curvature features + line/plane GN.

The reference's A-LOAM pipeline (`scanRegistration.cpp` features ->
`laserOdometry.cpp` frame-to-frame Ceres -> `laserMapping.cpp` cube-grid
refinement) collapses here into one scan-to-map stage: LOAM features
extracted from the range image, corners registered to line structures
and surfs to planes in the persistent voxel map (`ops/registration.
loam_icp`), coarse-to-fine like the dense front-end. Feeding features
instead of raw downsampled points cuts the per-frame point budget ~5x
at similar accuracy on structured scenes.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.se3 import Pose
from ..ops import features as feat
from ..ops import pointcloud as pcl
from ..ops import registration, voxel_grid
from .odometry import OdometryConfig, OdometryState, init  # shared state


@partial(jax.jit, static_argnames=("config",))
def step(
    state: OdometryState,
    xyz_image: jax.Array,   # (R, A, 3) body-frame range image
    hit: jax.Array,         # (R, A)
    config: OdometryConfig,
):
    """One frame of feature odometry. Returns (state, diagnostics)."""
    f = feat.extract(xyz_image, hit)
    motion = se3.between(state.prev_pose, state.pose)
    pred = se3.compose(state.pose, motion)

    def register(_):
        coarse = registration.point_to_plane_icp(
            f.surfs, state.coarse_grid, pred, iters=3,
            max_corr_dist=8.0 * config.map_leaf, neighbors="direct27",
        )
        res = registration.loam_icp(
            f.corners, f.surfs, state.grid, coarse.pose,
            iters=config.iters, max_corr_dist=config.max_corr_dist,
        )
        return res.pose, res.error, res.num_inliers

    def first(_):
        return pred, jnp.float32(0.0), jnp.float32(0.0)

    new_pose, err, inliers = jax.lax.cond(state.frame > 0, register, first, None)
    # map maintenance identical to the dense front-end
    scan = pcl.park(
        pcl.PointCloud(xyz_image.reshape(-1, 3), hit.reshape(-1))
    )
    fine = pcl.voxel_downsample(
        scan, config.insert_leaf, config.insert_capacity,
        bounds=((-150.0, -150.0, -150.0), (150.0, 150.0, 150.0)),
    )
    world = pcl.transform(fine, new_pose)
    grid = voxel_grid.insert(state.grid, world)
    grid = voxel_grid.decay(grid, new_pose.t, config.map_radius)
    ds = pcl.voxel_downsample(
        scan, config.scan_leaf, config.scan_capacity,
        bounds=((-150.0, -150.0, -150.0), (150.0, 150.0, 150.0)),
    )
    cg = voxel_grid.insert(state.coarse_grid, pcl.transform(ds, new_pose))
    cg = voxel_grid.decay(cg, new_pose.t, config.map_radius)
    new_state = OdometryState(
        grid=grid, coarse_grid=cg, pose=new_pose,
        prev_pose=state.pose, frame=state.frame + 1,
    )
    return new_state, {"error": err, "inliers": inliers}


@partial(jax.jit, static_argnames=("config",))
def run(
    xyz_images: jax.Array,  # (T, R, A, 3)
    hits: jax.Array,        # (T, R, A)
    config: OdometryConfig,
    origin: Pose | None = None,
):
    """Offline batch: whole sequence as one lax.scan."""
    state0 = init(config, origin)

    def body(state, frame):
        xyz, hit = frame
        new_state, diag = step(state, xyz, hit, config)
        return new_state, (new_state.pose, diag["error"], diag["inliers"])

    final, (poses, errs, inl) = jax.lax.scan(body, state0, (xyz_images, hits))
    return final, poses, {"error": errs, "inliers": inl}
