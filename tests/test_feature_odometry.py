import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.frontend import feature_odometry, odometry
from mr_slam_tpu.geometry import Pose, se3, so3
from mr_slam_tpu.ops import features, pointcloud as pcl, registration, voxel_grid
from tests.test_registration import make_structured_cloud


class TestLoamICP:
    def test_recovers_transform_with_lines_and_planes(self):
        """Scene with strong line + plane structure: pole grid + ground."""
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        ground = jnp.concatenate(
            [jax.random.uniform(ks[0], (2048, 2), minval=-15, maxval=15),
             jnp.zeros((2048, 1))], axis=-1)
        # vertical poles (lines)
        px = jnp.repeat(jnp.arange(-12.0, 13.0, 6.0), 40)
        py = jnp.tile(jnp.repeat(jnp.arange(-12.0, 13.0, 6.0), 8), 5)[: px.shape[0]]
        pz = jnp.tile(jnp.linspace(0, 4, 8), px.shape[0] // 8)
        poles = jnp.stack([px, py[: px.shape[0]], pz], axis=-1)
        cloud = jnp.concatenate([ground, poles], axis=0)
        cloud = cloud + 0.01 * jax.random.normal(ks[1], cloud.shape)
        target = pcl.make(cloud)
        true = Pose(so3.exp(jnp.array([0.01, -0.01, 0.06])), jnp.array([0.3, -0.2, 0.05]))
        n_pts = cloud.shape[0]
        corners_src = pcl.transform(
            pcl.make(poles + 0.01 * jax.random.normal(ks[2], poles.shape)),
            se3.inverse(true),
        )
        surfs_src = pcl.transform(
            pcl.make(ground + 0.01 * jax.random.normal(ks[3], ground.shape)),
            se3.inverse(true),
        )
        # min_points=1: sparse pole cells hold 1-2 points; the pooled
        # wsum gates inside loam_icp supply the robustness instead
        grid = voxel_grid.build(target, 1.0, 1 << 14, min_points=1)
        res = registration.loam_icp(
            corners_src, surfs_src, grid, se3.identity(), iters=15
        )
        np.testing.assert_allclose(np.asarray(res.pose.t), np.asarray(true.t), atol=0.07)
        np.testing.assert_allclose(
            np.asarray(so3.log(res.pose.R @ true.R.T)), 0.0, atol=0.03
        )


@pytest.mark.slow
class TestFeatureOdometry:
    def test_tracks_trajectory(self):
        world = synthetic.default_world(3)
        n = 12
        traj = synthetic.circle_trajectory(n, radius=25.0, laps=0.06)
        keys = jax.random.split(jax.random.PRNGKey(1), n)
        imgs, hits = [], []
        for i in range(n):
            xyz, _, hit = synthetic.scan(
                world, se3.index(traj, i), n_rings=16, n_azimuth=512, key=keys[i]
            )
            imgs.append(xyz)
            hits.append(hit)
        config = odometry.OdometryConfig(table_size=1 << 16, iters=10)
        final, poses, diag = feature_odometry.run(
            jnp.stack(imgs), jnp.stack(hits), config, origin=se3.index(traj, 0)
        )
        errs = jnp.linalg.norm(poses.t - traj.t, axis=-1)
        assert float(errs[-1]) < 0.5, np.asarray(errs).round(2)
