import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.geometry import Pose, se3, so3
from mr_slam_tpu.ops import pointcloud as pcl
from mr_slam_tpu.ops import registration, voxel_grid


def make_structured_cloud(key, n=2048):
    """Ground plane + two walls + scattered clutter: enough structure to
    constrain all 6 dof."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n4 = n // 4
    ground = jnp.concatenate(
        [jax.random.uniform(k1, (n4 * 2, 2), minval=-10, maxval=10),
         jnp.zeros((n4 * 2, 1))], axis=-1)
    wall1 = jnp.concatenate(
        [jax.random.uniform(k2, (n4, 1), minval=-10, maxval=10),
         jnp.full((n4, 1), 8.0),
         jax.random.uniform(k2, (n4, 1), minval=0, maxval=4)], axis=-1)
    wall2 = jnp.concatenate(
        [jnp.full((n4, 1), -9.0),
         jax.random.uniform(k3, (n4, 1), minval=-10, maxval=10),
         jax.random.uniform(k3, (n4, 1), minval=0, maxval=4)], axis=-1)
    xyz = jnp.concatenate([ground, wall1, wall2], axis=0)
    xyz = xyz + 0.01 * jax.random.normal(k4, xyz.shape)
    return pcl.make(xyz)


class TestVoxelGrid:
    def test_build_and_lookup(self):
        pc = make_structured_cloud(jax.random.PRNGKey(0))
        grid = voxel_grid.build(pc, leaf=1.0, table_size=1 << 14)
        found, mean, cov, cnt = voxel_grid.nearest_cell(grid, pc.xyz[:64])
        assert bool(jnp.all(found))
        # centroid of the containing voxel is within voxel diagonal
        d = jnp.linalg.norm(mean - pc.xyz[:64], axis=-1)
        assert float(jnp.max(d)) < jnp.sqrt(3.0)

    def test_counts_sum_to_points(self):
        pc = make_structured_cloud(jax.random.PRNGKey(1), n=512)
        grid = voxel_grid.build(pc, leaf=1.0, table_size=1 << 14)
        # nearly all points accounted (few collision drops allowed)
        assert float(jnp.sum(grid.count)) >= 512 * 0.97

    def test_mask_respected(self):
        xyz = jnp.array([[0.5, 0.5, 0.5], [0.6, 0.6, 0.6], [5.5, 5.5, 5.5]])
        pc = pcl.park(pcl.PointCloud(xyz, jnp.array([True, True, False])))
        grid = voxel_grid.build(pc, leaf=1.0, table_size=256)
        assert float(jnp.sum(grid.count)) == 2.0
        found, *_ = voxel_grid.nearest_cell(grid, jnp.array([[5.5, 5.5, 5.5]]))
        assert not bool(found[0])

    def test_plane_regularization(self):
        pc = make_structured_cloud(jax.random.PRNGKey(2))
        grid = voxel_grid.build(
            pc, leaf=1.0, table_size=1 << 14, min_points=5, regularize="plane"
        )
        from mr_slam_tpu.ops import linalg3

        evals = linalg3.eigvalsh3(grid.cov[grid.valid.nonzero()[0][:32]])
        ratio = evals[:, 0] / jnp.maximum(evals[:, 2], 1e-12)
        # clamped at 1e-3 up to f32 reconstruction noise
        assert float(jnp.min(ratio)) >= 5e-4


class TestRegistration:
    def _check_recovers(self, method, atol_t=0.05, atol_r=0.02):
        target = make_structured_cloud(jax.random.PRNGKey(3))
        true = Pose(so3.exp(jnp.array([0.02, -0.03, 0.1])), jnp.array([0.5, -0.3, 0.1]))
        # source = inverse-transformed target points (so source->target = true)
        source = pcl.transform(target, se3.inverse(true))
        # leaf 0.5 = the reference's FAST_VGICP_CUDA resolution
        # (`global_manager.cpp:2447`)
        result = registration.register_pair(
            source, target, se3.identity(), leaf=0.5, method=method, iters=30
        )
        np.testing.assert_allclose(result.pose.t, true.t, atol=atol_t)
        np.testing.assert_allclose(
            so3.log(result.pose.R @ true.R.T), 0.0, atol=atol_r
        )
        assert float(result.fitness) < 0.1

    def test_vgicp_recovers_transform(self):
        self._check_recovers("vgicp")

    def test_point_to_plane_recovers_transform(self):
        self._check_recovers("icp")

    def test_identity_is_fixed_point(self):
        target = make_structured_cloud(jax.random.PRNGKey(4))
        result = registration.register_pair(
            target, target, se3.identity(), leaf=1.0, iters=5
        )
        np.testing.assert_allclose(result.pose.t, 0.0, atol=1e-3)
        # fitness has a small floor from non-planar (edge) cells using
        # centroid distance; what matters is the aligned/misaligned gap
        # (see test_fitness_discriminates)
        assert float(result.fitness) < 0.05

    def test_fitness_discriminates(self):
        target = make_structured_cloud(jax.random.PRNGKey(5))
        grid = voxel_grid.build(target, leaf=0.5, table_size=1 << 14)
        good = registration.fitness(target, grid, se3.identity())
        bad_pose = Pose(so3.yaw_rot(jnp.array(1.0)), jnp.array([5.0, 5.0, 1.0]))
        bad = registration.fitness(target, grid, bad_pose)
        assert float(good) < 0.01
        assert float(bad) > float(good) * 10

    def test_vmap_over_pairs(self):
        """Batched loop verification: vmap over (source, target-grid) pairs."""
        pcs = [make_structured_cloud(jax.random.PRNGKey(i)) for i in range(3)]
        grids = [voxel_grid.build(p, leaf=1.0, table_size=1 << 13) for p in pcs]
        batch_grid = jax.tree.map(lambda *x: jnp.stack(x), *grids)
        batch_src = jax.tree.map(lambda *x: jnp.stack(x), *pcs)
        init = se3.identity((3,))
        f = jax.vmap(lambda s, g, i: registration.vgicp(s, g, i, iters=5))
        res = f(batch_src, batch_grid, init)
        assert res.pose.t.shape == (3, 3)
        np.testing.assert_allclose(res.pose.t, 0.0, atol=1e-2)


class TestMethodSelector:
    """All four selector methods (`global_manager.cpp:2416-2462`) recover
    a known rigid transform on a structured scene."""

    def _scene(self, n=4096):
        key = jax.random.PRNGKey(42)
        k1, k2, k3 = jax.random.split(key, 3)
        ground = jnp.concatenate(
            [jax.random.uniform(k1, (n // 2, 2), minval=-10, maxval=10),
             jnp.zeros((n // 2, 1))], axis=-1)
        wall = jnp.concatenate(
            [jax.random.uniform(k2, (n // 4, 1), minval=-10, maxval=10),
             jnp.full((n // 4, 1), 5.0),
             jax.random.uniform(k2, (n // 4, 1), minval=0, maxval=3)], axis=-1)
        wall2 = jnp.concatenate(
            [jnp.full((n // 4, 1), -4.0),
             jax.random.uniform(k3, (n // 4, 1), minval=-10, maxval=10),
             jax.random.uniform(k3, (n // 4, 1), minval=0, maxval=3)], axis=-1)
        return pcl.make(jnp.concatenate([ground, wall, wall2], axis=0))

    @pytest.mark.parametrize("method", ["icp", "gicp", "vgicp", "point_to_plane"])
    def test_recovers_transform(self, method):
        target = self._scene()
        true = se3.Pose(
            so3.exp(jnp.array([0.02, -0.01, 0.05])), jnp.array([0.3, -0.2, 0.1])
        )
        src = pcl.transform(target, se3.inverse(true))
        res = registration.register_pair(
            src, target, se3.identity(), method=method, iters=25
        )
        np.testing.assert_allclose(np.asarray(res.pose.t), np.asarray(true.t), atol=0.05)
        np.testing.assert_allclose(
            np.asarray(so3.log(res.pose.R @ true.R.T)), 0.0, atol=0.02
        )
