import jax
import jax.numpy as jnp
import numpy as np

from mr_slam_tpu.geometry import Pose, so3
from mr_slam_tpu.ops import pointcloud as pcl


def _cloud(key, n=256, scale=10.0, capacity=None):
    xyz = jax.random.uniform(key, (n, 3), minval=-scale, maxval=scale)
    pc = pcl.make(xyz)
    if capacity:
        pc = pcl.pad_to(pc, capacity)
    return pc


class TestBasics:
    def test_make_and_count(self):
        pc = _cloud(jax.random.PRNGKey(0), 100)
        assert pc.capacity == 100
        assert int(pc.count()) == 100

    def test_pad_parks_sentinels(self):
        pc = pcl.pad_to(_cloud(jax.random.PRNGKey(0), 10), 32)
        assert pc.capacity == 32
        assert int(pc.count()) == 10
        assert np.all(np.asarray(pc.xyz[10:]) == pcl.SENTINEL)

    def test_crop_box(self):
        xyz = jnp.array([[0.0, 0, 0], [5, 0, 0], [0, 0, 40]])
        pc = pcl.crop_box(pcl.make(xyz), lo=(-1, -1, -1), hi=(1, 1, 30))
        np.testing.assert_array_equal(np.asarray(pc.mask), [True, False, False])

    def test_transform(self):
        pc = _cloud(jax.random.PRNGKey(1), 64)
        pose = Pose(so3.yaw_rot(jnp.array(0.5)), jnp.array([1.0, 2.0, 3.0]))
        out = pcl.transform(pc, pose)
        expect = (pose.R @ pc.xyz.T).T + pose.t
        np.testing.assert_allclose(out.xyz, expect, atol=1e-5)

    def test_compact(self):
        xyz = jnp.arange(15.0).reshape(5, 3)
        mask = jnp.array([False, True, False, True, True])
        pc = pcl.compact(pcl.park(pcl.PointCloud(xyz, mask)))
        assert int(pc.count()) == 3
        assert bool(jnp.all(pc.mask[:3]))
        np.testing.assert_allclose(pc.xyz[0], xyz[1])


class TestVoxelDownsample:
    def test_merges_points_in_same_voxel(self):
        # two clusters, each well inside one 1m voxel
        xyz = jnp.array(
            [[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5.1, 5.1, 5.1], [5.3, 5.2, 5.1]]
        )
        out = pcl.voxel_downsample(pcl.make(xyz), leaf=1.0, capacity=8)
        assert int(out.count()) == 2
        pts = np.asarray(pcl.compact(out).xyz[:2])
        pts = pts[np.argsort(pts[:, 0])]
        np.testing.assert_allclose(pts[0], [0.15, 0.15, 0.15], atol=1e-5)
        np.testing.assert_allclose(pts[1], [5.2, 5.15, 5.1], atol=1e-5)

    def test_respects_mask(self):
        xyz = jnp.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2]])
        pc = pcl.PointCloud(xyz, jnp.array([True, False]))
        out = pcl.voxel_downsample(pcl.park(pc), leaf=1.0, capacity=4)
        assert int(out.count()) == 1
        np.testing.assert_allclose(pcl.compact(out).xyz[0], [0.1, 0.1, 0.1], atol=1e-5)

    def test_preserves_count_when_sparse(self):
        pc = _cloud(jax.random.PRNGKey(2), 128, scale=100.0)
        out = pcl.voxel_downsample(pc, leaf=0.1, capacity=256)
        assert int(out.count()) == 128  # no two points share a 0.1m voxel whp

    def test_jit_and_shapes(self):
        pc = _cloud(jax.random.PRNGKey(3), 512, capacity=1024)
        out = pcl.voxel_downsample(pc, leaf=2.0, capacity=256)
        assert out.capacity == 256
        assert out.xyz.shape == (256, 3)


class TestKNN:
    def test_knn_exact(self):
        pc = _cloud(jax.random.PRNGKey(4), 200)
        q = np.asarray(pc.xyz[:8])
        d, idx = pcl.knn(jnp.asarray(q), pc, k=3)
        # nearest neighbour of a database point is itself
        np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.arange(8))
        # compare against numpy brute force for k=3
        full = np.linalg.norm(q[:, None] - np.asarray(pc.xyz)[None], axis=-1) ** 2
        expect = np.sort(full, axis=1)[:, :3]
        np.testing.assert_allclose(np.sort(np.asarray(d), axis=1), expect, atol=1e-3)

    def test_knn_ignores_masked(self):
        xyz = jnp.array([[0.0, 0, 0], [0.1, 0, 0], [10, 0, 0]])
        pc = pcl.park(pcl.PointCloud(xyz, jnp.array([True, False, True])))
        d, idx = pcl.knn(jnp.array([[0.0, 0, 0]]), pc, k=2)
        assert int(idx[0, 0]) == 0
        assert int(idx[0, 1]) == 2  # masked point skipped

    def test_covariances(self):
        # points on a plane -> covariance rank ~2, small normal eigenvalue
        key = jax.random.PRNGKey(5)
        xy = jax.random.normal(key, (64, 2))
        xyz = jnp.concatenate([xy, jnp.zeros((64, 1))], axis=-1)
        mean, cov, valid = pcl.covariances_knn(pcl.make(xyz), k=8)
        assert bool(jnp.all(valid))
        evals = jnp.linalg.eigvalsh(cov)
        np.testing.assert_allclose(evals[:, 0], 0.0, atol=1e-5)  # flat direction
