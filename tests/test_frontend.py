import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.frontend import keyframes, odometry
from mr_slam_tpu.geometry import se3, so3
from mr_slam_tpu.ops import features
from mr_slam_tpu.ops import pointcloud as pcl
from mr_slam_tpu.ops import voxel_grid


class TestFeatures:
    def test_extract_shapes(self):
        world = synthetic.default_world(0)
        xyz, rng, hit = synthetic.scan(world, se3.identity(), n_rings=16, n_azimuth=384)
        f = features.extract(xyz, hit)
        assert f.corners.xyz.shape[1] == 3
        assert f.surfs.count() > 0

    def test_wall_corner_is_sharp(self):
        """A scan of two walls meeting at a corner: corner points have
        high curvature, wall interiors low."""
        world = synthetic.World(
            jnp.array(
                [
                    [[-20.0, 5.0, 0.0], [20.0, 6.0, 4.0]],
                    [[5.0, -20.0, 0.0], [6.0, 20.0, 4.0]],
                ]
            )
        )
        xyz, rng, hit = synthetic.scan(
            world, se3.identity(), n_rings=8, n_azimuth=512, noise=0.0
        )
        f = features.extract(xyz, hit, corner_thresh=0.02)
        corners = np.asarray(pcl.compact(f.corners).xyz[: int(f.corners.count())])
        # the physical corner is near (5, 5); at least one detected
        # corner should be near the wall intersection region
        d = np.linalg.norm(corners[:, :2] - np.array([5.0, 5.5]), axis=-1)
        assert d.min() < 2.0

    def test_surfs_are_planar(self):
        world = synthetic.default_world(2)
        xyz, rng, hit = synthetic.scan(world, se3.identity(), n_rings=16, n_azimuth=384)
        f = features.extract(xyz, hit)
        surfs = np.asarray(f.curvature)[np.asarray(f.surfs.mask).reshape(16, 6, -1).any(-1).any(-1)]
        assert f.surfs.count() > 50


class TestIncrementalGrid:
    def test_insert_matches_build(self):
        key = jax.random.PRNGKey(0)
        xyz = jax.random.uniform(key, (512, 3), minval=-10, maxval=10)
        pc = pcl.make(xyz)
        built = voxel_grid.build(pc, 1.0, 1 << 13)
        inserted = voxel_grid.insert(voxel_grid.empty(1.0, 1 << 13), pc)
        np.testing.assert_allclose(
            float(built.count.sum()), float(inserted.count.sum()), rtol=0.01
        )
        # same occupied cells (up to claim-order collisions)
        assert abs(int(built.valid.sum()) - int(inserted.valid.sum())) <= 5

    def test_two_inserts_accumulate(self):
        xyz1 = jnp.array([[0.5, 0.5, 0.5]])
        xyz2 = jnp.array([[0.6, 0.6, 0.6], [5.5, 0.5, 0.5]])
        g = voxel_grid.empty(1.0, 256)
        g = voxel_grid.insert(g, pcl.make(xyz1))
        g = voxel_grid.insert(g, pcl.make(xyz2))
        assert float(g.count.sum()) == 3.0
        found, mean, cov, cnt = voxel_grid.nearest_cell(g, jnp.array([[0.5, 0.5, 0.5]]))
        assert bool(found[0]) and float(cnt[0]) == 2.0
        np.testing.assert_allclose(mean[0], [0.55, 0.55, 0.55], atol=1e-5)

    def test_decay_removes_far_cells(self):
        xyz = jnp.array([[0.5, 0.5, 0.5], [50.5, 0.5, 0.5]])
        g = voxel_grid.insert(voxel_grid.empty(1.0, 256), pcl.make(xyz))
        g = voxel_grid.decay(g, jnp.zeros(3), 10.0)
        found, *_ = voxel_grid.nearest_cell(g, xyz)
        assert bool(found[0]) and not bool(found[1])
        # freed slot is reclaimable
        g = voxel_grid.insert(g, pcl.make(jnp.array([[50.5, 0.5, 0.5]])))
        found, *_ = voxel_grid.nearest_cell(g, xyz[1:])
        assert bool(found[0])


class TestOdometry:
    @pytest.mark.slow
    def test_tracks_circle(self):
        """Odometry on raycast scans along an arc: trajectory error stays
        well under the motion scale."""
        world = synthetic.default_world(3)
        n_frames = 20
        traj = synthetic.circle_trajectory(n_frames, radius=25.0, laps=0.08)
        keys = jax.random.split(jax.random.PRNGKey(1), n_frames)
        scans = []
        for i in range(n_frames):
            xyz, _, hit = synthetic.scan(
                world, se3.index(traj, i), n_rings=16, n_azimuth=512, key=keys[i]
            )
            scans.append(synthetic.scan_to_cloud(xyz, hit))
        batch = jax.tree.map(lambda *x: jnp.stack(x), *scans)
        config = odometry.OdometryConfig(
            scan_leaf=0.4, map_leaf=1.0, scan_capacity=4096, table_size=1 << 16,
            iters=10,
        )
        final, poses, diag = odometry.run(batch, config, origin=se3.index(traj, 0))
        t_err = jnp.linalg.norm(poses.t - traj.t, axis=-1)
        travelled = float(jnp.sum(jnp.linalg.norm(jnp.diff(traj.t, axis=0), axis=-1)))
        assert float(t_err[-1]) < max(0.05 * travelled, 0.5), (
            f"drift {float(t_err[-1]):.2f} over {travelled:.1f} m"
        )

    def test_step_is_jittable_and_stateful(self):
        config = odometry.OdometryConfig(table_size=1 << 12, scan_capacity=512)
        state = odometry.init(config)
        pc = pcl.pad_to(
            pcl.make(jax.random.uniform(jax.random.PRNGKey(0), (256, 3), minval=-5, maxval=5)),
            512,
        )
        state, diag = odometry.step(state, pc, config)
        assert int(state.frame) == 1
        assert float(state.grid.count.sum()) > 0


class TestKeyframes:
    def test_distance_gate(self):
        store = keyframes.init(capacity=8, points_per_kf=128)
        pc = pcl.make(jax.random.uniform(jax.random.PRNGKey(0), (64, 3), minval=-5, maxval=5))
        # first frame always accepted (infinite last_pose)
        store, added = keyframes.maybe_add(store, pc, se3.identity(), jnp.float32(0.0))
        assert bool(added) and int(store.count) == 1
        # 1 m move < 2 m gate: rejected
        p1 = se3.Pose(jnp.eye(3), jnp.array([1.0, 0.0, 0.0]))
        store, added = keyframes.maybe_add(store, pc, p1, jnp.float32(1.0))
        assert not bool(added) and int(store.count) == 1
        # 3 m move: accepted
        p2 = se3.Pose(jnp.eye(3), jnp.array([3.0, 0.0, 0.0]))
        store, added = keyframes.maybe_add(store, pc, p2, jnp.float32(2.0))
        assert bool(added) and int(store.count) == 2
        np.testing.assert_allclose(store.poses.t[1], [3.0, 0, 0])

    def test_capacity_limit(self):
        store = keyframes.init(capacity=2, points_per_kf=64)
        pc = pcl.make(jnp.zeros((16, 3)))
        for i in range(4):
            p = se3.Pose(jnp.eye(3), jnp.array([10.0 * i, 0.0, 0.0]))
            store, _ = keyframes.maybe_add(store, pc, p, jnp.float32(i))
        assert int(store.count) == 2

    def test_merged_neighborhood(self):
        store = keyframes.init(capacity=8, points_per_kf=128)
        for i in range(4):
            pc = pcl.make(jnp.ones((32, 3)) * 0.1 * i)
            p = se3.Pose(jnp.eye(3), jnp.array([5.0 * i, 0.0, 0.0]))
            store, _ = keyframes.maybe_add(store, pc, p, jnp.float32(i))
        merged = keyframes.merged_neighborhood(store, jnp.int32(1), window=1)
        # keyframes 0..2 present, world x spans [0..10]+cloud offsets
        assert int(merged.count()) > 0
        pts = np.asarray(pcl.compact(merged).xyz[: int(merged.count())])
        assert pts[:, 0].min() < 1.0 and pts[:, 0].max() > 9.0
