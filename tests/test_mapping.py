import jax
import jax.numpy as jnp
import numpy as np

from mr_slam_tpu.mapping import costmap, elevation
from mr_slam_tpu.ops.pointcloud import PointCloud, make as make_cloud


def flat_cloud(key, n=512, z=0.5, extent=5.0, noise=0.01):
    xy = jax.random.uniform(key, (n, 2), minval=-extent, maxval=extent)
    zs = z + noise * jax.random.normal(jax.random.PRNGKey(7), (n, 1))
    return make_cloud(jnp.concatenate([xy, zs], axis=-1))


class TestElevation:
    def test_fuse_flat_ground(self):
        m = elevation.init(size=60, resolution=0.2)
        pc = flat_cloud(jax.random.PRNGKey(0))
        var = elevation.sensor_variance(pc.xyz)
        m = elevation.fuse(m, pc, var)
        h = np.asarray(m.height)[np.asarray(m.valid)]
        assert len(h) > 100
        np.testing.assert_allclose(h.mean(), 0.5, atol=0.05)

    def test_motion_update_lever_arm(self):
        """RobotMotionMapUpdater analogue: tilt drift inflates far cells
        more than near ones; vertical drift inflates all valid cells
        equally; invalid cells untouched."""
        m = elevation.init(size=40, resolution=0.2, center=(0, 0))
        pc = flat_cloud(jax.random.PRNGKey(0), extent=3.5)
        m = elevation.fuse(m, pc, elevation.sensor_variance(pc.xyz))
        robot = jnp.zeros(2)
        m2 = elevation.motion_update(m, robot, sigma_z=0.0, sigma_tilt=0.05)
        dv = np.asarray(m2.variance - m.variance)
        valid = np.asarray(m.valid)
        H, W = m.shape
        ci = (np.arange(H) + 0.5) * 0.2 + float(m.origin[0])
        cj = (np.arange(W) + 0.5) * 0.2 + float(m.origin[1])
        r2 = ci[:, None] ** 2 + cj[None, :] ** 2
        near = valid & (r2 < 1.0)
        far = valid & (r2 > 6.0)
        assert near.any() and far.any()
        assert dv[far].mean() > 4 * dv[near].mean()
        assert (dv[~valid] == 0).all()
        m3 = elevation.motion_update(m, robot, sigma_z=0.1, sigma_tilt=0.0)
        dz = np.asarray(m3.variance - m.variance)
        np.testing.assert_allclose(dz[valid], 0.01, rtol=1e-5)

    def test_variance_shrinks_with_fusion(self):
        m = elevation.init(size=30, resolution=0.2, center=(0, 0))
        for i in range(5):
            pc = flat_cloud(jax.random.PRNGKey(i), extent=2.0)
            m = elevation.fuse(m, pc, elevation.sensor_variance(pc.xyz))
        v = np.asarray(m.variance)[np.asarray(m.valid)]
        assert v.mean() < 0.01

    def test_mahalanobis_reset(self):
        m = elevation.init(size=30, resolution=0.2)
        pc = flat_cloud(jax.random.PRNGKey(0), extent=2.0, z=0.0)
        m = elevation.fuse(m, pc, elevation.sensor_variance(pc.xyz))
        for _ in range(3):  # converge variance down
            m = elevation.fuse(m, pc, elevation.sensor_variance(pc.xyz))
        # new surface 2 m higher: must RESET, not blend
        pc2 = flat_cloud(jax.random.PRNGKey(1), extent=2.0, z=2.0)
        m2 = elevation.fuse(m, pc2, elevation.sensor_variance(pc2.xyz))
        h = np.asarray(m2.height)[np.asarray(m2.valid)]
        assert np.median(h) > 1.5  # jumped to the new surface

    def test_shift_preserves_world_anchoring(self):
        m = elevation.init(size=30, resolution=0.2, center=(0, 0))
        pc = make_cloud(jnp.array([[1.0, 1.0, 0.7]]))
        m = elevation.fuse(m, pc, jnp.array([0.01]))
        m2 = elevation.shift(m, jnp.array([1.0, 1.0]))
        # the cell containing world (1,1) still holds ~0.7
        ij = np.floor((np.array([1.0, 1.0]) - np.asarray(m2.origin)) / 0.2).astype(int)
        assert bool(m2.valid[ij[0], ij[1]])
        np.testing.assert_allclose(float(m2.height[ij[0], ij[1]]), 0.7, atol=1e-5)

    def test_features_flat_vs_wall(self):
        m = elevation.init(size=60, resolution=0.2, center=(0, 0))
        # flat ground with a 1.5 m step wall along x=0
        pc = flat_cloud(jax.random.PRNGKey(0), n=4096, z=0.0, extent=5.0)
        m = elevation.fuse(m, pc, elevation.sensor_variance(pc.xyz))
        wall_xy = jax.random.uniform(jax.random.PRNGKey(1), (512, 1), minval=-5, maxval=5)
        wall = make_cloud(
            jnp.concatenate(
                [jnp.zeros((512, 1)) + 0.05, wall_xy, jnp.full((512, 1), 1.5)], axis=-1
            )
        )
        m = elevation.fuse(m, wall, elevation.sensor_variance(wall.xyz))
        f = elevation.features(m)
        trav = np.asarray(f.traversability)
        valid = np.asarray(m.valid)
        H, W = trav.shape
        # column of the wall (world x ~ 0) should be far less traversable
        wall_col = int((0.05 - float(m.origin[0])) / 0.2)
        flat_region = trav[valid & (np.abs(np.arange(H)[:, None] - wall_col) > 6)]
        wall_region = trav[valid & (np.abs(np.arange(H)[:, None] - wall_col) <= 2)]
        assert flat_region.mean() > 0.8
        assert wall_region.mean() < flat_region.mean() - 0.2

    def test_to_cloud_roundtrip(self):
        m = elevation.init(size=30, resolution=0.2)
        pc = make_cloud(jnp.array([[0.5, 0.5, 1.0]]))
        m = elevation.fuse(m, pc, jnp.array([0.01]))
        out = elevation.to_cloud(m)
        pts = np.asarray(out.xyz)[np.asarray(out.mask)]
        assert len(pts) == 1
        np.testing.assert_allclose(pts[0][:2], [0.5, 0.5], atol=0.2)
        np.testing.assert_allclose(pts[0][2], 1.0, atol=1e-5)


class TestCostmap:
    def _mapped_wall_scene(self):
        m = elevation.init(size=60, resolution=0.2, center=(0, 0))
        pc = flat_cloud(jax.random.PRNGKey(0), n=4096, z=0.0, extent=5.0)
        m = elevation.fuse(m, pc, elevation.sensor_variance(pc.xyz))
        wall_y = jax.random.uniform(jax.random.PRNGKey(1), (512, 1), minval=-5, maxval=5)
        wall_z = jax.random.uniform(jax.random.PRNGKey(2), (512, 1), minval=0, maxval=2.0)
        wall = make_cloud(jnp.concatenate([jnp.zeros((512, 1)), wall_y, wall_z], -1))
        m = elevation.fuse(m, wall, elevation.sensor_variance(wall.xyz))
        return m

    def test_from_elevation_marks_wall(self):
        m = self._mapped_wall_scene()
        f = elevation.features(m)
        cm = costmap.from_elevation(m, f)
        cost = np.asarray(cm.cost)
        valid = np.asarray(m.valid)
        assert (cost[valid] == 100).sum() > 10     # wall cells lethal
        assert (cost[valid] == 0).sum() > 200      # ground free
        assert (cost[~valid] == -1).all()          # unseen unknown

    def test_rasterize_cloud(self):
        cloud = make_cloud(
            jnp.array([[1.0, 1.0, 0.0], [2.0, 2.0, 0.0], [3.0, 3.0, 2.5]])
        )
        trav = jnp.array([0.9, 0.2, 0.9])
        cm = costmap.rasterize_cloud(
            cloud, trav, jnp.array([0.0, 0.0]), 0.5, 10
        )
        cost = np.asarray(cm.cost)
        assert cost[2, 2] == 0     # traversable point
        assert cost[4, 4] == 100   # low traversability
        assert cost[6, 6] == 100   # tall obstacle
        assert cost[0, 0] == -1    # empty

    def test_inflate(self):
        cm = costmap.Costmap(
            cost=jnp.zeros((9, 9), jnp.int8).at[4, 4].set(100),
            origin=jnp.zeros(2),
            resolution=jnp.float32(0.5),
        )
        out = costmap.inflate(cm, radius_cells=2)
        cost = np.asarray(out.cost)
        assert cost[2, 4] == 100 and cost[6, 4] == 100
        assert cost[0, 0] == 0


class TestSensorModels:
    def test_all_models_positive_and_range_dependent(self):
        xyz = jnp.array([[1.0, 0.0, 1.0], [10.0, 0.0, 10.0]])
        for name, fn in elevation.SENSOR_MODELS.items():
            v = np.asarray(fn(xyz))
            assert (v > 0).all(), name
            if name != "perfect":
                assert v[1] > v[0], name  # farther -> noisier


class TestRaytrace:
    def test_clears_stale_obstacle(self):
        m = elevation.init(size=60, resolution=0.2)
        # stale obstacle: a 2 m pillar at x=3 that is no longer there
        pillar = make_cloud(jnp.array([[3.0, 0.0, 2.0]] * 4))
        m = elevation.fuse(m, pillar, elevation.perfect_variance(pillar.xyz))
        assert bool(m.valid.any())
        # beams from the origin at z=0.5 hitting ground at x=5 pass
        # straight through the pillar cell well below 2 m
        ground = make_cloud(jnp.array([[5.0, y, 0.0] for y in (-0.1, 0.0, 0.1)]))
        origin = jnp.array([0.0, 0.0, 0.5])
        m2 = elevation.raytrace_clear(m, origin, ground)
        ij = jnp.floor((jnp.array([3.0, 0.0]) - m.origin) / m.resolution).astype(int)
        assert not bool(m2.valid[ij[0], ij[1]])

    def test_consistent_surface_untouched(self):
        m = elevation.init(size=60, resolution=0.2)
        pc = flat_cloud(jax.random.PRNGKey(0), z=0.0)
        m = elevation.fuse(m, pc, elevation.sensor_variance(pc.xyz))
        origin = jnp.array([0.0, 0.0, 1.0])
        m2 = elevation.raytrace_clear(m, origin, pc)
        # ground is below every beam: nothing cleared
        assert int(m.valid.sum()) == int(m2.valid.sum())


class TestInterpolation:
    def test_fills_holes(self):
        m = elevation.init(size=30, resolution=0.2)
        pc = flat_cloud(jax.random.PRNGKey(3), n=200, z=1.0, extent=2.5)
        m = elevation.fuse(m, pc, elevation.sensor_variance(pc.xyz))
        before = int(m.valid.sum())
        m2 = elevation.interpolate_dense(m, iterations=2)
        after = int(m2.valid.sum())
        assert after > before
        filled = np.asarray(m2.valid & ~m.valid)
        h = np.asarray(m2.height)[filled]
        np.testing.assert_allclose(h, 1.0, atol=0.1)


class TestColorLayer:
    """GEM camera path: colorize -> fuse_color -> ortho_image."""

    def _setup(self):
        from mr_slam_tpu.mapping import elevation as ev
        from mr_slam_tpu.ops.pointcloud import PointCloud
        m = ev.init(32, 0.5, (0.0, 0.0))
        key = jax.random.PRNGKey(0)
        xyz = jax.random.uniform(key, (500, 3), minval=-7, maxval=7)
        pc = PointCloud(xyz, jnp.ones((500,), bool))
        m = ev.fuse(m, pc, ev.sensor_variance(xyz))
        return ev, m, pc, xyz

    def test_colorize_visibility_and_fusion(self):
        ev, m, pc, xyz = self._setup()
        img = jnp.ones((48, 64, 3)) * jnp.array([0.2, 0.5, 0.8])
        R_down = jnp.diag(jnp.array([1.0, -1.0, -1.0]))  # optical axis -z
        cols, vis = ev.colorize_from_camera(
            xyz, R_down, jnp.array([0.0, 0.0, 10.0]),
            jnp.array([40.0, 40.0, 32.0, 24.0]), img)
        assert int(vis.sum()) > 100
        cg = ev.fuse_color(m, ev.init_color(32), pc, cols, vis)
        o = np.asarray(ev.ortho_image(m, cg))
        colored = np.asarray(cg.weight > 0)
        assert colored.sum() > 0
        expected = np.broadcast_to([0.2, 0.5, 0.8], o[colored].shape)
        np.testing.assert_allclose(o[colored], expected, atol=1e-5)
        # camera looking up sees nothing
        _, vis_up = ev.colorize_from_camera(
            xyz, jnp.eye(3), jnp.array([0.0, 0.0, 10.0]),
            jnp.array([40.0, 40.0, 32.0, 24.0]), img)
        assert int(vis_up.sum()) == 0

    def test_ortho_without_color_and_fake_image(self):
        ev, m, pc, _ = self._setup()
        o = np.asarray(ev.ortho_image(m))
        valid = np.asarray(m.valid)
        assert (o[~valid] == 0).all()
        assert o[valid].max() <= 1.0 and o[valid].max() > 0.0
        assert ev.fake_image().shape == (480, 640, 3)
