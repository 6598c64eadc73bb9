import jax
import jax.numpy as jnp
import numpy as np

from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.frontend import preprocess as pp
from mr_slam_tpu.geometry import se3, so3
from mr_slam_tpu.ops import pointcloud as pcl


def _synthetic_cloud(n=4096, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    # points on a sphere shell between 2 and 40 m, elevations within VLP16 FOV
    az = jax.random.uniform(k1, (n,), minval=0, maxval=2 * jnp.pi)
    el = jax.random.uniform(k2, (n,), minval=-15.0, maxval=15.0) * jnp.pi / 180
    r = jax.random.uniform(k1, (n,), minval=2.0, maxval=40.0)
    xyz = jnp.stack(
        [r * jnp.cos(el) * jnp.cos(az), r * jnp.cos(el) * jnp.sin(az), r * jnp.sin(el)],
        axis=-1,
    )
    return pcl.make(xyz)


class TestRings:
    def test_assign_rings_vlp16(self):
        pc = _synthetic_cloud()
        ring, valid = pp.assign_rings(pc.xyz, pp.VLP16)
        assert ring.min() >= 0 and ring.max() <= 15
        assert bool(valid.all())
        # elevation order respected: higher z/r -> higher ring
        ang = pp.vertical_angles(pc.xyz)
        order = jnp.argsort(ang)
        assert bool(jnp.all(jnp.diff(ring[order]) >= 0))

    def test_out_of_fov_invalid(self):
        xyz = jnp.array([[1.0, 0.0, 10.0]])  # ~84 deg elevation
        _, valid = pp.assign_rings(xyz, pp.VLP16)
        assert not bool(valid[0])

    def test_hdl64_ring_count(self):
        pc = _synthetic_cloud()
        ring, _ = pp.assign_rings(pc.xyz, pp.HDL64)
        assert ring.max() <= 63


class TestTimes:
    def test_relative_times_span(self):
        pc = _synthetic_cloud()
        t = pp.relative_times(pc.xyz, pp.VLP16, start_azimuth=jnp.array(0.0))
        assert float(t.min()) >= 0.0
        assert float(t.max()) <= pp.VLP16.scan_period + 1e-6

    def test_azimuth_convention(self):
        # -atan2(y,x): +x axis -> 0, point at -y quarter turn later
        xyz = jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
        phi = pp.azimuth(xyz)
        assert abs(float(phi[0])) < 1e-6
        np.testing.assert_allclose(float(phi[1]), np.pi / 2, atol=1e-6)


class TestFilters:
    def test_blind_filter(self):
        xyz = jnp.array([[0.1, 0.0, 0.0], [5.0, 0.0, 0.0], [500.0, 0.0, 0.0]])
        out = pp.blind_filter(pcl.make(xyz), pp.VLP16)
        np.testing.assert_array_equal(np.asarray(out.mask), [False, True, False])

    def test_point_skip(self):
        pc = _synthetic_cloud(100)
        out = pp.point_skip(pc, 3)
        assert int(out.count()) == 34  # ceil(100/3)


class TestRangeImage:
    def test_roundtrip_occupancy(self):
        pc = _synthetic_cloud()
        img, hit, times = pp.to_range_image(pc, pp.VLP16, n_azimuth=512)
        assert img.shape == (16, 512, 3)
        assert hit.shape == (16, 512)
        assert int(hit.sum()) > 1000
        # every hit cell holds a real (finite, in-range) point
        r = jnp.linalg.norm(img, axis=-1)
        assert float(jnp.max(jnp.where(hit, r, 0.0))) < pp.VLP16.max_range

    def test_nearest_return_wins(self):
        # two points in the same cell; nearer one should be kept
        xyz = jnp.array([[10.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
        img, hit, _ = pp.to_range_image(pcl.make(xyz), pp.VLP16, n_azimuth=64)
        ring, _ = pp.assign_rings(xyz, pp.VLP16)
        cell = img[int(ring[0]), 0]
        np.testing.assert_allclose(np.asarray(cell), [5.0, 0.0, 0.0], atol=1e-5)

    def test_feeds_feature_extract(self):
        from mr_slam_tpu.ops import features

        world = synthetic.default_world(0)
        xyz, rng, hit = synthetic.scan(world, se3.identity(), n_rings=16, n_azimuth=384)
        cloud = synthetic.scan_to_cloud(xyz, hit)
        img, h2, _ = pp.to_range_image(cloud, pp.VLP16, n_azimuth=384)
        f = features.extract(img, h2)
        assert int(f.surfs.count()) > 0


class TestUndistort:
    def test_identity_delta_is_noop(self):
        pc = _synthetic_cloud(256)
        t = pp.relative_times(pc.xyz, pp.VLP16, start_azimuth=jnp.array(0.0))
        out = pp.undistort_constant_velocity(pc, t, se3.identity(), 0.1)
        np.testing.assert_allclose(np.asarray(out.xyz), np.asarray(pc.xyz), atol=1e-5)

    def test_full_sweep_gets_full_delta(self):
        xyz = jnp.array([[3.0, 1.0, 0.5]])
        pc = pcl.make(xyz)
        delta = se3.Pose(so3.exp(jnp.array([0.0, 0.0, 0.2])), jnp.array([1.0, 0.0, 0.0]))
        out = pp.undistort_constant_velocity(pc, jnp.array([0.1]), delta, 0.1)
        expect = delta.R @ xyz[0] + delta.t
        np.testing.assert_allclose(np.asarray(out.xyz[0]), np.asarray(expect), atol=1e-5)

    def test_half_sweep_gets_half_rotation(self):
        xyz = jnp.array([[3.0, 0.0, 0.0]])
        pc = pcl.make(xyz)
        delta = se3.Pose(so3.exp(jnp.array([0.0, 0.0, 0.4])), jnp.zeros(3))
        out = pp.undistort_constant_velocity(pc, jnp.array([0.05]), delta, 0.1)
        half = so3.exp(jnp.array([0.0, 0.0, 0.2])) @ xyz[0]
        np.testing.assert_allclose(np.asarray(out.xyz[0]), np.asarray(half), atol=1e-5)


class TestLivox:
    def test_livox_preprocess(self):
        key = jax.random.PRNGKey(1)
        xyz = jax.random.uniform(key, (512, 3), minval=-30, maxval=30)
        offs = jnp.linspace(0.0, 0.1, 512)
        line = jnp.arange(512) % 6
        pc, t, ring = pp.livox_preprocess(xyz, offs, line, skip=2)
        assert int(pc.count()) <= 256
        assert ring.max() <= 5
