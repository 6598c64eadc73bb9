import jax
import jax.numpy as jnp
import numpy as np

from mr_slam_tpu.geometry import Pose, so3
from mr_slam_tpu.loop import bev, fast_histogram, m2dp, ring
from mr_slam_tpu.ops import pointcloud as pcl
from tests.test_loop import scene_cloud


class TestM2DP:
    def test_shape_and_finite(self):
        d = m2dp.describe(scene_cloud())
        assert d.shape == (4 * 16 + 8 * 16,)
        assert bool(jnp.all(jnp.isfinite(d)))

    def test_rotation_robustness(self):
        a = m2dp.describe(scene_cloud())
        rot = pcl.transform(
            scene_cloud(), Pose(so3.yaw_rot(jnp.array(0.8)), jnp.zeros(3))
        )
        b = m2dp.describe(rot)
        c = m2dp.describe(scene_cloud(offset=(30.0, 25.0)))
        # PCA alignment makes it approximately rotation invariant
        assert float(jnp.linalg.norm(a - b)) < float(jnp.linalg.norm(a - c))


class TestFastHistogram:
    def test_describe_normalized(self):
        h = fast_histogram.describe(scene_cloud())
        np.testing.assert_allclose(float(h.sum()), 1.0, atol=1e-5)

    def test_distance_discriminates(self):
        a = fast_histogram.describe(scene_cloud())
        b = fast_histogram.describe(scene_cloud(offset=(1.0, 0.5)))
        c = fast_histogram.describe(scene_cloud(offset=(30.0, 25.0)))
        db = jnp.stack([b, c])
        d = fast_histogram.distance(a, db)
        assert float(d[0]) < float(d[1])

    def test_rotation_invariant(self):
        a = fast_histogram.describe(scene_cloud())
        rot = pcl.transform(
            scene_cloud(), Pose(so3.yaw_rot(jnp.array(1.3)), jnp.zeros(3))
        )
        b = fast_histogram.describe(rot)
        d = fast_histogram.distance(a, b[None])
        assert float(d[0]) < 0.01


class TestRingPP:
    def _desc_of(self, cloud):
        ds = pcl.voxel_downsample(cloud, 0.5, 4096)
        fb = bev.eigen_feature_bev(ds, 120, 120, k=8)
        return ring.describe_ringpp(fb)

    def _desc(self, **kw):
        return self._desc_of(scene_cloud(**kw))

    def test_shapes(self):
        d = self._desc()
        assert d.sinograms.shape == (6, 120, 120)
        assert d.tirings.shape == (6, 120, 120)

    def test_correlate_recovers_yaw(self):
        k = 30
        yaw = np.pi * k / 120
        base = scene_cloud()
        rot = pcl.transform(base, Pose(so3.yaw_rot(jnp.array(yaw)), jnp.zeros(3)))
        a = self._desc_of(base)
        b = self._desc_of(rot)
        dist, shift = ring.correlate_multichannel(a.tirings, b.tirings[None])
        err = min((int(shift[0]) - k) % 120, (k - int(shift[0])) % 120)
        assert err <= 3, f"shift {int(shift[0])} vs {k}"

    def test_discriminates(self):
        a = self._desc()
        b = self._desc(offset=(2.0, 1.0))
        c = self._desc(offset=(30.0, 25.0))
        d_same, _ = ring.correlate_multichannel(a.tirings, b.tirings[None])
        d_diff, _ = ring.correlate_multichannel(a.tirings, c.tirings[None])
        assert float(d_same[0]) < float(d_diff[0])


class TestM2DPBasis:
    def test_degenerate_view_basis_is_orthonormal(self):
        """Near-vertical view dirs hit the cross(dir, z) degeneracy; the
        fallback must normalize PER ROW (regression: `ord=-1` was being
        passed where `axis=-1` was meant, dividing by a scalar matrix
        norm)."""
        from mr_slam_tpu.loop import m2dp

        dirs = jnp.array([
            [0.0, 0.0, 1.0],              # exactly vertical
            [1e-4, 0.0, 1.0],             # near-vertical (unnormalized ok)
            [0.0, 0.0, -1.0],             # down
            [1.0, 0.0, 0.0],              # regular
            [0.3, -0.4, 0.86],            # generic
        ])
        ex, ey = m2dp.projection_basis(dirs)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(ex), axis=-1), 1.0, atol=1e-5
        )
        # ex orthogonal to its view direction
        dots = np.abs(np.sum(np.asarray(ex) * np.asarray(dirs), axis=-1))
        assert (dots < 1e-5 * np.linalg.norm(np.asarray(dirs), axis=-1)).all()
        # ey = dir x ex is orthogonal to both
        dots_y = np.abs(np.sum(np.asarray(ey) * np.asarray(ex), axis=-1))
        assert (dots_y < 1e-5).all()
