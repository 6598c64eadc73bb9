import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.geometry import Pose, se3, so3
from mr_slam_tpu.loop import bev, disco, ring, scancontext
from mr_slam_tpu.ops import pointcloud as pcl


def scene_cloud(seed=0, pose=None, yaw=0.0, offset=(0.0, 0.0)):
    world = synthetic.default_world(seed)
    if pose is None:
        pose = Pose(so3.yaw_rot(jnp.array(yaw)), jnp.array([offset[0], offset[1], 0.0]))
    xyz, _, hit = synthetic.scan(world, pose, n_rings=32, n_azimuth=512)
    return synthetic.scan_to_cloud(xyz, hit)


class TestBEV:
    def test_cartesian_occupancy(self):
        pc = bev.normalize_cloud(scene_cloud())
        g = bev.cartesian_occupancy(pc, 120, 120)
        assert g.shape == (1, 120, 120)
        assert 0 < float(g.sum()) < 120 * 120

    def test_polar_occupancy_shape(self):
        g = bev.polar_occupancy(scene_cloud(), 40, 120, z_bins=20)
        assert g.shape == (20, 40, 120)
        assert float(g.sum()) > 0

    def test_polar_max_height(self):
        g = bev.polar_max_height(scene_cloud(), 20, 60)
        assert g.shape == (20, 60)
        assert float(g.max()) > 0.5  # walls are tall

    def test_eigen_feature_bev(self):
        pc = bev.normalize_cloud(scene_cloud())
        pc = pcl.pad_to(pcl.compact(pc), 2048)  # cap for kNN cost
        g = bev.eigen_feature_bev(pc, 120, 120, k=8)
        assert g.shape == (6, 120, 120)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestScanContext:
    def test_rotation_shifts_columns(self):
        pc = scene_cloud(yaw=0.0)
        yaw = 2 * np.pi * 10 / 60  # exactly 10 sectors
        R = so3.yaw_rot(jnp.array(yaw))
        rot = pcl.transform(pc, Pose(R, jnp.zeros(3)))
        sc0 = scancontext.describe(pc)
        sc1 = scancontext.describe(rot)
        d, shift = scancontext.distance(sc0, sc1[None])
        assert float(d[0]) < 0.1
        assert int(shift[0]) in (10, 50)  # direction convention

    def test_discriminates_places(self):
        a = scancontext.describe(scene_cloud(offset=(0.0, 0.0)))
        b = scancontext.describe(scene_cloud(offset=(1.0, 0.5)))  # same place-ish
        c = scancontext.describe(scene_cloud(offset=(30.0, 25.0)))  # elsewhere
        d_same, _ = scancontext.distance(a, b[None])
        d_diff, _ = scancontext.distance(a, c[None])
        assert float(d_same[0]) < float(d_diff[0])

    def test_ring_key_retrieval(self):
        descs = jnp.stack(
            [
                scancontext.describe(scene_cloud(offset=(0.0, 0.0))),
                scancontext.describe(scene_cloud(offset=(2.0, 0.0))),
                scancontext.describe(scene_cloud(offset=(35.0, 30.0))),
            ]
        )
        keys = scancontext.ring_key(descs)
        q = scancontext.ring_key(scancontext.describe(scene_cloud(offset=(0.5, 0.0))))
        d = scancontext.retrieve(q, keys, jnp.array([True, True, True]))
        assert int(jnp.argmin(d)) == 0
        # masked entries excluded
        d2 = scancontext.retrieve(q, keys, jnp.array([False, True, True]))
        assert not bool(jnp.isfinite(d2[0]))


class TestRing:
    def test_radon_rotation_equivariance(self):
        """Rotating the cloud by k angle-bins row-shifts the sinogram."""
        pc = scene_cloud()
        n_angles = 120
        k = 15  # shift bins; rotation = k * pi / 120
        yaw = np.pi * k / n_angles
        rot = pcl.transform(pc, Pose(so3.yaw_rot(jnp.array(yaw)), jnp.zeros(3)))
        b0 = bev.cartesian_occupancy(bev.normalize_cloud(pc))[0]
        b1 = bev.cartesian_occupancy(bev.normalize_cloud(rot))[0]
        s0 = ring.radon(b0, n_angles)
        s1 = ring.radon(b1, n_angles)
        # compare s1 against all row-shifts of s0 (columns may flip sign
        # of the tau axis at the pi wrap; use TIRING rows which are
        # flip-insensitive via |FFT|)
        t0 = jnp.abs(jnp.fft.fft(s0, axis=-1))
        t1 = jnp.abs(jnp.fft.fft(s1, axis=-1))
        corrs = []
        for s in range(n_angles):
            corrs.append(float(jnp.sum(jnp.roll(t0, s, axis=0) * t1)))
        best = int(np.argmax(corrs))
        assert min((best - k) % n_angles, (k - best) % n_angles) <= 2

    def test_correlate_recovers_yaw(self):
        pc = scene_cloud()
        k = 23
        n_angles = 120
        yaw = np.pi * k / n_angles
        rot = pcl.transform(pc, Pose(so3.yaw_rot(jnp.array(yaw)), jnp.zeros(3)))
        d0 = ring.describe(bev.cartesian_occupancy(bev.normalize_cloud(pc))[0])
        d1 = ring.describe(bev.cartesian_occupancy(bev.normalize_cloud(rot))[0])
        dist, shift = ring.correlate(d0.tiring, d1.tiring[None])
        assert float(dist[0]) < 0.2
        err = min((int(shift[0]) - k) % n_angles, (k - int(shift[0])) % n_angles)
        assert err <= 2

    def test_tiring_translation_tolerance(self):
        """TIRING distance between same place +-2 m apart is much lower
        than to a different place."""
        a = ring.describe(bev.cartesian_occupancy(bev.normalize_cloud(scene_cloud()))[0])
        b = ring.describe(
            bev.cartesian_occupancy(bev.normalize_cloud(scene_cloud(offset=(2.0, 1.0))))[0]
        )
        c = ring.describe(
            bev.cartesian_occupancy(bev.normalize_cloud(scene_cloud(offset=(30.0, 28.0))))[0]
        )
        d_same, _ = ring.correlate(a.tiring, b.tiring[None])
        d_diff, _ = ring.correlate(a.tiring, c.tiring[None])
        assert float(d_same[0]) < float(d_diff[0])

    def test_fbp_reconstructs_image(self):
        """Filtered backprojection inverts the forward Radon transform
        (torch-radon API parity: forward + backprojection + FBP)."""
        size = 64
        y, x = np.mgrid[:size, :size]
        img = (
            ((x - 22) ** 2 + (y - 30) ** 2 < 81).astype(np.float32)
            + 0.5 * ((x - 44) ** 2 + (y - 40) ** 2 < 36).astype(np.float32)
        )
        # zero outside the inscribed circle: projections only cover it
        circle = ((x - (size - 1) / 2) ** 2 + (y - (size - 1) / 2) ** 2
                  < ((size - 1) / 2 - 2) ** 2)
        img = jnp.asarray(img * circle)
        sino = ring.radon(img, n_angles=180)
        rec = ring.fbp(sino, size)
        rec = rec * circle
        corr = float(
            jnp.sum(rec * img)
            / jnp.maximum(jnp.linalg.norm(rec) * jnp.linalg.norm(img), 1e-9)
        )
        assert corr > 0.9, corr
        # amplitude scale is right too (FBP is quantitative, not just shape)
        peak_ratio = float(jnp.max(rec) / jnp.max(img))
        assert 0.6 < peak_ratio < 1.5, peak_ratio

    def test_backproject_is_adjoint(self):
        """<radon(x), y> == <x, backproject(y)> — the operator pair
        property torch-radon guarantees between forward/backprojection
        (exact here: backprojection is the linear transpose)."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(45, 32)).astype(np.float32))
        lhs = float(jnp.sum(ring.radon(x, n_angles=45) * y))
        rhs = float(jnp.sum(x * ring.radon_backproject(y, 32)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)

    def test_solve_translation(self):
        pc = scene_cloud()
        dx, dy = 3.0, -2.0
        moved = pcl.transform(pc, Pose(jnp.eye(3), jnp.array([dx, dy, 0.0])))
        s_a = ring.describe(bev.cartesian_occupancy(bev.normalize_cloud(pc))[0])
        s_b = ring.describe(bev.cartesian_occupancy(bev.normalize_cloud(moved))[0])
        xy, res = ring.solve_translation(s_a.sinogram, s_b.sinogram, bev_extent=140.0)
        # sign/direction convention: check magnitude recovered within ~1.5 m
        err = np.linalg.norm(np.abs(np.asarray(xy)) - np.abs(np.array([dx, dy])))
        assert err < 1.5, f"xy={xy}"


class TestDisco:
    def _desc(self, **kw):
        g = bev.polar_occupancy(scene_cloud(**kw), 40, 120, z_bins=20)
        return disco.describe(g)

    def test_signature_rotation_invariance(self):
        a = self._desc(yaw=0.0)
        b = self._desc(yaw=1.0)
        c = self._desc(offset=(30.0, 25.0))
        d_rot = float(jnp.linalg.norm(a.signature - b.signature))
        d_diff = float(jnp.linalg.norm(a.signature - c.signature))
        assert d_rot < d_diff

    def test_relative_yaw(self):
        k = 20  # sectors; yaw = k * 3 deg
        yaw_true = 2 * np.pi * k / 120
        a = self._desc(yaw=0.0)
        b = self._desc(yaw=yaw_true)
        yaw, conf = disco.relative_yaw(a.spectrum, b.spectrum)
        err = abs(abs(float(yaw)) - yaw_true)
        assert err < 2 * np.pi * 3 / 120, f"yaw={yaw} true={yaw_true}"

    def test_distance_masks(self):
        a = self._desc()
        sigs = jnp.stack([a.signature, a.signature * 0 + 0.1])
        d = disco.distance(a.signature, sigs, jnp.array([True, False]))
        assert float(d[0]) < 1e-5
        assert not bool(jnp.isfinite(d[1]))
