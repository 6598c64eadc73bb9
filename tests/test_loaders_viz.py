import os

import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.datasets import loaders


class TestKitti:
    def test_load_bin(self, tmp_path):
        pts = np.random.default_rng(0).random((100, 4)).astype(np.float32)
        p = str(tmp_path / "000000.bin")
        pts.tofile(p)
        xyz, mask, inten = loaders.load_kitti_bin(p, capacity=128)
        assert xyz.shape == (128, 3)
        assert mask.sum() == 100
        np.testing.assert_allclose(xyz[:100], pts[:, :3])
        np.testing.assert_allclose(inten[:100], pts[:, 3])

    def test_iter_sequence(self, tmp_path):
        for i in range(3):
            np.random.default_rng(i).random((10, 4)).astype(np.float32).tofile(
                str(tmp_path / f"{i:06d}.bin")
            )
        frames = list(loaders.iter_kitti_sequence(str(tmp_path), capacity=16))
        assert len(frames) == 3
        assert frames[2][0] == 2

    def test_poses(self, tmp_path):
        poses = np.tile(np.eye(3, 4).reshape(-1), (5, 1))
        p = str(tmp_path / "poses.txt")
        np.savetxt(p, poses)
        out = loaders.load_kitti_poses(p)
        assert out.shape == (5, 4, 4)
        np.testing.assert_allclose(out[0], np.eye(4))


class TestNclt:
    def test_load_velodyne_bin(self, tmp_path):
        # synthesize the packed NCLT format for known points
        pts = np.array([[1.0, -2.0, 0.5], [10.0, 20.0, -1.0]])
        scale, offset = 0.005, -100.0
        q = np.round((pts - offset) / scale).astype(np.uint16)
        rec = np.zeros((2, 8), np.uint8)
        rec[:, 0] = q[:, 0] & 0xFF
        rec[:, 1] = q[:, 0] >> 8
        rec[:, 2] = q[:, 1] & 0xFF
        rec[:, 3] = q[:, 1] >> 8
        rec[:, 4] = q[:, 2] & 0xFF
        rec[:, 5] = q[:, 2] >> 8
        rec[:, 6] = [7, 8]
        p = str(tmp_path / "scan.bin")
        rec.tofile(p)
        xyz, mask, inten = loaders.load_nclt_velodyne_bin(p)
        assert mask.sum() == 2
        np.testing.assert_allclose(xyz[:2], pts, atol=0.006)
        np.testing.assert_allclose(inten[:2], [7, 8])


class TestVisualize:
    @pytest.mark.slow
    def test_plot_map_and_costmap(self, tmp_path):
        from mr_slam_tpu.datasets import synthetic
        from mr_slam_tpu.eval import visualize
        from mr_slam_tpu.geometry import se3
        from mr_slam_tpu.mapping import costmap, elevation
        from mr_slam_tpu.runtime import pipeline
        from tests.test_pipeline import SMALL_CFG, make_scans

        world = synthetic.default_world(5)
        traj = synthetic.circle_trajectory(10, radius=22.0, laps=0.15)
        scans = make_scans(world, traj, 10)
        res = pipeline.run([scans], SMALL_CFG, origins=[se3.index(traj, 0)])
        p1 = str(tmp_path / "map.png")
        visualize.plot_map(p1, res)
        assert os.path.getsize(p1) > 10_000
        emap, feats, cm = pipeline.build_elevation(res, SMALL_CFG, size=400)
        p2 = str(tmp_path / "elev.png")
        visualize.plot_elevation(p2, emap, feats)
        p3 = str(tmp_path / "cost.png")
        visualize.plot_costmap(p3, cm)
        assert os.path.getsize(p2) > 5_000 and os.path.getsize(p3) > 5_000
