"""Bag-style replay feeder driving the online session (the rosbag
playback analogue, `README.md` Quick Demo)."""
import numpy as np
import pytest

from mr_slam_tpu.datasets import replay, synthetic
from mr_slam_tpu.runtime.config import SlamConfig, LoopCfg, OdometryCfg
from mr_slam_tpu.runtime.online import OnlineSlam


@pytest.mark.slow
class TestReplay:
    def test_synthetic_bag_drives_online_session(self):
        world = synthetic.default_world(5)
        n = 10
        trajs = [
            synthetic.circle_trajectory(n, radius=22.0, laps=0.25,
                                        phase=2 * np.pi * r / 2)
            for r in range(2)
        ]
        bag = replay.synthetic_bag(world, trajs, n, n_azimuth=256)
        # interleaved stamps, both robots present
        assert len(bag) == 2 * n
        stamps = [f.stamp for f in bag]
        assert stamps == sorted(stamps)
        assert {f.robot for f in bag} == {0, 1}

        cfg = SlamConfig(
            odometry=OdometryCfg(table_size=1 << 15, scan_capacity=2048,
                                 insert_capacity=8192),
            loops=LoopCfg(dist_thresh=0.3, min_separation=5,
                          fitness_thresh=0.15),
        )
        sess = OnlineSlam(cfg)
        n_fed = replay.replay(bag, sess)
        assert n_fed == 2 * n
        assert set(sess.robots) == {0, 1}  # discovery on first sight
        res = sess.result()
        for r in range(2):
            assert int(res.robots[r].store.count) >= 2

    def test_scanlog_bag_roundtrip(self, tmp_path):
        from mr_slam_tpu import native

        if native.load() is None:
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(0)
        paths = {}
        for r in range(2):
            p = str(tmp_path / f"robot{r}.mrlog")
            w = native.ScanLogWriter(p, max_points=64)
            for i in range(3):
                pose12 = np.eye(3, 4, dtype=np.float32).reshape(-1)
                xyz = rng.normal(0, 5, (64, 3)).astype(np.float32)
                w.write(i * 0.1 + r * 0.03, pose12, xyz)
            w.close()
            paths[r] = p
        frames = list(replay.scanlog_bag(paths))
        assert len(frames) == 6
        stamps = [f.stamp for f in frames]
        assert stamps == sorted(stamps)
        assert frames[0].origin is not None  # first sight carries origin
