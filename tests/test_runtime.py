import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.backend import factor_graph as fg
from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.eval import pcd
from mr_slam_tpu.frontend import odometry
from mr_slam_tpu.geometry import se3
from mr_slam_tpu.ops import pointcloud as pcl
from mr_slam_tpu.runtime import checkpoint, online, persistence
from mr_slam_tpu.runtime.config import SlamConfig, LoopCfg, OdometryCfg
from tests.test_pipeline import make_scans, SMALL_CFG


class TestCheckpoint:
    def test_roundtrip_odometry_state(self, tmp_path):
        config = odometry.OdometryConfig(table_size=1 << 10, scan_capacity=256)
        state = odometry.init(config)
        scan = pcl.pad_to(
            pcl.make(jax.random.uniform(jax.random.PRNGKey(0), (128, 3), minval=-5, maxval=5)),
            256,
        )
        state, _ = odometry.step(state, scan, config)
        path = str(tmp_path / "ckpt.npz")
        checkpoint.save(path, state)
        template = odometry.init(config)
        restored = checkpoint.restore(path, template)
        np.testing.assert_allclose(restored.grid.packed, state.grid.packed)
        assert int(restored.frame) == 1
        # restored state continues stepping
        state2, _ = odometry.step(restored, scan, config)
        assert int(state2.frame) == 2

    def test_shape_mismatch_raises(self, tmp_path):
        path = str(tmp_path / "c.npz")
        checkpoint.save(path, {"a": jnp.zeros((3,))})
        with pytest.raises((ValueError, KeyError)):
            checkpoint.restore(path, {"a": jnp.zeros((4,))})


class TestPCD:
    def test_roundtrip_binary(self, tmp_path):
        xyz = np.random.default_rng(0).random((100, 3)).astype(np.float32)
        p = str(tmp_path / "a.pcd")
        pcd.write_pcd(p, xyz)
        back = pcd.read_pcd(p)
        np.testing.assert_allclose(back[:, :3], xyz, atol=1e-6)

    def test_roundtrip_ascii_intensity(self, tmp_path):
        xyz = np.random.default_rng(1).random((50, 3)).astype(np.float32)
        inten = np.arange(50, dtype=np.float32)
        p = str(tmp_path / "b.pcd")
        pcd.write_pcd(p, xyz, binary=False, intensity=inten)
        back = pcd.read_pcd(p)
        np.testing.assert_allclose(back[:, :3], xyz, atol=1e-5)
        np.testing.assert_allclose(back[:, 3], inten, atol=1e-5)


@pytest.mark.slow
class TestOnline:
    def test_online_matches_batch_shape(self, tmp_path):
        world = synthetic.default_world(5)
        n = 60
        traj = synthetic.circle_trajectory(n, radius=22.0, laps=1.15)
        scans = make_scans(world, traj, n)
        sess = online.OnlineSlam(SMALL_CFG)
        sess.register_robot(0, se3.index(traj, 0))
        for i in range(n):
            sess.add_frame(0, pcl.PointCloud(scans.xyz[i], scans.mask[i]), stamp=float(i))
        res = sess.result()
        K = int(res.robots[0].store.count)
        assert K >= 8
        assert len(res.loops) >= 1, "online session found no loops"
        # optimized trajectory finite and anchored
        opt = res.optimized_trajectory(0)
        assert bool(jnp.all(jnp.isfinite(opt.t)))
        np.testing.assert_allclose(opt.t[0], traj.t[0], atol=0.5)
        # artifact dump
        out = str(tmp_path / "artifacts")
        persistence.save_artifacts(out, res)
        assert os.path.exists(os.path.join(out, "fullGraph.g2o"))
        assert os.path.exists(os.path.join(out, "fullGraph_optimized.g2o"))
        assert os.path.exists(os.path.join(out, "map.pcd"))
        assert os.path.isdir(os.path.join(out, "keyframes", "0_0"))
        tfs = persistence.map_to_odom_transforms(res)
        assert len(tfs) == 1


class TestConfigOverlays:
    """Per-robot overlays — the reference's per-robot YAML configs +
    manual_config_dir initial poses (`global_manager.cpp:2469-2506`)."""

    def _cfg(self):
        from mr_slam_tpu.runtime.config import KeyframeCfg, RobotOverlay

        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [5.0, -2.0, 0.3]
        return SlamConfig(
            n_robots=2,
            overlays=(
                RobotOverlay(
                    robot=1,
                    keyframes=KeyframeCfg(dist_thresh=7.5),
                    init_pose=tuple(float(x) for x in T.reshape(-1)),
                ),
            ),
        )

    def test_for_robot_resolution(self):
        cfg = self._cfg()
        assert cfg.for_robot(0).keyframes.dist_thresh == 2.0
        assert cfg.for_robot(1).keyframes.dist_thresh == 7.5
        # resolved configs drop overlays so they hash as static jit args
        assert cfg.for_robot(1).overlays == ()
        hash(cfg.for_robot(1))

    def test_init_pose(self):
        cfg = self._cfg()
        assert cfg.init_pose(0) is None
        p = cfg.init_pose(1)
        np.testing.assert_allclose(np.asarray(p.t), [5.0, -2.0, 0.3])
        np.testing.assert_allclose(np.asarray(p.R), np.eye(3))

    def test_json_roundtrip(self):
        cfg = self._cfg()
        cfg2 = SlamConfig.from_json(cfg.to_json())
        assert cfg2 == cfg

    def test_online_uses_overlay(self):
        cfg = self._cfg()
        sess = online.OnlineSlam(cfg)
        sess.register_robot(1)
        # origin came from the overlay init_pose
        np.testing.assert_allclose(
            np.asarray(sess.robots[1]["odo"].pose.t), [5.0, -2.0, 0.3],
            atol=1e-6,
        )
        assert sess.robots[1]["kf_cfg"].dist_thresh == 7.5


class TestOnlineLio:
    @pytest.mark.slow
    def test_streaming_lio_session(self):
        """The online scheduler runs the FAST-LIO front-end per robot
        when cfg selects it (the reference's pluggable per-robot node),
        fed PointCloud2+Imu pairs through the bag replay."""
        from mr_slam_tpu.datasets import replay, synthetic
        from mr_slam_tpu.runtime.config import (
            KeyframeCfg, LoopCfg, OdometryCfg, SlamConfig,
        )

        world = synthetic.default_world(3)
        # rest start: LIO initializes v = 0 (robots power up standing)
        circ = synthetic.circle_trajectory(8, radius=25.0, laps=0.05)
        traj = se3.Pose(
            jnp.concatenate([jnp.broadcast_to(circ.R[:1], (3, 3, 3)), circ.R]),
            jnp.concatenate([jnp.broadcast_to(circ.t[:1], (3, 3)), circ.t]),
        )
        n = traj.t.shape[0]
        cfg = SlamConfig(
            odometry=OdometryCfg(frontend="lio", scan_capacity=4096,
                                 insert_capacity=8192, table_size=1 << 16),
            keyframes=KeyframeCfg(dist_thresh=1.0, capacity=16,
                                  points_per_kf=2048),
            loops=LoopCfg(method="scancontext", dist_thresh=0.4,
                          min_separation=4, verify_capacity=4096),
        )
        bag = replay.synthetic_bag(
            world, [traj], n, n_rings=16, n_azimuth=512, with_imu=True
        )
        sess = online.OnlineSlam(cfg)
        fed = replay.replay(bag, sess)
        assert fed == n
        res = sess.result()
        K = int(res.robots[0].store.count)
        assert K >= 3
        # LIO pose tracked the circle: final odometry within 1.5 m
        drift = float(jnp.linalg.norm(res.robots[0].odom_poses.t - traj.t[n - 1]))
        assert drift < 1.5, drift

    def test_lio_robot_requires_imu(self):
        from mr_slam_tpu.runtime.config import OdometryCfg, SlamConfig

        cfg = SlamConfig(odometry=OdometryCfg(
            frontend="lio", scan_capacity=512, insert_capacity=1024,
            table_size=1 << 10,
        ))
        sess = online.OnlineSlam(cfg)
        sess.register_robot(0)
        scan = pcl.PointCloud(jnp.zeros((512, 3)), jnp.ones((512,), bool))
        sess.add_frame(0, scan)  # frame 0 may omit imu
        with pytest.raises(ValueError):
            sess.add_frame(0, scan)
