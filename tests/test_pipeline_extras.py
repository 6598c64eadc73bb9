import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.geometry import se3
from mr_slam_tpu.mapping import costmap as costmap_mod
from mr_slam_tpu.runtime import pipeline
from mr_slam_tpu.runtime.config import OdometryCfg, SlamConfig
from tests.test_pipeline import SMALL_CFG, make_scans


@pytest.mark.slow
class TestElevationIntegration:
    def test_build_elevation_from_result(self):
        world = synthetic.default_world(5)
        n = 16
        traj = synthetic.circle_trajectory(n, radius=22.0, laps=0.25)
        scans = make_scans(world, traj, n)
        res = pipeline.run([scans], SMALL_CFG, origins=[se3.index(traj, 0)])
        emap, feats, cm = pipeline.build_elevation(res, SMALL_CFG, size=600)
        valid_frac = float(jnp.mean(emap.valid))
        assert valid_frac > 0.01
        # costmap has free and lethal cells
        cost = np.asarray(cm.cost)
        assert (cost == 0).sum() > 100
        assert (cost == 100).sum() > 10


@pytest.mark.slow
class TestLioFrontend:
    def test_pipeline_with_lio(self):
        world = synthetic.default_world(3)
        n = 14
        traj = synthetic.circle_trajectory(n, radius=25.0, laps=0.05)
        scans = make_scans(world, traj, n)
        gyro, acc, dts = synthetic.imu_for_trajectory(traj, frame_dt=0.1, n_sub=10)
        cfg = SMALL_CFG.replace(
            odometry=OdometryCfg(frontend="lio", table_size=1 << 16)
        )
        rr = pipeline.run_frontend(
            scans, cfg, origin=se3.index(traj, 0), imu=(gyro, acc, dts)
        )
        errs = jnp.linalg.norm(rr.odom_poses.t - traj.t, axis=-1)
        assert float(errs[-1]) < 1.0, np.asarray(errs).round(2)


@pytest.mark.slow
class TestOdomSpaceLoops:
    def test_radius_search_finds_loops_without_descriptors(self):
        """Same-robot loops via the odometry-space radius path
        (`global_manager.cpp:1029-1094`) with the descriptor gate shut."""
        from mr_slam_tpu.runtime.config import LoopCfg

        world = synthetic.default_world(5)
        n = 28
        traj = synthetic.circle_trajectory(n, radius=22.0, laps=1.15)
        scans = make_scans(world, traj, n)
        cfg = SlamConfig(
            odometry=OdometryCfg(table_size=1 << 16, scan_capacity=4096),
            loops=LoopCfg(
                dist_thresh=1e-6,       # descriptor path produces nothing
                min_separation=8, fitness_thresh=0.15,
                odom_radius=6.0,
            ),
        )
        res = pipeline.run([scans], cfg, origins=[se3.index(traj, 0)])
        assert len(res.loops) >= 1, "odometry-space path found no loops"
        for l in res.loops:
            assert l["robot_a"] == l["robot_b"] == 0
            assert abs(l["kf_a"] - l["kf_b"]) > 8
