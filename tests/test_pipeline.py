"""End-to-end SLAM pipeline tests on the synthetic world — the
deterministic counterpart of the reference's rosbag demos."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.eval import metrics
from mr_slam_tpu.geometry import se3
from mr_slam_tpu.runtime import pipeline
from mr_slam_tpu.runtime.config import SlamConfig, LoopCfg, OdometryCfg


def make_scans(world, traj, n_frames, seed=0, n_rings=16, n_azimuth=512):
    keys = jax.random.split(jax.random.PRNGKey(seed), n_frames)
    scans = []
    for i in range(n_frames):
        xyz, _, hit = synthetic.scan(
            world, se3.index(traj, i), n_rings=n_rings, n_azimuth=n_azimuth,
            key=keys[i],
        )
        scans.append(synthetic.scan_to_cloud(xyz, hit))
    return jax.tree.map(lambda *x: jnp.stack(x), *scans)


SMALL_CFG = SlamConfig(
    odometry=OdometryCfg(table_size=1 << 16, scan_capacity=4096),
    loops=LoopCfg(dist_thresh=0.3, min_separation=5, fitness_thresh=0.15),
)


@pytest.mark.slow
class TestSingleRobot:
    def test_full_loop_reduces_drift(self):
        """One robot drives 1.15 laps; the loop closure must cut the
        end-of-run keyframe ATE versus raw odometry."""
        world = synthetic.default_world(5)
        n = 60
        traj = synthetic.circle_trajectory(n, radius=22.0, laps=1.15)
        scans = make_scans(world, traj, n)
        res = pipeline.run([scans], SMALL_CFG, origins=[se3.index(traj, 0)])
        K = int(res.robots[0].store.count)
        assert K >= 10, f"only {K} keyframes"
        kf_idx = res.robots[0].kf_frame_idx
        true_kf = se3.index(traj, jnp.asarray(kf_idx))
        odo_kf = res.robots[0].store.poses
        odo_kf = se3.index(odo_kf, slice(0, K))
        opt_kf = res.optimized_trajectory(0)
        ate_odo = metrics.ate(odo_kf, true_kf)
        ate_opt = metrics.ate(opt_kf, true_kf)
        assert len(res.loops) >= 1, "no loop closures found"
        assert float(ate_opt.rmse) <= float(ate_odo.rmse) + 0.05, (
            f"opt {float(ate_opt.rmse):.3f} vs odo {float(ate_odo.rmse):.3f}"
        )

    def test_compose_map(self):
        world = synthetic.default_world(5)
        n = 20
        traj = synthetic.circle_trajectory(n, radius=22.0, laps=0.3)
        scans = make_scans(world, traj, n)
        res = pipeline.run([scans], SMALL_CFG, origins=[se3.index(traj, 0)])
        cloud = pipeline.compose_map(res)
        assert int(cloud.count()) > 1000
