import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.frontend import lio
from mr_slam_tpu.geometry import se3, so3


class TestImuPropagation:
    def test_static_hover(self):
        """Zero rates + exact gravity reaction: state stays put."""
        config = lio.LioConfig(table_size=1 << 10)
        state = lio.init(config)
        imu = lio.ImuSample(
            gyro=jnp.zeros((10, 3)),
            acc=jnp.tile(jnp.array([0.0, 0.0, 9.81]), (10, 1)),
            dt=jnp.full((10,), 0.01),
        )
        state2, _ = lio.propagate(state, imu, config)
        np.testing.assert_allclose(state2.p, 0.0, atol=1e-4)
        np.testing.assert_allclose(state2.v, 0.0, atol=1e-3)

    def test_constant_yaw_rate(self):
        config = lio.LioConfig(table_size=1 << 10)
        state = lio.init(config)
        rate = 0.5
        imu = lio.ImuSample(
            gyro=jnp.tile(jnp.array([0.0, 0.0, rate]), (100, 1)),
            acc=jnp.tile(jnp.array([0.0, 0.0, 9.81]), (100, 1)),
            dt=jnp.full((100,), 0.01),
        )
        state2, _ = lio.propagate(state, imu, config)
        yaw = float(jnp.arctan2(state2.R[1, 0], state2.R[0, 0]))
        np.testing.assert_allclose(yaw, rate * 1.0, atol=0.02)

    def test_trajectory_imu_consistency(self):
        """Integrating synthesized IMU reproduces the source trajectory
        (drift-free in the noiseless case over a short horizon)."""
        traj = synthetic.circle_trajectory(30, radius=20.0, laps=0.1)
        gyro, acc, dts = synthetic.imu_for_trajectory(traj, frame_dt=0.1, n_sub=20)
        config = lio.LioConfig(table_size=1 << 10)
        state = lio.init(config, se3.index(traj, 0))
        # initial velocity from trajectory
        v0 = (traj.t[1] - traj.t[0]) / 0.1
        state = state._replace(v=v0)
        for i in range(29):
            imu = lio.ImuSample(gyro=gyro[i], acc=acc[i], dt=dts[i])
            state, _ = lio.propagate(state, imu, config)
        err = np.linalg.norm(np.asarray(state.p - traj.t[-1]))
        assert err < 1.0, f"IMU dead-reckoning err {err:.3f}"


@pytest.mark.slow
class TestLioPipeline:
    def test_tracks_with_imu(self):
        world = synthetic.default_world(3)
        n = 15
        traj = synthetic.circle_trajectory(n, radius=25.0, laps=0.05)
        gyro, acc, dts = synthetic.imu_for_trajectory(traj, frame_dt=0.1, n_sub=10)
        config = lio.LioConfig(
            table_size=1 << 16, scan_capacity=4096, iters=4
        )
        state = lio.init(config, se3.index(traj, 0))
        state = state._replace(v=(traj.t[1] - traj.t[0]) / 0.1)
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        errs = []
        for i in range(n - 1):
            xyz, _, hit = synthetic.scan(
                world, se3.index(traj, i + 1), n_rings=16, n_azimuth=512,
                key=keys[i],
            )
            scan = synthetic.scan_to_cloud(xyz, hit)
            # synthetic scans are instantaneous at sweep END (the pose we
            # raycast from), so stamp all points at the interval end
            pt_time = jnp.full((scan.xyz.shape[0],), 0.0999)
            imu = lio.ImuSample(gyro=gyro[i], acc=acc[i], dt=dts[i])
            state, inl = lio.step(state, scan, pt_time, imu, config)
            errs.append(float(jnp.linalg.norm(state.p - traj.t[i + 1])))
        assert errs[-1] < 0.5, f"LIO drift {errs[-1]:.3f} ({errs})"
