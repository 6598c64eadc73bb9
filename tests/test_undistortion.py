"""Motion compensation in the production front-ends. Synthetic scans
are instantaneous, so a sheared-scan simulator (`synthetic.shear_scan`)
provides the spinning-lidar distortion that real data carries
(`IMU_Processing.hpp:65`, `laserOdometry.cpp:112-123`)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.frontend import preprocess
from mr_slam_tpu.geometry import se3, so3
from mr_slam_tpu.geometry.se3 import Pose
from mr_slam_tpu.ops import pointcloud as pcl
from mr_slam_tpu.runtime import pipeline as pl
from mr_slam_tpu.runtime.config import KeyframeCfg, OdometryCfg, SlamConfig


class TestShearRoundTrip:
    def test_undistort_inverts_shear(self):
        rng = np.random.default_rng(0)
        xyz = jnp.asarray(rng.uniform(-30, 30, (500, 3)), jnp.float32)
        pc = pcl.PointCloud(xyz, jnp.ones(500, bool))
        delta = Pose(
            so3.exp(jnp.array([0.0, 0.0, 0.3])), jnp.array([1.0, -0.5, 0.0])
        )
        sheared, t_rel = synthetic.shear_scan(pc, delta, scan_period=0.1)
        restored = preprocess.undistort_constant_velocity(
            sheared, t_rel, delta, 0.1
        )
        np.testing.assert_allclose(
            np.asarray(restored.xyz), np.asarray(xyz), atol=1e-4
        )

    def test_shear_is_nontrivial(self):
        rng = np.random.default_rng(0)
        xyz = jnp.asarray(rng.uniform(-30, 30, (500, 3)), jnp.float32)
        pc = pcl.PointCloud(xyz, jnp.ones(500, bool))
        delta = Pose(so3.exp(jnp.array([0.0, 0.0, 0.3])), jnp.zeros(3))
        sheared, _ = synthetic.shear_scan(pc, delta)
        d = np.linalg.norm(np.asarray(sheared.xyz - xyz), axis=-1)
        assert d.max() > 1.0  # up to 30 m * 0.3 rad of smear


class TestScan2MapUndistortion:
    """A fast-spinning robot: per-sweep yaw 0.25 rad smears a 60 m-wide
    scan by metres. With per-point times the fused front-end must track;
    treating the sweep as instantaneous must fail the same bound."""

    def _run(self, with_times: bool) -> float:
        world = synthetic.default_world(3)
        # rest start (4 stationary frames: robots power up standing
        # still, and the constant-velocity model needs two frames of
        # history) then a fast circle
        circ = synthetic.circle_trajectory(12, radius=12.0, laps=0.45)
        traj = se3.Pose(
            jnp.concatenate([jnp.broadcast_to(circ.R[:1], (4, 3, 3)), circ.R]),
            jnp.concatenate([jnp.broadcast_to(circ.t[:1], (4, 3)), circ.t]),
        )
        n = traj.t.shape[0]
        cfg = SlamConfig(
            odometry=OdometryCfg(scan_capacity=4096, insert_capacity=8192,
                                 table_size=1 << 16),
            keyframes=KeyframeCfg(capacity=16, points_per_kf=2048),
        )
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        rel = se3.between(
            se3.index(traj, slice(0, n - 1)), se3.index(traj, slice(1, n))
        )
        scans, times = [], []
        for i in range(n):
            xyz, _, hit = synthetic.scan(
                world, se3.index(traj, i), n_rings=16, n_azimuth=512,
                key=keys[i],
            )
            clean = synthetic.scan_to_cloud(xyz, hit)
            # sweep i is distorted by the motion the constant-velocity
            # model predicts for it (rel[i-2]; equal to the true sweep
            # motion everywhere off the 1-frame acceleration edge)
            delta = se3.index(rel, max(i - 2, 0))
            sheared, t_rel = synthetic.shear_scan(clean, delta, 0.1)
            scans.append(sheared)
            times.append(t_rel)
        stacked = jax.tree.map(lambda *a: jnp.stack(a), *scans)
        t_stack = jnp.stack(times) if with_times else None
        rr = pl.run_frontend(stacked, cfg, se3.index(traj, 0), times=t_stack)
        return float(
            jnp.linalg.norm(rr.odom_poses.t[n - 1] - traj.t[n - 1])
        )

    def test_undistortion_required_and_sufficient(self):
        drift_with = self._run(True)
        drift_without = self._run(False)
        assert drift_with < 0.6, f"undistorted drift {drift_with:.3f}"
        assert drift_without > 2.0 * drift_with, (drift_without, drift_with)


class TestLioTimesPlumbing:
    """FAST-LIO convention: scan j is stamped at its sweep END (pose
    traj[j]) and the sweep spans IMU interval j-1. A point captured at
    fraction s of the sweep is recorded as
    p_rec = exp((1-s) xi_j) p_end with xi_j = log(rel_j) — the backward
    pass `IMU_Processing.hpp:65` undoes exactly this using the
    intra-frame IMU trajectory."""

    def _shear_to_end(self, cloud, rel, t_rel, dt):
        """p_rec = R(s)^T (X_end p_clean + p_end - p(s)) with the same
        continuous model imu_for_trajectory integrates (constant body
        rate, linear world position)."""
        xi_R = so3.log(rel.R)
        s = jnp.clip(t_rel / dt, 0.0, 1.0)
        R_rest = so3.exp((1.0 - s)[:, None] * xi_R)        # R(s)^T R_end
        t_rest = jnp.einsum(
            "nij,j->ni", so3.exp(-s[:, None] * xi_R), rel.t
        ) * (1.0 - s)[:, None]                             # R(s)^T (p_end - p(s))
        rec = jnp.einsum("nij,nj->ni", R_rest, cloud.xyz) + t_rest
        return pcl.park(pcl.PointCloud(rec, cloud.mask))

    def _run(self, with_times: bool) -> float:
        world = synthetic.default_world(3)
        frame_dt = 0.1
        # rest start: LIO initializes v = 0, so the truth must too; the
        # acceleration onto the circle rides the synthesized IMU stream
        circ = synthetic.circle_trajectory(10, radius=12.0, laps=0.2)
        traj = se3.Pose(
            jnp.concatenate([jnp.broadcast_to(circ.R[:1], (3, 3, 3)), circ.R]),
            jnp.concatenate([jnp.broadcast_to(circ.t[:1], (3, 3)), circ.t]),
        )
        n = traj.t.shape[0]
        gyro, acc, dts = synthetic.imu_for_trajectory(
            traj, frame_dt=frame_dt, n_sub=10
        )
        rel = se3.between(
            se3.index(traj, slice(0, n - 1)), se3.index(traj, slice(1, n))
        )
        cfg = SlamConfig(
            odometry=OdometryCfg(frontend="lio", scan_capacity=4096,
                                 insert_capacity=8192, table_size=1 << 16),
            keyframes=KeyframeCfg(capacity=16, points_per_kf=2048),
        )
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        scans, times = [], []
        for i in range(n):
            xyz, _, hit = synthetic.scan(
                world, se3.index(traj, i), n_rings=16, n_azimuth=512,
                key=keys[i],
            )
            clean = synthetic.scan_to_cloud(xyz, hit)
            phi = jnp.mod(
                jnp.arctan2(clean.xyz[:, 1], clean.xyz[:, 0]), 2 * jnp.pi
            )
            t_rel = frame_dt * phi / (2 * jnp.pi)
            if i == 0:
                scans.append(clean)  # frame 0 seeds the map un-sheared
                times.append(jnp.full_like(t_rel, frame_dt * 0.999))
            else:
                scans.append(
                    self._shear_to_end(clean, se3.index(rel, i - 1),
                                       t_rel, frame_dt)
                )
                times.append(t_rel)
        stacked = jax.tree.map(lambda *a: jnp.stack(a), *scans)
        t_stack = jnp.stack(times) if with_times else None
        rr = pl.run_frontend(
            stacked, cfg, se3.index(traj, 0), imu=(gyro, acc, dts),
            times=t_stack,
        )
        return float(jnp.linalg.norm(rr.odom_poses.t[n - 1] - traj.t[n - 1]))

    @pytest.mark.slow
    def test_point_times_enable_lio_undistortion(self):
        drift_with = self._run(True)
        drift_without = self._run(False)
        assert drift_with < 1.0, f"undistorted LIO drift {drift_with:.3f}"
        assert drift_without > drift_with, (drift_without, drift_with)
