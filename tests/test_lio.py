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


class TestImuInit:
    def test_recovers_gyro_bias_and_gravity(self):
        """`IMU_init` analogue: static rest prefix -> gyro mean = bias,
        accel mean direction = gravity (with a tilted initial attitude)."""
        config = lio.LioConfig(table_size=1 << 10)
        tilt = so3.exp(jnp.array([0.12, -0.08, 0.0]))
        state = lio.init(config)._replace(R=tilt)
        bg_true = jnp.array([0.004, -0.002, 0.003])
        # rest: specific force = -R^T g
        f = tilt.T @ jnp.array([0.0, 0.0, 9.81])
        imu = lio.ImuSample(
            gyro=jnp.tile(bg_true, (50, 1)),
            acc=jnp.tile(f, (50, 1)),
            dt=jnp.full((50,), 0.01),
        )
        state = lio.imu_init(state, imu)
        np.testing.assert_allclose(np.asarray(state.bg), np.asarray(bg_true),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.grav),
                                   [0.0, 0.0, -9.81], atol=1e-4)


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

    def test_covariance_contracts_on_update(self):
        """The iterated update must SHRINK the pose covariance — the
        (I - KH) P contraction the reference's esekfom update performs."""
        world = synthetic.default_world(3)
        traj = synthetic.circle_trajectory(6, radius=25.0, laps=0.02)
        gyro, acc, dts = synthetic.imu_for_trajectory(traj, frame_dt=0.1, n_sub=10)
        config = lio.LioConfig(table_size=1 << 16, scan_capacity=4096, iters=3)
        state = lio.init(config, se3.index(traj, 0))
        state = state._replace(v=(traj.t[1] - traj.t[0]) / 0.1)
        keys = jax.random.split(jax.random.PRNGKey(1), 6)
        for i in range(3):
            xyz, _, hit = synthetic.scan(
                world, se3.index(traj, i + 1), n_rings=16, n_azimuth=512,
                key=keys[i],
            )
            scan = synthetic.scan_to_cloud(xyz, hit)
            pt_time = jnp.full((scan.xyz.shape[0],), 0.0999)
            imu = lio.ImuSample(gyro=gyro[i], acc=acc[i], dt=dts[i])
            state, _ = lio.step(state, scan, pt_time, imu, config)
        # explicit propagate -> update cycle on the warmed-up state
        imu = lio.ImuSample(gyro=gyro[3], acc=acc[3], dt=dts[3])
        prop, (Rs, ps) = lio.propagate(state, imu, config)
        xyz, _, hit = synthetic.scan(
            world, se3.index(traj, 4), n_rings=16, n_azimuth=512, key=keys[4]
        )
        scan = synthetic.scan_to_cloud(xyz, hit)
        from mr_slam_tpu.ops import pointcloud as pcl
        ds = pcl.voxel_downsample(scan, config.scan_leaf, config.scan_capacity)
        post, inl = lio.update(prop, ds, config)
        assert int(inl) > 200
        tr_prop = float(jnp.trace(prop.P[:6, :6]))
        tr_post = float(jnp.trace(post.P[:6, :6]))
        assert tr_post < tr_prop, f"P grew: {tr_post} !< {tr_prop}"
        # propagate must GROW uncertainty
        assert tr_prop > float(jnp.trace(state.P[:6, :6]))

    def test_biased_imu_converges(self):
        """Constant gyro bias injected into the IMU stream: the filter
        estimates it (bg -> true bias) and tracking stays bounded."""
        world = synthetic.default_world(3)
        n = 15
        traj = synthetic.circle_trajectory(n, radius=25.0, laps=0.05)
        gyro, acc, dts = synthetic.imu_for_trajectory(traj, frame_dt=0.1, n_sub=10)
        bg_true = jnp.array([0.02, -0.01, 0.03])
        gyro = gyro + bg_true
        config = lio.LioConfig(table_size=1 << 16, scan_capacity=4096, iters=4)
        state = lio.init(config, se3.index(traj, 0))
        state = state._replace(v=(traj.t[1] - traj.t[0]) / 0.1)
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        for i in range(n - 1):
            xyz, _, hit = synthetic.scan(
                world, se3.index(traj, i + 1), n_rings=16, n_azimuth=512,
                key=keys[i],
            )
            scan = synthetic.scan_to_cloud(xyz, hit)
            pt_time = jnp.full((scan.xyz.shape[0],), 0.0999)
            imu = lio.ImuSample(gyro=gyro[i], acc=acc[i], dt=dts[i])
            state, _ = lio.step(state, scan, pt_time, imu, config)
        drift = float(jnp.linalg.norm(state.p - traj.t[n - 1]))
        bg_err = float(jnp.linalg.norm(state.bg - bg_true))
        bg_err0 = float(jnp.linalg.norm(bg_true))
        assert drift < 0.8, f"biased-IMU drift {drift:.3f}"
        assert bg_err < 0.5 * bg_err0, (
            f"gyro bias not estimated: |bg-true|={bg_err:.4f} "
            f"(|true|={bg_err0:.4f}, bg={np.asarray(state.bg)})"
        )


class TestGravityMisinit:
    """The filter freezes gravity after init (no S2 refinement, unlike
    IKFoM — `lio.py` design note). These tests document the failure
    envelope: small init tilt is absorbed by the map update; large tilt
    degrades tracking measurably. If gravity refinement lands later,
    the large-tilt bound below should tighten."""

    def _run(self, tilt_rad: float) -> float:
        world = synthetic.default_world(3)
        n = 12
        traj = synthetic.circle_trajectory(n, radius=25.0, laps=0.04)
        gyro, acc, dts = synthetic.imu_for_trajectory(traj, frame_dt=0.1, n_sub=10)
        config = lio.LioConfig(table_size=1 << 16, scan_capacity=4096, iters=4)
        state = lio.init(config, se3.index(traj, 0))
        state = state._replace(v=(traj.t[1] - traj.t[0]) / 0.1)
        # tilt the frozen gravity estimate about x
        Rt = so3.exp(jnp.array([tilt_rad, 0.0, 0.0]))
        state = state._replace(grav=Rt @ state.grav)
        keys = jax.random.split(jax.random.PRNGKey(1), n)
        for i in range(n - 1):
            xyz, _, hit = synthetic.scan(
                world, se3.index(traj, i + 1), n_rings=16, n_azimuth=512,
                key=keys[i],
            )
            scan = synthetic.scan_to_cloud(xyz, hit)
            pt_time = jnp.full((scan.xyz.shape[0],), 0.0999)
            imu = lio.ImuSample(gyro=gyro[i], acc=acc[i], dt=dts[i])
            state, _ = lio.step(state, scan, pt_time, imu, config)
        return float(jnp.linalg.norm(state.p - traj.t[n - 1]))

    def test_small_tilt_absorbed(self):
        drift = self._run(jnp.deg2rad(2.0))
        assert drift < 1.0, f"2 deg gravity tilt should track: {drift:.3f} m"

    def test_large_tilt_degrades(self):
        """15 deg of gravity error cannot be corrected (gravity is not a
        state) — tracking degrades vs the small-tilt case. Documents the
        envelope rather than hiding it."""
        small = self._run(jnp.deg2rad(2.0))
        large = self._run(jnp.deg2rad(15.0))
        assert large > small, (small, large)


class TestExtrinsics:
    """Online lidar-IMU extrinsic state (the reference's 23-state IKFoM
    path, `use-ikfom.hpp`; config extrinsics `FAST_LIO/config/*.yaml`)."""

    def _clean_grid(self, world, keys):
        from mr_slam_tpu.ops import pointcloud as pcl, voxel_grid

        clouds = []
        for i in range(8):
            p = se3.Pose(so3.yaw_rot(jnp.array(i * 0.8)),
                         jnp.array([5.0, 0.0, 0.0]))
            x2, _, h2 = synthetic.scan(
                world, p, n_rings=16, n_azimuth=512, key=keys[i]
            )
            clouds.append(pcl.transform(synthetic.scan_to_cloud(x2, h2), p))
        allc = jax.tree.map(lambda *a: jnp.concatenate(a), *clouds)
        return voxel_grid.build(allc, 1.0, 1 << 17)

    @pytest.mark.slow
    def test_update_moves_extrinsic_toward_truth(self):
        """With the TRUE pose and a clean map, one iterated update must
        move R_li toward the true mount, never away."""
        from mr_slam_tpu.ops import pointcloud as pcl
        from mr_slam_tpu.geometry.se3 import Pose

        world = synthetic.default_world(3)
        keys = jax.random.split(jax.random.PRNGKey(0), 12)
        grid = self._clean_grid(world, keys)
        ext_true = Pose(so3.exp(jnp.deg2rad(jnp.array([2.0, -2.0, 0.0]))),
                        jnp.zeros(3))
        body = Pose(so3.yaw_rot(jnp.array(0.5)), jnp.array([5.0, 0.0, 0.0]))
        xyz, _, hit = synthetic.scan(
            world, se3.compose(body, ext_true), n_rings=16, n_azimuth=512,
            key=keys[9],
        )
        ds = pcl.voxel_downsample(
            synthetic.scan_to_cloud(xyz, hit), 0.4, 4096,
            bounds=((-150.0, -150.0, -150.0), (150.0, 150.0, 150.0)),
        )
        config = lio.LioConfig(
            table_size=1 << 17, iters=8, estimate_extrinsics=True,
            extrinsic_prior=5e-3, extrinsic_step=1.0,
        )
        state = lio.init(config, body)._replace(grid=grid, frame=jnp.int32(1))
        err0 = float(jnp.linalg.norm(so3.log(state.R_li @ ext_true.R.T)))
        state2, inl = lio.update(state, ds, config)
        err1 = float(jnp.linalg.norm(so3.log(state2.R_li @ ext_true.R.T)))
        assert int(inl) > 200
        assert err1 < err0, (
            f"extrinsic moved away from truth: {err0:.4f} -> {err1:.4f}"
        )

    @pytest.mark.slow
    def test_known_mount_tracks_like_identity(self):
        """A config-supplied 10 deg / 10 cm mount (the per-robot YAML
        extrinsic) must track as well as an identity mount — the frame
        plumbing the 15-dof round-3 filter hard-coded away."""
        from mr_slam_tpu.geometry.se3 import Pose

        world = synthetic.default_world(3)
        n = 15
        traj = synthetic.circle_trajectory(n, radius=25.0, laps=0.05)
        gyro, acc, dts = synthetic.imu_for_trajectory(
            traj, frame_dt=0.1, n_sub=10
        )
        ext = Pose(so3.exp(jnp.deg2rad(jnp.array([10.0, 0.0, 5.0]))),
                   jnp.array([0.1, -0.05, 0.1]))
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        config = lio.LioConfig(table_size=1 << 16, scan_capacity=4096, iters=4)
        state = lio.init(config, se3.index(traj, 0), extrinsic=ext)
        state = state._replace(v=(traj.t[1] - traj.t[0]) / 0.1)
        for i in range(n - 1):
            body = se3.index(traj, i + 1)
            xyz, _, hit = synthetic.scan(
                world, se3.compose(body, ext), n_rings=16, n_azimuth=512,
                key=keys[i],
            )
            scan = synthetic.scan_to_cloud(xyz, hit)
            pt_time = jnp.full((scan.xyz.shape[0],), 0.0999)
            imu = lio.ImuSample(gyro=gyro[i], acc=acc[i], dt=dts[i])
            state, _ = lio.step(state, scan, pt_time, imu, config)
        err = float(jnp.linalg.norm(state.p - traj.t[-1]))
        assert err < 0.5, f"known-mount LIO drift {err:.3f} m"

    @pytest.mark.slow
    def test_online_refinement_stays_stable(self):
        """`estimate_extrinsics` with a small (0.5 deg) mount error: the
        tight-prior online refinement must not destabilize tracking
        (<= 1.5x the fixed-extrinsic error) and must not move the
        calibration away from truth."""
        from mr_slam_tpu.geometry.se3 import Pose

        world = synthetic.default_world(3)
        n = 20
        traj = synthetic.circle_trajectory(n, radius=25.0, laps=0.1)
        gyro, acc, dts = synthetic.imu_for_trajectory(
            traj, frame_dt=0.1, n_sub=10
        )
        ext_true = Pose(so3.exp(jnp.deg2rad(jnp.array([0.4, -0.3, 0.0]))),
                        jnp.array([0.02, 0.0, 0.0]))
        keys = jax.random.split(jax.random.PRNGKey(0), n)

        def run(est):
            config = lio.LioConfig(
                table_size=1 << 16, scan_capacity=4096, iters=4,
                estimate_extrinsics=est,
            )
            state = lio.init(config, se3.index(traj, 0))
            state = state._replace(v=(traj.t[1] - traj.t[0]) / 0.1)
            for i in range(n - 1):
                body = se3.index(traj, i + 1)
                xyz, _, hit = synthetic.scan(
                    world, se3.compose(body, ext_true), n_rings=16,
                    n_azimuth=512, key=keys[i],
                )
                scan = synthetic.scan_to_cloud(xyz, hit)
                pt_time = jnp.full((scan.xyz.shape[0],), 0.0999)
                imu = lio.ImuSample(gyro=gyro[i], acc=acc[i], dt=dts[i])
                state, _ = lio.step(state, scan, pt_time, imu, config)
            perr = float(jnp.linalg.norm(state.p - traj.t[-1]))
            aerr = float(jnp.linalg.norm(so3.log(state.R_li @ ext_true.R.T)))
            return perr, aerr

        p_off, a_off = run(False)
        p_on, a_on = run(True)
        assert p_on < max(1.5 * p_off, 0.3), (
            f"extrinsic estimation destabilized tracking: {p_on:.3f} vs "
            f"{p_off:.3f}"
        )
        # on a 20-frame run the refinement signal is below the noise
        # floor; the guarantee at this horizon is BOUNDEDNESS (the
        # round-4 failure mode was multi-degree runaway)
        assert a_on <= a_off + jnp.deg2rad(0.25), (
            f"calibration ran away: {jnp.rad2deg(a_on):.2f} deg"
        )


@pytest.mark.slow
class TestGravityRefinement:
    def test_online_gravity_corrects_misinit(self):
        """`estimate_gravity` (IKFoM's S2 state, ours a renormalized
        3-dof tangent): a 4-deg gravity misinit must be pulled back
        under 1 deg while the fixed-gravity filter keeps the full
        tilt."""
        world = synthetic.default_world(3)
        n = 25
        traj = synthetic.circle_trajectory(n, radius=25.0, laps=0.12)
        gyro, acc, dts = synthetic.imu_for_trajectory(
            traj, frame_dt=0.1, n_sub=10
        )
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        tilt = so3.exp(jnp.deg2rad(jnp.array([4.0, 0.0, 0.0])))
        g_bad = tilt @ jnp.array([0.0, 0.0, -9.81])

        def run(est):
            config = lio.LioConfig(
                table_size=1 << 16, scan_capacity=4096, iters=4,
                estimate_gravity=est, gravity_prior=5e-2,
            )
            state = lio.init(config, se3.index(traj, 0))
            state = state._replace(
                v=(traj.t[1] - traj.t[0]) / 0.1, grav=g_bad
            )
            for i in range(n - 1):
                body = se3.index(traj, i + 1)
                xyz, _, hit = synthetic.scan(
                    world, body, n_rings=16, n_azimuth=512, key=keys[i]
                )
                sc = synthetic.scan_to_cloud(xyz, hit)
                pt = jnp.full((sc.xyz.shape[0],), 0.0999)
                state, _ = lio.step(
                    state, sc, pt,
                    lio.ImuSample(gyro=gyro[i], acc=acc[i], dt=dts[i]),
                    config,
                )
            gerr = float(jnp.rad2deg(jnp.arccos(jnp.clip(
                -state.grav[2] / 9.81, -1, 1
            ))))
            perr = float(jnp.linalg.norm(state.p - traj.t[-1]))
            return perr, gerr

        p_off, g_off = run(False)
        p_on, g_on = run(True)
        assert g_off > 3.5  # fixed filter keeps the tilt
        assert g_on < 1.0, f"gravity not refined: {g_on:.2f} deg"
        assert p_on < max(1.5 * p_off, 0.3)
        # |g| stays on the 9.81 sphere (S2 retraction)
