"""Rate-based online scheduler (SchedulerCfg): stamp-driven loop/TF/
composing cadences, the two-rate odometry split and the load-shed
deadline monitor — the reference's launch-configured thread rates
(`global_manager.launch:39-48`) and A-LOAM's drop-under-load behavior
(`A-LOAM/src/laserMapping.cpp:303`)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.frontend import odometry
from mr_slam_tpu.geometry import se3
from mr_slam_tpu.ops import pointcloud as pcl
from mr_slam_tpu.runtime import observability as obs
from mr_slam_tpu.runtime import online
from mr_slam_tpu.runtime.config import (
    LoopCfg, OdometryCfg, SchedulerCfg, SlamConfig,
)
from tests.test_pipeline import make_scans, SMALL_CFG


def _session_cfg(**sched):
    return dataclasses.replace(SMALL_CFG, scheduler=SchedulerCfg(**sched))


def _drive(sess, n=24, dt=0.1, laps=0.6):
    world = synthetic.default_world(5)
    traj = synthetic.circle_trajectory(n, radius=22.0, laps=laps)
    scans = make_scans(world, traj, n)
    for i in range(n):
        sess.add_frame(
            0, jax.tree.map(lambda a: a[i], scans), stamp=i * dt
        )
    return sess


class TestCadences:
    def test_tf_cadence_publishes_at_rate(self):
        sess = online.OnlineSlam(_session_cfg(tf_period_s=0.3))
        obs.metrics.counters.clear()
        _drive(sess, n=13)  # stamps 0 .. 1.2 s
        # ~every 3rd frame over 1.2 s (exact count shifts by one with
        # float accumulation of the period-from-last-fire schedule)
        assert 4 <= obs.metrics.counters["tf.publishes"] <= 5
        assert ("map", "robot_0/odom") in sess.tf._edges

    def test_compose_cadence_builds_merged_map(self):
        sess = online.OnlineSlam(_session_cfg(compose_period_s=0.55))
        obs.metrics.counters.clear()
        _drive(sess, n=13)
        assert obs.metrics.counters["compose.runs"] == 3  # 0.0, 0.6, 1.2
        assert sess.merged_map is not None
        assert bool(jnp.any(sess.merged_map.mask))

    def test_loop_stamp_cadence(self):
        # keyframe-count trigger off; stamp cadence on
        sess = online.OnlineSlam(
            _session_cfg(loop_every_kf=0, loop_period_s=0.5)
        )
        _drive(sess, n=20)
        # the cadence must have flushed pending keyframes along the way
        assert len(sess._pending_kf) < int(
            sess.mstore.stores.count[0]
        ), "loop stage never fired from the stamp cadence"


class TestTwoRate:
    def test_map_every_sheds_inserts(self):
        sess = online.OnlineSlam(_session_cfg(map_every=3))
        obs.metrics.counters.clear()
        # small motion: only frame 0 registers a keyframe (total arc
        # ~0.7 m < dist_thresh), so the after-keyframe shed exemption
        # covers frame 1 alone and the count is deterministic
        _drive(sess, n=12, laps=0.005)
        # of frames 1..11: multiples of 3 map (3, 6, 9), frame 1 is
        # exempt (right after the frame-0 keyframe) -> 7 shed
        assert obs.metrics.counters["frontend.frames_shed"] == 7

    def test_shed_step_keeps_map_identical(self):
        """A shed odometry step must not touch the persistent map."""
        config = odometry.OdometryConfig(table_size=1 << 10, scan_capacity=256)
        state = odometry.init(config)
        scan = pcl.pad_to(
            pcl.make(jax.random.uniform(
                jax.random.PRNGKey(0), (128, 3), minval=-5, maxval=5
            )), 256,
        )
        state, _ = odometry.step(state, scan, config)
        shed_state, _ = odometry.step(state, scan, config, shed=True)
        np.testing.assert_array_equal(
            np.asarray(shed_state.grid.packed), np.asarray(state.grid.packed)
        )
        assert int(shed_state.frame) == int(state.frame) + 1

    def test_deadline_monitor_counts_over_budget(self):
        # an impossible budget: every frame is over it
        sess = online.OnlineSlam(
            _session_cfg(frame_budget_s=1e-9, shed=True)
        )
        obs.metrics.counters.clear()
        # small motion -> only frame 0 keyframes; frame 1 is exempt
        # from shedding (after a registered keyframe), frames 2..7 shed
        _drive(sess, n=8, laps=0.005)
        assert obs.metrics.counters["frontend.frames_over_budget"] == 8
        # frames after the first over-budget one shed their map insert
        assert obs.metrics.counters["frontend.frames_shed"] == 6


@pytest.mark.slow
class TestShedAccuracy:
    def test_two_rate_odometry_still_tracks(self):
        """map_every=2 halves map-insert work; drift must stay sane."""
        world = synthetic.default_world(5)
        n = 40
        traj = synthetic.circle_trajectory(n, radius=22.0, laps=0.5)
        scans = make_scans(world, traj, n)
        sess = online.OnlineSlam(_session_cfg(map_every=2, loop_every_kf=0))
        sess.register_robot(0, origin=se3.index(traj, 0))
        errs = []
        for i in range(n):
            pose = sess.add_frame(0, jax.tree.map(lambda a: a[i], scans))
            errs.append(float(jnp.linalg.norm(
                pose.t - se3.index(traj, i).t
            )))
        assert errs[-1] < 1.0, f"two-rate odometry drifted: {errs[-1]:.2f} m"
