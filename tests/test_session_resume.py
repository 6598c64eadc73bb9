"""Online-session checkpoint/resume (SURVEY §5.4 elastic recovery):
serialize a live OnlineSlam mid-run, restore into a FRESH session from
the manifest alone, continue the stream, and match the uninterrupted
run exactly."""
import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.geometry import se3
from mr_slam_tpu.runtime import checkpoint
from mr_slam_tpu.runtime.config import (
    ElevationCfg, KeyframeCfg, LoopCfg, OdometryCfg, SlamConfig,
)
from mr_slam_tpu.runtime.online import OnlineSlam

CFG = SlamConfig(
    odometry=OdometryCfg(scan_capacity=2048, insert_capacity=4096,
                         table_size=1 << 15),
    keyframes=KeyframeCfg(dist_thresh=1.5, capacity=32, points_per_kf=2048),
    loops=LoopCfg(method="scancontext", dist_thresh=0.4, min_separation=4,
                  candidates=2, verify_capacity=4096, fitness_thresh=0.3),
    elevation=ElevationCfg(size=80, resolution=0.4),
)


def _frames(n=16):
    world = synthetic.default_world(3)
    traj = synthetic.circle_trajectory(n, radius=10.0, laps=1.0)
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    out = []
    for i in range(n):
        xyz, _, hit = synthetic.scan(
            world, se3.index(traj, i), n_rings=16, n_azimuth=256, key=keys[i]
        )
        out.append((synthetic.scan_to_cloud(xyz, hit), 0.1 * i))
    return traj, out


def _feed(sess, frames):
    for cloud, stamp in frames:
        sess.add_frame(0, cloud, stamp=stamp)


class TestSessionResume:
    @pytest.mark.slow
    def test_resume_matches_uninterrupted(self, tmp_path):
        traj, frames = _frames(16)
        cut = 9

        # uninterrupted run
        ref = OnlineSlam(CFG, enable_gem=True)
        ref.register_robot(0, se3.index(traj, 0))
        _feed(ref, frames)
        ref_res = ref.result()

        # interrupted: save at `cut`, restore, continue
        a = OnlineSlam(CFG, enable_gem=True)
        a.register_robot(0, se3.index(traj, 0))
        _feed(a, frames[:cut])
        path = os.path.join(tmp_path, "sess.npz")
        checkpoint.save_session(a, path)
        b = checkpoint.load_session(path)
        _feed(b, frames[cut:])
        res = b.result()

        assert int(res.robots[0].store.count) == int(
            ref_res.robots[0].store.count
        )
        assert len(res.loops) == len(ref_res.loops)
        np.testing.assert_allclose(
            np.asarray(res.opt_poses.t), np.asarray(ref_res.opt_poses.t),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(res.robots[0].odom_poses.t),
            np.asarray(ref_res.robots[0].odom_poses.t),
            atol=1e-4,
        )
        # GEM state survived: flushed submaps + composable global map
        assert len(b.robots[0]["gem_flushed"]) == len(
            ref.robots[0]["gem_flushed"]
        )
        emap = b.global_elevation(size=128)
        assert int(jnp.sum(jnp.asarray(emap.valid))) > 100

    def test_manifest_reconstructs_config(self, tmp_path):
        traj, frames = _frames(6)
        a = OnlineSlam(CFG)
        a.register_robot(0, se3.index(traj, 0))
        _feed(a, frames[:6])
        path = os.path.join(tmp_path, "sess2.npz")
        checkpoint.save_session(a, path)
        b = checkpoint.load_session(path)
        assert b.cfg == CFG  # frozen dataclasses compare by value
        assert b.loop_every == a.loop_every
        assert b.node_of == a.node_of
        assert b._pending_kf == a._pending_kf
