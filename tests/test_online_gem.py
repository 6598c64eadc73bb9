"""Online per-robot GEM: rolling local grid, keyframe flush, and
re-anchoring of flushed submaps to optimized poses
(`ElevationMapping.cpp:592-821`, `GetInitMap:627-653` analogues)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.geometry import se3, so3
from mr_slam_tpu.geometry.se3 import Pose
from mr_slam_tpu.runtime.config import SlamConfig, LoopCfg, OdometryCfg, ElevationCfg
from mr_slam_tpu.runtime.online import OnlineSlam


def true_height(world, xy):
    """Ground-truth surface height at (N, 2) world xy: max box top
    covering the cell, else ground (0)."""
    lo = np.asarray(world.boxes[:, 0])
    hi = np.asarray(world.boxes[:, 1])
    inside = (
        (xy[:, 0:1] >= lo[None, :, 0]) & (xy[:, 0:1] <= hi[None, :, 0])
        & (xy[:, 1:2] >= lo[None, :, 1]) & (xy[:, 1:2] <= hi[None, :, 1])
    )
    h = np.where(inside, hi[None, :, 2], 0.0)
    return h.max(axis=1)


@pytest.mark.slow
class TestOnlineGem:
    def _run_session(self):
        world = synthetic.default_world(5)
        cfg = SlamConfig(
            odometry=OdometryCfg(table_size=1 << 16, scan_capacity=4096),
            loops=LoopCfg(dist_thresh=0.3, min_separation=5,
                          fitness_thresh=0.15),
            elevation=ElevationCfg(size=120, resolution=0.4),
        )
        sess = OnlineSlam(cfg, enable_gem=True)
        n = 10
        traj = synthetic.circle_trajectory(n, radius=22.0, laps=0.25)
        sess.register_robot(0, se3.index(traj, 0))
        keys = jax.random.split(jax.random.PRNGKey(2), n)
        for i in range(n):
            xyz, _, hit = synthetic.scan(
                world, se3.index(traj, i), n_rings=16, n_azimuth=512,
                key=keys[i],
            )
            sess.add_frame(0, synthetic.scan_to_cloud(xyz, hit), stamp=float(i))
        return world, cfg, sess, traj

    def test_local_map_tracks_robot_and_flushes(self):
        world, cfg, sess, traj = self._run_session()
        rs = sess.robots[0]
        # local grid recentered near the robot
        m = rs["gem_local"]
        half = cfg.elevation.size * cfg.elevation.resolution / 2
        center = np.asarray(m.origin) + half
        robot_xy = np.asarray(rs["odo"].pose.t[:2])
        assert np.linalg.norm(center - robot_xy) < 2 * cfg.elevation.resolution + 1e-3
        assert int(np.asarray(m.valid).sum()) > 100
        # one flushed grid submap per keyframe
        store, _ = sess.store_view(0)
        assert len(rs["gem_flushed"]) == int(store.count) >= 2

    def test_reanchoring_uses_optimized_poses(self):
        world, cfg, sess, traj = self._run_session()
        rs = sess.robots[0]
        store, _ = sess.store_view(0)
        K = int(store.count)
        # pretend optimization produced the TRUE keyframe poses
        kf_stamps = np.asarray(store.stamps[:K]).astype(int)
        N = sess.graph.node_capacity
        Rm = np.tile(np.eye(3), (N, 1, 1)).astype(np.float32)
        tm = np.zeros((N, 3), np.float32)
        for k in range(K):
            node = sess.node_of[(0, k)]
            p = se3.index(traj, int(kf_stamps[k]))
            Rm[node] = np.asarray(p.R)
            tm[node] = np.asarray(p.t)
        sess.opt_poses = Pose(jnp.asarray(Rm), jnp.asarray(tm))
        # injected poses cover every node (the session otherwise only
        # trusts opt entries up to the last real solve's node count)
        sess._opt_n_nodes = int(sess.graph.n_nodes)
        good = sess.global_elevation(size=192, center=(0.0, 14.0))

        # a grossly perturbed "optimization" must produce a worse map
        # large perturbation: flat ground dominates the mean height
        # error, so small xy shifts barely move it — the contrast needs
        # displacement at building scale
        bad_t = tm.copy()
        bad_t[:, 0] += 6.0
        yaw = so3.yaw_rot(jnp.float32(0.3))
        sess.opt_poses = Pose(
            jnp.einsum("ab,nbc->nac", yaw, jnp.asarray(Rm)), jnp.asarray(bad_t)
        )
        bad = sess.global_elevation(size=192, center=(0.0, 14.0))

        def height_err(m):
            H, W = m.shape
            res = float(m.resolution)
            ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
            xy = np.stack([
                np.asarray(m.origin)[0] + (ii.ravel() + 0.5) * res,
                np.asarray(m.origin)[1] + (jj.ravel() + 0.5) * res,
            ], -1)
            th = true_height(world, xy).reshape(H, W)
            v = np.asarray(m.valid)
            err = np.abs(np.asarray(m.height) - th)
            return float(err[v].mean()), int(v.sum())

        e_good, n_good = height_err(good)
        e_bad, n_bad = height_err(bad)
        assert n_good > 500
        assert e_good < 0.5, f"re-anchored map height err {e_good:.3f}"
        # true-pose anchoring beats the perturbed one (mean-height
        # contrast is modest: flat ground dominates and rooftops are
        # occluded from a ground lidar either way)
        assert e_good < e_bad, (
            f"re-anchoring had no effect: good {e_good:.3f} vs {e_bad:.3f}"
        )
        # ... and the poses demonstrably DRIVE composition: the two
        # maps must disagree at building scale where both are valid
        both = np.asarray(good.valid) & np.asarray(bad.valid)
        diff = np.abs(
            np.asarray(good.height) - np.asarray(bad.height)
        )[both]
        assert float(diff.max()) > 1.0, "opt poses not used in composition"
        assert float(diff.mean()) > 0.01  # flat-ground cells agree; edges differ
