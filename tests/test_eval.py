import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from mr_slam_tpu.backend import factor_graph as fg
from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.eval import g2o, metrics
from mr_slam_tpu.geometry import Pose, se3, so3


class TestATE:
    def test_zero_for_identical(self):
        traj = synthetic.circle_trajectory(50)
        r = metrics.ate(traj, traj)
        assert float(r.rmse) < 1e-6
        assert float(r.rot_rmse_deg) < 1e-3

    def test_known_offset(self):
        traj = synthetic.circle_trajectory(50)
        off = Pose(
            jnp.broadcast_to(jnp.eye(3), traj.R.shape), traj.t + jnp.array([1.0, 0, 0])
        )
        r = metrics.ate(off, traj)
        np.testing.assert_allclose(float(r.rmse), 1.0, atol=1e-5)

    def test_alignment_removes_gauge(self):
        traj = synthetic.circle_trajectory(50)
        g = Pose(so3.yaw_rot(jnp.array(0.7)), jnp.array([5.0, -2.0, 1.0]))
        moved = Pose(
            jnp.einsum("ab,nbc->nac", g.R, traj.R),
            jnp.einsum("ab,nb->na", g.R, traj.t) + g.t,
        )
        r_raw = metrics.ate(moved, traj)
        r_aligned = metrics.ate(moved, traj, align=True)
        assert float(r_raw.rmse) > 1.0
        assert float(r_aligned.rmse) < 1e-3

    def test_rpe(self):
        traj = synthetic.circle_trajectory(50)
        noisy = synthetic.perturb_trajectory(jax.random.PRNGKey(0), traj)
        assert float(metrics.relative_pose_error(noisy, traj)) < 0.2


class TestRecall:
    def test_perfect_descriptors(self):
        # database distance = metric distance -> recall@1 = 1
        Q, D = 10, 100
        key = jax.random.PRNGKey(0)
        db_t = jax.random.uniform(key, (D, 3), minval=0, maxval=100)
        q_t = db_t[:Q] + 0.5
        dists = jnp.linalg.norm(q_t[:, None] - db_t[None], axis=-1)
        pos = metrics.make_positives(q_t, db_t, radius=5.0)
        valid = pos.any(axis=1)
        r = metrics.recall_at_n(dists, pos, valid, max_n=5)
        np.testing.assert_allclose(r.recall_at_n[0], 1.0)

    def test_random_descriptors_low_recall(self):
        Q, D = 20, 500
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        db_t = jax.random.uniform(k1, (D, 3), minval=0, maxval=1000)
        q_t = db_t[:Q] + 0.1
        dists = jax.random.uniform(k2, (Q, D))
        pos = metrics.make_positives(q_t, db_t, radius=5.0)
        valid = pos.any(axis=1)
        r = metrics.recall_at_n(dists, pos, valid, max_n=5)
        assert float(r.recall_at_n[0]) < 0.5


class TestG2O:
    def test_roundtrip(self, tmp_path):
        g = fg.init(8, 8)
        poses = [
            se3.identity(),
            Pose(so3.yaw_rot(jnp.array(0.5)), jnp.array([1.0, 2.0, 0.5])),
            Pose(so3.yaw_rot(jnp.array(-0.2)), jnp.array([2.0, 1.0, 0.0])),
        ]
        for i, p in enumerate(poses):
            g, _ = fg.add_node(g, p, jnp.int32(0 if i < 2 else 1))
        g, _ = fg.add_edge(
            g, jnp.int32(0), jnp.int32(1), se3.between(poses[0], poses[1]),
            jnp.int32(fg.ODOM), jnp.float32(1.0), jnp.float32(1.0),
        )
        g, _ = fg.add_edge(
            g, jnp.int32(1), jnp.int32(2), se3.between(poses[1], poses[2]),
            jnp.int32(fg.INTER_LOOP), jnp.float32(10.0), jnp.float32(5.0),
        )
        path = str(tmp_path / "graph.g2o")
        g2o.export_g2o(path, g)
        g2 = g2o.import_g2o(path)
        assert int(g2.n_nodes) == 3 and int(g2.n_edges) == 2
        np.testing.assert_allclose(g2.poses.t[:3], g.poses.t[:3], atol=1e-5)
        np.testing.assert_allclose(g2.poses.R[:3], g.poses.R[:3], atol=1e-5)
        np.testing.assert_allclose(
            g2.edge_meas.t[:2], g.edge_meas.t[:2], atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(g2.node_robot[:3]), [0, 0, 1])
        np.testing.assert_allclose(np.asarray(g2.edge_w_rot[:2]), [1.0, 10.0])
        np.testing.assert_allclose(np.asarray(g2.edge_w_trans[:2]), [1.0, 5.0])

    def test_gtsam_key_format(self, tmp_path):
        g = fg.init(2, 1)
        g, _ = fg.add_node(g, se3.identity(), jnp.int32(1))
        path = str(tmp_path / "k.g2o")
        g2o.export_g2o(path, g)
        line = open(path).readline().split()
        key = int(line[1])
        r, i = fg.key_to_robot_id(key)
        assert r == 1 and i == 0

    def test_import_reconstructs_edge_kinds(self, tmp_path):
        """g2o carries no edge-type tag; import classifies from the key
        codec (consecutive same-robot = odom, else intra/inter loop)."""
        g = fg.init(8, 8)
        poses = [se3.identity() for _ in range(4)]
        robots = [0, 0, 0, 1]
        for p, r in zip(poses, robots):
            g, _ = fg.add_node(g, p, jnp.int32(r))
        ident = se3.identity()
        for i, j, kind in [(0, 1, fg.ODOM), (0, 2, fg.INTRA_LOOP),
                           (1, 3, fg.INTER_LOOP)]:
            g, _ = fg.add_edge(
                g, jnp.int32(i), jnp.int32(j), ident, jnp.int32(kind),
                jnp.float32(1.0), jnp.float32(1.0),
            )
        path = str(tmp_path / "kinds.g2o")
        g2o.export_g2o(path, g)
        g2 = g2o.import_g2o(path)
        np.testing.assert_array_equal(
            np.asarray(g2.edge_kind[:3]),
            [fg.ODOM, fg.INTRA_LOOP, fg.INTER_LOOP],
        )


class TestOfflineG2ORunner:
    """examples/run_pgo_g2o.py — the run_distributed_mapper.cpp analogue."""

    def _noisy_two_robot_graph(self):
        rng = np.random.default_rng(3)
        g = fg.init(32, 64)
        true = []
        for r in range(2):
            for i in range(8):
                yaw = 0.25 * i + (1.5 if r else 0.0)
                t = np.array([np.cos(yaw) * 6, np.sin(yaw) * 6, 0.1 * r])
                true.append(Pose(so3.yaw_rot(jnp.array(yaw)), jnp.asarray(t)))
        for k, p in enumerate(true):
            noise = jnp.asarray(rng.normal(0, 0.3, 3)) * (k % 8 != 0)
            g, _ = fg.add_node(
                g, Pose(p.R, p.t + noise), jnp.int32(k // 8)
            )
        def add(i, j, kind):
            nonlocal g
            g, _ = fg.add_edge(
                g, jnp.int32(i), jnp.int32(j), se3.between(true[i], true[j]),
                jnp.int32(kind), jnp.float32(10.0), jnp.float32(10.0),
            )
        for r in range(2):
            for i in range(7):
                add(8 * r + i, 8 * r + i + 1, fg.ODOM)
        add(2, 10, fg.INTER_LOOP)
        add(5, 13, fg.INTER_LOOP)
        return g

    @pytest.mark.slow
    def test_runner_reduces_chi2(self, tmp_path):
        import json
        import subprocess
        import sys

        g = self._noisy_two_robot_graph()
        inp = str(tmp_path / "in.g2o")
        outp = str(tmp_path / "out.g2o")
        g2o.export_g2o(inp, g)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        repo_root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        res = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "..", "examples",
                          "run_pgo_g2o.py"),
             inp, outp],
            capture_output=True, timeout=600, env=env,
        )
        assert res.returncode == 0, res.stderr.decode()[-2000:]
        stats = json.loads(res.stdout.decode().strip().splitlines()[-1])
        assert stats["nodes"] == 16 and stats["robots"] == 2
        assert stats["chi2_post"] < 0.1 * stats["chi2_pre"]
        g3 = g2o.import_g2o(outp)
        assert int(g3.n_nodes) == 16 and int(g3.n_edges) == 16
