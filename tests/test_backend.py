import jax
import jax.numpy as jnp
import numpy as np

from mr_slam_tpu.backend import chordal, factor_graph as fg, pcm
from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.geometry import Pose, se3, so3


def build_circle_graph(
    n=40, node_cap=64, edge_cap=128, drift_t=0.05, drift_r=0.005,
    with_loop=True, seed=0,
):
    """Circle trajectory with drifted odometry + one loop closure back to
    the start. Returns (graph, true_poses, drifted_poses)."""
    true = synthetic.circle_trajectory(n, radius=10.0, laps=1.0)
    noisy = synthetic.perturb_trajectory(
        jax.random.PRNGKey(seed), true, trans_sigma=drift_t, rot_sigma=drift_r
    )
    g = fg.init(node_cap, edge_cap)
    for i in range(n):
        g, _ = fg.add_node(g, se3.index(noisy, i), jnp.int32(0))
    for i in range(n - 1):
        meas = se3.between(se3.index(noisy, i), se3.index(noisy, i + 1))
        g, _ = fg.add_edge(
            g, jnp.int32(i), jnp.int32(i + 1), meas, jnp.int32(fg.ODOM),
            jnp.float32(1.0), jnp.float32(1.0),
        )
    if with_loop:
        # exact loop measurement between node n-1 and node 0
        meas = se3.between(se3.index(true, n - 1), se3.index(true, 0))
        g, _ = fg.add_edge(
            g, jnp.int32(n - 1), jnp.int32(0), meas, jnp.int32(fg.INTRA_LOOP),
            jnp.float32(10.0), jnp.float32(10.0),
        )
    return g, true, noisy


def ate_rmse(est_t, true_t, mask=None):
    d2 = jnp.sum((est_t - true_t) ** 2, axis=-1)
    if mask is not None:
        d2 = jnp.where(mask, d2, 0.0)
        return float(jnp.sqrt(jnp.sum(d2) / jnp.maximum(mask.sum(), 1)))
    return float(jnp.sqrt(jnp.mean(d2)))


class TestFactorGraph:
    def test_add_node_edge(self):
        g = fg.init(8, 8)
        g, i0 = fg.add_node(g, se3.identity(), jnp.int32(0))
        g, i1 = fg.add_node(g, Pose(jnp.eye(3), jnp.array([1.0, 0, 0])), jnp.int32(1))
        assert int(g.n_nodes) == 2 and int(i1) == 1
        g, e0 = fg.add_edge(
            g, i0, i1, se3.identity(), jnp.int32(fg.INTER_LOOP),
            jnp.float32(1.0), jnp.float32(1.0),
        )
        assert int(g.n_edges) == 1
        assert bool(fg.interrobot_edges_mask(g)[0])
        conn = fg.connected_robots(g, 3)
        assert bool(conn[0]) and bool(conn[1]) and not bool(conn[2])

    def test_capacity_guard(self):
        g = fg.init(2, 2)
        for _ in range(4):
            g, _ = fg.add_node(g, se3.identity(), jnp.int32(0))
        assert int(g.n_nodes) == 2

    def test_key_codec(self):
        key = fg.robot_id_to_key(2, 1234)
        r, i = fg.key_to_robot_id(key)
        assert r == 2 and i == 1234


class TestChordalPGO:
    def test_loop_closure_reduces_ate(self):
        g, true, noisy = build_circle_graph(n=40)
        anchors = jnp.zeros((g.node_capacity,), bool).at[0].set(True)
        opt = chordal.optimize(g, anchors)
        mask = g.node_valid
        before = ate_rmse(noisy.t, true.t)
        after = ate_rmse(opt.t[:40], true.t, None)
        assert after < before * 0.5, f"ATE before={before:.3f} after={after:.3f}"

    def test_no_loop_keeps_odometry(self):
        """Without loops the optimum IS the odometry chain."""
        g, true, noisy = build_circle_graph(n=20, with_loop=False)
        anchors = jnp.zeros((g.node_capacity,), bool).at[0].set(True)
        opt = chordal.optimize(g, anchors)
        np.testing.assert_allclose(opt.t[:20], noisy.t, atol=0.05)

    def test_perfect_odometry_fixed_point(self):
        g, true, _ = build_circle_graph(n=20, drift_t=0.0, drift_r=0.0)
        anchors = jnp.zeros((g.node_capacity,), bool).at[0].set(True)
        opt = chordal.optimize(g, anchors)
        np.testing.assert_allclose(opt.t[:20], true.t, atol=0.02)
        # rotations stay orthonormal
        RtR = jnp.einsum("nab,ncb->nac", opt.R[:20], opt.R[:20])
        np.testing.assert_allclose(
            RtR, jnp.broadcast_to(jnp.eye(3), RtR.shape), atol=1e-4
        )

    def test_rotation_init_aligns(self):
        """With a loop edge, the chordal solve spreads accumulated yaw
        drift: global rotation error vs ground truth must shrink."""
        g, true, noisy = build_circle_graph(n=30, drift_r=0.01)
        anchors = jnp.zeros((g.node_capacity,), bool).at[0].set(True)
        R = chordal.rotation_init(g, anchors)

        def glob_err(Rs):
            d = jnp.einsum("nba,nbc->nac", Rs[:30], true.R)  # Rs^T Rtrue
            from mr_slam_tpu.geometry import so3
            return float(jnp.mean(jnp.linalg.norm(so3.log(d), axis=-1)))

        assert glob_err(R) < glob_err(noisy.R)

    def test_robust_downweights_outlier_loop(self):
        g, true, noisy = build_circle_graph(n=40)
        # inject a grossly wrong loop
        bad = Pose(so3.yaw_rot(jnp.array(2.0)), jnp.array([15.0, -3.0, 2.0]))
        g, _ = fg.add_edge(
            g, jnp.int32(10), jnp.int32(30), bad, jnp.int32(fg.INTRA_LOOP),
            jnp.float32(10.0), jnp.float32(10.0),
        )
        anchors = jnp.zeros((g.node_capacity,), bool).at[0].set(True)
        opt_robust = chordal.optimize(
            g, anchors, chordal.PGOConfig(robust_delta=0.5)
        )
        after = ate_rmse(opt_robust.t[:40], true.t)
        before = ate_rmse(noisy.t, true.t)
        assert after < before, f"{after} !< {before}"


class TestPCM:
    def _loops(self, n_good=6, n_bad=2):
        """Two parallel straight trajectories with inter-robot loops."""
        n = 20
        ta = jnp.stack([jnp.arange(n) * 1.0, jnp.zeros(n), jnp.zeros(n)], -1)
        tb = jnp.stack([jnp.arange(n) * 1.0, jnp.ones(n) * 2.0, jnp.zeros(n)], -1)
        eye = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
        pa, pb = Pose(eye, ta), Pose(eye, tb)
        idx = np.linspace(0, n - 1, n_good + n_bad).astype(int)
        poses_a = se3.index(pa, jnp.asarray(idx))
        poses_b = se3.index(pb, jnp.asarray(idx))
        # true relative: b_frame <- a_frame at same index: t = (0, -2, 0)
        good = Pose(
            jnp.broadcast_to(jnp.eye(3), (n_good + n_bad, 3, 3)),
            jnp.tile(jnp.array([0.0, -2.0, 0.0]), (n_good + n_bad, 1)),
        )
        meas_t = good.t
        key = jax.random.PRNGKey(1)
        bad_t = jax.random.uniform(key, (n_bad, 3), minval=3.0, maxval=8.0)
        meas_t = meas_t.at[n_good:].set(bad_t)
        meas = Pose(good.R, meas_t)
        return poses_a, poses_b, meas, n_good, n_bad

    def test_consistency_matrix_separates(self):
        pa, pb, meas, n_good, n_bad = self._loops()
        L = n_good + n_bad
        M = pcm.consistency_matrix(pa, pb, meas, jnp.ones(L, bool))
        M = np.asarray(M)
        good_block = M[:n_good, :n_good]
        assert np.all(good_block < 0.872)
        assert np.all(M[n_good:, :n_good] > 0.872)

    def test_filter_keeps_good_rejects_bad(self):
        pa, pb, meas, n_good, n_bad = self._loops()
        keep = pcm.filter_loops(pa, pb, meas, np.ones(n_good + n_bad, bool))
        assert keep[:n_good].all()
        assert not keep[n_good:].any()

    def test_single_loop_kept(self):
        pa, pb, meas, *_ = self._loops(n_good=1, n_bad=0)
        valid = np.array([True])
        keep = pcm.filter_loops(
            se3.index(pa, jnp.array([0])), se3.index(pb, jnp.array([0])),
            se3.index(meas, jnp.array([0])), valid,
        )
        assert keep[0]

    def test_max_clique(self):
        # 5-node graph: clique {0,1,2}, extra edges 3-4
        adj = np.zeros((5, 5), bool)
        for a, b in [(0, 1), (1, 2), (0, 2), (3, 4)]:
            adj[a, b] = adj[b, a] = True
        c = pcm.max_clique_greedy(adj)
        assert set(c.tolist()) == {0, 1, 2}


class TestPCMPerPair:
    """PCM must gate each robot pair independently
    (`distributed_pcm.cpp:53-58`): with R>=3 a single stacked consistency
    matrix composes odometry from different robots' frames and drops
    valid loops of all but one pair."""

    def _pose_of(self, r, k):
        return Pose(jnp.eye(3), jnp.array([float(k), 2.0 * r, 0.0]))

    def _loop(self, ra, ia, rb, ib, offset=(0.0, 0.0, 0.0)):
        # rel maps a-frame points to b-frame: rel = T_b^-1 T_a
        ta = np.array([float(ia), 2.0 * ra, 0.0])
        tb = np.array([float(ib), 2.0 * rb, 0.0])
        rel = Pose(jnp.eye(3), jnp.asarray(ta - tb + np.asarray(offset)))
        return dict(robot_a=ra, kf_a=ia, robot_b=rb, kf_b=ib, rel=rel,
                    fitness=0.0, desc_dist=0.0)

    def test_all_pairs_valid_loops_survive(self):
        from mr_slam_tpu.runtime import pipeline as pl
        from mr_slam_tpu.runtime.config import SlamConfig

        cfg = SlamConfig()
        assert cfg.loops.use_pcm
        loops = [
            # pair (0,1): 3 good + 1 outlier
            self._loop(0, 2, 1, 2), self._loop(0, 8, 1, 8),
            self._loop(0, 14, 1, 14),
            self._loop(0, 5, 1, 5, offset=(4.0, -3.0, 1.5)),
            # pair (1,2): 3 good (mixed orientation) + 1 outlier
            self._loop(1, 3, 2, 3), self._loop(2, 9, 1, 9),
            self._loop(1, 15, 2, 15),
            self._loop(2, 6, 1, 6, offset=(-5.0, 2.5, 2.0)),
        ]
        kept = pl.pcm_gate_inter_loops(loops, self._pose_of, cfg)
        kept_keys = {(l["robot_a"], l["kf_a"], l["robot_b"], l["kf_b"]) for l in kept}
        for l in [loops[0], loops[1], loops[2], loops[4], loops[5], loops[6]]:
            key = (l["robot_a"], l["kf_a"], l["robot_b"], l["kf_b"])
            assert key in kept_keys, f"valid loop {key} dropped"
        for l in [loops[3], loops[7]]:
            key = (l["robot_a"], l["kf_a"], l["robot_b"], l["kf_b"])
            assert key not in kept_keys, f"outlier {key} kept"
