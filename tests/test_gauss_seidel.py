import jax
import jax.numpy as jnp
import numpy as np

from mr_slam_tpu.backend import chordal, factor_graph as fg, gauss_seidel
from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.geometry import se3
from tests.test_backend import ate_rmse, build_circle_graph


def build_two_robot_graph(n=24, seed=0):
    """Two circle trajectories side by side, drifted odometry, exact
    inter-robot loops tying them together. Returns (graph, true_ts)."""
    true_a = synthetic.circle_trajectory(n, radius=8.0, laps=0.8)
    true_b = synthetic.circle_trajectory(n, radius=8.0, laps=0.8,
                                         center=(4.0, 0.0))
    keys = jax.random.split(jax.random.PRNGKey(seed), 2)
    noisy_a = synthetic.perturb_trajectory(keys[0], true_a,
                                           trans_sigma=0.05, rot_sigma=0.005)
    noisy_b = synthetic.perturb_trajectory(keys[1], true_b,
                                           trans_sigma=0.05, rot_sigma=0.005)
    g = fg.init(2 * n, 4 * n)
    for r, noisy in ((0, noisy_a), (1, noisy_b)):
        base = r * n
        for i in range(n):
            g, _ = fg.add_node(g, se3.index(noisy, i), jnp.int32(r))
        for i in range(n - 1):
            meas = se3.between(se3.index(noisy, i), se3.index(noisy, i + 1))
            g, _ = fg.add_edge(
                g, jnp.int32(base + i), jnp.int32(base + i + 1), meas,
                jnp.int32(fg.ODOM), jnp.float32(1.0), jnp.float32(1.0))
    for i in range(0, n, 6):  # exact inter-robot loops
        meas = se3.between(se3.index(true_a, i), se3.index(true_b, i))
        g, _ = fg.add_edge(
            g, jnp.int32(i), jnp.int32(n + i), meas, jnp.int32(fg.INTER_LOOP),
            jnp.float32(10.0), jnp.float32(10.0))
    true_t = jnp.concatenate([true_a.t, true_b.t], axis=0)
    return g, true_t


class TestGaussSeidel:
    def test_two_robot_convergence(self):
        g, true_t = build_two_robot_graph()
        anchors = jnp.zeros((g.node_capacity,), bool).at[0].set(True)
        before = ate_rmse(g.poses.t, true_t, g.node_valid)
        cfg = gauss_seidel.GSConfig(rot_sweeps=15, pose_sweeps=15, cg_iters=12)
        opt = gauss_seidel.optimize(g, anchors, 2, cfg)
        after = ate_rmse(opt.t, true_t, g.node_valid)
        assert np.isfinite(np.asarray(opt.t)).all()
        # converges toward the centralized optimum (noise floor ~0.27)
        cen = chordal.optimize(g, anchors, chordal.PGOConfig())
        cen_err = ate_rmse(cen.t, true_t, g.node_valid)
        assert after < before, (before, after)
        assert after < 1.35 * cen_err, (after, cen_err)

    def test_matches_centralized_fixed_point(self):
        g, true_t = build_two_robot_graph(seed=3)
        anchors = jnp.zeros((g.node_capacity,), bool).at[0].set(True)
        gs = gauss_seidel.optimize(
            g, anchors, 2,
            gauss_seidel.GSConfig(rot_sweeps=25, pose_sweeps=25, cg_iters=15))
        cen = chordal.optimize(
            g, anchors,
            chordal.PGOConfig(rot_cg_iters=60, gn_iters=12, pose_cg_iters=40))
        err_gs = ate_rmse(gs.t, true_t, g.node_valid)
        err_cen = ate_rmse(cen.t, true_t, g.node_valid)
        # decentralized should land in the same basin as centralized
        assert err_gs < max(2.0 * err_cen, 0.05), (err_gs, err_cen)

    def test_jacobi_and_relaxation_variants(self):
        g, true_t = build_two_robot_graph(seed=1)
        anchors = jnp.zeros((g.node_capacity,), bool).at[0].set(True)
        before = ate_rmse(g.poses.t, true_t, g.node_valid)
        jac = gauss_seidel.optimize(
            g, anchors, 2,
            gauss_seidel.GSConfig(rot_sweeps=20, pose_sweeps=20, cg_iters=12,
                                  jacobi=True, gamma=0.8))
        assert ate_rmse(jac.t, true_t, g.node_valid) < 0.95 * before

    def test_single_robot_matches_chordal(self):
        g, true, noisy = build_circle_graph(n=24, node_cap=32, edge_cap=64)
        anchors = jnp.zeros((g.node_capacity,), bool).at[0].set(True)
        gs = gauss_seidel.optimize(
            g, anchors, 1,
            gauss_seidel.GSConfig(rot_sweeps=10, pose_sweeps=15, cg_iters=20,
                                  flagged_init=False))
        err = ate_rmse(gs.t[:24], true.t)
        cen = chordal.optimize(g, anchors, chordal.PGOConfig())
        cen_err = ate_rmse(cen.t[:24], true.t)
        # single robot: block solve IS the global solve -> same optimum
        assert err < 1.05 * cen_err, (err, cen_err)
