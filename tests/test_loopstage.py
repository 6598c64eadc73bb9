"""Batched loop stage (`runtime/loopstage.py`): the O(R^2)-dispatch
retrieval/verification must agree with the per-query reference path
(`pipeline._descriptor_distances` / `pipeline._verify_loop`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.frontend import keyframes as kf
from mr_slam_tpu.geometry import se3
from mr_slam_tpu.runtime import loopstage
from mr_slam_tpu.runtime import pipeline as pl
from mr_slam_tpu.runtime.config import KeyframeCfg, LoopCfg, SlamConfig


@pytest.fixture(scope="module")
def circle_store():
    world = synthetic.default_world(3)
    n = 20
    traj = synthetic.circle_trajectory(n, radius=10.0, laps=1.0)
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    store = kf.init(32, 2048)
    for i in range(n):
        xyz, _, hit = synthetic.scan(
            world, se3.index(traj, i), n_rings=16, n_azimuth=256, key=keys[i]
        )
        scan = synthetic.scan_to_cloud(xyz, hit)
        store, _ = kf.maybe_add(
            store, scan, se3.index(traj, i), jnp.float32(0.1 * i),
            dist_thresh=1.0, leaf=0.2,
        )
    return store


CFG = SlamConfig(
    keyframes=KeyframeCfg(dist_thresh=1.0, capacity=32, points_per_kf=2048),
    loops=LoopCfg(method="scancontext", dist_thresh=0.4, min_separation=4,
                  candidates=2, verify_capacity=4096, fitness_thresh=0.3),
)


class TestRetrieve:
    def test_matches_per_query_distances(self, circle_store):
        store = circle_store
        descs = pl.compute_descriptors(store, CFG)
        K = int(store.count)
        qi = jnp.arange(store.capacity, dtype=jnp.int32)
        d_top, i_top, yaw_top, *_ = loopstage.retrieve(
            descs, qi, store.poses.t, descs, store.poses.t, store.count,
            CFG, same_robot=True,
        )
        d_top, i_top = np.asarray(d_top), np.asarray(i_top)
        sep = CFG.loops.min_separation
        for ia in range(K):
            d, _ = pl._descriptor_distances(descs, ia, descs, CFG)
            d = np.array(d[:K])
            # same masking as the batched path: band + lower triangle
            for ib in range(K):
                if abs(ib - ia) <= sep or ib >= ia:
                    d[ib] = np.inf
            order = np.argsort(d)[: CFG.loops.candidates]
            for c, ib in enumerate(order):
                if np.isfinite(d[ib]):
                    assert i_top[ia, c] == ib
                    np.testing.assert_allclose(
                        d_top[ia, c], d[ib], rtol=1e-5, atol=1e-6
                    )
                else:
                    assert not np.isfinite(d_top[ia, c])

    def test_padding_rows_masked(self, circle_store):
        store = circle_store
        descs = pl.compute_descriptors(store, CFG)
        qi = jnp.asarray([-1, 5], jnp.int32)
        d_top, *_ = loopstage.retrieve(
            descs, qi, store.poses.t, descs, store.poses.t, store.count,
            CFG, same_robot=True,
        )
        # qi=-1 wraps but the host path discards it; qi=5 with sep=4 and
        # lower triangle leaves only ib=0 eligible
        assert np.isfinite(np.asarray(d_top)[1]).sum() <= 1


class TestVerifyChunk:
    def test_matches_reference_verify(self, circle_store):
        store = circle_store
        descs = pl.compute_descriptors(store, CFG)
        loops = loopstage.search_pair_loops(
            store, descs, store, descs, CFG, same_robot=True
        )
        assert len(loops) >= 1, "revisit on a closed circle must verify"
        for l in loops[:2]:
            acc, rel, fit = pl._verify_loop(
                store, l["kf_a"], store, l["kf_b"], 0.0, CFG,
                same_robot=True, descs_a=descs, descs_b=descs,
            )
            assert acc
            # batched picks the best seed; same-robot has one seed, so
            # fitness and pose must agree tightly
            np.testing.assert_allclose(fit, l["fitness"], rtol=0.05, atol=5e-3)
            assert float(jnp.linalg.norm(rel.t - l["rel"].t)) < 0.1

    def test_exclude_skips_verification(self, circle_store):
        store = circle_store
        descs = pl.compute_descriptors(store, CFG)
        all_loops = loopstage.search_pair_loops(
            store, descs, store, descs, CFG, same_robot=True
        )
        excl = {(l["kf_a"], l["kf_b"]) for l in all_loops}
        rest = loopstage.search_pair_loops(
            store, descs, store, descs, CFG, same_robot=True, exclude=excl
        )
        assert not {(l["kf_a"], l["kf_b"]) for l in rest} & excl


class TestGraphBuildBatch:
    def test_matches_incremental_build(self, circle_store):
        from mr_slam_tpu.backend import factor_graph as fg

        store = circle_store
        robots = [
            pl.RobotResult(
                odom_poses=store.poses, store=store,
                kf_frame_idx=np.arange(int(store.count)),
            )
        ] * 2
        graph, node_of = pl.build_graph(robots, CFG)
        K = int(store.count)
        assert int(graph.n_nodes) == 2 * K
        assert int(graph.n_edges) == 2 * (K - 1)
        assert (node_of[0, :K] == np.arange(K)).all()
        assert (node_of[1, :K] == K + np.arange(K)).all()
        # odometry edge measurements match se3.between of consecutives
        meas_R = np.asarray(graph.edge_meas.R[: K - 1])
        ref = se3.between(
            se3.index(store.poses, 0), se3.index(store.poses, 1)
        )
        np.testing.assert_allclose(meas_R[0], np.asarray(ref.R), atol=1e-6)
        assert np.asarray(graph.node_robot[:K]).max() == 0
        assert np.asarray(graph.node_robot[K : 2 * K]).min() == 1

    def test_node_overflow_warns_and_drops(self, circle_store):
        import warnings

        store = circle_store
        cfg = CFG.replace(pgo=CFG.pgo.__class__(node_capacity=8, edge_capacity=16))
        robots = [
            pl.RobotResult(
                odom_poses=store.poses, store=store,
                kf_frame_idx=np.arange(int(store.count)),
            )
        ]
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            graph, node_of = pl.build_graph(robots, cfg)
        assert any("saturated" in str(x.message) for x in w)
        assert int(graph.n_nodes) == 8
        assert (node_of[0, 8:] == -1).all()
