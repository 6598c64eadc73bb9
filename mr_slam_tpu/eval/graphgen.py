"""Synthetic multi-robot pose-graph generator for optimizer evaluation.

Builds the graph the reference's back-end would assemble from an NCLT-
style multi-robot run (`readFullGraph`, `global_manager.cpp:1484-1535`):
per-robot odometry chains integrated from NOISY relative motions (real
drift, exact ground truth), intra-robot loop closures where a robot
revisits its own track, and inter-robot loops where two robots' true
positions coincide — loop measurements are the true relative pose plus
bounded noise, at loop weight. Used by the `ate_vs_reference_ratio`
gate (BASELINE.md: ours <= 1.1x the reference optimizer's ATE) and the
reference-solver cross-check tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..backend import factor_graph as fg
from ..datasets import synthetic
from ..geometry import se3, so3
from ..geometry.se3 import Pose


def multi_robot_graph(
    n_robots: int = 3,
    nodes_per_robot: int = 170,
    radius: float = 30.0,
    laps: float = 2.0,
    drift_t: float = 0.05,
    drift_r: float = 0.004,
    loop_noise_t: float = 0.02,
    loop_noise_r: float = 0.002,
    loop_stride: int = 25,
    loop_radius: float = 8.0,
    min_separation: int = 40,
    outlier_frac: float = 0.0,
    seed: int = 0,
    node_capacity: int | None = None,
    edge_capacity: int | None = None,
):
    """Returns (graph, true_poses (R*K,) Pose stacked robot-major,
    anchors (node_capacity,) bool, node_of (R, K) int).

    Robots ride the same circle with angular offsets (the NCLT demo's
    shared-site geometry), so inter-robot revisits are dense; `laps > 1`
    gives each robot intra-robot revisits too.
    """
    R, K = n_robots, nodes_per_robot
    N = R * K
    node_capacity = node_capacity or int(1.1 * N) + 8
    edge_capacity = edge_capacity or 4 * N
    key = jax.random.PRNGKey(seed)

    true_list, noisy_list = [], []
    for r in range(R):
        key, sub = jax.random.split(key)
        t = synthetic.circle_trajectory(K, radius=radius, laps=laps)
        # rotate robot r's whole track by a phase offset around the site
        phase = 2.0 * jnp.pi * r / R
        Rz = so3.yaw_rot(jnp.float32(phase))
        t = Pose(Rz[None] @ t.R, (Rz @ t.t.T).T)
        true_list.append(t)
        noisy_list.append(
            synthetic.perturb_trajectory(sub, t, drift_t, drift_r)
        )

    graph = fg.init(node_capacity, edge_capacity)
    node_of = np.arange(N).reshape(R, K)
    for r in range(R):
        graph, idx = fg.add_nodes_batch(
            graph,
            se3.index(noisy_list[r], slice(0, K)),
            jnp.full((K,), r, jnp.int32),
        )
        node_of[r] = np.asarray(idx)
        # odometry edges from the NOISY chain: consistent with the
        # initial values, so residual error lives in the drift
        meas = se3.between(
            se3.index(noisy_list[r], slice(0, K - 1)),
            se3.index(noisy_list[r], slice(1, K)),
        )
        graph, _ = fg.add_edges_batch(
            graph, idx[:-1], idx[1:], meas, fg.ODOM, 1.0, 1.0
        )

    # ---- loop closures from TRUE geometry + bounded noise ----------------
    # Candidate selection in numpy; ALL loop measurements computed in
    # one batched op (per-loop jnp dispatches measured ~300 s for a
    # 510-node graph on a 2-core host — this is host-side test-fixture
    # code, but the bench grid builds 9 such graphs).
    rng = np.random.default_rng(seed + 1)
    true_t = np.stack([np.asarray(t.t) for t in true_list])  # (R, K, 3)
    sel = []  # (ra, ia, rb, ib, kind)

    for ra in range(R):
        for ia in range(loop_stride, K, loop_stride):
            # intra: nearest previous node outside the separation window
            d = np.linalg.norm(true_t[ra, :ia] - true_t[ra, ia], axis=-1)
            d[max(0, ia - min_separation):] = np.inf
            ib = int(np.argmin(d))
            if np.isfinite(d[ib]) and d[ib] < loop_radius:
                sel.append((ra, ia, ra, ib, fg.INTRA_LOOP))
            # inter: nearest node of each other robot
            for rb in range(ra):
                d = np.linalg.norm(true_t[rb] - true_t[ra, ia], axis=-1)
                ib = int(np.argmin(d))
                if d[ib] < loop_radius:
                    sel.append((ra, ia, rb, ib, fg.INTER_LOOP))

    li = [int(node_of[ra, ia]) for ra, ia, _, _, _ in sel]
    lj = [int(node_of[rb, ib]) for _, _, rb, ib, _ in sel]
    lkind = [k for *_, k in sel]
    lmeas = []
    if sel:
        true_R_all = jnp.concatenate([t.R for t in true_list])  # (N, 3, 3)
        true_t_all = jnp.concatenate([t.t for t in true_list])
        ja = jnp.asarray([node_of[ra, ia] for ra, ia, _, _, _ in sel])
        jb = jnp.asarray([node_of[rb, ib] for _, _, rb, ib, _ in sel])
        ta = Pose(true_R_all[ja], true_t_all[ja])
        tb = Pose(true_R_all[jb], true_t_all[jb])
        meas = se3.between(ta, tb)
        L = len(sel)
        dw = so3.exp(jnp.asarray(
            loop_noise_r * rng.standard_normal((L, 3)), jnp.float32))
        dt = jnp.asarray(
            loop_noise_t * rng.standard_normal((L, 3)), jnp.float32)
        noisy = Pose(dw @ meas.R, meas.t + dt)

        # ---- outlier injection: replace a fraction of loops with wrong
        # measurements (random association — the failure PCM + robust
        # loss must absorb; `distributed_pcm.cpp` exists for these)
        if outlier_frac > 0.0:
            n_out = int(round(outlier_frac * L))
            if n_out:
                out_idx = jnp.asarray(
                    rng.choice(L, size=n_out, replace=False)
                )
                bad_R = so3.exp(jnp.asarray(
                    rng.uniform(-np.pi, np.pi, (n_out, 3)) * 0.5,
                    jnp.float32))
                bad_t = jnp.asarray(
                    rng.uniform(-20.0, 20.0, (n_out, 3)), jnp.float32)
                noisy = Pose(
                    noisy.R.at[out_idx].set(bad_R),
                    noisy.t.at[out_idx].set(bad_t),
                )

        graph, _ = fg.add_edges_batch(
            graph,
            jnp.asarray(li, jnp.int32), jnp.asarray(lj, jnp.int32),
            noisy, jnp.asarray(lkind, jnp.int32),
            jnp.full((L,), 10.0, jnp.float32),
            jnp.full((L,), 10.0, jnp.float32),
        )

    anchors = np.zeros(node_capacity, bool)
    anchors[node_of[:, 0]] = True
    true = Pose(
        jnp.concatenate([t.R for t in true_list]),
        jnp.concatenate([t.t for t in true_list]),
    )
    return graph, true, jnp.asarray(anchors), node_of
