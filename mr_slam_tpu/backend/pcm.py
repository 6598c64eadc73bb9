"""Pairwise Consistency Maximization (PCM) inter-robot loop gating.

Re-design of the vendored lajoiepy stack (`pairwise_consistency_
maximization/`): two inter-robot loops (a_i -> b_j, Z1) and
(a_k -> b_l, Z2) are *consistent* when the cycle

    Z1^-1 . (x_{a_i}^-1 x_{a_k}) . Z2 . (x_{b_l}^-1 x_{b_j})

is near identity under a Mahalanobis norm
(`pairwise_consistency.cpp:99-137`, identity covariance). The largest
mutually-consistent subset is the maximum clique of the consistency
graph (`fast_max-clique_finder`, heuristic mode in production —
`global_manager.cpp:1305`).

TPU split: the O(L^2) consistency matrix is one batched pose-algebra op;
the max clique is inherently combinatorial and runs on host over the
tiny boolean matrix (L = active loop count, tens), exactly where the
reference runs it. A greedy+local-search heuristic matches
`findCliqueHeu.cpp`; loop counts here never justify the exact
branch-and-bound twin.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3
from ..geometry.se3 import Pose

# chi2 inverse CDF at 6 dof for the reference's pcm_thresh table
# (`pairwise_consistency.cpp:7-38`: threshold prob -> chi2 value)
CHI2_6DOF = {
    0.01: 0.872,
    0.05: 1.635,
    0.10: 2.204,
    0.25: 3.455,
    0.50: 5.348,
    0.75: 7.840,
}


@jax.jit
def consistency_matrix(
    poses_a: Pose,      # (L,) robot-a keyframe odometry poses at loop ends
    poses_b: Pose,      # (L,) robot-b keyframe odometry poses at loop ends
    meas: Pose,         # (L,) loop measurements: b-frame <- a-frame
    valid: jax.Array,   # (L,)
    rot_sigma: float = 0.1,
    trans_sigma: float = 0.5,
) -> jax.Array:
    """(L, L) squared consistency distances (chi2-comparable, 6 dof).

    For loops k, l: err_kl = log( Z_k^-1 A_kl Z_l B_lk ) with
    A_kl = x_{a_k}^-1 x_{a_l} (robot-a odometry between the two loop
    anchor frames) and B_lk = x_{b_l}^-1 x_{b_k}. Scaled by fixed sigmas
    (the reference uses identity covariance; sigmas here normalize rot
    vs trans units). Invalid pairs get +inf.
    """
    L = valid.shape[0]

    def pair(k, l):
        A = se3.between(se3.index(poses_a, k), se3.index(poses_a, l))
        B = se3.between(se3.index(poses_b, l), se3.index(poses_b, k))
        Zk = se3.index(meas, k)
        Zl = se3.index(meas, l)
        cycle = se3.compose(
            se3.compose(se3.inverse(Zk), A), se3.compose(Zl, B)
        )
        xi = se3.log(cycle)
        d2 = (
            jnp.sum((xi[0:3] / trans_sigma) ** 2)
            + jnp.sum((xi[3:6] / rot_sigma) ** 2)
        )
        return d2

    ks = jnp.arange(L)
    M = jax.vmap(lambda k: jax.vmap(lambda l: pair(k, l))(ks))(ks)
    ok = valid[:, None] & valid[None, :]
    return jnp.where(ok, M, jnp.inf)


def max_clique(adj: np.ndarray) -> np.ndarray:
    """Maximum clique: native exact branch-and-bound when the C++
    library is built (`native/maxclique.cpp`, the twin of the
    reference's fast_max-clique_finder), else the greedy heuristic."""
    from .. import native

    result = native.max_clique(np.asarray(adj, bool))
    if result is not None:
        return result
    return max_clique_greedy(np.asarray(adj, bool))


def max_clique_greedy(adj: np.ndarray, restarts: int = 32, seed: int = 0) -> np.ndarray:
    """Heuristic maximum clique on a boolean adjacency matrix (host).

    Greedy-by-degree with randomized restarts + 1-swap local search —
    the same flavour as `findCliqueHeu.cpp` (Pattabiraman et al.
    heuristic). Returns indices of the best clique found.
    """
    n = adj.shape[0]
    if n == 0:
        return np.zeros((0,), np.int64)
    adj = np.asarray(adj, bool).copy()
    np.fill_diagonal(adj, False)
    rng = np.random.default_rng(seed)
    best: np.ndarray = np.zeros((0,), np.int64)
    degrees = adj.sum(1)
    for it in range(restarts):
        if it == 0:
            order = np.argsort(-degrees)
        else:
            order = rng.permutation(n)
        clique: list[int] = []
        cand = np.ones(n, bool)
        for v in order:
            if cand[v]:
                clique.append(v)
                cand &= adj[v]
        c = np.array(sorted(clique), np.int64)
        if len(c) > len(best):
            best = c
    return best


def filter_loops(
    poses_a: Pose,
    poses_b: Pose,
    meas: Pose,
    valid: np.ndarray | jax.Array,
    threshold: float = 0.872,  # pcm_thresh 0.01 (`global_manager.launch:45`)
    rot_sigma: float = 0.1,
    trans_sigma: float = 0.5,
) -> np.ndarray:
    """Full PCM pass for one robot pair: consistency matrix (device) ->
    max clique (host) -> (L,) bool accept mask — what `solveCentralized`
    does before erasing rejected factors (`distributed_pcm.cpp:37-66`)."""
    M = consistency_matrix(poses_a, poses_b, meas, jnp.asarray(valid), rot_sigma, trans_sigma)
    M = np.asarray(M)
    v = np.asarray(valid, bool)
    adj = (M < threshold) & (M.T < threshold)
    adj &= v[:, None] & v[None, :]
    clique = max_clique(adj)
    keep = np.zeros(v.shape[0], bool)
    keep[clique] = True
    # singleton graphs: a single valid loop has no pair support; the
    # reference keeps it (PCM only prunes when contradictions exist)
    if v.sum() == 1:
        keep = v.copy()
    return keep
