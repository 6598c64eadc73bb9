"""Independent trusted SE(3) pose-graph solver — the cross-check role
GTSAM plays in the reference (the back-end is gtsam Gauss-Newton /
distributed-mapper: `global_manager.cpp:1279-1465`,
`distributed_mapper/evaluation_utils.cpp:273-331`; gtsam is not
installable here, so this stands in as the reference optimizer).

Deliberately shares NO math or code path with `backend/chordal.py`:

  parameterization  global rotation-vector per node (scipy Rotation)
                    vs chordal relaxation + GN retraction
  solver            scipy.optimize.least_squares TRF with a sparse
                    finite-difference Jacobian vs matrix-free CG inside
                    hand-derived Gauss-Newton
  assembly          batched numpy/scipy on host vs jitted einsum chains

Agreement between the two optimizers on the same graph is therefore
evidence of correctness, not of shared bugs. This solver is slow-but-
trusted: host-only, O(edges) dense residual sweeps per Jacobian column
group — use for evaluation, never in the production path.
"""
from __future__ import annotations

import numpy as np

from ..backend import factor_graph as fg
from ..geometry.se3 import Pose


def _extract(graph: fg.FactorGraph):
    """Pull the valid graph content to host numpy."""
    n_nodes = int(graph.n_nodes)
    n_edges = int(graph.n_edges)
    nodes_R = np.asarray(graph.poses.R[:n_nodes], np.float64)
    nodes_t = np.asarray(graph.poses.t[:n_nodes], np.float64)
    ei = np.asarray(graph.edge_i[:n_edges])
    ej = np.asarray(graph.edge_j[:n_edges])
    meas_R = np.asarray(graph.edge_meas.R[:n_edges], np.float64)
    meas_t = np.asarray(graph.edge_meas.t[:n_edges], np.float64)
    w_rot = np.asarray(graph.edge_w_rot[:n_edges], np.float64)
    w_trans = np.asarray(graph.edge_w_trans[:n_edges], np.float64)
    return nodes_R, nodes_t, ei, ej, meas_R, meas_t, w_rot, w_trans


def solve(
    graph: fg.FactorGraph,
    anchors,
    anchor_weight: float = 1e3,
    max_nfev: int | None = None,
    verbose: int = 0,
    loss: str = "linear",
) -> Pose:
    """Full nonlinear SE(3) PGO via scipy TRF least squares.

    Residuals per edge (i, j) with measurement (R_m, t_m):
        r_t = sqrt(w_t) * (R_i^T (t_j - t_i) - t_m)
        r_R = sqrt(w_r) * Log(R_m^T R_i^T R_j)
    plus anchor priors pinning each anchored node at its input pose.
    Returns a Pose batched over graph.node_capacity (invalid nodes keep
    their input pose), float32, matching `chordal.optimize`'s contract.
    """
    from scipy.optimize import least_squares
    from scipy.sparse import lil_matrix
    from scipy.spatial.transform import Rotation

    nodes_R, nodes_t, ei, ej, meas_R, meas_t, w_rot, w_trans = _extract(graph)
    N = nodes_t.shape[0]
    E = ei.shape[0]
    anchors = np.asarray(anchors, bool)[:N]
    aidx = np.flatnonzero(anchors)
    A = len(aidx)
    if N == 0:
        return graph.poses

    sw_t = np.sqrt(w_trans)[:, None]
    sw_r = np.sqrt(w_rot)[:, None]
    anchor_R0 = Rotation.from_matrix(nodes_R[aidx]) if A else None
    anchor_t0 = nodes_t[aidx]
    meas_rot = Rotation.from_matrix(meas_R)

    def unpack(x):
        x = x.reshape(N, 6)
        return x[:, :3], Rotation.from_rotvec(x[:, 3:])

    def residuals(x):
        t, rot = unpack(x)
        Ri = rot[ei]
        Rj = rot[ej]
        r_t = Ri.inv().apply(t[ej] - t[ei]) - meas_t
        r_R = (meas_rot.inv() * Ri.inv() * Rj).as_rotvec()
        out = [sw_t * r_t, sw_r * r_R]
        if A:
            out.append(anchor_weight * (t[aidx] - anchor_t0))
            out.append(anchor_weight * (anchor_R0.inv() * rot[aidx]).as_rotvec())
        return np.concatenate([o.ravel() for o in out])

    # sparse finite-difference Jacobian structure: each edge residual
    # block touches the 12 states of its two endpoints. Row layout
    # matches `residuals`' concatenation: [r_t (3E), r_R (3E),
    # anchor_t (3A), anchor_R (3A)].
    rows = 6 * E + 6 * A
    S = lil_matrix((rows, 6 * N), dtype=np.int8)
    for e in range(E):
        for node in (ei[e], ej[e]):
            S[3 * e : 3 * e + 3, 6 * node : 6 * node + 6] = 1
            S[3 * E + 3 * e : 3 * E + 3 * e + 3, 6 * node : 6 * node + 6] = 1
    for a in range(A):
        col = slice(6 * aidx[a], 6 * aidx[a] + 6)
        S[6 * E + 3 * a : 6 * E + 3 * a + 3, col] = 1
        S[6 * E + 3 * A + 3 * a : 6 * E + 3 * A + 3 * a + 3, col] = 1

    x0 = np.concatenate(
        [nodes_t, Rotation.from_matrix(nodes_R).as_rotvec()], axis=1
    ).ravel()
    res = least_squares(
        residuals, x0, jac_sparsity=S, method="trf",
        x_scale="jac", max_nfev=max_nfev, verbose=verbose, loss=loss,
    )
    t, rot = unpack(res.x)

    cap = graph.node_capacity
    out_R = np.asarray(graph.poses.R, np.float32).copy()
    out_t = np.asarray(graph.poses.t, np.float32).copy()
    out_R[:N] = rot.as_matrix().astype(np.float32)
    out_t[:N] = t.astype(np.float32)
    import jax.numpy as jnp

    return Pose(jnp.asarray(out_R), jnp.asarray(out_t))
