"""g2o pose-graph interchange — artifact parity with the reference.

The reference persists `writeG2o` dumps before/after optimization
(`global_manager.cpp:188-212`, `/tmp/fullGraph.g2o` debug dumps at
`:1322-1323`) with gtsam-style keys (char('a'+robot) << 56 | index).
This module reads/writes the same VERTEX_SE3:QUAT / EDGE_SE3:QUAT
format so trajectories can be cross-checked against gtsam tooling.
"""
from __future__ import annotations

import numpy as np

from ..backend import factor_graph as fg
from ..geometry import se3, so3
from ..geometry.se3 import Pose


def export_g2o(path: str, g: fg.FactorGraph, max_index: int = 1 << 20) -> None:
    """Write valid nodes/edges. Node ids use the gtsam key codec so
    per-robot graphs read back identically to the reference's dumps."""
    import jax.numpy as jnp

    n_nodes = int(g.n_nodes)
    n_edges = int(g.n_edges)
    poses_q = np.asarray(so3.rot_to_quat(g.poses.R[:n_nodes]))  # (N, wxyz)
    poses_t = np.asarray(g.poses.t[:n_nodes])
    robots = np.asarray(g.node_robot[:n_nodes])
    meas_q = np.asarray(so3.rot_to_quat(g.edge_meas.R[:n_edges]))
    meas_t = np.asarray(g.edge_meas.t[:n_edges])
    ei = np.asarray(g.edge_i[:n_edges])
    ej = np.asarray(g.edge_j[:n_edges])
    w_rot = np.asarray(g.edge_w_rot[:n_edges])
    w_trans = np.asarray(g.edge_w_trans[:n_edges])
    valid_e = np.asarray(g.edge_valid[:n_edges])

    # local per-robot indices for key encoding
    local_idx = np.zeros(n_nodes, np.int64)
    counters: dict[int, int] = {}
    for i in range(n_nodes):
        r = int(robots[i])
        local_idx[i] = counters.get(r, 0)
        counters[r] = counters.get(r, 0) + 1

    def key(i: int) -> int:
        return fg.robot_id_to_key(int(robots[i]), int(local_idx[i]))

    with open(path, "w") as f:
        for i in range(n_nodes):
            w, x, y, z = poses_q[i]
            tx, ty, tz = poses_t[i]
            f.write(
                f"VERTEX_SE3:QUAT {key(i)} {tx:.9f} {ty:.9f} {tz:.9f} "
                f"{x:.9f} {y:.9f} {z:.9f} {w:.9f}\n"
            )
        for e in range(n_edges):
            if not valid_e[e]:
                continue
            w, x, y, z = meas_q[e]
            tx, ty, tz = meas_t[e]
            # diagonal information: translation block w_trans, rotation w_rot
            I = np.zeros((6, 6))
            I[0, 0] = I[1, 1] = I[2, 2] = w_trans[e]
            I[3, 3] = I[4, 4] = I[5, 5] = w_rot[e]
            upper = " ".join(
                f"{I[r, c]:.9f}" for r in range(6) for c in range(r, 6)
            )
            f.write(
                f"EDGE_SE3:QUAT {key(int(ei[e]))} {key(int(ej[e]))} "
                f"{tx:.9f} {ty:.9f} {tz:.9f} {x:.9f} {y:.9f} {z:.9f} {w:.9f} "
                f"{upper}\n"
            )


def import_g2o(path: str, node_capacity: int | None = None, edge_capacity: int | None = None):
    """Read a g2o file into a FactorGraph (+ the key list in file
    order). Handles gtsam-style huge keys via the codec."""
    import jax.numpy as jnp

    verts: list[tuple[int, np.ndarray, np.ndarray]] = []
    edges: list[tuple[int, int, np.ndarray, np.ndarray, float, float]] = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "VERTEX_SE3:QUAT":
                k = int(parts[1])
                tx, ty, tz, x, y, z, w = map(float, parts[2:9])
                verts.append((k, np.array([tx, ty, tz]), np.array([w, x, y, z])))
            elif parts[0] == "EDGE_SE3:QUAT":
                ki, kj = int(parts[1]), int(parts[2])
                tx, ty, tz, x, y, z, w = map(float, parts[3:10])
                info = list(map(float, parts[10:31]))
                w_trans = info[0] if info else 1.0
                # info upper-triangular row-major: index of (3,3) entry
                w_rot = info[18] if len(info) > 18 else 1.0
                edges.append(
                    (ki, kj, np.array([tx, ty, tz]), np.array([w, x, y, z]),
                     w_rot, w_trans)
                )
    key_to_idx = {k: i for i, (k, _, _) in enumerate(verts)}
    n, e = len(verts), len(edges)
    g = fg.init(node_capacity or max(n, 1), edge_capacity or max(e, 1))
    ts = jnp.asarray(np.stack([v[1] for v in verts])) if n else jnp.zeros((0, 3))
    qs = jnp.asarray(np.stack([v[2] for v in verts])) if n else jnp.zeros((0, 4))
    Rs = so3.quat_to_rot(qs)
    robots = jnp.asarray(
        np.array([fg.key_to_robot_id(v[0])[0] for v in verts], np.int32)
    )
    N = g.node_capacity
    g = g._replace(
        poses=Pose(
            g.poses.R.at[:n].set(Rs), g.poses.t.at[:n].set(ts)
        ),
        node_robot=g.node_robot.at[:n].set(jnp.maximum(robots, 0)),
        node_valid=g.node_valid.at[:n].set(True),
        n_nodes=jnp.int32(n),
    )
    if e:
        ei = jnp.asarray(np.array([key_to_idx[x[0]] for x in edges], np.int32))
        ej = jnp.asarray(np.array([key_to_idx[x[1]] for x in edges], np.int32))
        mts = jnp.asarray(np.stack([x[2] for x in edges]))
        mqs = jnp.asarray(np.stack([x[3] for x in edges]))
        wr = jnp.asarray(np.array([x[4] for x in edges], np.float32))
        wt = jnp.asarray(np.array([x[5] for x in edges], np.float32))
        # classify kinds from the key codec: consecutive same-robot keys
        # are odometry, other same-robot pairs intra-robot loops, cross-
        # robot pairs inter-robot loops (g2o carries no type tag; the
        # reference reconstructs the same way when reading its dumps)
        def _kind(ki: int, kj: int) -> int:
            ri_, ii_ = fg.key_to_robot_id(ki)
            rj_, ij_ = fg.key_to_robot_id(kj)
            if ri_ != rj_:
                return fg.INTER_LOOP
            return fg.ODOM if abs(ii_ - ij_) == 1 else fg.INTRA_LOOP

        kinds = jnp.asarray(
            np.array([_kind(x[0], x[1]) for x in edges], np.int32)
        )
        g = g._replace(
            edge_i=g.edge_i.at[:e].set(ei),
            edge_j=g.edge_j.at[:e].set(ej),
            edge_kind=g.edge_kind.at[:e].set(kinds),
            edge_meas=Pose(
                g.edge_meas.R.at[:e].set(so3.quat_to_rot(mqs)),
                g.edge_meas.t.at[:e].set(mts),
            ),
            edge_w_rot=g.edge_w_rot.at[:e].set(wr),
            edge_w_trans=g.edge_w_trans.at[:e].set(wt),
            edge_valid=g.edge_valid.at[:e].set(True),
            n_edges=jnp.int32(e),
        )
    return g
