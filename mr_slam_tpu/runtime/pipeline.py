"""End-to-end multi-robot SLAM pipeline — the global manager, functional.

The reference's GlobalManager runs six mutex-guarded threads (discovery,
map composing, loop closing, TF publish, graph publish, geometry check —
`global_manager_node.cpp:45-50`). Here the same dataflow is a
deterministic staged pipeline over array state (SURVEY.md §2.10):

  odometry (lax.scan) -> keyframe gating -> descriptor batch ->
  loop retrieval (one einsum/FFT) -> geometry verification (vmapped
  VGICP over merged submaps) -> PCM -> chordal PGO -> map composing

Host Python only orchestrates stage order and the (tiny) dynamic loop
list; every heavy stage is jit-compiled. The multi-robot case runs the
same stages with a leading robot axis.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..backend import chordal, factor_graph as fg, pcm
from ..frontend import keyframes as kf
from ..frontend import odometry
from ..geometry import se3, so3
from ..geometry.se3 import Pose
from ..loop import bev, disco, ring, scancontext
from ..ops import pointcloud as pcl
from ..ops import registration, voxel_grid
from .config import SlamConfig


@dataclass
class RobotResult:
    odom_poses: Pose            # (T,) raw odometry
    store: kf.KeyframeStore     # keyframes
    kf_frame_idx: np.ndarray    # (K,) frame index of each keyframe


@dataclass
class SlamResult:
    robots: list[RobotResult]
    graph: fg.FactorGraph
    opt_poses: Pose             # (N,) optimized node poses
    node_of: np.ndarray         # (R, Kmax) node index per robot keyframe
    loops: list[dict]           # accepted loop records
    merged_cloud: pcl.PointCloud | None = None

    def optimized_trajectory(self, robot: int) -> Pose:
        ids = self.node_of[robot]
        ids = ids[ids >= 0]
        return Pose(self.opt_poses.R[ids], self.opt_poses.t[ids])


def _lio_config(cfg: SlamConfig):
    from ..frontend import lio

    o = cfg.odometry
    return lio.LioConfig(
        map_leaf=o.map_leaf, insert_leaf=o.insert_leaf, scan_leaf=o.scan_leaf,
        scan_capacity=o.scan_capacity, insert_capacity=o.insert_capacity,
        table_size=o.table_size, map_radius=o.map_radius,
    )


@partial(jax.jit, static_argnames=("cfg",))
def _frontend_fused_lio(scans: pcl.PointCloud, imu, cfg: SlamConfig, origin: Pose):
    """LIO odometry + keyframe gating as ONE lax.scan — no per-frame
    host round-trips (SURVEY §7.4 streaming). Returns (poses (T,),
    store, added (T,) bool)."""
    from ..frontend import lio

    gyro, acc, dts = imu
    lcfg = _lio_config(cfg)
    state0 = lio.init(lcfg, origin)
    store0 = kf.init(cfg.keyframes.capacity, cfg.keyframes.points_per_kf)
    # frame 0: no update, just gate the first keyframe at the origin
    scan0 = pcl.PointCloud(scans.xyz[0], scans.mask[0])
    store0, added0 = kf.maybe_add(
        store0, scan0, origin, jnp.float32(0.0),
        dist_thresh=cfg.keyframes.dist_thresh, leaf=cfg.keyframes.leaf,
    )
    frame_dt = jnp.sum(dts[0])

    def body(carry, frame):
        state, store = carry
        scan_xyz, scan_mask, g, a, dt, stamp = frame
        scan = pcl.PointCloud(scan_xyz, scan_mask)
        pt_time = jnp.full((scan_xyz.shape[0],), frame_dt * 0.999)
        state, _ = lio.step(
            state, scan, pt_time, lio.ImuSample(gyro=g, acc=a, dt=dt), lcfg
        )
        store, added = kf.maybe_add(
            store, scan, state.pose(), stamp,
            dist_thresh=cfg.keyframes.dist_thresh, leaf=cfg.keyframes.leaf,
        )
        return (state, store), (state.pose(), added)

    T = scans.xyz.shape[0]
    stamps = jnp.arange(1, T, dtype=jnp.float32)
    (state, store), (poses, added) = jax.lax.scan(
        body, (state0, store0),
        (scans.xyz[1:], scans.mask[1:], gyro, acc, dts, stamps),
    )
    poses = Pose(
        jnp.concatenate([origin.R[None], poses.R]),
        jnp.concatenate([origin.t[None], poses.t]),
    )
    added = jnp.concatenate([added0[None], added])
    return poses, store, added


@partial(jax.jit, static_argnames=("cfg",))
def _frontend_fused(scans: pcl.PointCloud, cfg: SlamConfig, origin: Pose):
    """Scan-matching odometry + keyframe gating as ONE lax.scan."""
    ocfg = _odometry_config(cfg)
    state0 = odometry.init(ocfg, origin)
    store0 = kf.init(cfg.keyframes.capacity, cfg.keyframes.points_per_kf)

    def body(carry, frame):
        state, store = carry
        scan_xyz, scan_mask, stamp = frame
        scan = pcl.PointCloud(scan_xyz, scan_mask)
        state, _ = odometry.step(state, scan, ocfg)
        store, added = kf.maybe_add(
            store, scan, state.pose, stamp,
            dist_thresh=cfg.keyframes.dist_thresh, leaf=cfg.keyframes.leaf,
        )
        return (state, store), (state.pose, added)

    T = scans.xyz.shape[0]
    stamps = jnp.arange(T, dtype=jnp.float32)
    (state, store), (poses, added) = jax.lax.scan(
        body, (state0, store0), (scans.xyz, scans.mask, stamps)
    )
    return poses, store, added


def _odometry_config(cfg: SlamConfig) -> odometry.OdometryConfig:
    o = cfg.odometry
    return odometry.OdometryConfig(
        scan_leaf=o.scan_leaf, map_leaf=o.map_leaf, insert_leaf=o.insert_leaf,
        scan_capacity=o.scan_capacity, insert_capacity=o.insert_capacity,
        table_size=o.table_size, map_radius=o.map_radius, iters=o.iters,
        max_corr_dist=o.max_corr_dist,
    )


def run_frontend(
    scans: pcl.PointCloud,
    cfg: SlamConfig,
    origin: Pose | None = None,
    imu: tuple | None = None,
) -> RobotResult:
    """Odometry + keyframe extraction for one robot's scan sequence
    (scans: stacked (T, P, 3)/(T, P) pytree, body frame).

    `imu`: optional (gyro (T-1, S, 3), acc (T-1, S, 3), dt (T-1, S))
    packets; with `cfg.odometry.frontend == 'lio'` the FAST-LIO-style
    inertial front-end runs instead of pure scan matching (the
    reference's pluggable-front-end switch).

    The whole front-end (odometry ticks + keyframe gating) is ONE
    compiled `lax.scan`; the only device->host transfer per sequence is
    the (T,) keyframe mask (SURVEY §7.4 streaming/asynchrony)."""
    if origin is None:
        origin = se3.identity()
    if cfg.odometry.frontend == "lio" and imu is not None:
        poses, store, added = _frontend_fused_lio(scans, imu, cfg, origin)
    else:
        poses, store, added = _frontend_fused(scans, cfg, origin)
    kf_frames = np.flatnonzero(np.asarray(added))
    return RobotResult(
        odom_poses=poses, store=store,
        kf_frame_idx=np.asarray(kf_frames, np.int64),
    )


# --------------------------------------------------------------------------
# descriptors
# --------------------------------------------------------------------------


def describe_one(cloud: pcl.PointCloud, cfg: SlamConfig) -> dict:
    """Describe ONE keyframe cloud. Returns the unbatched dict for
    cfg.loops.method (same keys as `compute_descriptors`)."""
    method = cfg.loops.method
    if method == "scancontext":
        d = scancontext.describe(cloud)
        return {"sc": d, "key": scancontext.ring_key(d)}
    if method == "ring":
        norm = bev.normalize_cloud(cloud, z_min=cfg.loops.bev_z_min)
        occ = bev.cartesian_occupancy(norm)[0]
        d = ring.describe(occ)
        return {"sino": d.sinogram, "tiring": d.tiring}
    if method == "disco":
        g = bev.polar_occupancy(cloud, 40, 120, z_bins=20,
                                z_min=cfg.loops.bev_z_min)
        d = disco.describe(g)
        return {"sig": d.signature, "spec": d.spectrum}
    if method == "ringpp":
        fb = bev.eigen_feature_bev(cloud, 120, 120, k=8)
        d = ring.describe_ringpp(fb)
        return {"sino_pp": d.sinograms, "tiring_pp": d.tirings}
    if method == "m2dp":
        from ..loop import m2dp

        return {"m2dp": m2dp.describe(cloud)}
    if method == "fasthist":
        from ..loop import fast_histogram

        return {"hist": fast_histogram.describe(cloud)}
    raise ValueError(f"unknown loop method {method}")


def compute_descriptors(store: kf.KeyframeStore, cfg: SlamConfig):
    """Batch-describe every keyframe. Returns a dict of stacked arrays
    (contents depend on cfg.loops.method)."""
    clouds = pcl.PointCloud(store.xyz, store.mask)  # (K, P, ...)
    return jax.vmap(lambda c: describe_one(c, cfg))(clouds)


def _descriptor_distances(desc_q: dict, qi: int, desc_db: dict, cfg: SlamConfig):
    """(D,) distances of query keyframe qi against a database, plus an
    initial yaw guess per database entry (None when unavailable)."""
    m = cfg.loops.method
    if m == "scancontext":
        d, shift = scancontext.distance(
            jax.tree.map(lambda a: a[qi], desc_q["sc"]), desc_db["sc"]
        )
        n_sectors = desc_db["sc"].shape[-1]
        yaw = shift.astype(jnp.float32) * (2 * jnp.pi / n_sectors)
        return d, yaw
    if m == "ring":
        d, shift = ring.correlate(desc_q["tiring"][qi], desc_db["tiring"])
        n_angles = desc_db["tiring"].shape[-2]
        yaw = ring.shift_to_yaw(shift, n_angles)
        return d, yaw
    if m == "disco":
        d = disco.distance(
            desc_q["sig"][qi], desc_db["sig"],
            jnp.ones(desc_db["sig"].shape[0], bool),
        )
        yaws = jax.vmap(
            lambda spec: disco.relative_yaw(desc_q["spec"][qi], spec)[0]
        )(desc_db["spec"])
        return d, yaws
    if m == "ringpp":
        d, shift = ring.correlate_multichannel(
            desc_q["tiring_pp"][qi], desc_db["tiring_pp"]
        )
        n_angles = desc_db["tiring_pp"].shape[-2]
        return d, ring.shift_to_yaw(shift, n_angles)
    if m == "m2dp":
        d = jnp.linalg.norm(desc_db["m2dp"] - desc_q["m2dp"][qi][None], axis=-1)
        return d, jnp.zeros_like(d)
    if m == "fasthist":
        from ..loop import fast_histogram

        d = fast_histogram.distance(desc_q["hist"][qi], desc_db["hist"])
        return d, jnp.zeros_like(d)
    raise ValueError(m)


# --------------------------------------------------------------------------
# loop verification
# --------------------------------------------------------------------------


def _loop_seeds(
    descs_a: dict | None,
    ia: int,
    descs_b: dict | None,
    ib: int,
    yaw_guess: float,
    cfg: SlamConfig,
) -> list[Pose]:
    """Initial-guess pose seeds (b-frame <- a-frame points) for loop
    verification. RING-family methods seed the FULL SE(2): both yaw
    hypotheses (theta, theta - pi) with their row-shift translation
    solves, best-residual first (`main_RING.py:146-205`); other methods
    seed yaw-only at zero translation."""
    m = cfg.loops.method
    sino_a = sino_b = None
    if descs_a is not None and descs_b is not None:
        if m == "ring":
            sino_a = descs_a["sino"][ia]
            sino_b = descs_b["sino"][ib]
        elif m == "ringpp":
            # channel-mean sinogram carries the occupancy structure
            sino_a = jnp.mean(descs_a["sino_pp"][ia], axis=0)
            sino_b = jnp.mean(descs_b["sino_pp"][ib], axis=0)
    if sino_a is None:
        # yaw maps a-frame points to b-frame; init must map b -> a
        fwd = Pose(so3.yaw_rot(jnp.float32(yaw_guess)), jnp.zeros(3))
        return [se3.inverse(fwd)]
    A = sino_a.shape[-2]
    shift = jnp.int32(jnp.round(yaw_guess * A / jnp.pi))
    yaws, xys, res = ring.se2_hypotheses(sino_a, sino_b, shift)
    order = np.argsort(np.asarray(res))
    seeds = []
    for k in order:
        fwd = Pose(
            so3.yaw_rot(yaws[k]),
            jnp.concatenate([xys[k], jnp.zeros(1)]),
        )
        seeds.append(se3.inverse(fwd))
    return seeds


def _verify_loop(
    store_a: kf.KeyframeStore,
    ia: int,
    store_b: kf.KeyframeStore,
    ib: int,
    yaw_guess: float,
    cfg: SlamConfig,
    same_robot: bool = False,
    descs_a: dict | None = None,
    descs_b: dict | None = None,
):
    """Geometry check (`ICPCheck`, `global_manager.cpp:1945-2084`):
    merge +-window keyframes around each side (cropped +-crop_xy in x/y,
    `global_manager.cpp:1916-1926`), register a->b, gate on fitness.
    Same-robot candidates are seeded with the odometry relative pose
    (the reference's odometry-space loop path does the same); cross
    robot ones with the descriptor SE(2) seeds (dual yaw + translation
    for RING-family). Returns (accept, rel_pose (b_kf_frame <-
    a_kf_frame), fitness)."""
    L = cfg.loops
    merged_a = kf.merged_neighborhood(store_a, jnp.int32(ia), L.verify_window)
    merged_b = kf.merged_neighborhood(store_b, jnp.int32(ib), L.verify_window)
    pose_a = se3.index(store_a.poses, ia)
    pose_b = se3.index(store_b.poses, ib)
    # bring both into their center-keyframe body frames
    a_local = pcl.transform(merged_a, se3.inverse(pose_a))
    b_local = pcl.transform(merged_b, se3.inverse(pose_b))
    c = L.crop_xy
    a_local = pcl.crop_box(a_local, (-c, -c, -jnp.inf), (c, c, jnp.inf))
    b_local = pcl.crop_box(b_local, (-c, -c, -jnp.inf), (c, c, jnp.inf))
    a_ds = pcl.voxel_downsample(a_local, L.verify_leaf, L.verify_capacity)
    b_ds = pcl.voxel_downsample(b_local, L.verify_leaf, L.verify_capacity)
    if same_robot:
        # T_ab init from (drifted) odometry: T_a^-1 T_b
        seeds = [se3.between(pose_a, pose_b)]
    else:
        seeds = _loop_seeds(descs_a, ia, descs_b, ib, yaw_guess, cfg)
    best = None
    # grid leaf tracks the downsample leaf; table sized ~4x the point
    # capacity so wide (+-crop_xy) merged submaps don't saturate the hash
    grid_leaf = max(0.5, L.verify_leaf)
    table = max(1 << 15, 4 * L.verify_capacity)
    for init in seeds:
        # coarse-to-fine: a 2 m grid with a 4 m correspondence radius
        # pulls metre-scale seed errors into the fine basin (the
        # point-to-plane metric is nearly flat in-plane on open ground,
        # so single-scale VGICP stalls at the seed)
        coarse = registration.register_pair(
            b_ds, a_ds, init, leaf=2.0, table_size=1 << 15,
            method="vgicp", iters=15, max_corr_dist=4.0,
        )
        res = registration.register_pair(
            b_ds, a_ds, coarse.pose, leaf=grid_leaf, table_size=table,
            method="vgicp", iters=15,
        )
        if best is None or float(res.fitness) < float(best.fitness):
            best = res
        if float(best.fitness) < L.fitness_thresh:
            break  # first seed that verifies wins (reference behavior)
    # best.pose maps b-frame points into a-frame: T_ab. Loop measurement
    # wants b <- a: invert.
    accept = float(best.fitness) < L.fitness_thresh
    return accept, se3.inverse(best.pose), float(best.fitness)


def odom_space_candidates(
    store: kf.KeyframeStore, qi: int, cfg: SlamConfig
) -> list[int]:
    """Same-robot loop candidates by RADIUS SEARCH over the key-pose
    cloud — the reference's odometry-space loop path
    (`detectLoopClosure`'s 6-D radius search,
    `global_manager.cpp:1029-1094`). Returns past keyframe indices within
    `cfg.loops.odom_radius` metres of keyframe `qi`, excluding the
    temporal window; nearest first, capped at cfg.loops.candidates."""
    L = cfg.loops
    if L.odom_radius <= 0.0:
        return []
    K = int(store.count)
    if K == 0:
        return []
    t = np.asarray(store.poses.t[:K])
    d = np.linalg.norm(t - t[qi], axis=-1)
    ok = (d < L.odom_radius) & (np.abs(np.arange(K) - qi) > L.min_separation)
    idx = np.flatnonzero(ok)
    return [int(i) for i in idx[np.argsort(d[idx])][: L.candidates]]


# --------------------------------------------------------------------------
# PCM gating
# --------------------------------------------------------------------------


def pcm_gate_inter_loops(inter: list[dict], pose_of, cfg: SlamConfig) -> list[dict]:
    """Gate inter-robot loops with PCM **independently per robot pair**,
    as the reference does (`distributed_pcm.cpp:53-58`). Mixing pairs in
    one consistency matrix composes odometry poses expressed in different
    robots' frames — meaningless cycles that sever cross-pair adjacency
    and silently drop valid loops for R>=3.

    `pose_of(robot, kf)` returns that keyframe's odometry pose."""
    if not cfg.loops.use_pcm or len(inter) <= 1:
        return list(inter)
    groups: dict[tuple[int, int], list[dict]] = {}
    for l in inter:
        key = (min(l["robot_a"], l["robot_b"]), max(l["robot_a"], l["robot_b"]))
        groups.setdefault(key, []).append(l)
    kept: list[dict] = []
    for key, ls in groups.items():
        if len(ls) == 1:
            kept.extend(ls)  # singleton: no pair support, keep (reference)
            continue
        # canonical orientation within the pair: robot_a == key[0]
        # (a loop (ra,ia,rb,ib,rel) == (rb,ib,ra,ia,rel^-1))
        def ends(l):
            if l["robot_a"] == key[0]:
                return (l["robot_a"], l["kf_a"]), (l["robot_b"], l["kf_b"]), l["rel"]
            return (l["robot_b"], l["kf_b"]), (l["robot_a"], l["kf_a"]), se3.inverse(l["rel"])

        oriented = [ends(l) for l in ls]
        pa = se3.stack([pose_of(*ea) for ea, _, _ in oriented])
        pb = se3.stack([pose_of(*eb) for _, eb, _ in oriented])
        meas = se3.stack([rel for _, _, rel in oriented])
        keep = pcm.filter_loops(
            pa, pb, meas, np.ones(len(ls), bool),
            threshold=cfg.loops.pcm_threshold,
        )
        kept.extend(l for l, k in zip(ls, keep) if k)
    return kept


# --------------------------------------------------------------------------
# full pipeline
# --------------------------------------------------------------------------


def run(
    scans_per_robot: list[pcl.PointCloud],
    cfg: SlamConfig,
    origins: list[Pose] | None = None,
    imus: list[tuple] | None = None,
) -> SlamResult:
    """Full multi-robot SLAM: per-robot front-ends, cross/self loop
    search, verification, PCM, chordal PGO.

    Per-robot `cfg.overlays` apply to each robot's front-end; when
    `origins` is None, overlay `init_pose`s are used (the reference's
    `manual_config_dir` initial-pose path)."""
    R = len(scans_per_robot)
    robots = []
    for r in range(R):
        origin = origins[r] if origins else cfg.init_pose(r)
        imu = imus[r] if imus else None
        robots.append(run_frontend(scans_per_robot[r], cfg.for_robot(r), origin, imu))
    return run_backend(robots, cfg)


def run_backend(
    robots: list[RobotResult],
    cfg: SlamConfig,
    pgo_mesh=None,
) -> SlamResult:
    """Back-end stages on finished front-end products: graph build, loop
    retrieval + verification, per-pair PCM, chordal PGO. Deterministic
    given identical inputs, so multi-host runs execute it redundantly on
    every process (replicated control; see `parallel/multihost.py`).
    `pgo_mesh`: optional device mesh — the optimizer runs edge-sharded
    over it (`backend/distributed.py`) instead of single-device."""
    R = len(robots)
    descs = [compute_descriptors(rr.store, cfg) for rr in robots]

    # ---- build graph: odometry chains ------------------------------------
    graph = fg.init(cfg.pgo.node_capacity, cfg.pgo.edge_capacity)
    node_of = -np.ones((R, max(int(rr.store.count) for rr in robots)), np.int64)
    for r, rr in enumerate(robots):
        K = int(rr.store.count)
        prev = None
        for k in range(K):
            graph, idx = fg.add_node(
                graph, se3.index(rr.store.poses, k), jnp.int32(r)
            )
            node_of[r, k] = int(idx)
            if prev is not None:
                meas = se3.between(
                    se3.index(rr.store.poses, k - 1), se3.index(rr.store.poses, k)
                )
                graph, _ = fg.add_edge(
                    graph, jnp.int32(prev), jnp.int32(int(idx)), meas,
                    jnp.int32(fg.ODOM), jnp.float32(1.0), jnp.float32(1.0),
                )
            prev = int(idx)

    # ---- loop retrieval + verification -----------------------------------
    loops: list[dict] = []
    for ra in range(R):
        Ka = int(robots[ra].store.count)
        for rb in range(R):
            if rb > ra:
                continue  # each unordered pair once; allow ra==rb (self loops)
            Kb = int(robots[rb].store.count)
            if Ka == 0 or Kb == 0:
                continue
            for ia in range(Ka):
                d, yaw = _descriptor_distances(descs[ra], ia, descs[rb], cfg)
                d = np.array(d[:Kb])  # writable copy
                yaw_np = np.asarray(yaw[:Kb]) if yaw is not None else np.zeros(Kb)
                if ra == rb:
                    lo = max(0, ia - cfg.loops.min_separation)
                    hi = min(Kb, ia + cfg.loops.min_separation + 1)
                    d[lo:hi] = np.inf
                order = list(np.argsort(d)[: cfg.loops.candidates])
                if ra == rb:
                    # odometry-space radius path joins the candidate set
                    for j in odom_space_candidates(robots[ra].store, ia, cfg):
                        if j not in order:
                            order.append(j)
                for ib in order:
                    desc_ok = np.isfinite(d[ib]) and d[ib] <= cfg.loops.dist_thresh
                    odom_ok = (
                        ra == rb and cfg.loops.odom_radius > 0.0
                        and abs(ia - int(ib)) > cfg.loops.min_separation
                        and float(
                            jnp.linalg.norm(
                                robots[ra].store.poses.t[ia]
                                - robots[rb].store.poses.t[int(ib)]
                            )
                        ) < cfg.loops.odom_radius
                    )
                    if not (desc_ok or odom_ok):
                        continue
                    accept, rel, fit = _verify_loop(
                        robots[ra].store, ia, robots[rb].store, int(ib),
                        float(yaw_np[ib]), cfg, same_robot=(ra == rb),
                        descs_a=descs[ra], descs_b=descs[rb],
                    )
                    if accept:
                        loops.append(
                            dict(
                                robot_a=ra, kf_a=ia, robot_b=rb, kf_b=int(ib),
                                rel=rel, fitness=fit, desc_dist=float(d[ib]),
                            )
                        )
                if len(loops) >= cfg.loops.max_loops:
                    break

    # ---- PCM gating on inter-robot loops (per robot pair) ----------------
    inter = [l for l in loops if l["robot_a"] != l["robot_b"]]
    intra = [l for l in loops if l["robot_a"] == l["robot_b"]]
    kept_inter = pcm_gate_inter_loops(
        inter, lambda r, k: se3.index(robots[r].store.poses, k), cfg
    )

    accepted = intra + kept_inter
    for l in accepted:
        i = int(node_of[l["robot_a"], l["kf_a"]])
        j = int(node_of[l["robot_b"], l["kf_b"]])
        kind = fg.INTRA_LOOP if l["robot_a"] == l["robot_b"] else fg.INTER_LOOP
        # rel maps a->b frames: measurement for edge (i=a, j=b) is pose
        # of b expressed in a = inverse(rel)? Convention: edge meas =
        # between(pose_i, pose_j) = T_i^-1 T_j. rel = b_frame <- a_frame
        # transform of POINTS, i.e. T_b^-1 T_a; so meas = rel^-1.
        meas = se3.inverse(l["rel"])
        graph, _ = fg.add_edge(
            graph, jnp.int32(i), jnp.int32(j), meas, jnp.int32(kind),
            jnp.float32(cfg.loops.w_rot), jnp.float32(cfg.loops.w_trans),
        )

    # ---- optimize --------------------------------------------------------
    anchors = np.zeros(graph.node_capacity, bool)
    for r in range(R):
        if node_of[r, 0] >= 0:
            anchors[int(node_of[r, 0])] = True
    pgo_cfg = chordal.PGOConfig(
        rot_cg_iters=cfg.pgo.rot_cg_iters, gn_iters=cfg.pgo.gn_iters,
        pose_cg_iters=cfg.pgo.pose_cg_iters, robust_delta=cfg.pgo.robust_delta,
    )
    if pgo_mesh is not None:
        from ..backend import distributed

        opt = distributed.optimize(graph, jnp.asarray(anchors), pgo_mesh, pgo_cfg)
    else:
        opt = chordal.optimize(graph, jnp.asarray(anchors), pgo_cfg)
    return SlamResult(
        robots=robots, graph=graph, opt_poses=opt, node_of=node_of,
        loops=accepted,
    )


def build_elevation(
    result: SlamResult,
    cfg: SlamConfig,
    center=(0.0, 0.0),
    size: int = 600,
):
    """Fuse every optimized keyframe cloud into one global 2.5D
    elevation map + terrain features + costmap — the reference's
    "merged elevation map -> costmap" product (`composeGlobalMap` +
    `pointMap_layer`). `size` cells at cfg.elevation.resolution."""
    from ..mapping import costmap as costmap_mod
    from ..mapping import elevation

    emap = elevation.init(
        size=size, resolution=cfg.elevation.resolution, center=center
    )
    for r, rr in enumerate(result.robots):
        K = int(rr.store.count)
        if K == 0:
            continue
        ids = result.node_of[r, :K]
        poses = Pose(result.opt_poses.R[ids], result.opt_poses.t[ids])
        pts = (
            jnp.einsum("kab,kpb->kpa", poses.R, rr.store.xyz[:K])
            + poses.t[:, None, :]
        )
        cloud = pcl.park(
            pcl.PointCloud(pts.reshape(-1, 3), rr.store.mask[:K].reshape(-1))
        )
        var = elevation.sensor_variance(cloud.xyz)
        emap = elevation.fuse(emap, cloud, var)
    feats = elevation.features(emap)
    cm = costmap_mod.from_elevation(
        emap, feats, travers_thresh=cfg.elevation.travers_thresh
    )
    return emap, feats, cm


def compose_map(
    result: SlamResult, leaf: float = 0.5, capacity: int = 1 << 17
) -> pcl.PointCloud:
    """Merged global cloud: every keyframe re-transformed by its
    optimized pose, voxel-merged (`composeGlobalMap`,
    `global_manager.cpp:2090-2236`)."""
    parts_xyz = []
    parts_mask = []
    for r, rr in enumerate(result.robots):
        K = int(rr.store.count)
        if K == 0:
            continue
        ids = result.node_of[r, :K]
        poses = Pose(result.opt_poses.R[ids], result.opt_poses.t[ids])
        pts = (
            jnp.einsum("kab,kpb->kpa", poses.R, rr.store.xyz[:K])
            + poses.t[:, None, :]
        )
        parts_xyz.append(pts.reshape(-1, 3))
        parts_mask.append(rr.store.mask[:K].reshape(-1))
    merged = pcl.park(
        pcl.PointCloud(jnp.concatenate(parts_xyz), jnp.concatenate(parts_mask))
    )
    return pcl.voxel_downsample(merged, leaf, capacity)
