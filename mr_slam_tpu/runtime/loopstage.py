"""Batched loop retrieval + geometric verification — the array-native
loop stage shared by the batch pipeline and the online scheduler.

The reference drives loop search one keyframe at a time: a Python loop
over queries, each issuing a brute-force correlation over all
candidates (`main_RING.py:133-140`) and then one GICP per survivor
(`ICPCheck`, `global_manager.cpp:1945-2084`). Round-2 of this repo kept
that host loop (one device dispatch per (robot-pair, keyframe) plus one
per candidate). Here the whole stage is O(R^2) dispatches:

  retrieval    ONE jitted call per robot pair: every query's descriptor
               distance against the whole database (the inner metric is
               an einsum/FFT batch on the MXU), candidate top-k and the
               odometry-radius candidate top-k selected ON DEVICE; a
               single (Q, C) host transfer carries the survivors.
  verification ONE jitted call per CHUNK of candidates: merged-submap
               extraction, crop, downsample, voxel-grid builds and the
               coarse-to-fine VGICP all vmapped over the candidate
               batch (and over the RING dual-yaw seed axis), best seed
               selected on device by fitness.

Host Python only gates tiny (Q, C) arrays and assembles the accepted
list. SURVEY §5.7 (keyframe scaling axis); the O(K·R²) dispatch pattern
this replaces is documented in VERDICT round 2, Missing #2.

Design note — brute force IS the TPU-native index: the reference gates
DiSCO candidates through an incremental CPU kd-tree
(`global_manager.cpp:1867-1888`); our `native.DescriptorKNN` provides
the same host-side index, but at K <= a few thousand keyframes one
(Q, D)x(K, D) einsum on the MXU beats tree traversal by orders of
magnitude and has no host round-trip, so the batched matmul is the
production retrieval path and the native index remains the host-side
fallback for CPU-only deployments.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend import keyframes as kf
from ..geometry import se3, so3
from ..geometry.se3 import Pose
from ..loop import ring
from ..ops import pointcloud as pcl
from ..ops import registration, voxel_grid
from ..precision import fast
from . import observability as obs
from .config import SlamConfig

# verification candidates are padded to a multiple of CHUNK so every
# verify dispatch reuses one compiled program
CHUNK = 8


# --------------------------------------------------------------------------
# retrieval: one dispatch per robot pair
# --------------------------------------------------------------------------


@fast
@partial(jax.jit, static_argnames=("cfg", "same_robot"))
def retrieve(
    descs_q: dict,
    qi: jax.Array,            # (Q,) query keyframe indices into store a
    q_pose_t: jax.Array,      # (Ka_cap, 3) query-store keyframe positions
    descs_db: dict,
    db_pose_t: jax.Array,     # (Kb_cap, 3) database keyframe positions
    db_count: jax.Array,      # () valid database size
    cfg: SlamConfig,
    same_robot: bool,
):
    """Batched candidate retrieval for Q queries against one database.

    Returns (d_top (Q, C), i_top (Q, C), yaw_top (Q, C),
    od_top (Q, C), oi_top (Q, C), oyaw_top (Q, C)) — descriptor top-k
    and (same-robot only; +inf otherwise) odometry-radius top-k, with
    masked-out entries +inf. All selection happens on device; the
    caller transfers these six small arrays once.
    """
    from . import pipeline as pl

    L = cfg.loops
    C = L.candidates

    d, yaw = jax.vmap(
        lambda q: pl._descriptor_distances(descs_q, q, descs_db, cfg)
    )(qi)                                             # (Q, Kb_cap)
    Kb = d.shape[1]
    col = jnp.arange(Kb)
    invalid = col[None, :] >= db_count                # capacity padding
    if same_robot:
        # temporal separation band + strict lower triangle: each
        # unordered same-robot pair is considered exactly once, when its
        # LATER keyframe queries (the earlier one is already in the db)
        sep = jnp.abs(col[None, :] - qi[:, None]) <= L.min_separation
        invalid = invalid | sep | (col[None, :] >= qi[:, None])
    d = jnp.where(invalid, jnp.inf, d)
    neg_top, i_top = jax.lax.top_k(-d, C)
    d_top = -neg_top
    yaw_top = jnp.take_along_axis(yaw, i_top, axis=1)

    if same_robot and L.odom_radius > 0.0:
        # odometry-space radius search over key poses — the reference's
        # 6-D kd radius path (`global_manager.cpp:1029-1094`), here a
        # masked pairwise-distance matrix + top-k
        pd = jnp.linalg.norm(
            q_pose_t[qi][:, None, :] - db_pose_t[None, :, :], axis=-1
        )
        pd = jnp.where(invalid | (pd >= L.odom_radius), jnp.inf, pd)
        neg_od, oi_top = jax.lax.top_k(-pd, C)
        od_top = -neg_od
        oyaw_top = jnp.take_along_axis(yaw, oi_top, axis=1)
    else:
        od_top = jnp.full((qi.shape[0], C), jnp.inf)
        oi_top = jnp.zeros((qi.shape[0], C), jnp.int32)
        oyaw_top = jnp.zeros((qi.shape[0], C), jnp.float32)
    return d_top, i_top, yaw_top, od_top, oi_top, oyaw_top


# --------------------------------------------------------------------------
# verification: one dispatch per CHUNK of candidates
# --------------------------------------------------------------------------


def _prep_side(store: kf.KeyframeStore, idx: jax.Array, cfg: SlamConfig):
    """Merged ±window neighborhood around keyframe `idx`, in that
    keyframe's body frame, ±crop_xy-cropped and voxelized — `ICPCheck`'s
    submap prep (`global_manager.cpp:1916-1926`), vmapped by callers."""
    L = cfg.loops
    merged = kf.merged_neighborhood(store, idx, L.verify_window)
    pose = se3.index(store.poses, idx)
    local = pcl.transform(merged, se3.inverse(pose))
    c = L.crop_xy
    local = pcl.crop_box(local, (-c, -c, -jnp.inf), (c, c, jnp.inf))
    return pcl.voxel_downsample(local, L.verify_leaf, L.verify_capacity), pose


@partial(jax.jit, static_argnames=("cfg", "same_robot"))
def verify_chunk(
    store_a: kf.KeyframeStore,
    store_b: kf.KeyframeStore,
    ia: jax.Array,            # (B,)
    ib: jax.Array,            # (B,)
    yaw: jax.Array,           # (B,) descriptor yaw guess (a -> b points)
    cfg: SlamConfig,
    same_robot: bool,
    descs_a: dict | None = None,
    descs_b: dict | None = None,
):
    """Geometry-check a batch of candidate loops in one dispatch.

    Per candidate: prep both merged submaps, build the coarse / fine /
    permissive-fitness voxel grids of side a ONCE, then register side b
    into them from S seeds (RING-family cross-robot: both SE(2)
    hypotheses; same-robot: the odometry relative pose; otherwise the
    yaw guess) — coarse (2 m grid, 4 m corr radius) then fine VGICP,
    PCL-style fitness against the permissive grid. The best seed per
    candidate is selected on device.

    Returns (rel Pose (B,) mapping b_kf_frame <- a_kf_frame points,
    fitness (B,)).
    """
    L = cfg.loops
    a_ds, pose_a = jax.vmap(lambda i: _prep_side(store_a, i, cfg))(ia)
    b_ds, pose_b = jax.vmap(lambda i: _prep_side(store_b, i, cfg))(ib)

    grid_leaf = max(0.5, L.verify_leaf)
    # right-sized tables: build cost is full-table passes (the measured
    # bulk of the verify chunk), so load factor ~0.5 instead of 0.25;
    # collisions only thin the map like a voxel filter. The 2 m coarse
    # grid spans +-crop_xy with ~4k cells — an 8k table is generous.
    table = max(1 << 14, 2 * L.verify_capacity)
    coarse_g = jax.vmap(
        lambda c: voxel_grid.build(c, 2.0, 1 << 13, min_points=3,
                                   regularize="plane")
    )(a_ds)
    fine_g = jax.vmap(
        lambda c: voxel_grid.build(c, grid_leaf, table, min_points=3,
                                   regularize="plane")
    )(a_ds)
    fit_g = jax.vmap(
        lambda c: voxel_grid.build(c, grid_leaf, table, min_points=1)
    )(a_ds)

    # ---- seeds (B, S): init poses mapping b-frame points -> a-frame
    m = L.method
    if same_robot:
        seeds = jax.vmap(lambda pa, pb: se3.between(pa, pb))(pose_a, pose_b)
        seeds = jax.tree.map(lambda x: x[:, None], seeds)            # S=1
    elif m in ("ring", "ringpp") and descs_a is not None:
        if m == "ring":
            sino_a = descs_a["sino"][ia]
            sino_b = descs_b["sino"][ib]
        else:
            sino_a = jnp.mean(descs_a["sino_pp"][ia], axis=1)
            sino_b = jnp.mean(descs_b["sino_pp"][ib], axis=1)
        A = sino_a.shape[-2]
        shift = jnp.round(yaw * A / jnp.pi).astype(jnp.int32)
        yaws, xys, _res = jax.vmap(ring.se2_hypotheses)(sino_a, sino_b, shift)
        fwd = Pose(
            so3.yaw_rot(yaws),                                       # (B, 2, 3, 3)
            jnp.concatenate([xys, jnp.zeros(xys.shape[:-1] + (1,))], -1),
        )
        seeds = se3.inverse(fwd)                                     # S=2
    else:
        fwd = Pose(so3.yaw_rot(yaw), jnp.zeros((yaw.shape[0], 3)))
        seeds = jax.tree.map(lambda x: x[:, None], se3.inverse(fwd))  # S=1

    def reg_one(cloud_b, cg, fgr, ftg, seed):
        coarse = registration.vgicp(
            cloud_b, cg, seed, iters=15, max_corr_dist=4.0
        )
        fine = registration.vgicp(
            cloud_b, fgr, coarse.pose, iters=15, max_corr_dist=1.0
        )
        # fitness is a MEAN — a 4x subsample scores it to the same
        # statistics at a quarter of the direct27 gather cost (the
        # single most expensive op of the verify chunk). Scored on
        # STRUCTURE points only (z above fitness_z_min in the keyframe
        # body frame): ground matches ground under any in-plane
        # transform, so a ground-dominated mean scores false loops
        # ~0.02 in symmetric worlds (see LoopCfg.fitness_z_min).
        sub = jax.tree.map(lambda a: a[::4], cloud_b)
        sub = sub._replace(
            mask=sub.mask & (sub.xyz[:, 2] > L.fitness_z_min)
        )
        fit = registration.fitness(sub, ftg, fine.pose)
        return fine.pose, fit

    def per_candidate(cloud_b, cg, fgr, ftg, seed_row):
        poses, fits = jax.vmap(
            lambda s: reg_one(cloud_b, cg, fgr, ftg, s)
        )(seed_row)
        best = jnp.argmin(fits)
        return se3.index(poses, best), fits[best]

    pose_ab, fit = jax.vmap(per_candidate)(b_ds, coarse_g, fine_g, fit_g, seeds)
    # pose_ab maps b-frame points into a-frame; the loop record wants
    # b <- a (matching `pipeline._verify_loop`'s return convention)
    return se3.inverse(pose_ab), fit


# --------------------------------------------------------------------------
# host orchestration: gate + chunked verify
# --------------------------------------------------------------------------


def search_pair_loops(
    store_a: kf.KeyframeStore,
    descs_a: dict,
    store_b: kf.KeyframeStore,
    descs_b: dict,
    cfg: SlamConfig,
    same_robot: bool,
    query_idx: np.ndarray | None = None,
    exclude: set | None = None,
    counters=None,
) -> list[dict]:
    """All accepted loops between store a's queries and store b.

    query_idx: which keyframes of a to query (default: all valid;
    entries < 0 or >= count are padding and skipped). `exclude`:
    (kf_a, kf_b) pairs already verified elsewhere — skipped BEFORE
    verification. The function issues ONE retrieval dispatch,
    ceil(B / CHUNK) verify dispatches, and returns loop dicts
    {kf_a, kf_b, rel, fitness, desc_dist}. `counters`: optional
    observability CounterRegistry.
    """
    L = cfg.loops
    Ka = int(store_a.count)
    Kb = int(store_b.count)
    if Ka == 0 or Kb == 0:
        return []
    if query_idx is None:
        # capacity-shaped query batch -> one compiled program regardless
        # of fill level; invalid rows are discarded on host below
        query_idx = np.arange(store_a.capacity)
    qi = jnp.asarray(query_idx, jnp.int32)

    with obs.tracer.span("loop.retrieve"):
        d_top, i_top, yaw_top, od_top, oi_top, oyaw_top = retrieve(
            descs_a, qi, store_a.poses.t, descs_b, store_b.poses.t,
            store_b.count, cfg, same_robot,
        )
        d_top = np.asarray(d_top)
        i_top = np.asarray(i_top)
        yaw_top = np.asarray(yaw_top)
        od_top = np.asarray(od_top)
        oi_top = np.asarray(oi_top)
        oyaw_top = np.asarray(oyaw_top)

    # ---- host gating over the tiny (Q, C) survivor arrays ----------------
    cand: list[tuple[int, int, float, float]] = []  # (ia, ib, yaw, desc_d)
    seen: set[tuple[int, int]] = set(exclude) if exclude else set()
    for q in range(len(query_idx)):
        ia = int(query_idx[q])
        if ia < 0 or ia >= Ka:
            continue
        for c in range(d_top.shape[1]):
            dd = float(d_top[q, c])
            if np.isfinite(dd) and dd <= L.dist_thresh:
                key = (ia, int(i_top[q, c]))
                if key not in seen:
                    seen.add(key)
                    cand.append((ia, int(i_top[q, c]), float(yaw_top[q, c]), dd))
        for c in range(od_top.shape[1]):
            if np.isfinite(od_top[q, c]):  # already radius+band masked
                key = (ia, int(oi_top[q, c]))
                if key not in seen:
                    seen.add(key)
                    cand.append(
                        (ia, int(oi_top[q, c]), float(oyaw_top[q, c]), np.inf)
                    )
    metrics = counters if counters is not None else obs.metrics
    metrics.inc("loops.candidates", len(cand))
    if not cand:
        return []

    # ---- chunked batched verification -------------------------------------
    loops: list[dict] = []
    for s in range(0, len(cand), CHUNK):
        chunk = cand[s : s + CHUNK]
        B = len(chunk)
        pad = CHUNK - B
        ia_arr = jnp.asarray([c[0] for c in chunk] + [0] * pad, jnp.int32)
        ib_arr = jnp.asarray([c[1] for c in chunk] + [0] * pad, jnp.int32)
        yw_arr = jnp.asarray([c[2] for c in chunk] + [0.0] * pad, jnp.float32)
        with obs.tracer.span("loop.verify"):
            rel, fit = verify_chunk(
                store_a, store_b, ia_arr, ib_arr, yw_arr, cfg, same_robot,
                descs_a=descs_a, descs_b=descs_b,
            )
            fit = np.asarray(fit)
        for k in range(B):
            metrics.inc("loops.verified")
            metrics.observe("loops.fitness", float(fit[k]))
            if float(fit[k]) < L.fitness_thresh:
                loops.append(
                    dict(
                        kf_a=chunk[k][0], kf_b=chunk[k][1],
                        rel=se3.index(rel, k), fitness=float(fit[k]),
                        desc_dist=float(chunk[k][3]),
                    )
                )
            else:
                metrics.inc("loops.fitness_rejected")
    metrics.inc("loops.accepted", len(loops))
    return loops
