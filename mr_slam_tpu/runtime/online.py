"""Online (streaming) multi-robot SLAM session.

The reference's GlobalManager is callback-driven: six threads racing
over mutex-guarded state (discovery, loop closing @0.1 Hz, geometry
check busy-loop, composing @3 Hz, TF @10 Hz — `global_manager_node.cpp:
45-50`). The TPU runtime replaces that with ONE deterministic scheduler:
`add_frame` ticks odometry (jitted, fixed shapes) and gates keyframes;
every `loop_every` new keyframes the session runs the loop stage
(batched retrieval -> batched verification -> PCM -> incremental PGO).
No locks, no races — state transitions are explicit and replayable
(the §5.2 story: races disappear by construction).

Backing state is the batched `parallel.store.MultiRobotStore` — ONE
robot-major pytree holding every robot's keyframe clouds, poses and
structured descriptor database (the array-native `RobotHandle` vector,
`global_manager.h:108-137`). Keyframe appends and descriptor writes are
single-dispatch scatters (`gate_and_add`/`write_descriptor`, the
`mapUpdate`/`discoUpdate` pair); the whole session state is a pytree +
small manifest, which is what makes `runtime.checkpoint.save_session`
a plain array dump.

Robots register lazily (`register_robot`), mirroring topic discovery;
a robot can join mid-session.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..backend import chordal, factor_graph as fg
from ..frontend import odometry
from ..geometry import se3
from ..geometry.se3 import Pose
from ..ops import pointcloud as pcl
from ..parallel import store as mstore_lib
from . import pipeline as pl
from .config import SlamConfig


class OnlineSlam:
    def __init__(self, cfg: SlamConfig, enable_gem: bool = False):
        self.cfg = cfg
        self.odo_cfg = pl._odometry_config(cfg)
        self.robots: dict[int, dict] = {}    # per-robot odometry/GEM state
        self.rows: dict[int, int] = {}       # robot id -> mstore row
        self.mstore: Optional[mstore_lib.MultiRobotStore] = None
        self.graph = fg.init(cfg.pgo.node_capacity, cfg.pgo.edge_capacity)
        self.node_of: dict[tuple[int, int], int] = {}
        self.loops: list[dict] = []
        self._pending_kf: list[tuple[int, int]] = []  # (robot, kf index)
        self.opt_poses: Optional[Pose] = None
        self.loop_every = 3  # keyframes between loop-stage runs
        self.enable_gem = enable_gem  # per-robot rolling elevation maps

    # -- batched-store plumbing ----------------------------------------
    def _kf_capacity(self) -> int:
        """Uniform store capacity: the max resolved per-robot keyframe
        capacity (overlays may grow it — rows of smaller robots carry
        padding, the per-robot gate still uses their own threshold)."""
        caps = [self.cfg.keyframes.capacity] + [
            ov.keyframes.capacity
            for ov in self.cfg.overlays
            if ov.keyframes is not None
        ]
        return max(caps)

    def _points_per_kf(self) -> int:
        pts = [self.cfg.keyframes.points_per_kf] + [
            ov.keyframes.points_per_kf
            for ov in self.cfg.overlays
            if ov.keyframes is not None
        ]
        return max(pts)

    def _ensure_row(self, robot: int) -> int:
        """Allocate (or grow) the batched store row for `robot`."""
        if robot in self.rows:
            return self.rows[robot]
        if self.mstore is None:
            # descriptor layout comes from one template describe_one on
            # an empty cloud (shapes are data-independent)
            P = self._points_per_kf()
            dummy = pcl.park(
                pcl.PointCloud(jnp.zeros((P, 3)), jnp.zeros((P,), bool))
            )
            template = pl.describe_one(dummy, self.cfg)
            self.mstore = mstore_lib.init(
                1, self._kf_capacity(), P, desc_template=template
            )
            self.rows[robot] = 0
            return 0
        # grow by one row (host-side realloc; rare — robot discovery)
        self.mstore = jax.tree.map(
            lambda a: jnp.concatenate([a, jnp.zeros_like(a[:1])]), self.mstore
        )
        # fresh KeyframeStore rows need their sentinel/identity fields
        single = jax.tree.map(
            lambda a: a[0],
            mstore_lib.init(
                1, self._kf_capacity(), self._points_per_kf(), desc_dim=0
            ).stores,
        )
        row = self.mstore.desc_valid.shape[0] - 1
        self.mstore = self.mstore._replace(
            stores=jax.tree.map(
                lambda b, s: b.at[row].set(s), self.mstore.stores, single
            )
        )
        self.rows[robot] = row
        return row

    def store_view(self, robot: int):
        """This robot's (KeyframeStore, descriptor-tree) view."""
        return self.mstore.robot_view(self.rows[robot])

    # -- discovery ------------------------------------------------------
    def register_robot(self, robot: int, origin: Pose | None = None) -> None:
        if robot in self.robots:
            return
        if origin is None:
            origin = self.cfg.init_pose(robot)  # overlay T.initPose
        rcfg = self.cfg.for_robot(robot)
        if rcfg.odometry.frontend == "lio":
            # streaming lidar-inertial front-end (the reference's
            # FAST-LIO per-robot node); frames must carry IMU packets
            from ..frontend import lio

            rs = dict(
                frontend="lio",
                odo=lio.init(pl._lio_config(rcfg), origin),
                odo_cfg=pl._lio_config(rcfg),
                kf_cfg=rcfg.keyframes,
                frame=0,
            )
        else:
            rs = dict(
                frontend="scan2map",
                odo=odometry.init(pl._odometry_config(rcfg), origin),
                odo_cfg=pl._odometry_config(rcfg),
                kf_cfg=rcfg.keyframes,
                frame=0,
            )
        if self.enable_gem:
            from ..mapping import elevation

            e = rcfg.elevation
            center = (0.0, 0.0) if origin is None else (
                float(origin.t[0]), float(origin.t[1])
            )
            rs["gem_cfg"] = e
            rs["gem_local"] = elevation.init(
                size=e.size, resolution=e.resolution, center=center
            )
            # flushed grid submaps: (kf index, cloud in that keyframe's
            # body frame) — the SubMap{submap=grid, pose} publish at each
            # keyframe boundary (`ElevationMapping.cpp:653-760`)
            rs["gem_flushed"] = []
        self.robots[robot] = rs
        self._ensure_row(robot)

    # -- per-frame tick -------------------------------------------------
    def add_frame(
        self,
        robot: int,
        scan: pcl.PointCloud,
        stamp: float = 0.0,
        times=None,
        imu=None,
    ) -> Pose:
        """Odometry tick + keyframe gate. Returns the current odometry
        pose estimate for `robot`. `times`: optional (P,) per-point
        sweep-relative capture times — enables constant-velocity
        undistortion in the odometry step (IMU-interpolated in LIO).
        `imu`: (gyro (S, 3), acc (S, 3), dt (S)) packet covering the
        sweep — REQUIRED per frame when the robot runs the LIO
        front-end (`OdometryCfg.frontend == 'lio'`).

        Sync budget: ONE scalar device->host transfer per frame (the
        keyframe-gate bit, needed to schedule the host-side descriptor
        write and loop stage). At 10 Hz x R robots this is O(10R)
        scalar syncs/s — negligible against the per-frame compute; the
        offline path (`pipeline._frontend_fused`) folds even this into
        its lax.scan."""
        from . import observability as obs

        if robot not in self.robots:
            self.register_robot(robot)
        rs = self.robots[robot]
        row = self.rows[robot]
        with obs.tracer.span("online.frontend"):
            if rs["frontend"] == "lio":
                from ..frontend import lio

                if imu is None:
                    if rs["frame"] > 0:
                        raise ValueError(
                            f"robot {robot} runs the LIO front-end; "
                            "add_frame needs an imu=(gyro, acc, dt) "
                            "packet per frame"
                        )
                    # frame 0: no propagation — gate the origin keyframe
                    # (the batch path does the same, `_frontend_fused_lio`)
                else:
                    gyro, acc, dts = imu
                    frame_dt = jnp.sum(dts)
                    pt_time = (
                        jnp.asarray(times)
                        if times is not None
                        else jnp.full((scan.xyz.shape[0],), frame_dt * 0.999)
                    )
                    rs["odo"], _ = lio.step(
                        rs["odo"], scan, pt_time,
                        lio.ImuSample(gyro=gyro, acc=acc, dt=dts),
                        rs["odo_cfg"],
                    )
                pose = rs["odo"].pose()
            else:
                rs["odo"], _ = odometry.step(
                    rs["odo"], scan, rs["odo_cfg"], t_rel=times
                )
                pose = rs["odo"].pose
            self.mstore, added, k = mstore_lib.gate_and_add(
                self.mstore, jnp.int32(row), scan, pose, jnp.float32(stamp),
                dist_thresh=rs["kf_cfg"].dist_thresh, leaf=rs["kf_cfg"].leaf,
            )
            added = bool(added)
        rs["frame"] += 1
        if not added and int(self.mstore.stores.count[row]) >= self._kf_capacity():
            import warnings

            obs.metrics.inc("keyframes.capacity_saturated")
            if obs.metrics.counters["keyframes.capacity_saturated"] == 1:
                warnings.warn(
                    "keyframe store full; further keyframes are dropped — "
                    "raise KeyframeCfg.capacity"
                )
        if self.enable_gem:
            with obs.tracer.span("online.gem"):
                self._gem_tick(rs, scan, pose)
        if added:
            self._on_keyframe(robot, int(k))
        return pose

    # -- per-robot rolling GEM -------------------------------------------
    def _gem_tick(self, rs: dict, scan: pcl.PointCloud, pose: Pose) -> None:
        """Shift the rolling local grid to the robot and Kalman-fuse the
        frame — the per-frame half of `ElevationMapping::Callback`
        (`ElevationMapping.cpp:298` -> `G_Clear_map`/`G_fuse`)."""
        from ..mapping import elevation

        m = elevation.shift(rs["gem_local"], pose.t[:2])
        m = elevation.predict(m)
        # motion-induced variance (RobotMotionMapUpdater): odometry drift
        # proportional to motion since the last frame, split into a
        # vertical and a tilt (lever-arm) component
        last = rs.get("gem_last_pose")
        e = rs.get("gem_cfg", self.cfg.elevation)
        if last is not None and (e.drift_z > 0.0 or e.drift_tilt > 0.0):
            dt = float(jnp.linalg.norm(pose.t - last.t))
            drot = float(
                jnp.arccos(jnp.clip(
                    (jnp.trace(last.R.T @ pose.R) - 1.0) / 2.0, -1.0, 1.0
                ))
            )
            m = elevation.motion_update(
                m, pose.t[:2],
                sigma_z=e.drift_z * dt, sigma_tilt=e.drift_tilt * drot,
            )
        rs["gem_last_pose"] = pose
        world = pcl.transform(scan, pose)
        var = elevation.sensor_variance(scan.xyz)  # beam model, body frame
        rs["gem_local"] = elevation.fuse(m, world, var)

    def _gem_flush(self, rs: dict, k: int, pose: Pose) -> None:
        """Keyframe boundary: flush the local grid as a cloud anchored to
        keyframe k's BODY frame (`updateLocalMap`,
        `ElevationMapping.cpp:653-760` publishing SubMap{grid, pose}).
        Anchoring to the keyframe makes re-anchoring after optimization a
        pose substitution, which `global_elevation` applies lazily — the
        `updateGlobalMap`/`optKeyframeCallback` re-transform
        (`ElevationMapping.cpp:592-821`) without grid rewrites."""
        from ..mapping import elevation

        cloud = elevation.to_cloud(rs["gem_local"])       # world frame
        body = pcl.transform(cloud, se3.inverse(pose))
        rs["gem_flushed"].append((k, body))

    def global_elevation(self, size: int = 512, center=(0.0, 0.0)):
        """Compose the global 2.5D map from flushed grid submaps, each
        re-anchored to its keyframe's OPTIMIZED pose (`GetInitMap` +
        `composeGlobalMap`'s elevation product)."""
        from ..mapping import elevation

        e = self.cfg.elevation
        emap = elevation.init(size=size, resolution=e.resolution, center=center)
        for robot, rs in self.robots.items():
            store, _ = self.store_view(robot)
            for k, body in rs.get("gem_flushed", []):
                node = self.node_of.get((robot, k))
                if node is None:
                    continue
                if self.opt_poses is not None:
                    pose = se3.index(self.opt_poses, node)
                else:
                    pose = se3.index(store.poses, k)
                world = pcl.transform(body, pose)
                var = elevation.sensor_variance(body.xyz)
                emap = elevation.fuse(emap, world, var)
        return emap

    def _on_keyframe(self, robot: int, k: int) -> None:
        from . import observability as obs

        rs = self.robots[robot]
        row = self.rows[robot]
        pose = se3.index(
            jax.tree.map(lambda a: a[row], self.mstore.stores.poses), k
        )
        if self.enable_gem:
            self._gem_flush(rs, k, pose)
        self.graph, idx = fg.add_node(self.graph, pose, jnp.int32(robot))
        if int(self.graph.n_nodes) >= self.graph.node_capacity:
            import warnings

            obs.metrics.inc("graph.node_capacity_saturated")
            warnings.warn(
                "pose-graph node capacity reached; further keyframes "
                "cannot enter the graph — raise PGOCfg.node_capacity"
            )
        self.node_of[(robot, k)] = int(idx)
        if k > 0:
            prev = self.node_of[(robot, k - 1)]
            prev_pose = se3.index(
                jax.tree.map(lambda a: a[row], self.mstore.stores.poses), k - 1
            )
            meas = se3.between(prev_pose, pose)
            self.graph, _ = fg.add_edge(
                self.graph, jnp.int32(prev), jnp.int32(int(idx)), meas,
                jnp.int32(fg.ODOM), jnp.float32(1.0), jnp.float32(1.0),
            )
        # incremental descriptor append — O(1) new work per keyframe,
        # like `discoUpdate` (`global_manager.cpp:1867-1888`), straight
        # into the batched store
        store, _ = self.store_view(robot)
        one = pl.describe_one(store.cloud(k), self.cfg)
        self.mstore = mstore_lib.write_descriptor(
            self.mstore, jnp.int32(row), jnp.int32(k), one
        )
        self._pending_kf.append((robot, k))
        if len(self._pending_kf) >= self.loop_every:
            self.run_loop_stage()

    # -- loop stage -----------------------------------------------------
    def run_loop_stage(self) -> int:
        """Detect + verify loops for pending keyframes; optimize when
        any loop lands. Returns number of accepted loops this round.

        Batched: per (pending-robot, database-robot) pair this issues
        ONE retrieval dispatch and O(candidates / CHUNK) verification
        dispatches (`runtime/loopstage.py`), not one per keyframe."""
        from . import loopstage
        from . import observability as obs

        cfg = self.cfg
        new_loops = []
        pending, self._pending_kf = self._pending_kf, []
        # each unordered keyframe pair is verified at most once per
        # session, even when BOTH ends are pending this round (the batch
        # pipeline gets this for free from its rb <= ra sweep). Same-
        # robot pairs are additionally deduped by loopstage's strict
        # lower-triangle retrieval mask.
        searched = {
            frozenset(((l["robot_a"], l["kf_a"]), (l["robot_b"], l["kf_b"])))
            for l in self.loops
        }
        by_robot: dict[int, list[int]] = {}
        for ra, ia in pending:
            by_robot.setdefault(ra, []).append(ia)
        for ra, ias in by_robot.items():
            store_a, descs_a = self.store_view(ra)
            # fixed-length query batch -> one compiled retrieval program
            # per (pair, batch-size) instead of one dispatch per query
            Q = max(self.loop_every, len(ias))
            qi = np.full((Q,), -1, np.int64)
            qi[: len(ias)] = ias
            for rb in self.robots:
                store_b, descs_b = self.store_view(rb)
                if int(store_b.count) == 0:
                    continue
                exclude = {
                    (a_kf, b_kf)
                    for pair in searched
                    for (r1, a_kf) in pair
                    for (r2, b_kf) in pair
                    if r1 == ra and r2 == rb
                }
                found = loopstage.search_pair_loops(
                    store_a, descs_a, store_b, descs_b, cfg,
                    same_robot=(ra == rb), query_idx=qi, exclude=exclude,
                )
                for l in found:
                    pair = frozenset(((ra, l["kf_a"]), (rb, l["kf_b"])))
                    if pair in searched:
                        continue
                    searched.add(pair)
                    new_loops.append(
                        dict(robot_a=ra, kf_a=l["kf_a"], robot_b=rb,
                             kf_b=l["kf_b"], rel=l["rel"],
                             fitness=l["fitness"], desc_dist=l["desc_dist"])
                    )
        if not new_loops:
            return 0
        # PCM over ALL inter-robot loops (old + new), re-gated per robot
        # pair on every optimization round (`distributed_pcm.cpp:53-58`)
        inter = [l for l in self.loops + new_loops if l["robot_a"] != l["robot_b"]]
        intra = [l for l in self.loops + new_loops if l["robot_a"] == l["robot_b"]]

        def pose_of(r, k):
            store, _ = self.store_view(r)
            return se3.index(store.poses, k)

        with obs.tracer.span("online.pcm"):
            kept = pl.pcm_gate_inter_loops(inter, pose_of, cfg)
        obs.metrics.inc("online.pcm_rejected", len(inter) - len(kept))
        self.loops = intra + kept
        self._rebuild_loop_edges()
        with obs.tracer.span("online.solve"):
            self.optimize()
            jax.block_until_ready(self.opt_poses.t)
        return len(new_loops)

    def _rebuild_loop_edges(self) -> None:
        """Reset loop edges to the currently-accepted set (odometry
        edges stay; loop edges are re-written from self.loops)."""
        g = self.graph
        keep = np.asarray(g.edge_kind[: int(g.n_edges)]) == fg.ODOM
        n_odom = int(keep.sum())
        # compact: odometry edges first (they were added in order)
        valid = np.zeros(g.edge_capacity, bool)
        valid[: int(g.n_edges)] = keep
        order = np.argsort(~valid, kind="stable")
        take = lambda a: a[jnp.asarray(order)]
        self.graph = g._replace(
            edge_i=take(g.edge_i), edge_j=take(g.edge_j),
            edge_meas=Pose(take(g.edge_meas.R), take(g.edge_meas.t)),
            edge_kind=take(g.edge_kind),
            edge_w_rot=take(g.edge_w_rot), edge_w_trans=take(g.edge_w_trans),
            edge_valid=jnp.asarray(np.sort(valid)[::-1].copy()),
            n_edges=jnp.int32(n_odom),
        )
        if not self.loops:
            return
        # one batched scatter for all loop edges
        ei = jnp.asarray(
            [self.node_of[(l["robot_a"], l["kf_a"])] for l in self.loops],
            jnp.int32,
        )
        ej = jnp.asarray(
            [self.node_of[(l["robot_b"], l["kf_b"])] for l in self.loops],
            jnp.int32,
        )
        kinds = jnp.asarray(
            [
                fg.INTRA_LOOP if l["robot_a"] == l["robot_b"] else fg.INTER_LOOP
                for l in self.loops
            ],
            jnp.int32,
        )
        meas = se3.inverse(se3.stack([l["rel"] for l in self.loops]))
        self.graph, _ = fg.add_edges_batch(
            self.graph, ei, ej, meas, kinds,
            jnp.full((len(self.loops),), self.cfg.loops.w_rot, jnp.float32),
            jnp.full((len(self.loops),), self.cfg.loops.w_trans, jnp.float32),
        )

    def optimize(self) -> None:
        anchors = np.zeros(self.graph.node_capacity, bool)
        for r in self.robots:
            if (r, 0) in self.node_of:
                anchors[self.node_of[(r, 0)]] = True
        self.opt_poses = chordal.optimize(
            self.graph, jnp.asarray(anchors),
            chordal.PGOConfig(
                rot_cg_iters=self.cfg.pgo.rot_cg_iters,
                gn_iters=self.cfg.pgo.gn_iters,
                pose_cg_iters=self.cfg.pgo.pose_cg_iters,
                robust_delta=self.cfg.pgo.robust_delta,
            ),
        )

    # -- results --------------------------------------------------------
    def result(self) -> pl.SlamResult:
        if self._pending_kf:
            self.run_loop_stage()  # flush tail keyframes (the revisits!)
        robots = []
        ids = sorted(self.robots)
        counts = {
            r: int(self.mstore.stores.count[self.rows[r]]) for r in ids
        }
        max_k = max(counts.values(), default=0)
        node_of = -np.ones((len(ids), max(max_k, 1)), np.int64)
        for ri, r in enumerate(ids):
            rs = self.robots[r]
            store, _ = self.store_view(r)
            cur_pose = (
                rs["odo"].pose() if rs["frontend"] == "lio" else rs["odo"].pose
            )
            robots.append(
                pl.RobotResult(
                    odom_poses=cur_pose, store=store,
                    kf_frame_idx=np.arange(counts[r]),
                )
            )
            for k in range(counts[r]):
                node_of[ri, k] = self.node_of.get((r, k), -1)
        if self.opt_poses is None:
            self.optimize()
        return pl.SlamResult(
            robots=robots, graph=self.graph, opt_poses=self.opt_poses,
            node_of=node_of, loops=self.loops,
        )
