"""Online (streaming) multi-robot SLAM session.

The reference's GlobalManager is callback-driven: six threads racing
over mutex-guarded state (discovery, loop closing @0.1 Hz, geometry
check busy-loop, composing @3 Hz, TF @10 Hz — `global_manager_node.cpp:
45-50`). The TPU runtime replaces that with ONE deterministic scheduler:
`add_frame` ticks odometry (jitted, fixed shapes) and gates keyframes;
every `loop_every` new keyframes the session runs the loop stage
(retrieval -> verification -> PCM -> incremental PGO). No locks, no
races — state transitions are explicit and replayable (the §5.2 story:
races disappear by construction).

Robots register lazily (`register_robot`), mirroring topic discovery;
a robot can join mid-session.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..backend import chordal, factor_graph as fg
from ..frontend import keyframes as kf
from ..frontend import odometry
from ..geometry import se3
from ..geometry.se3 import Pose
from ..ops import pointcloud as pcl
from . import pipeline as pl
from .config import SlamConfig


class OnlineSlam:
    def __init__(self, cfg: SlamConfig, enable_gem: bool = False):
        self.cfg = cfg
        self.odo_cfg = pl._odometry_config(cfg)
        self.robots: dict[int, dict] = {}
        self.graph = fg.init(cfg.pgo.node_capacity, cfg.pgo.edge_capacity)
        self.node_of: dict[tuple[int, int], int] = {}
        self.loops: list[dict] = []
        self._pending_kf: list[tuple[int, int]] = []  # (robot, kf index)
        self.opt_poses: Optional[Pose] = None
        self.loop_every = 3  # keyframes between loop-stage runs
        self.enable_gem = enable_gem  # per-robot rolling elevation maps

    # -- discovery ------------------------------------------------------
    def register_robot(self, robot: int, origin: Pose | None = None) -> None:
        if robot in self.robots:
            return
        if origin is None:
            origin = self.cfg.init_pose(robot)  # overlay T.initPose
        rcfg = self.cfg.for_robot(robot)
        rs = dict(
            odo=odometry.init(pl._odometry_config(rcfg), origin),
            odo_cfg=pl._odometry_config(rcfg),
            kf_cfg=rcfg.keyframes,
            store=kf.init(rcfg.keyframes.capacity, rcfg.keyframes.points_per_kf),
            descs=None,
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

    # -- per-frame tick -------------------------------------------------
    def add_frame(self, robot: int, scan: pcl.PointCloud, stamp: float = 0.0) -> Pose:
        """Odometry tick + keyframe gate. Returns the current odometry
        pose estimate for `robot`."""
        if robot not in self.robots:
            self.register_robot(robot)
        rs = self.robots[robot]
        rs["odo"], _ = odometry.step(rs["odo"], scan, rs["odo_cfg"])
        pose = rs["odo"].pose
        before = int(rs["store"].count)
        rs["store"], added = kf.maybe_add(
            rs["store"], scan, pose, jnp.float32(stamp),
            dist_thresh=rs["kf_cfg"].dist_thresh,
            leaf=rs["kf_cfg"].leaf,
        )
        rs["frame"] += 1
        if self.enable_gem:
            self._gem_tick(rs, scan, pose)
        if bool(added):
            self._on_keyframe(robot, before)
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
            for k, body in rs.get("gem_flushed", []):
                node = self.node_of.get((robot, k))
                if node is None:
                    continue
                if self.opt_poses is not None:
                    pose = se3.index(self.opt_poses, node)
                else:
                    pose = se3.index(rs["store"].poses, k)
                world = pcl.transform(body, pose)
                var = elevation.sensor_variance(body.xyz)
                emap = elevation.fuse(emap, world, var)
        return emap

    def _on_keyframe(self, robot: int, k: int) -> None:
        rs = self.robots[robot]
        pose = se3.index(rs["store"].poses, k)
        if self.enable_gem:
            self._gem_flush(rs, k, pose)
        self.graph, idx = fg.add_node(self.graph, pose, jnp.int32(robot))
        self.node_of[(robot, k)] = int(idx)
        if k > 0:
            prev = self.node_of[(robot, k - 1)]
            meas = se3.between(se3.index(rs["store"].poses, k - 1), pose)
            self.graph, _ = fg.add_edge(
                self.graph, jnp.int32(prev), jnp.int32(int(idx)), meas,
                jnp.int32(fg.ODOM), jnp.float32(1.0), jnp.float32(1.0),
            )
        # incremental descriptor append — O(1) new work per keyframe,
        # like `discoUpdate` (`global_manager.cpp:1867-1888`), instead of
        # re-describing all K slots
        one = pl.describe_one(rs["store"].cloud(k), self.cfg)
        if rs["descs"] is None:
            # sized with the RESOLVED per-robot capacity: an overlay may
            # grow the keyframe store past the base config's capacity
            K = rs["kf_cfg"].capacity
            rs["descs"] = jax.tree.map(
                lambda a: jnp.zeros((K,) + a.shape, a.dtype), one
            )
        rs["descs"] = jax.tree.map(
            lambda buf, v: buf.at[k].set(v), rs["descs"], one
        )
        self._pending_kf.append((robot, k))
        if len(self._pending_kf) >= self.loop_every:
            self.run_loop_stage()

    # -- loop stage -----------------------------------------------------
    def _descriptors(self, robot: int):
        rs = self.robots[robot]
        if rs["descs"] is None:
            rs["descs"] = pl.compute_descriptors(rs["store"], self.cfg)
        return rs["descs"]

    def run_loop_stage(self) -> int:
        """Detect + verify loops for pending keyframes; optimize when
        any loop lands. Returns number of accepted loops this round."""
        cfg = self.cfg
        new_loops = []
        pending, self._pending_kf = self._pending_kf, []
        # each unordered keyframe pair is verified at most once per
        # session, even when BOTH ends are pending this round (the batch
        # pipeline gets this for free from its rb <= ra sweep)
        searched = {
            frozenset(((l["robot_a"], l["kf_a"]), (l["robot_b"], l["kf_b"])))
            for l in self.loops
        }
        for ra, ia in pending:
            descs_a = self._descriptors(ra)
            for rb in self.robots:
                Kb = int(self.robots[rb]["store"].count)
                if Kb == 0:
                    continue
                d, yaw = pl._descriptor_distances(descs_a, ia, self._descriptors(rb), cfg)
                d = np.array(d[:Kb])
                yaw_np = np.array(yaw[:Kb])
                if ra == rb:
                    lo = max(0, ia - cfg.loops.min_separation)
                    hi = min(Kb, ia + cfg.loops.min_separation + 1)
                    d[lo:hi] = np.inf
                order = list(np.argsort(d)[: cfg.loops.candidates])
                if ra == rb:
                    # odometry-space radius path (`global_manager.cpp:
                    # 1029-1094`) joins the candidate set
                    for j in pl.odom_space_candidates(
                        self.robots[ra]["store"], ia, cfg
                    ):
                        if j not in order:
                            order.append(j)
                for ib in order:
                    desc_ok = (
                        np.isfinite(d[ib]) and d[ib] <= cfg.loops.dist_thresh
                    )
                    odom_ok = (
                        ra == rb and cfg.loops.odom_radius > 0.0
                        and abs(ia - int(ib)) > cfg.loops.min_separation
                        and float(jnp.linalg.norm(
                            self.robots[ra]["store"].poses.t[ia]
                            - self.robots[rb]["store"].poses.t[int(ib)]
                        )) < cfg.loops.odom_radius
                    )
                    if not (desc_ok or odom_ok):
                        continue
                    pair = frozenset(((ra, ia), (rb, int(ib))))
                    if pair in searched:
                        continue
                    searched.add(pair)
                    accept, rel, fit = pl._verify_loop(
                        self.robots[ra]["store"], ia,
                        self.robots[rb]["store"], int(ib),
                        float(yaw_np[ib]), cfg, same_robot=(ra == rb),
                        descs_a=descs_a, descs_b=self._descriptors(rb),
                    )
                    if accept:
                        new_loops.append(
                            dict(robot_a=ra, kf_a=ia, robot_b=rb, kf_b=int(ib),
                                 rel=rel, fitness=fit, desc_dist=float(d[ib]))
                        )
        if not new_loops:
            return 0
        # PCM over ALL inter-robot loops (old + new), re-gated per robot
        # pair on every optimization round (`distributed_pcm.cpp:53-58`)
        inter = [l for l in self.loops + new_loops if l["robot_a"] != l["robot_b"]]
        intra = [l for l in self.loops + new_loops if l["robot_a"] == l["robot_b"]]
        inter = pl.pcm_gate_inter_loops(
            inter,
            lambda r, k: se3.index(self.robots[r]["store"].poses, k),
            cfg,
        )
        self.loops = intra + inter
        self._rebuild_loop_edges()
        self.optimize()
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
        for l in self.loops:
            i = self.node_of[(l["robot_a"], l["kf_a"])]
            j = self.node_of[(l["robot_b"], l["kf_b"])]
            kind = fg.INTRA_LOOP if l["robot_a"] == l["robot_b"] else fg.INTER_LOOP
            self.graph, _ = fg.add_edge(
                self.graph, jnp.int32(i), jnp.int32(j), se3.inverse(l["rel"]),
                jnp.int32(kind), jnp.float32(self.cfg.loops.w_rot),
                jnp.float32(self.cfg.loops.w_trans),
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
        max_k = max((int(self.robots[r]["store"].count) for r in ids), default=0)
        node_of = -np.ones((len(ids), max(max_k, 1)), np.int64)
        for ri, r in enumerate(ids):
            rs = self.robots[r]
            robots.append(
                pl.RobotResult(
                    odom_poses=rs["odo"].pose, store=rs["store"],
                    kf_frame_idx=np.arange(int(rs["store"].count)),
                )
            )
            for k in range(int(rs["store"].count)):
                node_of[ri, k] = self.node_of.get((r, k), -1)
        if self.opt_poses is None:
            self.optimize()
        return pl.SlamResult(
            robots=robots, graph=self.graph, opt_poses=self.opt_poses,
            node_of=node_of, loops=self.loops,
        )
