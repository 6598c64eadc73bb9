"""One typed hierarchical configuration for the whole engine.

The reference spreads ~40 launch params, rosparam YAMLs, OpenCV
FileStorage initial poses, and argparse-mutated module globals across
four mechanisms (SURVEY.md §5.6). Here a single frozen dataclass tree
covers every stage; defaults mirror `global_manager.launch:1-66`,
`RING_ros/config.py` and FAST-LIO YAMLs where a counterpart exists.
NamedTuple-style frozen dataclasses hash, so configs are static jit
arguments.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class OdometryCfg:
    frontend: str = "scan2map"      # scan2map (A-LOAM-style) | lio (FAST-LIO-style)
    scan_leaf: float = 0.4
    map_leaf: float = 1.0
    insert_leaf: float = 0.15
    scan_capacity: int = 4096
    insert_capacity: int = 16384
    table_size: int = 1 << 17
    map_radius: float = 120.0
    iters: int = 8
    max_corr_dist: float = 1.0


@dataclass(frozen=True)
class KeyframeCfg:
    dist_thresh: float = 2.0        # LIO_Publisher dis_th
    leaf: float = 0.2               # submap voxel (launch:55)
    capacity: int = 256             # keyframes per robot
    points_per_kf: int = 4096


@dataclass(frozen=True)
class LoopCfg:
    method: str = "scancontext"     # scancontext | ring | disco
    dist_thresh: float = 0.25       # descriptor gate (RING 0.48 scale-equiv)
    min_separation: int = 10        # skip recent frames (same robot)
    candidates: int = 1             # top-k to verify per query
    verify_window: int = 2          # merged +-window keyframes (submap_size)
    verify_leaf: float = 0.4        # icp_filter_size-ish
    verify_capacity: int = 16384
    fitness_thresh: float = 0.15    # accept gate (ref 0.10 with PCL scoring)
    max_loops: int = 64
    w_rot: float = 10.0             # loop noise 1e-1 -> info 10 (launch)
    w_trans: float = 10.0
    pcm_threshold: float = 2.204    # chi2 @ 6dof, pcm_thresh 0.10
    use_pcm: bool = True
    crop_xy: float = 60.0           # +-x/y crop of merged verify submaps
                                    # (`global_manager.cpp:1916-1926`)
    bev_z_min: float = 0.0          # BEV z floor (body frame); raise to
                                    # strip ground returns from descriptors
    odom_radius: float = 0.0        # same-robot odometry-space loop search
                                    # radius in m (0 = off) — the 6-D
                                    # key-pose radius path
                                    # (`global_manager.cpp:1029-1094`)


@dataclass(frozen=True)
class PGOCfg:
    rot_cg_iters: int = 60
    gn_iters: int = 12
    pose_cg_iters: int = 40
    robust_delta: float = 1.0
    node_capacity: int = 1024
    edge_capacity: int = 2048


@dataclass(frozen=True)
class ElevationCfg:
    size: int = 60                  # 12 m x 12 m @ 0.2 m
    resolution: float = 0.2
    travers_thresh: float = 0.4


@dataclass(frozen=True)
class SlamConfig:
    n_robots: int = 1
    odometry: OdometryCfg = field(default_factory=OdometryCfg)
    keyframes: KeyframeCfg = field(default_factory=KeyframeCfg)
    loops: LoopCfg = field(default_factory=LoopCfg)
    pgo: PGOCfg = field(default_factory=PGOCfg)
    elevation: ElevationCfg = field(default_factory=ElevationCfg)

    def replace(self, **kw) -> "SlamConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "SlamConfig":
        raw = json.loads(text)
        return cls(
            n_robots=raw.get("n_robots", 1),
            odometry=OdometryCfg(**raw.get("odometry", {})),
            keyframes=KeyframeCfg(**raw.get("keyframes", {})),
            loops=LoopCfg(**raw.get("loops", {})),
            pgo=PGOCfg(**raw.get("pgo", {})),
            elevation=ElevationCfg(**raw.get("elevation", {})),
        )
