"""Bag-style replay: a host feeder that streams timestamped multi-robot
frames into the online session.

The reference is driven by rosbag playback — `rosbag play 3_dog.bag`
fans PointCloud2 frames out to the per-robot odometry nodes and robots
are discovered as their topics appear (`README.md` Quick Demo,
`global_manager.cpp:287-442`). Here a "bag" is any iterable of
`Frame(stamp, robot, scan[, imu])` records sorted by stamp; `replay`
feeds them into an `OnlineSlam` session in stamp order, registering
robots on first sight (the discovery analogue).

Sources:
  * `synthetic_bag` — raycast a multi-robot synthetic world into an
    interleaved frame stream (the `3_dog.bag` stand-in);
  * `scanlog_bag` — read frames from the native binary scan log
    (`native/scanlog.cpp`), one file per robot, merged by stamp;
  * any user iterable of `Frame`s.
"""
from __future__ import annotations

import heapq
from dataclasses import dataclass
from typing import Iterable, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3
from ..geometry.se3 import Pose
from ..ops import pointcloud as pcl
from . import synthetic


@dataclass
class Frame:
    stamp: float
    robot: int
    scan: pcl.PointCloud          # body-frame masked cloud
    origin: Pose | None = None    # robot's initial pose (first frame only)
    imu: tuple | None = None      # (gyro (S,3), acc (S,3), dt (S)) packet
    times: object | None = None   # (P,) sweep-relative point times


def synthetic_bag(
    world,
    trajs: Sequence[Pose],
    n_frames: int,
    frame_dt: float = 0.1,
    stagger: float = 0.03,
    n_rings: int = 16,
    n_azimuth: int = 512,
    seed: int = 0,
    with_imu: bool = False,
    imu_sub: int = 10,
) -> list[Frame]:
    """Raycast an interleaved multi-robot frame stream: robot r's frame
    i is stamped i*frame_dt + r*stagger, so robots' frames interleave
    like concurrent rosbag topics. `with_imu=True` attaches synthesized
    IMU packets per frame (the PointCloud2+Imu pairing a FAST-LIO
    session consumes; frame 0 of each robot carries None — the session
    propagates from the registered origin)."""
    frames: list[Frame] = []
    for r, traj in enumerate(trajs):
        keys = jax.random.split(jax.random.PRNGKey(seed + r), n_frames)
        imu = None
        if with_imu:
            imu = synthetic.imu_for_trajectory(
                traj, frame_dt=frame_dt, n_sub=imu_sub
            )
        for i in range(n_frames):
            xyz, _, hit = synthetic.scan(
                world, se3.index(traj, i), n_rings=n_rings,
                n_azimuth=n_azimuth, key=keys[i],
            )
            packet = None
            if with_imu and i > 0:
                g, a, d = imu
                packet = (g[i - 1], a[i - 1], d[i - 1])
            frames.append(Frame(
                stamp=i * frame_dt + r * stagger,
                robot=r,
                scan=synthetic.scan_to_cloud(xyz, hit),
                origin=se3.index(traj, 0) if i == 0 else None,
                imu=packet,
            ))
    frames.sort(key=lambda f: f.stamp)
    return frames


def scanlog_bag(paths: dict[int, str]) -> Iterator[Frame]:
    """Merge per-robot native scan logs ({robot: path}) into one
    stamp-ordered stream (the multi-bag playback of the reference's
    Full Usage)."""
    from .. import native

    readers = {r: iter(native.ScanLogReader(p)) for r, p in paths.items()}
    heap: list[tuple[float, int, tuple]] = []
    for r, it in readers.items():
        rec = next(it, None)
        if rec is not None:
            heap.append((rec[0], r, rec))
    heapq.heapify(heap)
    first_seen: set[int] = set()
    while heap:
        stamp, r, (st, pose12, xyz, n) = heapq.heappop(heap)
        origin = None
        if r not in first_seen:
            first_seen.add(r)
            P = np.asarray(pose12, np.float32).reshape(3, 4)
            origin = Pose(jnp.asarray(P[:, :3]), jnp.asarray(P[:, 3]))
        mask = jnp.arange(xyz.shape[0]) < n
        yield Frame(
            stamp=float(st), robot=r,
            scan=pcl.park(pcl.PointCloud(jnp.asarray(xyz, jnp.float32), mask)),
            origin=origin,
        )
        rec = next(readers[r], None)
        if rec is not None:
            heapq.heappush(heap, (rec[0], r, rec))


def replay(frames: Iterable[Frame], session) -> int:
    """Stream frames into an `OnlineSlam` session in stamp order,
    registering robots on first sight. Returns the frame count."""
    n = 0
    for f in frames:
        if f.robot not in session.robots:
            session.register_robot(f.robot, f.origin)
        session.add_frame(
            f.robot, f.scan, stamp=f.stamp, times=f.times, imu=f.imu
        )
        n += 1
    return n
