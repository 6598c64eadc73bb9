"""Multi-process SLAM worker — one OS process per host.

Spawned N times (see `tests/test_multihost.py`) with
MRSLAM_COORDINATOR / MRSLAM_NUM_PROCESSES / MRSLAM_PROCESS_ID set; each
process owns one CPU device (one robot) and feeds that robot's scans —
the role of a per-robot ROS node set in the reference. Writes process
0's result to $MRSLAM_OUT.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mr_slam_tpu.parallel import multihost as mh

mh.initialize()

import jax
import jax.numpy as jnp

from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.geometry import se3
from mr_slam_tpu.runtime.config import SlamConfig, LoopCfg, OdometryCfg, KeyframeCfg


def make_scan_stack(world, traj, n, seed):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    xyzs, masks = [], []
    for i in range(n):
        xyz, _, hit = synthetic.scan(
            world, se3.index(traj, i), n_rings=16, n_azimuth=256, key=keys[i]
        )
        xyzs.append(np.asarray(xyz.reshape(-1, 3)))
        masks.append(np.asarray(hit.reshape(-1)))
    return np.stack(xyzs), np.stack(masks)


def main():
    n_robots = int(os.environ.get("MRSLAM_ROBOTS", "2"))
    n_frames = int(os.environ.get("MRSLAM_FRAMES", "8"))
    mesh = mh.robot_mesh(n_robots)
    cfg = SlamConfig(
        n_robots=n_robots,
        odometry=OdometryCfg(table_size=1 << 15, scan_capacity=2048,
                             insert_capacity=8192),
        keyframes=KeyframeCfg(capacity=16, points_per_kf=4096),
        loops=LoopCfg(dist_thresh=0.3, min_separation=4, fitness_thresh=0.15,
                      candidates=1),
    )
    world = synthetic.default_world(7)
    # every process derives the SAME ground truth deterministically but
    # only feeds its local robots
    trajs = [
        # ~2.6 m inter-frame motion regardless of n_frames (and
        # IDENTICAL inputs to tests/test_multihost.py build_inputs at
        # n_frames=8)
        synthetic.circle_trajectory(n_frames, radius=22.0,
                                    laps=0.15 * n_frames / 8.0,
                                    phase=2 * np.pi * r / n_robots)
        for r in range(n_robots)
    ]
    from mr_slam_tpu.ops.pointcloud import PointCloud

    local_scans = {}
    local_origins = {}
    for r in mh.local_robot_ids(mesh):
        xyz, mask = make_scan_stack(world, trajs[r], n_frames, seed=r)
        local_scans[r] = PointCloud(xyz, mask)
        o = se3.index(trajs[r], 0)
        local_origins[r] = se3.Pose(np.asarray(o.R), np.asarray(o.t))

    scans = mh.feed_global(local_scans, mesh)
    origins = mh.feed_global(local_origins, mesh)

    if os.environ.get("MRSLAM_BENCH"):
        # frames/s of the SPMD front-end across processes (includes the
        # cross-process dispatch/sync cost — the DCN-path number the
        # BASELINE scaling-efficiency target asks for)
        import json
        import time

        out = mh.frontend_spmd(scans, cfg, origins, mesh)  # compile
        jax.block_until_ready(out)
        reps = int(os.environ.get("MRSLAM_BENCH_REPS", "3"))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = mh.frontend_spmd(scans, cfg, origins, mesh)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        # ---- time split: host feed / device compute / collective ----
        # (the VERDICT-r3 #6 evidence: what share of the wall is
        # host-bound vs our dispatch/collective overhead)
        t0 = time.perf_counter()
        for _ in range(reps):
            scans2 = mh.feed_global(local_scans, mesh)
        jax.block_until_ready(scans2)
        feed_s = (time.perf_counter() - t0) / reps
        t0 = time.perf_counter()
        for _ in range(reps):
            rep = mh._replicate_to_hosts(out)
        gather_s = (time.perf_counter() - t0) / reps
        if jax.process_index() == 0:
            print(json.dumps(
                {"bench_fps": round(n_robots * n_frames / dt, 3),
                 "robots": n_robots, "frames": n_frames,
                 "processes": jax.process_count(),
                 "split_ms": {"frontend": round(dt * 1e3, 1),
                              "feed": round(feed_s * 1e3, 1),
                              "replicate": round(gather_s * 1e3, 1)}}
            ), flush=True)
        return

    res = mh.run_multihost(scans, cfg, origins, mesh)

    if jax.process_index() == 0 and "MRSLAM_OUT" in os.environ:
        out = {}
        for r in range(n_robots):
            out[f"odom_t_{r}"] = np.asarray(res.robots[r].odom_poses.t)
            out[f"opt_t_{r}"] = np.asarray(res.optimized_trajectory(r).t)
            out[f"kf_{r}"] = np.asarray(res.robots[r].kf_frame_idx)
        out["n_loops"] = np.array(len(res.loops))
        np.savez(os.environ["MRSLAM_OUT"], **out)
    print(f"[proc {jax.process_index()}] done: {len(res.loops)} loops")


if __name__ == "__main__":
    main()
