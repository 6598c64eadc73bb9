"""Multi-host runtime: SPMD front-ends over the robot mesh, host
feeders, replicated back-end, edge-sharded PGO — and a REAL 2-process
run (jax.distributed over localhost) matching the single-process
result. Replaces `global_manager.cpp:287-442`'s ROS fan-in."""
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.geometry import se3
from mr_slam_tpu.ops.pointcloud import PointCloud
from mr_slam_tpu.parallel import multihost as mh
from mr_slam_tpu.runtime import pipeline
from mr_slam_tpu.runtime.config import SlamConfig, LoopCfg, OdometryCfg, KeyframeCfg

CFG = SlamConfig(
    n_robots=2,
    odometry=OdometryCfg(table_size=1 << 15, scan_capacity=2048,
                         insert_capacity=8192),
    keyframes=KeyframeCfg(capacity=16, points_per_kf=4096),
    loops=LoopCfg(dist_thresh=0.3, min_separation=4, fitness_thresh=0.15,
                  candidates=1),
)


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


def build_inputs(n_robots=2, n=8):
    world = synthetic.default_world(7)
    trajs = [
        # laps sized for ~2.5 m inter-frame motion: the old 0.3
        # (5.2 m/frame) sat at the coarse-rescue basin edge and robot 1
        # silently diverged in BOTH lowerings (the former
        # lowering-equality assertions could not see it)
        synthetic.circle_trajectory(n, radius=22.0, laps=0.15,
                                    phase=2 * np.pi * r / n_robots)
        for r in range(n_robots)
    ]
    scans, origins = {}, {}
    for r in range(n_robots):
        xyz, mask = make_scan_stack(world, trajs[r], n, seed=r)
        scans[r] = PointCloud(xyz, mask)
        o = se3.index(trajs[r], 0)
        origins[r] = se3.Pose(np.asarray(o.R), np.asarray(o.t))
    return scans, origins, trajs


@pytest.mark.slow
class TestMultihostSim:
    """Single-process, 8 virtual CPU devices (conftest): the same SPMD
    program a true multi-host run compiles."""

    def test_spmd_frontend_matches_single(self):
        scans, origins, trajs = build_inputs()
        mesh = mh.robot_mesh(2)
        g_scans = mh.feed_global(scans, mesh)
        g_origins = mh.feed_global(origins, mesh)
        poses, stores, added = mh.frontend_spmd(g_scans, CFG, g_origins, mesh)
        # The sharded and direct lowerings of an ITERATED registration
        # chain are chaotic in their ulp-level differences (discrete
        # events — correspondence sets, decay cell drops — bifurcate),
        # so the contract is not bit-parity but that BOTH lowerings
        # track the true trajectory to odometry quality, and gate the
        # same number of keyframes (+-1 on gate-boundary frames).
        for r in range(2):
            rr = pipeline.run_frontend(
                PointCloud(jnp.asarray(scans[r].xyz), jnp.asarray(scans[r].mask)),
                CFG,
                se3.Pose(jnp.asarray(origins[r].R), jnp.asarray(origins[r].t)),
            )
            true_t = np.asarray(trajs[r].t)
            err_spmd = np.linalg.norm(
                np.asarray(poses.t[r]) - true_t, axis=-1
            ).max()
            err_direct = np.linalg.norm(
                np.asarray(rr.odom_poses.t) - true_t, axis=-1
            ).max()
            assert err_spmd < 0.5, f"SPMD odometry drift {err_spmd:.3f}"
            assert err_direct < 0.5, f"direct odometry drift {err_direct:.3f}"
            n_spmd = int(np.asarray(added[r]).sum())
            assert abs(n_spmd - len(rr.kf_frame_idx)) <= 1

    def test_run_multihost_end_to_end(self):
        scans, origins, trajs = build_inputs()
        mesh = mh.robot_mesh(2)
        g_scans = mh.feed_global(scans, mesh)
        g_origins = mh.feed_global(origins, mesh)
        res = mh.run_multihost(g_scans, CFG, g_origins, mesh)
        single = pipeline.run(
            [PointCloud(jnp.asarray(scans[r].xyz), jnp.asarray(scans[r].mask))
             for r in range(2)],
            CFG,
            origins=[se3.Pose(jnp.asarray(origins[r].R), jnp.asarray(origins[r].t))
                     for r in range(2)],
        )
        for r in range(2):
            true_kf = se3.index(
                trajs[r], jnp.asarray(res.robots[r].kf_frame_idx)
            )
            err = np.linalg.norm(
                np.asarray(res.optimized_trajectory(r).t)
                - np.asarray(true_kf.t), axis=-1,
            ).max()
            assert err < 0.5, f"multihost optimized drift {err:.3f}"
            true_kf_s = se3.index(
                trajs[r], jnp.asarray(single.robots[r].kf_frame_idx)
            )
            err_s = np.linalg.norm(
                np.asarray(single.optimized_trajectory(r).t)
                - np.asarray(true_kf_s.t), axis=-1,
            ).max()
            assert err_s < 0.5, f"single-process drift {err_s:.3f}"


@pytest.mark.slow
class TestMultihostProcesses:
    """Two real OS processes, jax.distributed over localhost — the
    actual multi-host mechanics (gRPC DCN, global device set)."""

    def test_two_processes_match_single(self, tmp_path):
        port = _free_port()
        out = tmp_path / "mh.npz"
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.pop("PYTEST_CURRENT_TEST", None)
            env.update(
                JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=1",
                MRSLAM_COORDINATOR=f"127.0.0.1:{port}",
                MRSLAM_NUM_PROCESSES="2",
                MRSLAM_PROCESS_ID=str(pid),
                MRSLAM_ROBOTS="2",
                MRSLAM_FRAMES="8",
                MRSLAM_OUT=str(out),
                PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            procs.append(subprocess.Popen(
                [sys.executable,
                 os.path.join(os.path.dirname(__file__), "..", "examples",
                              "multihost_worker.py")],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            ))
        outs = []
        for p in procs:
            stdout, _ = p.communicate(timeout=900)
            outs.append(stdout.decode())
        for p, o in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
        data = np.load(out)
        # single-process reference on identical inputs
        scans, origins, _ = build_inputs()
        single = pipeline.run(
            [PointCloud(jnp.asarray(scans[r].xyz), jnp.asarray(scans[r].mask))
             for r in range(2)],
            CFG,
            origins=[se3.Pose(jnp.asarray(origins[r].R), jnp.asarray(origins[r].t))
                     for r in range(2)],
        )
        # cross-process vs single-process: same chaotic-chain caveat
        # as the SPMD test — assert both track truth and agree to
        # odometry quality, not bit parity
        for r in range(2):
            np.testing.assert_allclose(
                data[f"odom_t_{r}"],
                np.asarray(single.robots[r].odom_poses.t),
                atol=0.5,
            )
            assert abs(
                len(data[f"kf_{r}"]) - len(single.robots[r].kf_frame_idx)
            ) <= 1


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
