#!/usr/bin/env python
"""True multi-process scaling bench: frames/s at 1 process (1 robot,
1 device) vs N processes (N robots, 1 device each, jax.distributed over
localhost gRPC) — the "1 host vs N hosts" measurement points of
BASELINE.md, with real cross-process mechanics (global device set, DCN
path) rather than in-process virtual devices.

Efficiency = fps(N proc, N robots) / (N * fps(1 proc, 1 robot)).
Prints one JSON line. Each configuration runs `multihost_worker.py`
in MRSLAM_BENCH mode.
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_config(n_procs: int, frames: int) -> float:
    port = _free_port()
    procs = []
    for pid in range(n_procs):
        env = dict(os.environ)
        env.pop("PYTEST_CURRENT_TEST", None)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            MRSLAM_ROBOTS=str(n_procs),
            MRSLAM_FRAMES=str(frames),
            MRSLAM_BENCH="1",
            PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
        )
        if n_procs > 1:
            env.update(
                MRSLAM_COORDINATOR=f"127.0.0.1:{port}",
                MRSLAM_NUM_PROCESSES=str(n_procs),
                MRSLAM_PROCESS_ID=str(pid),
            )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    fps = None
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=1200)
            text = stdout.decode()
            if p.returncode != 0:
                raise RuntimeError(
                    f"worker exited rc={p.returncode}; output tail:\n"
                    + "\n".join(text.splitlines()[-20:])
                )
            for line in text.splitlines():
                if line.startswith("{") and "bench_fps" in line:
                    fps = json.loads(line)["bench_fps"]
    finally:
        # a timeout/crash must not leak sibling workers
        for p in procs:
            if p.poll() is None:
                p.kill()
    if fps is None:
        raise RuntimeError("no bench_fps line from workers")
    return fps


def main() -> None:
    n = int(os.environ.get("BENCH_PROCESSES", "2"))
    frames = int(os.environ.get("BENCH_FRAMES", "8"))
    fps_1 = run_config(1, frames)
    fps_n = run_config(n, frames)
    print(json.dumps({
        "fps_1proc": round(fps_1, 2),
        "fps_nproc": round(fps_n, 2),
        "n_processes": n,
        "efficiency": round(fps_n / (n * fps_1), 3),
        "cpu_cores": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
