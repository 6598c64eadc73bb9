#!/usr/bin/env python
"""Headline benchmark: VGICP registrations/s per chip.

The BASELINE.json north star asks for >= 5x the reference's CPU/CUDA
registration throughput per chip. The workload mirrors the back-end's
loop-verification registration (`ICPCheck` with FAST_VGICP_CUDA:
resolution 0.5, ~50 iterations, few-thousand-point submaps,
`global_manager.cpp:2416-2462`): a batch of independent (source, target)
pairs registered by vmapped VGICP on one chip.

Baseline: fast_gicp's own multithreaded benchmark (README of the
upstream project) reports ~30 ms/align for VGICP on a desktop CPU
(~32 registrations/s) at comparable cloud sizes; FAST_VGICP_CUDA is
~3x that. We take 100 reg/s as the CUDA reference point, so
vs_baseline = ours / 100.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BATCH = 32
POINTS = 4096
ITERS = 50
BASELINE_REG_PER_S = 100.0


def main() -> None:
    from mr_slam_tpu.geometry import se3, so3
    from mr_slam_tpu.ops import pointcloud as pcl, registration, voxel_grid

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, BATCH + 2)

    # structured targets: ground + walls + clutter, per pair
    def make_cloud(k):
        k1, k2, k3 = jax.random.split(k, 3)
        n3 = POINTS // 4
        ground = jnp.concatenate(
            [jax.random.uniform(k1, (POINTS - 2 * n3, 2), minval=-25, maxval=25),
             jnp.zeros((POINTS - 2 * n3, 1))], axis=-1)
        wall1 = jnp.concatenate(
            [jax.random.uniform(k2, (n3, 1), minval=-25, maxval=25),
             jnp.full((n3, 1), 12.0),
             jax.random.uniform(k2, (n3, 1), minval=0, maxval=5)], axis=-1)
        wall2 = jnp.concatenate(
            [jnp.full((n3, 1), -10.0),
             jax.random.uniform(k3, (n3, 1), minval=-25, maxval=25),
             jax.random.uniform(k3, (n3, 1), minval=0, maxval=5)], axis=-1)
        xyz = jnp.concatenate([ground, wall1, wall2], axis=0)
        return xyz + 0.01 * jax.random.normal(k1, xyz.shape)

    targets_xyz = jax.vmap(make_cloud)(ks[:BATCH])
    targets = pcl.PointCloud(targets_xyz, jnp.ones((BATCH, POINTS), bool))
    # perturbed sources
    xi = 0.1 * jax.random.normal(ks[BATCH], (BATCH, 6))
    true = se3.exp(xi)
    sources = jax.vmap(lambda c, p: pcl.transform(c, se3.inverse(p)))(targets, true)

    build = jax.jit(
        jax.vmap(
            lambda c: voxel_grid.build(
                c, 0.5, 1 << 14, min_points=3, regularize="plane"
            )
        )
    )
    grids = build(targets)
    grids.mean.block_until_ready()

    run = jax.jit(
        jax.vmap(
            lambda s, g, i: registration.vgicp(
                s, g, i, iters=ITERS, max_corr_dist=1.0
            ).pose.t
        )
    )
    init = se3.identity((BATCH,))

    # warmup/compile
    run(sources, grids, init).block_until_ready()

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(sources, grids, init)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    reg_per_s = BATCH / dt

    print(
        json.dumps(
            {
                "metric": "vgicp_registrations_per_s_per_chip",
                "value": round(reg_per_s, 2),
                "unit": f"reg/s ({POINTS} pts, {ITERS} iters, batch {BATCH})",
                "vs_baseline": round(reg_per_s / BASELINE_REG_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
