"""Bird's-eye-view projections — the descriptor front half.

Replaces three CUDA kernels of the reference with scatter ops:
  * cartesian occupancy BEV (`generate_bev_cython_binary/src/kernel.cu:
    14-61` — normalized xyz -> uniform grid, max-z occupancy)
  * polar BEV (`disco_ros/tools/multi-layer-polar-gpu/cython/src/
    kernel.cu:40-80` — ring/sector/height occupancy)
  * eigen-feature BEV (`generate_bev_pointfeat_cython/src/kernel.cu:
    16-60` — per-point neighbourhood eigen features scattered to cells)

All functions take masked fixed-capacity clouds and are vmappable over
keyframes, so a whole submap batch becomes one scatter launch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import linalg3
from ..ops.pointcloud import PointCloud


def normalize_cloud(pc: PointCloud, xy_max: float = 70.0, z_min: float = 0.0, z_max: float = 30.0):
    """Crop to the RING working volume and scale into [-1, 1]^2 x [0, 1]
    (`RING_ros/util.py:91-112` load_pc_infer)."""
    xyz = pc.xyz
    m = (
        pc.mask
        & (jnp.abs(xyz[:, 0]) < xy_max)
        & (jnp.abs(xyz[:, 1]) < xy_max)
        & (xyz[:, 2] > z_min)
        & (xyz[:, 2] < z_max)
    )
    scaled = jnp.stack(
        [
            xyz[:, 0] / xy_max,
            xyz[:, 1] / xy_max,
            (xyz[:, 2] - z_min) / (z_max - z_min),
        ],
        axis=-1,
    )
    return PointCloud(jnp.where(m[:, None], scaled, 2.0), m)


@partial(jax.jit, static_argnames=("h", "w", "z_bins"))
def cartesian_occupancy(pc_norm: PointCloud, h: int = 120, w: int = 120, z_bins: int = 1):
    """Occupancy BEV from a normalized cloud: cell = 1 if any point falls
    in it (z_bins > 1 gives a stacked height-sliced BEV).

    Returns (z_bins, h, w) float32 in {0, 1}.
    """
    xyz = pc_norm.xyz
    i = jnp.clip(((xyz[:, 1] + 1.0) * 0.5 * h).astype(jnp.int32), 0, h - 1)
    j = jnp.clip(((xyz[:, 0] + 1.0) * 0.5 * w).astype(jnp.int32), 0, w - 1)
    k = jnp.clip((xyz[:, 2] * z_bins).astype(jnp.int32), 0, z_bins - 1)
    flat = (k * h + i) * w + j
    w_pt = pc_norm.mask.astype(jnp.float32)
    grid = jnp.zeros((z_bins * h * w,), jnp.float32).at[flat].max(w_pt)
    return grid.reshape(z_bins, h, w)


@partial(jax.jit, static_argnames=("n_rings", "n_sectors", "z_bins", "r_max"))
def polar_occupancy(
    pc: PointCloud,
    n_rings: int = 40,
    n_sectors: int = 120,
    z_bins: int = 1,
    r_max: float = 70.0,
    z_min: float = 0.0,
    z_max: float = 30.0,
):
    """Polar (ring, sector, height) occupancy from a METRIC cloud —
    DiSCO's `point2gridmap` (`kernel.cu:40-80`) and the ScanContext
    polar partition. Returns (z_bins, n_rings, n_sectors)."""
    xyz = pc.xyz
    r = jnp.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2)
    theta = jnp.arctan2(xyz[:, 1], xyz[:, 0])  # [-pi, pi]
    m = pc.mask & (r < r_max) & (xyz[:, 2] > z_min) & (xyz[:, 2] < z_max) & (r > 1e-3)
    ri = jnp.clip((r / r_max * n_rings).astype(jnp.int32), 0, n_rings - 1)
    si = jnp.clip(
        ((theta + jnp.pi) / (2 * jnp.pi) * n_sectors).astype(jnp.int32),
        0,
        n_sectors - 1,
    )
    zi = jnp.clip(
        ((xyz[:, 2] - z_min) / (z_max - z_min) * z_bins).astype(jnp.int32),
        0,
        z_bins - 1,
    )
    flat = (zi * n_rings + ri) * n_sectors + si
    grid = jnp.zeros((z_bins * n_rings * n_sectors,), jnp.float32).at[flat].max(
        m.astype(jnp.float32)
    )
    return grid.reshape(z_bins, n_rings, n_sectors)


@partial(jax.jit, static_argnames=("n_rings", "n_sectors", "r_max"))
def polar_max_height(
    pc: PointCloud,
    n_rings: int = 20,
    n_sectors: int = 60,
    r_max: float = 80.0,
) -> jax.Array:
    """ScanContext proper: max point height per (ring, sector) bin
    (`pr_methods/ScanContext.py:13-40`). Returns (n_rings, n_sectors)."""
    xyz = pc.xyz
    r = jnp.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2)
    theta = jnp.arctan2(xyz[:, 1], xyz[:, 0])
    m = pc.mask & (r < r_max) & (r > 1e-3)
    ri = jnp.clip((r / r_max * n_rings).astype(jnp.int32), 0, n_rings - 1)
    si = jnp.clip(
        ((theta + jnp.pi) / (2 * jnp.pi) * n_sectors).astype(jnp.int32),
        0,
        n_sectors - 1,
    )
    flat = ri * n_sectors + si
    z = jnp.where(m, pc.xyz[:, 2], -jnp.inf)
    grid = jnp.full((n_rings * n_sectors,), -jnp.inf).at[flat].max(z)
    grid = jnp.where(jnp.isfinite(grid), grid, 0.0)
    return grid.reshape(n_rings, n_sectors)


@partial(jax.jit, static_argnames=("h", "w", "k"))
def eigen_feature_bev(
    pc: PointCloud, h: int = 120, w: int = 120, k: int = 16, xy_max: float = 70.0
):
    """RING++ multi-channel feature BEV (`generate_bev_pointfeat_cython/
    src/kernel.cu:16-60` + `util.py:115-170`): per-point neighbourhood
    eigen statistics scattered (mean) into 6 channels: linearity,
    planarity, sphericity, omnivariance, anisotropy, eigen-entropy.

    Takes the METRIC body-frame cloud (neighbourhoods must be computed
    in metric space — normalizing first squashes z and degenerates every
    local covariance); BEV cell indices come from metric x/y over
    [-xy_max, xy_max]. Neighbourhoods via brute-force kNN.

    Returns (6, h, w)."""
    from ..ops.pointcloud import covariances_knn

    mean, cov, valid = covariances_knn(pc, k=k)
    evals = jnp.maximum(linalg3.eigvalsh3(cov), 1e-12)  # ascending
    e1, e2, e3 = evals[:, 2], evals[:, 1], evals[:, 0]  # descending
    esum = e1 + e2 + e3
    L = (e1 - e2) / e1
    P = (e2 - e3) / e1
    S = e3 / e1
    O = jnp.cbrt(e1 * e2 * e3)
    A = (e1 - e3) / e1
    p = evals / esum[:, None]
    E = -jnp.sum(p * jnp.log(p), axis=-1)
    feats = jnp.stack([L, P, S, O, A, E], axis=-1)  # (N, 6)
    i = jnp.clip(
        ((pc.xyz[:, 1] / xy_max + 1.0) * 0.5 * h).astype(jnp.int32), 0, h - 1
    )
    j = jnp.clip(
        ((pc.xyz[:, 0] / xy_max + 1.0) * 0.5 * w).astype(jnp.int32), 0, w - 1
    )
    inb = (jnp.abs(pc.xyz[:, 0]) < xy_max) & (jnp.abs(pc.xyz[:, 1]) < xy_max)
    flat = i * w + j
    wm = (pc.mask & valid & inb).astype(jnp.float32)
    num = jnp.zeros((h * w, 6), jnp.float32).at[flat].add(feats * wm[:, None])
    den = jnp.zeros((h * w,), jnp.float32).at[flat].add(wm)
    bev = num / jnp.maximum(den[:, None], 1.0)
    return jnp.moveaxis(bev.reshape(h, w, 6), -1, 0)