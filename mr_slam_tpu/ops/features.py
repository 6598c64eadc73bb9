"""LOAM-style feature extraction on range images — batched, no loops.

Re-designs `A-LOAM/src/scanRegistration.cpp:117-479` as array ops: the
reference walks each ring with OpenMP-free scalar loops (11-point
curvature `:276-286`, 6 sectors x sort-by-curvature picks `:297-428`).
Here the whole (rings x azimuth) image is processed at once:
convolutional curvature, per-sector `top_k`, everything fixed-shape.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .pointcloud import PointCloud, park


class ScanFeatures(NamedTuple):
    corners: PointCloud  # high-curvature (edge) points
    surfs: PointCloud    # low-curvature (planar) points
    curvature: jax.Array  # (R, A) diagnostic


@partial(jax.jit, static_argnames=("n_sectors", "corners_per_sector", "surfs_per_sector"))
def extract(
    xyz: jax.Array,
    hit: jax.Array,
    n_sectors: int = 6,
    corners_per_sector: int = 4,
    surfs_per_sector: int = 8,
    corner_thresh: float = 0.1,
    surf_thresh: float = 0.1,
) -> ScanFeatures:
    """xyz: (R, A, 3) body-frame range image, hit: (R, A) valid mask.

    Curvature (reference `:276-286`): c = |sum_{j=-5..5, j!=0} (p_j - p)|^2
    normalised by range^2. Neighbours wrap in azimuth (spinning lidar).
    Per ring and per azimuth sector: top-k curvature above
    `corner_thresh` become corners, bottom-k below `surf_thresh` become
    surfs (reference picks 2 sharp + 4 flat per sector of each ring).
    """
    R, A, _ = xyz.shape
    diff_sum = -10.0 * xyz
    for j in (-5, -4, -3, -2, -1, 1, 2, 3, 4, 5):
        diff_sum = diff_sum + jnp.roll(xyz, -j, axis=1)
    rng = jnp.linalg.norm(xyz, axis=-1)
    curv = jnp.sum(diff_sum * diff_sum, axis=-1) / jnp.maximum(rng, 1.0) ** 2
    # a point is usable only if its full 11-point neighbourhood is valid
    ok = hit
    for j in (-5, -4, -3, -2, -1, 1, 2, 3, 4, 5):
        ok = ok & jnp.roll(hit, -j, axis=1)
    # occlusion guard (reference `:430-460` marks picked neighbours of
    # depth discontinuities): suppress where adjacent range jumps
    jump = jnp.abs(jnp.roll(rng, -1, axis=1) - rng) > 0.5
    ok_surf = ok & ~jump & ~jnp.roll(jump, 1, axis=1)

    W = A // n_sectors
    A_used = n_sectors * W  # trim the remainder columns
    curv_s = curv[:, :A_used].reshape(R, n_sectors, W)
    ok_s = ok[:, :A_used].reshape(R, n_sectors, W)
    ok_surf_s = ok_surf[:, :A_used].reshape(R, n_sectors, W)
    xyz_s = xyz[:, :A_used].reshape(R, n_sectors, W, 3)

    # corners: largest curvature, gated
    corner_score = jnp.where(ok_s & (curv_s > corner_thresh), curv_s, -jnp.inf)
    c_val, c_idx = jax.lax.top_k(corner_score, corners_per_sector)
    c_pts = jnp.take_along_axis(xyz_s, c_idx[..., None].repeat(3, -1), axis=2)
    c_mask = jnp.isfinite(c_val)

    # surfs: smallest curvature, gated
    surf_score = jnp.where(ok_surf_s & (curv_s < surf_thresh), -curv_s, -jnp.inf)
    s_val, s_idx = jax.lax.top_k(surf_score, surfs_per_sector)
    s_pts = jnp.take_along_axis(xyz_s, s_idx[..., None].repeat(3, -1), axis=2)
    s_mask = jnp.isfinite(s_val)

    corners = park(PointCloud(c_pts.reshape(-1, 3), c_mask.reshape(-1)))
    surfs = park(PointCloud(s_pts.reshape(-1, 3), s_mask.reshape(-1)))
    return ScanFeatures(corners=corners, surfs=surfs, curvature=curv)
