"""Place-recognition recall harness over all descriptor families.

The reference's de-facto PR metric is `disco_ros/evaluate.py` (recall@N
and top-1% on pose-ground-truthed query sets). This module rebuilds that
harness dataset-agnostically: given keyframe clouds + ground-truth
positions, compute every descriptor family's distance matrix and its
recall curve — one call per method, all batched.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..loop import bev, disco, fast_histogram, m2dp, ring, scancontext
from ..ops import pointcloud as pcl
from . import metrics


def _sc_dists(clouds: pcl.PointCloud) -> jax.Array:
    descs = jax.vmap(scancontext.describe)(clouds)
    def one(q):
        d, _ = scancontext.distance(q, descs)
        return d
    return jax.lax.map(one, descs)


def _ring_dists(clouds: pcl.PointCloud) -> jax.Array:
    def desc(c):
        occ = bev.cartesian_occupancy(bev.normalize_cloud(c))[0]
        return ring.describe(occ).tiring
    tirings = jax.lax.map(desc, clouds)
    def one(q):
        d, _ = ring.correlate(q, tirings)
        return d
    return jax.lax.map(one, tirings)


def _ringpp_dists(clouds: pcl.PointCloud) -> jax.Array:
    def desc(c):
        ds = pcl.voxel_downsample(c, 0.5, 4096)
        fb = bev.eigen_feature_bev(ds, 120, 120, k=8)
        return ring.describe_ringpp(fb).tirings
    tirings = jax.lax.map(desc, clouds)
    def one(q):
        d, _ = ring.correlate_multichannel(q, tirings)
        return d
    return jax.lax.map(one, tirings)


def _disco_dists(clouds: pcl.PointCloud) -> jax.Array:
    def desc(c):
        g = bev.polar_occupancy(c, 40, 120, z_bins=20)
        return disco.describe(g).signature
    sigs = jax.lax.map(desc, clouds)
    return jnp.linalg.norm(sigs[:, None, :] - sigs[None, :, :], axis=-1)


def _m2dp_dists(clouds: pcl.PointCloud) -> jax.Array:
    sigs = jax.lax.map(m2dp.describe, clouds)
    return jnp.linalg.norm(sigs[:, None, :] - sigs[None, :, :], axis=-1)


def _hist_dists(clouds: pcl.PointCloud) -> jax.Array:
    sigs = jax.lax.map(fast_histogram.describe, clouds)
    return jax.vmap(lambda q: fast_histogram.distance(q, sigs))(sigs)


METHODS: dict[str, Callable] = {
    "scancontext": _sc_dists,
    "ring": _ring_dists,
    "ringpp": _ringpp_dists,
    "disco": _disco_dists,
    "m2dp": _m2dp_dists,
    "fasthist": _hist_dists,
}


def evaluate_method(
    method: str,
    clouds: pcl.PointCloud,     # (K, P, ...) keyframe clouds (body frame)
    positions: jax.Array,       # (K, 3) ground-truth keyframe positions
    radius: float = 5.0,
    min_separation: int = 10,
    max_n: int = 10,
) -> metrics.RecallResult:
    """Query every keyframe against all others (excluding a temporal
    window) and score recall@1..max_n — `evaluate.py:59-198` semantics."""
    K = positions.shape[0]
    dists = METHODS[method](clouds)
    idx = jnp.arange(K)
    near_in_time = jnp.abs(idx[:, None] - idx[None, :]) < min_separation
    dists = jnp.where(near_in_time, jnp.inf, dists)
    pos = metrics.make_positives(positions, positions, radius=radius)
    pos = pos & ~near_in_time
    valid = pos.any(axis=1)
    return metrics.recall_at_n(dists, pos, valid, max_n=max_n)
