"""Place-recognition recall harness over all descriptor families.

The reference's de-facto PR metric is `disco_ros/evaluate.py` (recall@N
and top-1% on pose-ground-truthed query sets, query runs matched against
separate database runs built by `generating_queries/*.py`). This module
rebuilds that harness dataset-agnostically: given keyframe clouds +
ground-truth positions, compute every descriptor family's distance
matrix and its recall curve — one call per method, all batched. Both
the self-retrieval form (`evaluate_method`) and the cross-run
query-vs-database form (`evaluate_cross`, the evaluate.py protocol)
are supported.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..loop import bev, disco, fast_histogram, m2dp, ring, scancontext
from ..ops import pointcloud as pcl
from . import metrics


# ---- per-method (describe, cross-distance) pairs -------------------------

def _sc_describe(clouds: pcl.PointCloud):
    return jax.vmap(scancontext.describe)(clouds)


def _sc_cross(dq, ddb) -> jax.Array:
    def one(q):
        d, _ = scancontext.distance(q, ddb)
        return d
    return jax.lax.map(one, dq)


def _ring_describe(clouds: pcl.PointCloud):
    def desc(c):
        occ = bev.cartesian_occupancy(bev.normalize_cloud(c))[0]
        return ring.describe(occ).tiring
    return jax.lax.map(desc, clouds)


def _ring_cross(dq, ddb) -> jax.Array:
    def one(q):
        d, _ = ring.correlate(q, ddb)
        return d
    return jax.lax.map(one, dq)


def _ringpp_describe(clouds: pcl.PointCloud):
    def desc(c):
        # knn is quadratic in points — 2048 keeps the harness wall
        # bounded at ~1.5% recall cost (measured vs the 4096 cap)
        ds = pcl.voxel_downsample(c, 0.5, 2048)
        fb = bev.eigen_feature_bev(ds, 120, 120, k=8)
        return ring.describe_ringpp(fb).tirings
    return jax.lax.map(desc, clouds)


def _ringpp_cross(dq, ddb) -> jax.Array:
    def one(q):
        d, _ = ring.correlate_multichannel(q, ddb)
        return d
    return jax.lax.map(one, dq)


def _disco_describe(clouds: pcl.PointCloud):
    def desc(c):
        g = bev.polar_occupancy(c, 40, 120, z_bins=20)
        return disco.describe(g).signature
    return jax.lax.map(desc, clouds)


def _l2_cross(dq, ddb) -> jax.Array:
    return jnp.linalg.norm(dq[:, None, :] - ddb[None, :, :], axis=-1)


def _m2dp_describe(clouds: pcl.PointCloud):
    return jax.lax.map(m2dp.describe, clouds)


def _hist_describe(clouds: pcl.PointCloud):
    return jax.lax.map(fast_histogram.describe, clouds)


def _hist_cross(dq, ddb) -> jax.Array:
    return jax.vmap(lambda q: fast_histogram.distance(q, ddb))(dq)


METHODS: dict[str, tuple[Callable, Callable]] = {
    "scancontext": (_sc_describe, _sc_cross),
    "ring": (_ring_describe, _ring_cross),
    "ringpp": (_ringpp_describe, _ringpp_cross),
    "disco": (_disco_describe, _l2_cross),
    "m2dp": (_m2dp_describe, _l2_cross),
    "fasthist": (_hist_describe, _hist_cross),
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
    describe, cross = METHODS[method]
    descs = describe(clouds)
    dists = cross(descs, descs)
    idx = jnp.arange(K)
    near_in_time = jnp.abs(idx[:, None] - idx[None, :]) < min_separation
    dists = jnp.where(near_in_time, jnp.inf, dists)
    pos = metrics.make_positives(positions, positions, radius=radius)
    pos = pos & ~near_in_time
    valid = pos.any(axis=1)
    return metrics.recall_at_n(dists, pos, valid, max_n=max_n)


def evaluate_cross(
    method: str,
    clouds_q: pcl.PointCloud,    # (Q, P, ...) query keyframes
    positions_q: jax.Array,      # (Q, 3)
    clouds_db: pcl.PointCloud,   # (D, P, ...) database keyframes
    positions_db: jax.Array,     # (D, 3)
    radius: float = 5.0,
    max_n: int = 25,
) -> metrics.RecallResult:
    """The evaluate.py protocol proper: a QUERY run retrieved against a
    separate DATABASE run (`evaluate.py`'s DATABASE_SETS/QUERY_SETS
    from `generating_queries/*.py`, ground truth by pose distance)."""
    describe, cross = METHODS[method]
    dq = describe(clouds_q)
    ddb = describe(clouds_db)
    dists = cross(dq, ddb)
    pos = metrics.make_positives(positions_q, positions_db, radius=radius)
    valid = pos.any(axis=1)
    return metrics.recall_at_n(dists, pos, valid, max_n=max_n)
