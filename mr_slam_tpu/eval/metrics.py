"""Trajectory and place-recognition metrics.

The reference's de-facto correctness metrics (SURVEY.md §4): ATE against
ground truth for trajectories, and recall@N / top-1% recall for place
recognition (`disco_ros/evaluate.py:59-198`). Both batched here.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3, so3
from ..geometry.se3 import Pose


class ATEResult(NamedTuple):
    rmse: jax.Array
    mean: jax.Array
    max: jax.Array
    rot_rmse_deg: jax.Array


def _umeyama_align(est_t: jax.Array, true_t: jax.Array, mask: jax.Array):
    """SE(3) alignment (no scale) of est onto true — standard ATE
    pre-alignment (evo-style)."""
    w = mask.astype(jnp.float32)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mu_e = jnp.sum(est_t * w, axis=0) / n
    mu_t = jnp.sum(true_t * w, axis=0) / n
    E = (est_t - mu_e) * w
    T = (true_t - mu_t) * w
    _P = jax.lax.Precision.HIGHEST
    H = jnp.matmul(E.T, T, precision=_P) / n
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(jnp.matmul(Vt.T, U.T, precision=_P)))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d]))
    R = jnp.matmul(jnp.matmul(Vt.T, D, precision=_P), U.T, precision=_P)
    t = mu_t - jnp.matmul(R, mu_e, precision=_P)
    return R, t


def ate(
    est: Pose, true: Pose, mask: jax.Array | None = None, align: bool = False
) -> ATEResult:
    """Absolute trajectory error. `align=True` removes the gauge with a
    rigid Umeyama fit first (multi-robot merged maps are anchored, so
    the default compares in the shared frame)."""
    n = est.t.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    est_t = est.t
    est_R = est.R
    if align:
        R, t = _umeyama_align(est.t, true.t, mask)
        _P = jax.lax.Precision.HIGHEST
        est_t = jnp.matmul(est.t, R.T, precision=_P) + t
        est_R = jnp.einsum("ab,nbc->nac", R, est.R, precision=_P)
    w = mask.astype(jnp.float32)
    nvalid = jnp.maximum(jnp.sum(w), 1.0)
    d2 = jnp.sum((est_t - true.t) ** 2, axis=-1) * w
    rot_err = jnp.linalg.norm(
        so3.log(jnp.einsum(
            "nab,ncb->nac", est_R, true.R,
            precision=jax.lax.Precision.HIGHEST,
        )), axis=-1
    ) * w
    return ATEResult(
        rmse=jnp.sqrt(jnp.sum(d2) / nvalid),
        mean=jnp.sum(jnp.sqrt(jnp.maximum(d2, 0.0))) / nvalid,
        max=jnp.max(jnp.sqrt(jnp.maximum(d2, 0.0))),
        rot_rmse_deg=jnp.sqrt(jnp.sum(rot_err**2) / nvalid) * 180.0 / jnp.pi,
    )


def relative_pose_error(est: Pose, true: Pose, delta: int = 1):
    """RPE over a fixed frame delta: translation drift per step."""
    n = est.t.shape[0]
    a = slice(0, n - delta)
    b = slice(delta, n)
    rel_est = se3.between(se3.index(est, a), se3.index(est, b))
    rel_true = se3.between(se3.index(true, a), se3.index(true, b))
    err = se3.between(rel_est, rel_true)
    return jnp.sqrt(jnp.mean(jnp.sum(err.t**2, axis=-1)))


class RecallResult(NamedTuple):
    recall_at_n: jax.Array  # (N,) cumulative recall@1..N
    top1_percent: jax.Array


def recall_at_n(
    dists: jax.Array,       # (Q, D) descriptor distances query x database
    positives: jax.Array,   # (Q, D) bool ground-truth same-place pairs
    valid_q: jax.Array,     # (Q,) queries that have >= 1 positive
    max_n: int = 25,
):
    """recall@1..max_n and top-1% recall — `evaluate.py:59-198`'s
    metrics as one sort. A query scores at rank r if any ground-truth
    positive appears among its r nearest database entries."""
    order = jnp.argsort(dists, axis=1)  # ascending distance
    hit_sorted = jnp.take_along_axis(positives, order, axis=1)
    hits_at = jnp.cumsum(hit_sorted[:, :max_n], axis=1) > 0  # (Q, N)
    w = valid_q.astype(jnp.float32)
    nq = jnp.maximum(jnp.sum(w), 1.0)
    recall = jnp.sum(hits_at * w[:, None], axis=0) / nq
    one_pct = jnp.maximum(dists.shape[1] // 100, 1)
    top1p = jnp.sum((jnp.cumsum(hit_sorted[:, :one_pct], axis=1)[:, -1] > 0) * w) / nq
    return RecallResult(recall_at_n=recall, top1_percent=top1p)


def make_positives(
    query_t: jax.Array, db_t: jax.Array, radius: float = 5.0, exclude_self: int = -1
):
    """Ground-truth positive mask by metric distance (the pose-based
    ground truth of `generating_queries/*.py`)."""
    d = jnp.linalg.norm(query_t[:, None, :2] - db_t[None, :, :2], axis=-1)
    pos = d < radius
    if exclude_self >= 0:
        q = query_t.shape[0]
        eye = jnp.eye(q, db_t.shape[0], dtype=bool)
        pos = pos & ~eye
    return pos
