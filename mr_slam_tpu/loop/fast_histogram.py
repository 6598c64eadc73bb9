"""FastHistogram place descriptor — range histogram + Wasserstein match.

Re-design of `pr_methods/FastHistogram.py`: the descriptor is the
normalized histogram of point ranges; matching uses the 1-Wasserstein
(cumulative-difference) distance. The cheapest PR baseline — useful as
the sanity floor in recall evaluations.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.pointcloud import PointCloud


@partial(jax.jit, static_argnames=("n_bins",))
def describe(pc: PointCloud, n_bins: int = 128, r_max: float = 80.0) -> jax.Array:
    r = jnp.linalg.norm(pc.xyz, axis=-1)
    m = pc.mask & (r < r_max)
    bi = jnp.clip((r / r_max * n_bins).astype(jnp.int32), 0, n_bins - 1)
    hist = jnp.zeros((n_bins,), jnp.float32).at[bi].add(m.astype(jnp.float32))
    return hist / jnp.maximum(jnp.sum(hist), 1.0)


@jax.jit
def distance(query: jax.Array, database: jax.Array) -> jax.Array:
    """1-Wasserstein distance between histograms: query (B,), database
    (D, B) -> (D,)."""
    cq = jnp.cumsum(query)
    cd = jnp.cumsum(database, axis=-1)
    return jnp.sum(jnp.abs(cd - cq[None, :]), axis=-1) / query.shape[-1]
