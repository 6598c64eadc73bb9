"""Costmap conversion — navigation-ready occupancy from terrain layers.

Re-design of `Costmap/src/costmap` (`pointMap_layer.cpp:119-126`,
`elevationMap_layer.cpp`): a costmap_2d plugin that marks
LETHAL_OBSTACLE where traversability < threshold or height > threshold.
Here the conversion is a pure threshold op over the elevation map's
feature layers, producing the standard cost convention
(0 = free, 100 = lethal, 255/unknown = -1) as an int8 grid plus helpers
to rasterize a merged world-frame cloud into a fixed global costmap.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.pointcloud import PointCloud
from . import elevation

FREE = jnp.int8(0)
LETHAL = jnp.int8(100)
UNKNOWN = jnp.int8(-1)


class Costmap(NamedTuple):
    cost: jax.Array        # (H, W) int8
    origin: jax.Array      # (2,)
    resolution: jax.Array  # ()


@partial(jax.jit, static_argnames=("travers_thresh", "z_thresh"))
def from_elevation(
    m: elevation.ElevationMap,
    feats: elevation.TerrainFeatures,
    travers_thresh: float = 0.4,   # reference launch default
    z_thresh: float = 1.5,         # obstacle height gate
    ref_height: float = 0.0,
) -> Costmap:
    """Threshold terrain layers into costs (`pointMap_layer.cpp:119-126`:
    lethal where travers < travers_thresh or z > z_thresh)."""
    lethal = (feats.traversability < travers_thresh) | (
        (m.height - ref_height) > z_thresh
    )
    cost = jnp.where(
        m.valid, jnp.where(lethal, LETHAL, FREE), UNKNOWN
    ).astype(jnp.int8)
    return Costmap(cost=cost, origin=m.origin, resolution=m.resolution)


@partial(jax.jit, static_argnames=("size",))
def rasterize_cloud(
    cloud: PointCloud,
    traversability: jax.Array,
    origin: jax.Array,
    resolution: float,
    size: int,
    travers_thresh: float = 0.4,
    z_thresh: float = 1.5,
) -> Costmap:
    """Mark costs straight from a merged elevation cloud with per-point
    traversability (the global manager publishes exactly that cloud;
    the costmap node re-bins it — `pointMap_layer.cpp:84-127`)."""
    ij = jnp.floor((cloud.xyz[:, :2] - origin) / resolution).astype(jnp.int32)
    inb = (
        cloud.mask
        & (ij[:, 0] >= 0) & (ij[:, 0] < size)
        & (ij[:, 1] >= 0) & (ij[:, 1] < size)
    )
    flat = jnp.where(inb, ij[:, 0] * size + ij[:, 1], size * size)
    lethal_pt = (traversability < travers_thresh) | (cloud.xyz[:, 2] > z_thresh)
    seen = jnp.zeros((size * size + 1,), bool).at[flat].max(inb)
    lethal = jnp.zeros((size * size + 1,), bool).at[flat].max(inb & lethal_pt)
    cost = jnp.where(
        seen[:-1], jnp.where(lethal[:-1], LETHAL, FREE), UNKNOWN
    ).astype(jnp.int8)
    return Costmap(
        cost=cost.reshape(size, size),
        origin=jnp.asarray(origin, jnp.float32),
        resolution=jnp.float32(resolution),
    )


def inflate(cm: Costmap, radius_cells: int = 2) -> Costmap:
    """Binary obstacle inflation (move_base's inflation layer, reduced
    to a max filter)."""
    lethal = cm.cost == LETHAL
    for _ in range(radius_cells):
        lethal = elevation._dilate3(lethal.astype(jnp.float32)) > 0
    cost = jnp.where(lethal, LETHAL, cm.cost).astype(jnp.int8)
    return cm._replace(cost=cost)
