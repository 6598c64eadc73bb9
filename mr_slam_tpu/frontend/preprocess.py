"""Sensor preprocessing: lidar-model handlers, ring/time assignment,
range-image projection, motion undistortion.

Re-designs the reference's two preprocessing front doors as array ops:

- A-LOAM `scanRegistration.cpp:171-259` — ring assignment by vertical
  angle for Velodyne 16/32/64 and Ouster-64, per-point relative sweep
  time from azimuth (the sequential `halfPassed` walk becomes a single
  vectorised phase unwrap).
- FAST-LIO `preprocess.cpp:69,166,261` — LID_TYPE handlers (AVIA /
  VELO16 / OUST64): blind-zone filtering, point skipping, per-point
  timestamps (Livox supplies offsets; Velodyne/Ouster derive from
  azimuth).

Everything is fixed-shape: unordered (N, 3) clouds scatter into a
(rings x azimuth) range image that feeds `ops/features.extract`, and
the constant-velocity undistortion mirrors A-LOAM `TransformToStart`
(`laserOdometry.cpp:112-123`, slerp by point time) without the
quaternion slerp — SO(3) log/exp scaling is exact for the same task.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3, so3
from ..ops import pointcloud as pcl


class LidarModel(NamedTuple):
    """Static spinning-lidar geometry. Angles in degrees."""

    n_rings: int
    fov_up: float
    fov_down: float
    blind: float = 0.5       # drop points closer than this (m)
    max_range: float = 150.0
    scan_period: float = 0.1  # seconds per sweep


# Presets mirroring the reference's supported sensors
# (`scanRegistration.cpp:171-224`, `preprocess.cpp` LID_TYPE table).
VLP16 = LidarModel(n_rings=16, fov_up=15.0, fov_down=-15.0)
HDL32 = LidarModel(n_rings=32, fov_up=10.67, fov_down=-30.67)
HDL64 = LidarModel(n_rings=64, fov_up=2.0, fov_down=-24.33)
OS1_64 = LidarModel(n_rings=64, fov_up=16.6, fov_down=-16.6, blind=1.0)
# Livox AVIA: non-repetitive pattern; ring = line id from the driver,
# time = per-point offset. 6 "lines" is the driver's convention.
AVIA = LidarModel(n_rings=6, fov_up=38.4, fov_down=-38.4, blind=1.0)


def vertical_angles(xyz: jax.Array) -> jax.Array:
    """Elevation angle in degrees per point (N,)."""
    r_xy = jnp.linalg.norm(xyz[..., :2], axis=-1)
    return jnp.degrees(jnp.arctan2(xyz[..., 2], jnp.maximum(r_xy, 1e-9)))


def assign_rings(xyz: jax.Array, model: LidarModel):
    """Ring index by vertical angle (`scanRegistration.cpp:171-224`).

    Velodyne-16 maps `(angle + 15) / 2`; HDL-64 uses a non-uniform
    piecewise map (upper block 1/3 deg, lower block 1/2 deg); the
    general linear map below reproduces both to the nearest ring for
    the uniform sensors and is the Ouster convention. Returns
    (ring (N,) int32, valid (N,) bool) — out-of-FOV points are invalid.
    """
    ang = vertical_angles(xyz)
    span = model.fov_up - model.fov_down
    frac = (ang - model.fov_down) / span
    ring = jnp.round(frac * (model.n_rings - 1)).astype(jnp.int32)
    valid = (ang >= model.fov_down - 1e-3) & (ang <= model.fov_up + 1e-3)
    return jnp.clip(ring, 0, model.n_rings - 1), valid


def azimuth(xyz: jax.Array) -> jax.Array:
    """Clockwise sweep angle in [0, 2pi) matching the reference's
    `-atan2(y, x)` orientation convention (`scanRegistration.cpp:231`)."""
    return jnp.mod(-jnp.arctan2(xyz[..., 1], xyz[..., 0]), 2.0 * jnp.pi)


def relative_times(xyz: jax.Array, model: LidarModel, start_azimuth=None):
    """Per-point relative sweep time (N,) in [0, scan_period].

    The reference walks points sequentially flipping a `halfPassed`
    flag (`scanRegistration.cpp:228-259`); with an unordered array the
    same quantity is the azimuth phase measured from the sweep start,
    unwrapped once: t = period * ((phi - phi0) mod 2pi) / 2pi.
    """
    phi = azimuth(xyz)
    phi0 = phi[..., 0] if start_azimuth is None else start_azimuth
    rel = jnp.mod(phi - phi0[..., None] if jnp.ndim(phi0) else phi - phi0,
                  2.0 * jnp.pi)
    return model.scan_period * rel / (2.0 * jnp.pi)


def blind_filter(pc: pcl.PointCloud, model: LidarModel) -> pcl.PointCloud:
    """Drop points in the blind zone or beyond max range
    (`preprocess.cpp` blind handling)."""
    r = jnp.linalg.norm(pc.xyz, axis=-1)
    keep = pc.mask & (r > model.blind) & (r < model.max_range)
    return pcl.park(pcl.PointCloud(pc.xyz, keep))


def point_skip(pc: pcl.PointCloud, every: int) -> pcl.PointCloud:
    """Keep every k-th valid slot (`point_filter_num` decimation)."""
    if every <= 1:
        return pc
    idx = jnp.arange(pc.capacity)
    return pcl.park(pcl.PointCloud(pc.xyz, pc.mask & (idx % every == 0)))


@partial(jax.jit, static_argnames=("model", "n_azimuth"))
def to_range_image(pc: pcl.PointCloud, model: LidarModel, n_azimuth: int = 1024):
    """Scatter an unordered cloud into a (rings, n_azimuth) range image.

    Output feeds `ops/features.extract` (which expects ring-major
    (R, A, 3) + hit mask); ties keep the nearer return (scatter-min on
    range), matching how a real spinning sensor reports first returns.
    Also returns per-cell relative time for undistortion.
    """
    ring, rv = assign_rings(pc.xyz, model)
    phi = azimuth(pc.xyz)
    # round-to-nearest bin centre with wraparound: truncation would make
    # points sitting exactly on bin boundaries (every point of a real
    # spinning sensor, whose azimuths ARE a regular grid) straddle two
    # bins from float error and collide/hole out ~half the image
    col = jnp.mod(
        jnp.round(phi / (2.0 * jnp.pi) * n_azimuth).astype(jnp.int32), n_azimuth
    )
    rng = jnp.linalg.norm(pc.xyz, axis=-1)
    valid = pc.mask & rv & (rng > model.blind) & (rng < model.max_range)
    flat = ring * n_azimuth + col
    flat = jnp.where(valid, flat, model.n_rings * n_azimuth)  # park
    size = model.n_rings * n_azimuth

    # nearest return wins: scatter-min range, then points whose range
    # equals the cell minimum write their coordinates (last writer of
    # the minimal set wins — deterministic under XLA's scatter order
    # is not required; any minimal-range point is acceptable)
    best = jnp.full((size + 1,), jnp.inf, jnp.float32).at[flat].min(
        jnp.where(valid, rng, jnp.inf)
    )
    winner = valid & (rng <= best[flat] + 1e-6)
    img = jnp.full((size + 1, 3), pcl.SENTINEL, jnp.float32).at[
        jnp.where(winner, flat, size)
    ].set(pc.xyz)
    t_rel = model.scan_period * phi / (2.0 * jnp.pi)
    times = jnp.zeros((size + 1,), jnp.float32).at[
        jnp.where(winner, flat, size)
    ].set(t_rel)
    hit = jnp.zeros((size + 1,), bool).at[jnp.where(winner, flat, size)].set(
        True
    ).at[size].set(False)
    R, A = model.n_rings, n_azimuth
    return img[:size].reshape(R, A, 3), hit[:size].reshape(R, A), times[
        :size
    ].reshape(R, A)


def undistort_constant_velocity(
    pc: pcl.PointCloud,
    t_rel: jax.Array,
    delta: se3.Pose,
    scan_period: float,
) -> pcl.PointCloud:
    """A-LOAM `TransformToStart` (`laserOdometry.cpp:112-123`): re-express
    each point at its capture time into the sweep-start frame, assuming
    constant velocity over the sweep described by `delta` (the pose of
    sweep end in sweep start). slerp(I -> delta, s = t/period) realised
    as scaled SO(3)/R^3 log-exp."""
    s = jnp.clip(t_rel / scan_period, 0.0, 1.0)
    w = so3.log(delta.R)
    R_s = so3.exp(s[..., None] * w)          # (N, 3, 3)
    t_s = s[..., None] * delta.t
    xyz = jnp.einsum("nij,nj->ni", R_s, pc.xyz) + t_s
    return pcl.park(pcl.PointCloud(xyz, pc.mask))


def livox_preprocess(
    xyz: jax.Array,
    offset_time: jax.Array,
    line: jax.Array,
    model: LidarModel = AVIA,
    skip: int = 1,
):
    """LID_TYPE=AVIA handler (`preprocess.cpp:69-165`): the driver
    supplies per-point time offsets (s) and line ids; apply blind-zone +
    decimation and return (cloud, t_rel, ring)."""
    pc = pcl.make(xyz)
    pc = blind_filter(pc, model)
    pc = point_skip(pc, skip)
    return pc, offset_time, jnp.clip(line.astype(jnp.int32), 0, model.n_rings - 1)
