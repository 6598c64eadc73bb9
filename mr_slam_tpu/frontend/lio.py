"""FAST-LIO2-style lidar-inertial odometry, TPU-native.

Re-design of `Localization/src/FAST_LIO` (SURVEY.md §2.5): the reference
runs a 23-state manifold iterated error-state EKF (IKFoM) whose
measurement model is an OpenMP loop of per-point ikd-tree 5-NN plane
residuals (`laserMapping.cpp:634-766`), IMU forward-propagation +
backward undistortion (`IMU_Processing.hpp:65`), and ikd-tree insertion.

The TPU formulation is a 15-dof error-state filter
dx = [dphi, dp, dv, dbg, dba] (left/world-frame rotation perturbation
R_true = exp(dphi) R_hat; gravity is estimated once at rest by
`imu_init` — the reference's `IMU_init`, `IMU_Processing.hpp:64` — and
held fixed, dropping IKFoM's S2 gravity manifold refinement):

  * `propagate` integrates the IMU packet with a per-sample first-order
    covariance propagation P <- F P F^T + Q (a `lax.scan` of 15x15
    matmuls — free next to the point kernels);
  * `update` runs the iterated measurement update as MAP Gauss-Newton
    with the propagated prior:  ||dx||^2_{P^-1} + sum_i ||h_i||^2_R.
    Point-to-plane residuals touch only (R, p); velocity and the biases
    correct through the prior cross-covariances built during
    propagation (the same mechanism as the IKFoM update), and the
    posterior covariance contracts to (J^T W J + P^-1)^-1 — the
    information-form (I - KH) P.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3, so3
from ..geometry.se3 import Pose
from ..ops import linalg3, pointcloud as pcl, voxel_grid
from ..precision import accurate

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
    grav: jax.Array   # (3,) gravity vector, world frame
    P: jax.Array      # (15, 15) error covariance [dphi, dp, dv, dbg, dba]
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
    gyro_noise: float = 1e-3       # PSD (rad^2/s)
    acc_noise: float = 1e-2        # PSD (m^2/s^3)
    bias_rw: float = 1e-5          # bias random-walk PSD
    lidar_noise: float = 0.05      # per-residual std (m)


def init(config: LioConfig, origin: Pose | None = None) -> LioState:
    if origin is None:
        origin = se3.identity()
    P0 = jnp.eye(15) * 1e-2
    # biases start uncertain so the update can pull them in
    P0 = P0.at[9:15, 9:15].set(jnp.eye(6) * 1e-3)
    return LioState(
        R=origin.R, p=origin.t, v=jnp.zeros(3), bg=jnp.zeros(3), ba=jnp.zeros(3),
        grav=GRAVITY,
        P=P0,
        grid=voxel_grid.empty(config.map_leaf, config.table_size),
        frame=jnp.int32(0),
    )


@accurate
@jax.jit
def imu_init(state: LioState, imu: ImuSample) -> LioState:
    """Static initialization from a rest prefix (`IMU_init`,
    `IMU_Processing.hpp:64`): the gyro mean is the gyro bias; the accel
    mean direction aligns gravity (magnitude pinned to 9.81 — the
    reference scales `G_m_s2 / mean_acc.norm()`); accel bias along
    gravity is unobservable at rest and stays zero."""
    w = imu.dt / jnp.maximum(jnp.sum(imu.dt), 1e-9)
    gyro_mean = jnp.sum(imu.gyro * w[:, None], axis=0)
    acc_mean = jnp.sum(imu.acc * w[:, None], axis=0)
    # at rest: f_body = -R^T g  =>  g = -R f_mean, rescaled to 9.81
    g_dir = -(state.R @ acc_mean)
    g = g_dir * (9.81 / jnp.maximum(jnp.linalg.norm(g_dir), 1e-9))
    return state._replace(bg=gyro_mean, grav=g)


@accurate
def propagate(state: LioState, imu: ImuSample, config: LioConfig):
    """Forward-propagate mean and covariance through an IMU packet
    (`ImuProcess::Process` forward pass). imu leaves have leading time
    axis. Returns (state', per-sample poses for undistortion).

    Covariance: per-sample first-order error-state transition
      dphi' = dphi - R' dbg dt
      dp'   = dp + dv dt
      dv'   = dv - [R (a - ba)]x dphi dt - R dba dt
    (left perturbation; biases random-walk), P <- F P F^T + Q."""
    I3 = jnp.eye(3)

    def step(carry, s):
        R, p, v, P = carry
        w = s.gyro - state.bg
        a = s.acc - state.ba
        dR = so3.exp(w * s.dt)
        R_new = R @ dR
        acc_w = R @ a + state.grav
        p_new = p + v * s.dt + 0.5 * acc_w * s.dt**2
        v_new = v + acc_w * s.dt
        dt = s.dt
        F = jnp.eye(15)
        F = F.at[0:3, 9:12].set(-R_new * dt)
        F = F.at[3:6, 6:9].set(I3 * dt)
        F = F.at[6:9, 0:3].set(-so3.hat(R @ a) * dt)
        F = F.at[6:9, 12:15].set(-R * dt)
        qd = jnp.concatenate([
            jnp.full(3, config.gyro_noise * dt),
            jnp.full(3, 1e-8 * dt),
            jnp.full(3, config.acc_noise * dt),
            jnp.full(6, config.bias_rw * dt),
        ])
        P_new = F @ P @ F.T + jnp.diag(qd)
        return (R_new, p_new, v_new, P_new), (R_new, p_new)

    (R, p, v, P), (Rs, ps) = jax.lax.scan(
        step, (state.R, state.p, state.v, state.P), imu
    )
    new_state = state._replace(R=R, p=p, v=v, P=0.5 * (P + P.T))
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


@accurate
@partial(jax.jit, static_argnames=("config",))
def update(state: LioState, scan_ds: pcl.PointCloud, config: LioConfig):
    """Iterated measurement update — MAP Gauss-Newton with the
    propagated prior over the FULL 15-dof error state.

    Residuals: point-to-plane against the map with pooled-moment planes.
    They constrain (dphi, dp) directly; (dv, dbg, dba) move through the
    prior cross-covariances (how the IKFoM update corrects biases).
    Posterior covariance contracts to (J^T W J + P^-1)^-1."""
    P = state.P + 1e-9 * jnp.eye(15)
    Pinv = jnp.linalg.inv(P)
    w_meas = 1.0 / (config.lidar_noise**2)

    def body(carry, _):
        R, p, v, bg, ba = carry
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
        J = jnp.concatenate([jnp.cross(rot_pt, n), n], axis=-1)  # (N, 6)
        JtWJ = jnp.einsum("ni,nj,n->ij", J, J, w)
        H = Pinv.at[0:6, 0:6].add(JtWJ)
        # prior residual: accumulated deviation from the propagated state
        x_prior = jnp.concatenate([
            so3.log(R @ state.R.T), p - state.p, v - state.v,
            bg - state.bg, ba - state.ba,
        ])
        b = (
            -jnp.concatenate([jnp.einsum("ni,n,n->i", J, r, w), jnp.zeros(9)])
            - Pinv @ x_prior
        )
        dx = linalg3.solve_psd(H + 1e-8 * jnp.eye(15), b)
        R_new = so3.exp(dx[0:3]) @ R
        return (
            (R_new, p + dx[3:6], v + dx[6:9], bg + dx[9:12], ba + dx[12:15]),
            (jnp.sum(ok), H),
        )

    (R, p, v, bg, ba), (inliers, Hs) = jax.lax.scan(
        body, (state.R, state.p, state.v, state.bg, state.ba), None,
        length=config.iters,
    )
    # information-form covariance contraction at the converged estimate
    P_post = jnp.linalg.inv(Hs[-1] + 1e-8 * jnp.eye(15))
    P_post = 0.5 * (P_post + P_post.T)
    state2 = state._replace(R=R, p=p, v=v, bg=bg, ba=ba, P=P_post)
    return state2, inliers[-1]


@accurate
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
    fine = pcl.voxel_downsample(
        und, config.insert_leaf, config.insert_capacity,
        bounds=((-150.0, -150.0, -150.0), (150.0, 150.0, 150.0)),
    )
    world = pcl.transform(fine, Pose(state.R, state.p))
    grid = voxel_grid.insert(state.grid, world)
    grid = voxel_grid.decay(grid, state.p, config.map_radius)
    state = state._replace(grid=grid, frame=state.frame + 1)
    return state, inliers
