"""M2DP global descriptor — multiview 2D projection signature.

Re-design of `LoopDetection/src/RING_ros/pr_methods/M2DP.py` (He et al.
2016): project the (centered, PCA-aligned) cloud onto J view planes
spanned by azimuth/elevation samples; per view build a polar occupancy
signature (L rings x T sectors); the descriptor is the left/right
singular-vector pair of the J x (L*T) signature matrix. Batched: the
per-view projection is one einsum, the histogram one scatter.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import linalg3
from ..ops.pointcloud import PointCloud


def projection_basis(dirs: jax.Array):
    """Per-view in-plane basis (ex, ey) orthogonal to each view
    direction. Near-vertical views (dir ~ +-z, where cross(dir, z)
    degenerates) fall back to cross(dir, x), normalized PER ROW."""
    ref = jnp.array([0.0, 0.0, 1.0])
    ex = jnp.cross(dirs, ref)
    ex_n = jnp.linalg.norm(ex, axis=-1, keepdims=True)
    alt = jnp.cross(dirs, jnp.array([1.0, 0.0, 0.0]))
    alt_n = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    ex = jnp.where(ex_n > 1e-3, ex / jnp.maximum(ex_n, 1e-9),
                   alt / jnp.maximum(alt_n, 1e-9))
    ey = jnp.cross(dirs, ex)
    return ex, ey


@partial(jax.jit, static_argnames=("n_azimuth", "n_elevation", "n_rings", "n_sectors"))
def describe(
    pc: PointCloud,
    n_azimuth: int = 4,
    n_elevation: int = 16,
    n_rings: int = 8,
    n_sectors: int = 16,
    r_max: float = 80.0,
) -> jax.Array:
    """Returns the M2DP descriptor: concat(u1, v1) of the SVD of the
    (J, L*T) view-signature matrix — dimension J + L*T."""
    w = pc.mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pc.xyz * w[:, None], axis=0) / n
    centered = (pc.xyz - mean) * w[:, None]
    # PCA alignment (x = principal axis)
    cov = centered.T @ centered / n
    _, V = linalg3.eigh3(cov[None])
    axes = V[0][:, ::-1]  # descending eigenvalue order
    pts = centered @ axes
    # view directions
    az = jnp.linspace(0.0, jnp.pi, n_azimuth, endpoint=False)
    el = jnp.linspace(0.0, jnp.pi / 2, n_elevation, endpoint=False)
    azg, elg = jnp.meshgrid(az, el, indexing="ij")
    dirs = jnp.stack(
        [jnp.cos(elg) * jnp.cos(azg), jnp.cos(elg) * jnp.sin(azg), jnp.sin(elg)],
        axis=-1,
    ).reshape(-1, 3)  # (J, 3)
    J = dirs.shape[0]
    ex, ey = projection_basis(dirs)
    px = jnp.einsum("jd,nd->jn", ex, pts)  # (J, N)
    py = jnp.einsum("jd,nd->jn", ey, pts)
    r = jnp.sqrt(px**2 + py**2)
    theta = jnp.arctan2(py, px)
    # sqrt-spaced rings (reference uses increasing-area bins)
    ri = jnp.clip(
        (jnp.sqrt(jnp.minimum(r / r_max, 1.0)) * n_rings).astype(jnp.int32),
        0, n_rings - 1,
    )
    ti = jnp.clip(
        ((theta + jnp.pi) / (2 * jnp.pi) * n_sectors).astype(jnp.int32),
        0, n_sectors - 1,
    )
    flat = ri * n_sectors + ti  # (J, N)
    sig = jnp.zeros((J, n_rings * n_sectors), jnp.float32)
    jidx = jnp.broadcast_to(jnp.arange(J)[:, None], flat.shape)
    sig = sig.at[jidx.reshape(-1), flat.reshape(-1)].add(
        jnp.broadcast_to(w[None, :], flat.shape).reshape(-1)
    )
    sig = sig / n
    U, S, Vt = jnp.linalg.svd(sig, full_matrices=False)
    d = jnp.concatenate([U[:, 0], Vt[0, :]])
    # sign canonicalization
    return d * jnp.sign(jnp.sum(d) + 1e-9)
