"""Pallas VGICP kernel vs XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.geometry import Pose, se3, so3
from mr_slam_tpu.ops import linalg3, pallas_vgicp, pointcloud as pcl, voxel_grid
from tests.test_registration import make_structured_cloud


def xla_reference(tp, mask, grid, eps=1e-6, max_corr=1.0):
    """Same math as the kernel, straightforward XLA."""
    found, cnt, mu, Cv = voxel_grid.lookup(grid, tp, "direct1")
    found, mu, Cv = found[:, 0], mu[:, 0], Cv[:, 0]
    r = mu - tp
    d2 = jnp.sum(r * r, axis=-1)
    w = (found & mask & (d2 < max_corr**2)).astype(jnp.float32)
    # same relative PSD det floor as the production accumulators
    # (registration._gn_terms_from_rows / the pallas kernel): degenerate
    # cells are dropped, not inverted
    C = Cv + eps * jnp.eye(3)
    det = linalg3.det3(C)
    floor = jnp.maximum(1e-5 * C[:, 0, 0] * C[:, 1, 1] * C[:, 2, 2], 1e-12)
    w = w * (det > floor).astype(jnp.float32)
    W = linalg3.inv3(C) * w[:, None, None]
    hat = jnp.stack(
        [
            jnp.stack([jnp.zeros_like(tp[:, 0]), -tp[:, 2], tp[:, 1]], -1),
            jnp.stack([tp[:, 2], jnp.zeros_like(tp[:, 0]), -tp[:, 0]], -1),
            jnp.stack([-tp[:, 1], tp[:, 0], jnp.zeros_like(tp[:, 0])], -1),
        ],
        axis=-2,
    )
    J = jnp.concatenate([-jnp.broadcast_to(jnp.eye(3), hat.shape), hat], axis=-1)
    WJ = jnp.einsum("nij,njk->nik", W, J)
    H = jnp.einsum("nij,nik->jk", J, WJ)
    b = -jnp.einsum("nij,ni->j", WJ, r)
    cost = jnp.sum(jnp.einsum("ni,nij,nj->n", r, W, r))
    return H, b, cost, jnp.sum(w)


@pytest.fixture(scope="module")
def setup():
    target = make_structured_cloud(jax.random.PRNGKey(3))
    # production configuration: plane-regularized cells (unregularized
    # 1-point cells have near-singular covariances whose ~1/eps inverse
    # weights amplify f32 summation-order noise into the comparison)
    grid = voxel_grid.build(target, 0.5, 1 << 13, min_points=3, regularize="plane")
    pose = Pose(so3.exp(jnp.array([0.01, -0.02, 0.05])), jnp.array([0.2, -0.1, 0.05]))
    source = pcl.transform(target, se3.inverse(pose))
    tp = se3.apply(pose, source.xyz)
    N = tp.shape[0]
    pad = (-N) % pallas_vgicp.BLK
    tp = jnp.pad(tp, ((0, pad), (0, 0)))
    mask = jnp.pad(source.mask, (0, pad))
    return tp, mask, grid, source, target, pose


class TestKernelMath:
    def test_matches_xla_reference(self, setup):
        tp, mask, grid, *_ = setup
        H, b, cost, n = pallas_vgicp.gn_accumulate(
            tp, mask, grid.packed, grid.leaf, interpret=True
        )
        H2, b2, cost2, n2 = xla_reference(tp, mask, grid)
        assert float(n) == float(n2), (float(n), float(n2))
        np.testing.assert_allclose(np.asarray(H), np.asarray(H2), rtol=2e-3, atol=1e-3)
        # b entries are small cancellations of ~1e3-magnitude terms;
        # f32 summation order alone moves them by a few percent
        np.testing.assert_allclose(np.asarray(b), np.asarray(b2), rtol=1e-2, atol=0.1)
        np.testing.assert_allclose(float(cost), float(cost2), rtol=1e-3)

    def test_full_registration_converges(self, setup):
        *_, source, target, pose = setup
        grid = voxel_grid.build(target, 0.5, 1 << 13, min_points=3, regularize="plane")
        res = pallas_vgicp.vgicp(
            source, grid, se3.identity(), iters=20, interpret=True
        )
        np.testing.assert_allclose(np.asarray(res.pose.t), np.asarray(pose.t), atol=0.05)
        np.testing.assert_allclose(
            np.asarray(so3.log(res.pose.R @ pose.R.T)), 0.0, atol=0.02
        )
