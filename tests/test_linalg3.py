import jax
import jax.numpy as jnp
import numpy as np

from mr_slam_tpu.ops import linalg3


def _random_sym(key, n):
    A = jax.random.normal(key, (n, 3, 3))
    return A @ jnp.swapaxes(A, -1, -2) + 0.1 * jnp.eye(3)


class TestInv3:
    def test_inverse(self):
        A = _random_sym(jax.random.PRNGKey(0), 32)
        invA = linalg3.inv3(A)
        np.testing.assert_allclose(
            invA @ A, jnp.broadcast_to(jnp.eye(3), A.shape), atol=1e-3
        )

    def test_det_matches_numpy(self):
        A = jax.random.normal(jax.random.PRNGKey(1), (16, 3, 3))
        np.testing.assert_allclose(
            linalg3.det3(A), np.linalg.det(np.asarray(A)), rtol=1e-4, atol=1e-5
        )

    def test_solve(self):
        A = _random_sym(jax.random.PRNGKey(2), 8)
        b = jax.random.normal(jax.random.PRNGKey(3), (8, 3))
        x = linalg3.solve3(A, b)
        np.testing.assert_allclose(jnp.einsum("nij,nj->ni", A, x), b, atol=1e-3)


class TestEigh3:
    def test_eigvals_match_numpy(self):
        A = _random_sym(jax.random.PRNGKey(4), 64)
        w = linalg3.eigvalsh3(A)
        expect = np.linalg.eigvalsh(np.asarray(A))
        np.testing.assert_allclose(w, expect, rtol=1e-3, atol=1e-3)

    def test_eigvecs(self):
        A = _random_sym(jax.random.PRNGKey(5), 64)
        w, V = linalg3.eigh3(A)
        # A v = lambda v for each column
        Av = jnp.einsum("nij,njk->nik", A, V)
        lv = V * w[:, None, :]
        np.testing.assert_allclose(Av, lv, atol=5e-3)
        # orthonormal columns
        VtV = jnp.einsum("nij,nik->njk", V, V)
        np.testing.assert_allclose(VtV, jnp.broadcast_to(jnp.eye(3), VtV.shape), atol=1e-4)

    def test_degenerate_isotropic(self):
        A = jnp.broadcast_to(2.0 * jnp.eye(3), (4, 3, 3))
        w, V = linalg3.eigh3(A)
        np.testing.assert_allclose(w, 2.0, atol=1e-5)
        VtV = jnp.einsum("nij,nik->njk", V, V)
        np.testing.assert_allclose(VtV, jnp.broadcast_to(jnp.eye(3), VtV.shape), atol=1e-4)

    def test_planar_covariance(self):
        # rank-2 covariance: smallest eigval ~0, eigvec = plane normal z
        pts = jax.random.normal(jax.random.PRNGKey(6), (128, 2))
        xyz = jnp.concatenate([pts, jnp.zeros((128, 1))], axis=-1)
        cov = (xyz.T @ xyz / 128)[None]
        w, V = linalg3.eigh3(cov)
        assert abs(float(w[0, 0])) < 1e-5
        np.testing.assert_allclose(jnp.abs(V[0, :, 0]), [0, 0, 1], atol=1e-4)


class TestPlaneFit:
    def test_recovers_plane(self):
        key = jax.random.PRNGKey(7)
        n_true = jnp.array([0.0, 0.6, 0.8])
        d_true = -2.0  # plane n.x + d = 0
        # sample points on the plane
        basis = jnp.array([[1.0, 0, 0], [0.0, 0.8, -0.6]])
        uv = jax.random.normal(key, (64, 2)) * 3
        origin = -d_true * n_true
        pts = origin + uv @ basis
        pts = pts[None]  # batch of 1
        n, d, mean = linalg3.plane_fit(pts)
        sign = jnp.sign(jnp.dot(n[0], n_true))
        np.testing.assert_allclose(n[0] * sign, n_true, atol=1e-4)
        np.testing.assert_allclose(d[0] * sign, d_true, atol=1e-3)
