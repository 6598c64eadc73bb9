import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.geometry import Pose, se3, so3


def random_rotations(key, n):
    q = jax.random.normal(key, (n, 4))
    return so3.quat_to_rot(q)


class TestSO3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (64, 3))
        w = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
        for scale in [1e-6, 1e-3, 0.5, 1.5, 3.0]:
            ws = w * scale
            R = so3.exp(ws)
            back = so3.log(R)
            np.testing.assert_allclose(back, ws, atol=5e-3 * max(scale, 1e-2))

    def test_exp_is_rotation(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 3)) * 2.0
        R = so3.exp(w)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)

    def test_log_near_pi(self):
        axis = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        for theta in [np.pi - 1e-4, np.pi]:
            R = so3.exp(axis * theta)
            w = so3.log(R)
            # angle preserved
            np.testing.assert_allclose(
                jnp.linalg.norm(w, axis=-1), theta, atol=1e-3
            )
            # axis preserved up to sign
            R2 = so3.exp(w)
            np.testing.assert_allclose(R2, R, atol=1e-3)

    def test_quat_roundtrip(self):
        R = random_rotations(jax.random.PRNGKey(2), 64)
        q = so3.rot_to_quat(R)
        R2 = so3.quat_to_rot(q)
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_rpy_roundtrip(self):
        rpy = jnp.array([[0.1, -0.2, 0.3], [1.0, 0.5, -2.0]])
        R = so3.rpy_to_rot(rpy)
        np.testing.assert_allclose(so3.rot_to_rpy(R), rpy, atol=1e-5)

    def test_project_restores_orthonormality(self):
        R = random_rotations(jax.random.PRNGKey(3), 16)
        noisy = R + 0.05 * jax.random.normal(jax.random.PRNGKey(4), R.shape)
        P = so3.project(noisy)
        eye = jnp.broadcast_to(jnp.eye(3), P.shape)
        np.testing.assert_allclose(P @ jnp.swapaxes(P, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(P), 1.0, atol=1e-5)
        # projection of an exact rotation is identity
        np.testing.assert_allclose(so3.project(R), R, atol=1e-5)

    def test_yaw_rot(self):
        R = so3.yaw_rot(jnp.array(np.pi / 2))
        v = R @ jnp.array([1.0, 0.0, 0.0])
        np.testing.assert_allclose(v, jnp.array([0.0, 1.0, 0.0]), atol=1e-6)


class TestSE3:
    def _random_pose(self, key, n=()):
        k1, k2 = jax.random.split(key)
        R = so3.quat_to_rot(jax.random.normal(k1, (*n, 4)))
        t = jax.random.normal(k2, (*n, 3)) * 5.0
        return Pose(R, t)

    def test_compose_inverse(self):
        p = self._random_pose(jax.random.PRNGKey(5), (8,))
        ident = se3.compose(p, se3.inverse(p))
        np.testing.assert_allclose(ident.R, jnp.broadcast_to(jnp.eye(3), ident.R.shape), atol=1e-5)
        np.testing.assert_allclose(ident.t, 0.0, atol=1e-5)

    def test_between(self):
        a = self._random_pose(jax.random.PRNGKey(6), (4,))
        b = self._random_pose(jax.random.PRNGKey(7), (4,))
        d = se3.between(a, b)
        np.testing.assert_allclose(se3.compose(a, d).R, b.R, atol=1e-5)
        np.testing.assert_allclose(se3.compose(a, d).t, b.t, atol=1e-5)

    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(8), (32, 6))
        # keep rotation angle below pi (log returns the principal branch)
        xi = xi.at[:, 3:].multiply(0.8)
        p = se3.exp(xi)
        np.testing.assert_allclose(se3.log(p), xi, atol=1e-4, rtol=1e-3)

    def test_matrix_roundtrip(self):
        p = self._random_pose(jax.random.PRNGKey(9), (4,))
        p2 = se3.from_matrix(p.matrix())
        np.testing.assert_allclose(p2.R, p.R, atol=1e-6)
        np.testing.assert_allclose(p2.t, p.t, atol=1e-6)

    def test_apply_matches_matrix(self):
        p = self._random_pose(jax.random.PRNGKey(10))
        pts = jax.random.normal(jax.random.PRNGKey(11), (16, 3))
        out = se3.apply(p, pts)
        hom = jnp.concatenate([pts, jnp.ones((16, 1))], axis=-1)
        expect = (p.matrix() @ hom.T).T[:, :3]
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_interpolate_endpoints(self):
        a = self._random_pose(jax.random.PRNGKey(12))
        b = self._random_pose(jax.random.PRNGKey(13))
        p0 = se3.interpolate(a, b, jnp.array(0.0))
        p1 = se3.interpolate(a, b, jnp.array(1.0))
        np.testing.assert_allclose(p0.t, a.t, atol=1e-4)
        np.testing.assert_allclose(p1.t, b.t, atol=1e-4)
        np.testing.assert_allclose(p1.R, b.R, atol=1e-4)

    def test_jit_compatible(self):
        f = jax.jit(lambda a, b: se3.log(se3.between(a, b)))
        a = self._random_pose(jax.random.PRNGKey(14), (8,))
        b = self._random_pose(jax.random.PRNGKey(15), (8,))
        assert f(a, b).shape == (8, 6)
