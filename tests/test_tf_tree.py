import numpy as np
import pytest

from mr_slam_tpu.geometry import tf_tree


def rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


class TestTransformBuffer:
    def test_single_edge_interpolation(self):
        buf = tf_tree.TransformBuffer()
        buf.set_transform("map", "odom", 0.0, np.eye(3), np.zeros(3))
        buf.set_transform("map", "odom", 1.0, rot_z(np.pi / 2), np.array([2.0, 0, 0]))
        R, t = buf.lookup("map", "odom", 0.5)
        np.testing.assert_allclose(R, rot_z(np.pi / 4), atol=1e-9)
        np.testing.assert_allclose(t, [1.0, 0, 0], atol=1e-9)
        # clamping outside the buffer
        R, t = buf.lookup("map", "odom", 5.0)
        np.testing.assert_allclose(t, [2.0, 0, 0], atol=1e-12)

    def test_chain_and_inverse(self):
        buf = tf_tree.TransformBuffer()
        # map <- odom <- base: composed lookup and reversed lookup
        buf.set_transform("map", "odom", 0.0, rot_z(np.pi / 2), np.array([1.0, 0, 0]))
        buf.set_transform("odom", "base", 0.0, np.eye(3), np.array([0.0, 3.0, 0]))
        R, t = buf.lookup("map", "base", 0.0)
        # x_map = Rz90 @ (x_base + [0,3,0]) + [1,0,0]
        np.testing.assert_allclose(R, rot_z(np.pi / 2), atol=1e-12)
        np.testing.assert_allclose(t, [1.0 - 3.0, 0.0, 0.0], atol=1e-12)
        Ri, ti = buf.lookup("base", "map", 0.0)
        np.testing.assert_allclose(Ri @ R, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(Ri @ t + ti, 0.0, atol=1e-12)

    def test_disconnected_and_unknown(self):
        buf = tf_tree.TransformBuffer()
        buf.set_transform("map", "odom", 0.0, np.eye(3), np.zeros(3))
        buf.set_transform("a", "b", 0.0, np.eye(3), np.zeros(3))
        assert buf.can_transform("map", "odom")
        assert not buf.can_transform("map", "b")
        with pytest.raises(LookupError):
            buf.lookup("map", "b", 0.0)
        with pytest.raises(LookupError):
            buf.lookup("map", "nope", 0.0)

    def test_out_of_order_insert(self):
        buf = tf_tree.TransformBuffer()
        buf.set_transform("map", "odom", 2.0, np.eye(3), np.array([2.0, 0, 0]))
        buf.set_transform("map", "odom", 0.0, np.eye(3), np.zeros(3))
        _, t = buf.lookup("map", "odom", 1.0)
        np.testing.assert_allclose(t, [1.0, 0, 0], atol=1e-12)

    def test_publish_map_to_odom(self):
        buf = tf_tree.TransformBuffer()
        T = np.eye(4)
        T[:3, :3] = rot_z(0.3)
        T[:3, 3] = [1.0, 2.0, 0.5]
        tf_tree.publish_map_to_odom(buf, 2, T, 1.5)
        R, t = buf.lookup("map", "robot_2/odom", 1.5)
        np.testing.assert_allclose(R, T[:3, :3], atol=1e-9)
        np.testing.assert_allclose(t, T[:3, 3], atol=1e-12)

    def test_quat_roundtrip_random(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            w = rng.normal(size=3)
            # rotation via Rodrigues
            a = np.linalg.norm(w)
            if a < 1e-9:
                continue
            k = w / a
            K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
            R = np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)
            q = tf_tree._quat_from_R(R)
            np.testing.assert_allclose(tf_tree._R_from_quat(q), R, atol=1e-9)
