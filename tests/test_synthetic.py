import jax
import jax.numpy as jnp
import numpy as np

from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.geometry import se3


class TestWorld:
    def test_scan_shapes_and_hits(self):
        world = synthetic.default_world(0)
        pose = se3.identity()
        xyz, rng, hit = synthetic.scan(world, pose, n_rings=16, n_azimuth=256)
        assert xyz.shape == (16, 256, 3)
        # a ground-level sensor in a walled courtyard hits plenty
        assert float(jnp.mean(hit)) > 0.5

    def test_ground_hits_at_z_zero(self):
        world = synthetic.World(jnp.zeros((1, 2, 3)))  # no boxes
        pose = se3.identity()
        xyz, rng, hit = synthetic.scan(world, pose, n_rings=16, n_azimuth=128, noise=0.0)
        pts = np.asarray(xyz[np.asarray(hit)])
        # body frame is anchored at the robot base: ground is z ~= 0
        np.testing.assert_allclose(pts[:, 2], 0.0, atol=1e-3)

    def test_scan_consistency_across_poses(self):
        """The same world point seen from two poses maps to the same
        world coordinate."""
        world = synthetic.default_world(1)
        p1 = se3.identity()
        from mr_slam_tpu.geometry import so3
        p2 = se3.Pose(so3.yaw_rot(jnp.array(0.3)), jnp.array([1.0, 0.5, 0.0]))
        for p in (p1, p2):
            xyz, _, hit = synthetic.scan(world, p, n_rings=8, n_azimuth=64, noise=0.0)
            wpts = se3.apply(p, xyz.reshape(-1, 3))
            m = np.asarray(hit).reshape(-1)
            # world z of hits is in [0, max building height]
            z = np.asarray(wpts)[m][:, 2]
            assert z.min() > -0.1 and z.max() < 10.0

    def test_circle_trajectory_loops(self):
        traj = synthetic.circle_trajectory(100, radius=20.0, laps=1.1)
        # end revisits start region
        d = jnp.linalg.norm(traj.t[-1] - traj.t[0])
        assert float(d) < 2 * np.pi * 20 * 0.15

    def test_multi_robot_shapes(self):
        trajs = synthetic.multi_robot_trajectories(3, 50)
        assert trajs.t.shape == (3, 50, 3)
        assert trajs.R.shape == (3, 50, 3, 3)

    def test_perturb_preserves_start(self):
        traj = synthetic.circle_trajectory(50)
        noisy = synthetic.perturb_trajectory(jax.random.PRNGKey(0), traj)
        np.testing.assert_allclose(noisy.t[0], traj.t[0], atol=1e-6)
        # drift grows but stays bounded for small sigma
        err = jnp.linalg.norm(noisy.t - traj.t, axis=-1)
        assert float(err[-1]) > 0
        assert float(err.max()) < 5.0
