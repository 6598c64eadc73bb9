import jax
import jax.numpy as jnp
import numpy as np

from mr_slam_tpu.loop import bev, disco, disco_net
from tests.test_loop import scene_cloud


def _bev(**kw):
    return bev.polar_occupancy(scene_cloud(**kw), 40, 120, z_bins=8)


class TestDiscoNet:
    def test_forward_shape_and_norm(self):
        model = disco_net.DiscoNet(base=4)
        b = _bev()
        params = model.init(jax.random.PRNGKey(0), b)
        sig = model.apply(params, b)
        assert sig.shape == (1024,)
        np.testing.assert_allclose(float(jnp.linalg.norm(sig)), 1.0, atol=1e-4)

    def test_rotation_invariance_of_untrained_net(self):
        """FFT-magnitude head keeps approximate rotation invariance even
        with random conv weights (equivariant-ish conv + |FFT|)."""
        model = disco_net.DiscoNet(base=4)
        b0 = _bev(yaw=0.0)
        b1 = _bev(yaw=0.7)
        b2 = _bev(offset=(30.0, 25.0))
        params = model.init(jax.random.PRNGKey(0), b0)
        s0 = model.apply(params, b0)
        s1 = model.apply(params, b1)
        s2 = model.apply(params, b2)
        assert float(jnp.linalg.norm(s0 - s1)) < float(jnp.linalg.norm(s0 - s2))

    def test_training_reduces_loss(self):
        model = disco_net.DiscoNet(base=4)
        anchor = _bev(offset=(0.0, 0.0))
        pos = _bev(offset=(1.0, 0.5))
        negs = jnp.stack([_bev(offset=(30.0, 25.0)), _bev(offset=(-25.0, 20.0))])
        other = _bev(offset=(20.0, -30.0))
        state, tx = disco_net.create_train_state(
            jax.random.PRNGKey(1), model, anchor, lr=1e-3
        )
        losses = []
        for _ in range(8):
            state, loss = disco_net.train_step(
                state, model, tx, anchor, pos, negs, other
            )
            losses.append(float(loss))
        assert losses[-1] <= losses[0], losses

    def test_quadruplet_loss_zero_when_separated(self):
        a = jnp.zeros(8).at[0].set(1.0)
        p = a
        n = jnp.zeros((2, 8)).at[:, 1].set(5.0)
        on = jnp.zeros(8).at[2].set(5.0)
        loss = disco_net.quadruplet_loss(a, p, n, on)
        assert float(loss) == 0.0
