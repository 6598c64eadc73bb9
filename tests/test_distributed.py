import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.backend import chordal, distributed, factor_graph as fg
from mr_slam_tpu.geometry import se3
from tests.test_backend import ate_rmse, build_circle_graph


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    return jax.make_mesh((8,), (distributed.AXIS,))


class TestDistributedPGO:
    def test_matches_centralized(self, mesh):
        g, true, noisy = build_circle_graph(n=40)
        anchors = jnp.zeros((g.node_capacity,), bool).at[0].set(True)
        central = chordal.optimize(g, anchors)
        dist = distributed.optimize(g, anchors, mesh)
        np.testing.assert_allclose(dist.t, central.t, atol=1e-2)
        np.testing.assert_allclose(dist.R, central.R, atol=1e-2)

    def test_improves_ate(self, mesh):
        g, true, noisy = build_circle_graph(n=40)
        anchors = jnp.zeros((g.node_capacity,), bool).at[0].set(True)
        opt = distributed.optimize(g, anchors, mesh)
        assert ate_rmse(opt.t[:40], true.t) < ate_rmse(noisy.t, true.t) * 0.5

    def test_edge_sharding_pads(self):
        g = fg.init(8, 10)  # 10 edges not divisible by 8
        g2 = distributed.shard_edges(g, 8)
        assert g2.edge_i.shape[0] % 8 == 0
        assert g2.node_robot.shape[0] == 8
