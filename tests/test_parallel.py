import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mr_slam_tpu.geometry import Pose, se3
from mr_slam_tpu.parallel import mesh as mesh_lib
from mr_slam_tpu.parallel import store as store_lib


class TestMesh:
    def test_make_mesh_shapes(self):
        m = mesh_lib.make_mesh(4, 2)
        assert m.shape[mesh_lib.ROBOT_AXIS] == 4
        assert m.shape[mesh_lib.SHARD_AXIS] == 2

    def test_too_many_raises(self):
        with pytest.raises(ValueError):
            mesh_lib.make_mesh(16, 16)


class TestStore:
    def _store(self, n_robots=4):
        return store_lib.init(n_robots, kf_capacity=8, points_per_kf=32, desc_dim=16)

    def test_ingest(self):
        s = self._store()
        xyz = jnp.ones((32, 3))
        mask = jnp.ones((32,), bool)
        desc = jnp.arange(16.0)
        s = store_lib.ingest(
            s, jnp.int32(2), xyz, mask, se3.identity(), jnp.float32(1.0), desc
        )
        assert int(s.stores.count[2]) == 1
        assert int(s.stores.count[0]) == 0
        np.testing.assert_allclose(s.descriptors[2, 0], desc)
        assert bool(s.desc_valid[2, 0])

    def test_capacity(self):
        s = self._store(1)
        for i in range(10):
            s = store_lib.ingest(
                s, jnp.int32(0), jnp.zeros((32, 3)), jnp.ones((32,), bool),
                se3.identity(), jnp.float32(i), jnp.zeros(16),
            )
        assert int(s.stores.count[0]) == 8

    def test_cross_robot_distances_local(self):
        s = self._store(2)
        d0 = jnp.ones(16)
        d1 = -jnp.ones(16)
        s = store_lib.ingest(
            s, jnp.int32(0), jnp.zeros((32, 3)), jnp.ones((32,), bool),
            se3.identity(), jnp.float32(0), d0,
        )
        s = store_lib.ingest(
            s, jnp.int32(1), jnp.zeros((32, 3)), jnp.ones((32,), bool),
            se3.identity(), jnp.float32(0), d1,
        )
        q = jnp.stack([d0[None], d1[None]])  # (2, 1, 16)
        dist = store_lib.cross_robot_distances(s, q)
        # robot 0's query matches robot 0's entry exactly
        assert float(dist[0, 0, 0, 0]) < 1e-6
        assert float(dist[0, 0, 1, 0]) > 1.0
        assert not bool(jnp.isfinite(dist[0, 0, 0, 1]))  # empty slot

    def test_cross_robot_distances_sharded(self):
        """all_gather path under shard_map on the 8-device mesh."""
        n_robots = 8
        s = self._store(n_robots)
        for r in range(n_robots):
            s = store_lib.ingest(
                s, jnp.int32(r), jnp.zeros((32, 3)), jnp.ones((32,), bool),
                se3.identity(), jnp.float32(0), jnp.full((16,), float(r)),
            )
        queries = s.descriptors[:, :1, :]  # each robot queries its own desc
        m = jax.make_mesh((8,), ("robot",))
        f = jax.jit(
            jax.shard_map(
                lambda st, q: store_lib.cross_robot_distances(st, q, "robot"),
                mesh=m,
                in_specs=(jax.tree.map(lambda _: P("robot"), s), P("robot")),
                out_specs=P("robot"),
                check_vma=False,
            )
        )
        dist = f(s, queries)
        assert dist.shape == (8, 1, 8, 8)
        d = np.asarray(dist)
        for r in range(8):
            # best match of robot r's query is robot r's own entry
            flat = d[r, 0, :, 0]
            assert int(np.argmin(flat)) == r
