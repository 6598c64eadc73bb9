"""Halo-exchanged sharded terrain features == unsharded features."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from mr_slam_tpu.mapping import elevation, sharded_elevation


def _grid(H=128, W=256, seed=0):
    rng = np.random.default_rng(seed)
    height = jnp.asarray(
        rng.normal(0, 1, (H, W)).astype(np.float32).cumsum(0) * 0.02
    )
    valid = jnp.asarray(rng.random((H, W)) > 0.2)
    return elevation.ElevationMap(
        height=height, variance=jnp.ones((H, W)), valid=valid,
        origin=jnp.zeros(2), resolution=jnp.float32(0.2),
    )


class TestShardedFeatures:
    def test_matches_unsharded(self):
        m = _grid()
        mesh = Mesh(np.array(jax.devices()[:8]), ("robot",))
        ref = elevation.features(m)
        out = sharded_elevation.features_sharded(m, mesh)
        # step is coordinate-free -> exact except at the 2-row global
        # border (empty-halo vs -inf padding when a whole window is
        # below 0); slope/rough/trav carry the f32 moment-cancellation
        # difference of local vs global row coordinates
        np.testing.assert_allclose(
            np.asarray(out.step)[2:-2], np.asarray(ref.step)[2:-2], atol=1e-5
        )
        for a, b in zip(
            (out.slope, out.roughness, out.traversability),
            (ref.slope, ref.roughness, ref.traversability),
        ):
            # traversability inherits step's border semantic: crop it
            np.testing.assert_allclose(
                np.asarray(a)[2:-2], np.asarray(b)[2:-2], atol=5e-3
            )
            assert a.shape == b.shape
