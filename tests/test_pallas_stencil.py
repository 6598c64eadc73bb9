"""Fused Pallas 5x5 terrain-feature stencil vs its XLA twin
(`elevation.features`). Runs in interpret mode on CPU; the TPU speedup
is measured by bench.py."""
import jax
import jax.numpy as jnp
import numpy as np

from mr_slam_tpu.mapping import elevation
from mr_slam_tpu.ops import pallas_stencil


def _case(H, W, seed=0, frac_valid=0.8):
    rng = np.random.default_rng(seed)
    height = jnp.asarray(
        (rng.normal(0, 1, (H, W)).astype(np.float32).cumsum(0)) * 0.02
    )
    valid = jnp.asarray(rng.random((H, W)) < frac_valid)
    m = elevation.ElevationMap(
        height=height, variance=jnp.ones((H, W)), valid=valid,
        origin=jnp.zeros(2), resolution=jnp.float32(0.2),
    )
    return m


class TestPallasStencil:
    def test_matches_xla_twin(self):
        m = _case(96, 200)
        ref = elevation.features(m)
        slope, rough, step, trav = pallas_stencil.terrain_features(
            m.height, m.valid, m.resolution
        )
        # interior is exact for step/trav; slope/rough differ only by
        # f32 moment-cancellation conditioning (the kernel uses local
        # coordinates and is the MORE accurate of the two)
        inner = np.s_[2:-2, 2:-2]
        np.testing.assert_allclose(
            np.asarray(step)[inner], np.asarray(ref.step)[inner], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(trav)[inner],
            np.asarray(ref.traversability)[inner], atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(slope)[inner], np.asarray(ref.slope)[inner], atol=2e-2
        )
        np.testing.assert_allclose(
            np.asarray(rough)[inner], np.asarray(ref.roughness)[inner],
            atol=2e-2,
        )

    def test_sparse_and_empty_cells(self):
        m = _case(64, 140, seed=3, frac_valid=0.05)
        slope, rough, step, trav = pallas_stencil.terrain_features(
            m.height, m.valid, m.resolution
        )
        for a in (slope, rough, step, trav):
            assert np.isfinite(np.asarray(a)).all()
        # cells with no valid neighbours: trav falls back to 0.5
        v = np.asarray(m.valid)
        box = np.zeros_like(v, np.int32)
        vp = np.pad(v.astype(np.int32), 2)
        for di in range(5):
            for dj in range(5):
                box += vp[di:di + v.shape[0], dj:dj + v.shape[1]]
        unknown = box < 3
        assert np.allclose(np.asarray(trav)[unknown], 0.5)
