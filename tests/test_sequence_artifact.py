"""Real-format sequence artifact: bit-determinism (golden digest) and
the full bytes -> loaders -> scanlog -> replay -> OnlineSlam -> ATE
chain at CI size (VERDICT-r4 item 4; the committed stand-in for the
reference's NCLT Full Usage runs, `README.md` Full Usage,
`kittiHelper.cpp:1-180`)."""
import os

import numpy as np
import pytest

from mr_slam_tpu.datasets import loaders, sequence_artifact as sa
from mr_slam_tpu.runtime.config import (
    KeyframeCfg, LoopCfg, OdometryCfg, SlamConfig,
)

# sha256 over the tiny reference artifact (4 frames x 2 robots, 16x256
# rays). The generator is pure numpy float64 (world geometry included —
# jax.random is config-sensitive), so this digest must be IDENTICAL on
# every platform AND under the 8-virtual-device test harness — a
# mismatch means the byte format or the geometry drifted.
GOLDEN_TINY_DIGEST = (
    "4c1f4d51f95deade099775445cf0365e10460a708dd27629091b85c1bce4cccc"
)


class TestGolden:
    def test_tiny_digest_is_stable(self, tmp_path):
        m = sa.generate(str(tmp_path), frames=4, robots=2,
                        n_rings=16, n_azimuth=256)
        assert m["digest"] == GOLDEN_TINY_DIGEST
        # regeneration into a different directory is bit-identical
        m2 = sa.generate(str(tmp_path / "again"), frames=4, robots=2,
                         n_rings=16, n_azimuth=256)
        assert m2["digest"] == m["digest"]

    def test_quantization_bound(self, tmp_path):
        """Decoded points sit within the 5 mm u16 quantization of the
        generator's float64 geometry."""
        sa.generate(str(tmp_path), frames=1, robots=1,
                    n_rings=16, n_azimuth=256, noise=0.0)
        vdir = tmp_path / "robot0" / "velodyne_sync"
        f = sorted(os.listdir(vdir))[0]
        xyz, mask, inten = loaders.load_nclt_velodyne_bin(
            str(vdir / f))
        pts = xyz[mask]
        # sensor at [22, 0, z] looking tangentially: ranges bounded by
        # the world extent; z-down convention puts ground ~ +(z_sensor)
        assert pts.shape[0] > 500
        assert np.abs(pts).max() < 130.0
        assert (inten[mask] >= 0).all() and (inten[mask] <= 255).all()


@pytest.mark.slow
class TestFullChain:
    def test_bytes_to_ate(self, tmp_path):
        """40 frames x 2 robots at 32x512 through the whole real-data
        chain; optimized keyframe ATE must stay within odometry-grade
        bounds on the ring road (loops may or may not fire at this
        short horizon — the ATE bound is the assertion)."""
        root = tmp_path / "seq"
        # laps scaled so per-frame arc stays ~1.6 m (see generate())
        sa.generate(str(root), frames=40, robots=2,
                    n_rings=32, n_azimuth=512, laps=0.45)
        cfg = SlamConfig(
            odometry=OdometryCfg(scan_capacity=4096,
                                 insert_capacity=8192),
            keyframes=KeyframeCfg(dist_thresh=2.0, capacity=64),
            loops=LoopCfg(dist_thresh=0.75, min_separation=8,
                          candidates=2, fitness_thresh=0.15),
        )
        out = sa.run_session(str(root), cfg=cfg)
        assert out["frames"] == 80
        assert out["keyframes"] >= 20
        assert out["ate_rmse_m"] < 0.5, out
