"""3-robot end-to-end: inter-robot loop closures + PCM + joint PGO —
the deterministic analogue of the reference's 3_dog.bag demo."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.backend import factor_graph as fg
from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.eval import metrics
from mr_slam_tpu.geometry import se3
from mr_slam_tpu.ops import pointcloud as pcl
from mr_slam_tpu.runtime import pipeline
from mr_slam_tpu.runtime.config import SlamConfig, LoopCfg, OdometryCfg
from tests.test_pipeline import make_scans


CFG = SlamConfig(
    n_robots=3,
    odometry=OdometryCfg(table_size=1 << 16, scan_capacity=4096),
    loops=LoopCfg(
        dist_thresh=0.3, min_separation=6, fitness_thresh=0.15,
        candidates=1,
    ),
)


@pytest.mark.slow
class TestThreeRobots:
    def test_inter_robot_loops_merge_maps(self):
        world = synthetic.default_world(7)
        n = 40
        # three robots on the same ring road, staggered phases, same
        # direction -> overlapping coverage with matching headings
        trajs = []
        for r in range(3):
            trajs.append(
                synthetic.circle_trajectory(
                    n, radius=22.0, laps=0.55, phase=2 * np.pi * r / 3
                )
            )
        scans = [make_scans(world, t, n, seed=r) for r, t in enumerate(trajs)]
        res = pipeline.run(
            [scans[r] for r in range(3)], CFG,
            origins=[se3.index(trajs[r], 0) for r in range(3)],
        )
        inter = [l for l in res.loops if l["robot_a"] != l["robot_b"]]
        assert len(inter) >= 1, f"no inter-robot loops (all: {len(res.loops)})"
        # optimized keyframe trajectories stay close to ground truth
        for r in range(3):
            K = int(res.robots[r].store.count)
            assert K >= 5
            kf_idx = res.robots[r].kf_frame_idx
            true_kf = se3.index(trajs[r], jnp.asarray(kf_idx))
            opt_kf = res.optimized_trajectory(r)
            a = metrics.ate(opt_kf, true_kf)
            assert float(a.rmse) < 1.0, f"robot {r} ATE {float(a.rmse):.3f}"
        # the graph has all three robots connected
        conn = fg.connected_robots(res.graph, 3)
        assert int(conn.sum()) >= 2

    def test_merged_map_covers_world(self):
        world = synthetic.default_world(7)
        n = 24
        trajs = [
            synthetic.circle_trajectory(n, radius=22.0, laps=0.35, phase=2 * np.pi * r / 3)
            for r in range(3)
        ]
        scans = [make_scans(world, t, n, seed=r) for r, t in enumerate(trajs)]
        res = pipeline.run(
            scans, CFG, origins=[se3.index(t, 0) for t in trajs]
        )
        merged = pipeline.compose_map(res)
        pts = np.asarray(merged.xyz)[np.asarray(merged.mask)]
        # union of three arcs covers most of the ring: angular extent
        ang = np.arctan2(pts[:, 1], pts[:, 0])
        hist, _ = np.histogram(ang, bins=12, range=(-np.pi, np.pi))
        assert (hist > 0).sum() >= 10, f"angular coverage {hist}"
