"""Train the DiSCO net on synthetic quadruplets and verify the LEARNED
descriptor beats the passthrough (sum-over-heights) descriptor at
recall@1 — turning `disco_net.py` from plausible code into a validated
capability (`train_DiSCO.py` role, SURVEY §2.6)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mr_slam_tpu.datasets import synthetic
from mr_slam_tpu.eval import metrics
from mr_slam_tpu.geometry import se3
from mr_slam_tpu.loop import bev, disco, disco_net


@pytest.mark.slow
class TestDiscoTrainedRecall:
    def test_trained_beats_passthrough_recall(self):
        world = synthetic.default_world(9)
        n = 30
        traj = synthetic.circle_trajectory(n, radius=20.0, laps=2.0)
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        bevs = []
        for i in range(n):
            xyz, _, hit = synthetic.scan(
                world, se3.index(traj, i), n_rings=16, n_azimuth=256,
                key=keys[i],
            )
            cloud = synthetic.scan_to_cloud(xyz, hit)
            bevs.append(bev.polar_occupancy(cloud, 40, 120, z_bins=8))
        bevs = jnp.stack(bevs)
        positions = traj.t

        min_sep = 6
        radius = 6.0
        idx = np.arange(n)
        near_in_time = np.abs(idx[:, None] - idx[None, :]) < min_sep
        d_xy = np.linalg.norm(
            np.asarray(positions)[:, None, :2] - np.asarray(positions)[None, :, :2],
            axis=-1,
        )
        pos_mask = (d_xy < radius) & ~near_in_time
        far_mask = (d_xy > 3 * radius) & ~near_in_time
        valid = pos_mask.any(1)

        def recall1(sigs):
            d = jnp.linalg.norm(sigs[:, None] - sigs[None], axis=-1)
            d = jnp.where(jnp.asarray(near_in_time), jnp.inf, d)
            res = metrics.recall_at_n(
                d, jnp.asarray(pos_mask), jnp.asarray(valid), max_n=1
            )
            return float(res.recall_at_n[0])

        # passthrough baseline (sum over heights -> |FFT| crop)
        pass_sigs = jax.lax.map(lambda b: disco.describe(b).signature, bevs)
        r1_pass = recall1(pass_sigs)

        # quadruplet training on the same frames
        model = disco_net.DiscoNet(base=4)
        state, tx = disco_net.create_train_state(
            jax.random.PRNGKey(1), model, bevs[0], lr=3e-4
        )
        rng = np.random.default_rng(0)
        anchors = [i for i in range(n) if pos_mask[i].any() and far_mask[i].any()]
        assert len(anchors) >= 8
        epochs = 8
        for _ in range(epochs):
            for a in anchors:
                p = int(rng.choice(np.flatnonzero(pos_mask[a])))
                negs = rng.choice(np.flatnonzero(far_mask[a]), size=4,
                                  replace=False)
                on_pool = np.flatnonzero(far_mask[a] & ~pos_mask[a])
                on = int(rng.choice(on_pool))
                state, loss = disco_net.train_step(
                    state, model, tx, bevs[a], bevs[p],
                    bevs[jnp.asarray(negs)], bevs[on],
                )
        learned_sigs = jax.lax.map(
            lambda b: model.apply(state.params, b), bevs
        )
        r1_learned = recall1(learned_sigs)
        assert r1_learned > r1_pass, (
            f"trained recall@1 {r1_learned:.3f} !> passthrough {r1_pass:.3f}"
        )
