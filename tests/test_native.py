import numpy as np
import pytest

from mr_slam_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native library not buildable")
    return lib


class TestMaxClique:
    def test_simple(self, lib):
        adj = np.zeros((5, 5), bool)
        for a, b in [(0, 1), (1, 2), (0, 2), (3, 4)]:
            adj[a, b] = adj[b, a] = True
        c = native.max_clique(adj)
        assert set(c.tolist()) == {0, 1, 2}

    def test_exact_beats_greedy_trap(self, lib):
        """A graph where greedy-by-degree is suboptimal: hub vertex with
        high degree but the true clique avoids it."""
        rng = np.random.default_rng(0)
        n = 24
        adj = np.zeros((n, n), bool)
        # hidden clique of 6 among vertices 10..15
        K = list(range(10, 16))
        for i in K:
            for j in K:
                if i != j:
                    adj[i, j] = True
        # hub 0 connected to everything except most of the clique
        for j in range(1, n):
            if j not in K[:5]:
                adj[0, j] = adj[j, 0] = True
        # random sparse edges
        for _ in range(40):
            i, j = rng.integers(0, n, 2)
            if i != j:
                adj[i, j] = adj[j, i] = True
        c = native.max_clique(adj)
        # exact solver must find a clique at least as large as the
        # planted one
        assert len(c) >= 6
        # and it must actually BE a clique
        for a in c:
            for b in c:
                if a != b:
                    assert adj[a, b]

    def test_empty(self, lib):
        c = native.max_clique(np.zeros((0, 0), bool))
        assert len(c) == 0

    def test_random_matches_reference_bruteforce(self, lib):
        from itertools import combinations

        rng = np.random.default_rng(3)
        for trial in range(5):
            n = 12
            adj = rng.random((n, n)) < 0.4
            adj = adj & adj.T
            np.fill_diagonal(adj, False)
            c = native.max_clique(adj)
            # brute force best clique size
            best = 0
            for k in range(n, 0, -1):
                found = False
                for comb in combinations(range(n), k):
                    if all(adj[a][b] for a in comb for b in comb if a != b):
                        found = True
                        break
                if found:
                    best = k
                    break
            assert len(c) == best, f"trial {trial}: {len(c)} != {best}"


class TestScanLog:
    def test_roundtrip(self, lib, tmp_path):
        path = str(tmp_path / "test.scanlog")
        w = native.ScanLogWriter(path, max_points=128)
        rng = np.random.default_rng(0)
        frames = []
        for i in range(5):
            n = int(rng.integers(10, 128))
            xyz = rng.random((n, 3)).astype(np.float32)
            pose = np.arange(12, dtype=np.float32) + i
            w.write(float(i) * 0.1, pose, xyz)
            frames.append((i * 0.1, pose, xyz))
        w.close()

        r = native.ScanLogReader(path)
        assert r.n_frames == 5
        assert r.max_points == 128
        got = list(r)
        assert len(got) == 5
        for (stamp, pose, xyz, n), (s0, p0, x0) in zip(got, frames):
            assert abs(stamp - s0) < 1e-9
            np.testing.assert_allclose(pose, p0)
            assert n == len(x0)
            np.testing.assert_allclose(xyz[:n], x0)
            # padding is the sentinel
            if n < 128:
                assert np.all(xyz[n:] == 1e6)
        r.close()


class TestDescriptorKNN:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(3)
        dim, n = 64, 300
        db = rng.normal(size=(n, dim)).astype(np.float32)
        tree = native.DescriptorKNN(dim)
        for row in db:
            tree.insert(row)
        assert len(tree) == n
        for q in rng.normal(size=(5, dim)).astype(np.float32):
            idx, dist = tree.knn(q, 7)
            ref = np.linalg.norm(db - q[None], axis=1)
            ref_idx = np.argsort(ref)[:7]
            np.testing.assert_array_equal(np.sort(idx), np.sort(ref_idx))
            np.testing.assert_allclose(dist, ref[idx], rtol=1e-5)

    def test_incremental_and_edge_cases(self):
        tree = native.DescriptorKNN(8)
        idx, dist = tree.knn(np.zeros(8), 3)
        assert idx.shape == (0,)
        for i in range(200):  # crosses the rebuild threshold
            v = np.zeros(8, np.float32)
            v[0] = float(i)
            tree.insert(v)
        q = np.zeros(8, np.float32)
        q[0] = 100.2
        idx, dist = tree.knn(q, 3)
        assert set(idx.tolist()) == {100, 101, 99}
        assert abs(dist[0] - 0.2) < 1e-5
        # k larger than the database
        idx, _ = tree.knn(q, 500)
        assert idx.shape == (200,)
