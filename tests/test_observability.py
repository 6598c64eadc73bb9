import json
import time

from mr_slam_tpu.runtime.observability import Metrics, Tracer


class TestTracer:
    def test_spans_accumulate(self):
        t = Tracer()
        for _ in range(3):
            with t.span("solve"):
                with t.span("rotation"):
                    time.sleep(0.001)
        rep = t.report()
        assert rep["solve"]["count"] == 3
        assert rep["solve.rotation"]["count"] == 3
        assert rep["solve"]["mean_ms"] >= rep["solve.rotation"]["mean_ms"] * 0.5

    def test_dump(self, tmp_path):
        t = Tracer()
        with t.span("x"):
            pass
        p = str(tmp_path / "trace.json")
        t.dump(p)
        assert "x" in json.load(open(p))


class TestMetrics:
    def test_counters_gauges_observations(self):
        m = Metrics()
        m.inc("loops_found", 2)
        m.inc("loops_found")
        m.set("optimizer_cost", 1.5)
        m.observe("fitness", 0.1)
        m.observe("fitness", 0.3)
        rep = m.report()
        assert rep["counters"]["loops_found"] == 3
        assert rep["gauges"]["optimizer_cost"] == 1.5
        assert abs(rep["observations"]["fitness"]["mean"] - 0.2) < 1e-9
