"""bench.py extras-rotation policy: never-certified extras first,
then least-recently-certified, cheapest first within a tie — computed
from the BENCH_r*.json artifacts in the cwd (VERDICT r4 #1)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_artifact(d, rnd, extras):
    with open(d / f"BENCH_r{rnd:02d}.json", "w") as f:
        json.dump({"parsed": {"metric": "m", "value": 1.0,
                              "extra_metrics": extras}}, f)


def test_rotation_prefers_starved_extras(tmp_path, monkeypatch):
    import bench

    _write_artifact(tmp_path, 2, {"a": 1.0, "b": "skipped:budget"})
    _write_artifact(tmp_path, 4, {"a": 2.0, "c": 3.0, "d": "error:X"})
    monkeypatch.chdir(tmp_path)

    last = bench._last_certified()
    # numbers certify; skipped/error strings do not
    assert last["a"] == 4 and last["c"] == 4
    assert "b" not in last and "d" not in last
    # metrics introduced in round N are floored at N-1, not "never"
    for k, introduced in bench._INTRODUCED.items():
        assert last[k] >= introduced - 1

    costs = {"a": 10.0, "b": 99.0, "c": 5.0, "e": 50.0, "f": 20.0}
    order = sorted(costs, key=lambda k: (last.get(k, -1), costs[k]))
    # never-certified first (cheapest first within the tie), then by
    # round (a and c tie at r4 -> cheaper c first)
    assert order == ["f", "e", "b", "c", "a"]


def test_rotation_handles_missing_and_corrupt_artifacts(tmp_path,
                                                        monkeypatch):
    import bench

    monkeypatch.chdir(tmp_path)
    assert {k: v for k, v in bench._last_certified().items()
            if k not in bench._INTRODUCED} == {}

    (tmp_path / "BENCH_r03.json").write_text("not json {")
    _write_artifact(tmp_path, 7, {"x": 1.5})
    last = bench._last_certified()
    assert last["x"] == 7  # corrupt artifact skipped, valid one read


def test_extra_costs_cover_all_extras():
    """Every extra bench 'all' mode can run must have a cost estimate —
    checked against the ACTUAL registry main() iterates, so a workload
    added to _extra_workloads without a cost can't KeyError inside the
    driver's official run while this test stays green."""
    import bench

    registry = set(bench._extra_workloads())
    assert registry <= set(bench._EXTRA_COSTS), \
        registry - set(bench._EXTRA_COSTS)
    for k in bench._INTRODUCED:
        assert k in registry
