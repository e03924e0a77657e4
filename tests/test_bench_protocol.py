"""Protocol-tooling CI guards (VERDICT r4 #7): a cheap end-to-end smoke of
bench.py's JSON contract plus unit tests of bench_scaling's pre-registered
steal rule and error-row exclusion — so tooling regressions can't silently
corrupt a multi-hour protocol run."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


@pytest.mark.slow
def test_bench_smoke_json_contract():
    """bench.py at tiny scale (one cheap section) must emit ONE parseable
    JSON line with the driver-contract fields."""
    env = dict(os.environ,
               BENCH_ONLY="tile_assign",
               BENCH_PAGES="2000",
               BENCH_REPS="1",
               SPARK_GRAFT_CPUS="4",
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    out = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                         capture_output=True, text=True, env=env, timeout=900)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON line from bench.py:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    j = json.loads(lines[-1])
    for key in ("metric", "value", "unit", "queries", "sf", "cpus",
                "reps", "isolated_sections", "failed_sections"):
        assert key in j, f"missing contract key {key}"
    assert j["failed_sections"] == []
    assert j["queries"].get("tile_assign", 0) > 0
    assert j["sf"] == 0.001
    assert j["cpus"] == 4


@pytest.mark.slow
def test_bench_failed_section_named():
    """A section whose child crashes must land in failed_sections while the
    run still emits valid JSON (ADVICE r3 regression guard)."""
    env = dict(os.environ,
               BENCH_ONLY="dedup_minhash",
               BENCH_PAGES="2000",
               BENCH_REPS="1",
               SPARK_GRAFT_CPUS="4",
               SPARK_GRAFT_SF_DIR="/nonexistent_sf_dir")
    out = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                         capture_output=True, text=True, env=env, timeout=900)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines
    j = json.loads(lines[-1])
    assert j["failed_sections"] == ["dedup_minhash"]


def test_steal_rule_reruns(monkeypatch):
    """The pre-registered steal rule re-runs over-threshold runs (bounded by
    STEAL_RETRIES), keeps the last attempt, and logs discards."""
    import tools.bench_scaling as BS

    seq = [{"value": 1.0, "steal_pct_of_box": 5.0},
           {"value": 2.0, "steal_pct_of_box": 4.0},
           {"value": 3.0, "steal_pct_of_box": 0.5}]
    calls = iter(seq)
    monkeypatch.setattr(BS, "run_once_with_steal", lambda cpus: dict(next(calls)))
    monkeypatch.setattr(BS, "STEAL_MAX", 2.0)
    monkeypatch.setattr(BS, "STEAL_RETRIES", 2)
    discarded: list = []
    r = BS.run_with_steal_rule(8, discarded)
    assert r["value"] == 3.0 and r["steal_attempts"] == 3
    assert [d["value"] for d in discarded] == [1.0, 2.0]

    # retries exhausted: last attempt kept even though still over threshold
    seq2 = iter([{"value": 1.0, "steal_pct_of_box": 9.0},
                 {"value": 2.0, "steal_pct_of_box": 9.0},
                 {"value": 3.0, "steal_pct_of_box": 9.0},
                 {"value": 99.0, "steal_pct_of_box": 9.0}])
    monkeypatch.setattr(BS, "run_once_with_steal", lambda cpus: dict(next(seq2)))
    discarded2: list = []
    r2 = BS.run_with_steal_rule(8, discarded2)
    assert r2["value"] == 3.0 and len(discarded2) == 2

    # error rows bypass the rule entirely
    monkeypatch.setattr(BS, "run_once_with_steal",
                        lambda cpus: {"error": "boom", "steal_pct_of_box": 9.0})
    discarded3: list = []
    r3 = BS.run_with_steal_rule(8, discarded3)
    assert "error" in r3 and discarded3 == []


def test_bench_section_steal_rule(monkeypatch):
    """bench.py's per-section runner applies the same pre-registered rule:
    over-threshold sections re-run (bounded), the kept attempt is annotated
    with its steal percentage and attempt count (VERDICT r5 #1)."""
    import bench as B

    # steal snapshots: each attempt spans one (pre, post) pair; steal%
    # = 100 * d_steal / d_total -> attempts at 5%, 4%, 0.5%
    snaps = iter([(0, 0), (50, 1000), (50, 1000), (90, 2000),
                  (90, 2000), (95, 3000)])
    monkeypatch.setattr(B, "_steal_snap", lambda: next(snaps))
    calls = {"n": 0}

    def fake_section(name):
        calls["n"] += 1
        return {"queries": {name: 1.0}, "v": calls["n"]}

    monkeypatch.setattr(B, "_run_section", fake_section)
    monkeypatch.setattr(B, "STEAL_MAX", 2.0)
    monkeypatch.setattr(B, "STEAL_RETRIES", 2)
    r = B._run_section_with_steal_rule("tile_assign")
    assert r["v"] == 3 and r["tile_assign_steal_attempts"] == 3
    assert r["tile_assign_steal_pct_of_box"] == 0.5

    # a crashed section short-circuits (no re-run loop on None)
    monkeypatch.setattr(B, "_steal_snap", lambda: (0, 1))
    monkeypatch.setattr(B, "_run_section", lambda name: None)
    assert B._run_section_with_steal_rule("tile_assign") is None
