"""tools/bench_compare.py — the noise-aware regression verdict that
bench.py embeds in every gate line (pure functions, no Spark)."""

from __future__ import annotations

from tools.bench_compare import compare


def test_identical_runs_have_no_regressions():
    q = {"a": 1.0, "b": 0.2}
    out = compare(q, q)
    assert out["regressions"] == [] and out["n_compared"] == 2


def test_ratio_and_abs_slack_must_both_trip():
    prev = {"tiny": 0.05, "big": 2.0}
    # tiny: huge ratio but under the 0.10s absolute slack -> ignored
    # big: 1.3x and +0.6s -> flagged
    cur = {"tiny": 0.11, "big": 2.6}
    out = compare(prev, cur)
    assert [r["name"] for r in out["regressions"]] == ["big"]
    assert out["regressions"][0]["ratio"] == 1.3


def test_regressions_sorted_worst_first():
    prev = {"a": 1.0, "b": 1.0}
    cur = {"a": 1.5, "b": 2.0}
    out = compare(prev, cur)
    assert [r["name"] for r in out["regressions"]] == ["b", "a"]


def test_noisy_calibration_downgrades_to_advisory():
    prev = {"a": 1.0}
    cur = {"a": 2.0}
    out = compare(prev, cur, prev_calib=[0.2, 0.21], cur_calib=[0.9, 1.1])
    assert out["advisory"] is True and out["regressions"]


def test_quiet_calibration_keeps_failures_hard():
    out = compare({"a": 1.0}, {"a": 2.0}, [0.2, 0.2], [0.22, 0.2])
    assert out["advisory"] is False and out["regressions"]


def test_new_and_removed_queries_are_ignored():
    out = compare({"gone": 1.0, "kept": 1.0}, {"kept": 1.0, "new": 9.9})
    assert out["n_compared"] == 1 and out["regressions"] == []
