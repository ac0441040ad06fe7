"""tools/bench_compare.py — the noise-aware regression verdict that
bench.py embeds in every gate line (pure functions, no Spark)."""

from __future__ import annotations

import pytest

from tools.bench_compare import _load_queries, compare, host_ratio


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


def test_noisy_probe_downgrades_to_advisory():
    prev = {"a": 1.0}
    cur = {"a": 2.0}
    out = compare(prev, cur, {"calib": 0.2}, {"calib": 0.9})
    assert out["advisory"] is True and out["regressions"]


def test_quiet_probe_keeps_failures_hard():
    out = compare({"a": 1.0}, {"a": 2.0}, {"calib": 0.2}, {"calib": 0.21})
    assert out["advisory"] is False and out["regressions"]


def test_new_and_removed_queries_are_ignored():
    out = compare({"gone": 1.0, "kept": 1.0}, {"kept": 1.0, "new": 9.9})
    assert out["n_compared"] == 1 and out["regressions"] == []


def test_host_ratio_geomean_over_shared_components():
    # calib 2x, shuffle 0.5x -> geometric mean exactly 1.0; the 'scan'
    # component exists on one side only and must be ignored
    hr = host_ratio(
        {"calib": 0.2, "shuffle": 0.4},
        {"calib": 0.4, "shuffle": 0.2, "scan": 9.0},
    )
    assert hr == pytest.approx(1.0)
    assert host_ratio({}, {"calib": 0.2}) is None
    assert host_ratio(None, None) is None


def test_uniform_host_drift_is_normalized_away():
    # every query AND every probe component 1.4x slower: the round-5
    # failure mode. Normalization must clear all flags, not advisory.
    prev = {"a": 1.0, "b": 0.5, "c": 2.0}
    cur = {k: v * 1.4 for k, v in prev.items()}
    out = compare(
        prev, cur,
        {"calib": 0.20, "shuffle": 0.40, "scan": 0.30},
        {"calib": 0.28, "shuffle": 0.56, "scan": 0.42},
    )
    assert out["regressions"] == []
    assert out["normalized"] is True
    assert out["host_ratio"] == pytest.approx(1.4, abs=0.01)
    assert out["advisory"] is False


def test_real_regression_survives_normalization():
    # host 1.3x slower, but one query is 2.6x slower — normalized it is
    # still 2x and must stay a hard flag
    prev = {"a": 1.0, "b": 1.0}
    cur = {"a": 1.3, "b": 2.6}
    out = compare(
        prev, cur,
        {"shuffle": 0.40, "scan": 0.30},
        {"shuffle": 0.52, "scan": 0.39},
    )
    assert [r["name"] for r in out["regressions"]] == ["b"]
    assert out["regressions"][0]["cur_norm"] == pytest.approx(2.0, abs=0.01)
    assert out["advisory"] is False


def test_faster_host_unmasks_regression():
    # host got 25% FASTER (within the 1.5x trust band), a plan
    # regressed 1.1x raw — normalized up it is ~1.47x and must be
    # flagged even though the raw ratio is under threshold
    out = compare(
        {"a": 1.0}, {"a": 1.1},
        {"shuffle": 0.8, "scan": 0.6},
        {"shuffle": 0.6, "scan": 0.45},
    )
    assert [r["name"] for r in out["regressions"]] == ["a"]
    assert out["regressions"][0]["cur_norm"] == pytest.approx(1.467, abs=0.01)


def test_extreme_drift_is_advisory_not_normalized():
    # 4.5x probe drift: beyond the 1.5x ceiling uniformity can't be
    # assumed — raw flags surface, but only as advisory
    out = compare(
        {"a": 1.0}, {"a": 2.0},
        {"calib": 0.2}, {"calib": 0.9},
    )
    assert out["advisory"] is True
    assert out["normalized"] is False
    assert [r["name"] for r in out["regressions"]] == ["a"]


def test_small_drift_band_uses_raw_times():
    # 1.1x probe drift is inside the 1.15x trust band: raw gating, and
    # a query at exactly 1.2x (under 1.25 threshold) passes
    out = compare(
        {"a": 1.0}, {"a": 1.2},
        {"shuffle": 0.40}, {"shuffle": 0.44},
    )
    assert out["regressions"] == [] and out["normalized"] is False


def test_load_queries_reads_probe_fields(tmp_path):
    p = tmp_path / "BENCH_rX.json"
    p.write_text(
        '{"parsed": {"queries": {"a": 1.5}, "calib_sec": [0.22, 0.13],'
        ' "probe": [0.41, 0.33]}}'
    )
    qs, probe = _load_queries(str(p))
    assert qs == {"a": 1.5}
    assert probe == {"calib": 0.13, "shuffle": 0.41, "scan": 0.33}


def test_threshold_flag_space_separated(tmp_path):
    # ADVICE round 5: `--threshold 1.25` (space form) hit the usage path.
    # ADVICE round 6: pass explicit tmp artifacts so the test is
    # hermetic (no dependence on the repo's real BENCH_r*.json files).
    from tools.bench_compare import main

    prev = tmp_path / "prev.json"
    cur = tmp_path / "cur.json"
    prev.write_text('{"queries": {"a": 1.0}}')
    cur.write_text('{"queries": {"a": 1.3}}')
    # 1.3x regression: fails at default 1.25, passes at 9.9
    assert main([str(prev), str(cur)]) == 1
    assert main(["--threshold", "9.9", str(prev), str(cur)]) == 0


def test_bench_regression_verdict_wires_probe(tmp_path):
    """Integration through bench.py's real call path: the round-6 bug
    passed compare() a raw list, silently yielding host_ratio=None and
    a dead advisory. Inject a 7x probe drift through
    bench._regression_verdict and require the advisory to trip."""
    import json as _json

    import bench

    (tmp_path / "BENCH_r01.json").write_text(_json.dumps({
        "parsed": {
            "queries": {"a": 1.0, "b": 0.5},
            "calib_sec": [0.20, 0.20],
            "probe": [0.40, 0.30],
        }
    }))
    out = bench._regression_verdict(
        {"a": 7.0, "b": 3.5}, [1.4, 1.4], [2.8, 2.1], repo=str(tmp_path)
    )
    assert out["host_ratio"] == pytest.approx(7.0, abs=0.05)
    assert out["advisory"] is True
    assert out["vs"] == "BENCH_r01.json"
    # quiet host, one real regression -> hard flag, non-null host_ratio
    out2 = bench._regression_verdict(
        {"a": 2.0, "b": 0.5}, [0.21, 0.20], [0.41, 0.30], repo=str(tmp_path)
    )
    assert out2["host_ratio"] is not None
    assert out2["advisory"] is False
    assert [r["name"] for r in out2["regressions"]] == ["a"]


def test_median_normalization_on_large_shared_sets():
    """r8 adjudication: with >= 20 shared queries the median query
    ratio, not the probe ratio, is the drift estimator — probes
    over-respond to host weather (r7: probes 1.406x vs queries 1.315x;
    r8: probes 0.844x vs queries 0.949x, which spuriously flagged 9
    untouched queries under probe normalization)."""
    prev = {f"q{i}": 1.0 for i in range(24)}
    # whole fleet 5% faster, probes 16% faster; one query genuinely 1.4x
    cur = {k: 0.95 for k in prev}
    cur["q3"] = 1.4
    out = compare(
        prev, cur,
        {"shuffle": 0.40, "scan": 0.30},
        {"shuffle": 0.336, "scan": 0.252},
    )
    assert out["norm_source"] == "median"
    assert out["median_query_ratio"] == pytest.approx(0.95, abs=0.01)
    assert [r["name"] for r in out["regressions"]] == ["q3"]
    assert out["uniform_drift"] is False


def test_uniform_regression_not_masked_by_median():
    """A session-wide 1.4x slowdown with QUIET probes is a real uniform
    regression (config/session change) — the median ratio would
    normalize every per-query flag away, so the uniform_drift guard
    must fire instead."""
    prev = {f"q{i}": 1.0 for i in range(24)}
    cur = {k: 1.4 for k in prev}
    out = compare(
        prev, cur,
        {"shuffle": 0.40, "scan": 0.30},
        {"shuffle": 0.41, "scan": 0.30},
    )
    assert out["uniform_drift"] is True
    assert out["regressions"] == []  # per-query flags normalized away


def test_waivers_move_flags_to_waived_list():
    prev = {"a": 1.0, "b": 1.0}
    cur = {"a": 1.4, "b": 1.4}
    waivers = {"a": {"max_ratio": 1.5, "reason": "deliberate trade"}}
    out = compare(prev, cur, waivers=waivers)
    assert [r["name"] for r in out["regressions"]] == ["b"]
    assert [w["name"] for w in out["waived"]] == ["a"]
    assert out["waived"][0]["reason"] == "deliberate trade"
    # beyond the waiver's cap the flag comes back
    out2 = compare(prev, {"a": 1.6, "b": 1.0}, waivers=waivers)
    assert [r["name"] for r in out2["regressions"]] == ["a"]


def test_load_queries_recovers_truncated_tail(tmp_path):
    """BENCH_r07.json shipped with "parsed": null because the gate line
    overflowed the driver's 2000-char stdout tail window — the line
    arrives with its HEAD cut off. The queries dict and probe fields
    sit at the END and must be recovered."""
    p = tmp_path / "BENCH_r07.json"
    p.write_text(
        '{"n": 7, "rc": 0, "parsed": null, '
        '"tail": "\\":\\"headline_queries_total_sec\\",\\"value\\":1.0,'
        '\\"queries\\":{\\"a\\":1.5,\\"b\\":0.25},\\"sf\\":0.1,'
        '\\"calib_sec\\":[0.22,0.13],\\"probe\\":[0.41,0.33],'
        '\\"regressions\\":[]}"}'
    )
    qs, probe = _load_queries(str(p))
    assert qs == {"a": 1.5, "b": 0.25}
    assert probe == {"calib": 0.13, "shuffle": 0.41, "scan": 0.33}


def test_bench_regression_verdict_no_artifact(tmp_path):
    import bench

    out = bench._regression_verdict({"a": 1.0}, [0.2, 0.2], [0.4, 0.3], repo=str(tmp_path))
    assert out["regressions"] == [] and out["n_compared"] == 0
