"""Bench regression guard: diff a bench run's per-query times against
the previous round's recorded artifact and fail on real slowdowns.

Usage (CLI):

    python tools/bench_compare.py                 # newest BENCH_r*.json vs bench_detail.json's gate stats
    python tools/bench_compare.py PREV.json CUR.json
    python tools/bench_compare.py --threshold 1.25

Also imported by bench.py, which embeds the result as a
``"regressions"`` field in its gate line so every ``BENCH_r{N}.json``
carries its own verdict against ``BENCH_r{N-1}.json``.

What counts as a regression — the comparison is noise-aware because
this box suffers host-level noise bursts (documented in bench.py):

- the compared statistic is the gate stat itself (min of warm reps —
  external noise strictly ADDS wall time, so min is the plan-cost
  estimator);
- ratio gate: cur > prev * threshold (default 1.25, the judge's bar);
- absolute slack: AND cur - prev > 0.10 s, so a 0.08 s query jumping
  to 0.11 s (pure job-overhead jitter) doesn't page anyone;
- calibration advisory: each artifact carries ``calib_sec`` (a fixed
  CPU-bound probe). If the current run's calibration is >1.5x the
  previous run's, the whole session is weather-inflated and findings
  are reported as ``advisory`` instead of failing the gate — absolute
  numbers from a noisy session say nothing about the plan.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

THRESHOLD = 1.25
ABS_SLACK_SEC = 0.10
CALIB_NOISE_RATIO = 1.5


def _load_queries(path: str) -> tuple[dict[str, float], list[float] | None]:
    """Extract (per-query gate times, calib_sec) from either a driver
    ``BENCH_r*.json`` (times under ``parsed``) or a raw bench.py gate
    line / detail file."""
    with open(path) as fh:
        d = json.load(fh)
    if "parsed" in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    qs = d.get("queries")
    if not isinstance(qs, dict):
        raise ValueError(f"{path}: no per-query timings found")
    return {k: float(v) for k, v in qs.items()}, d.get("calib_sec")


def latest_round_artifact(repo: str = REPO) -> str | None:
    """Newest BENCH_r{N}.json by round number, or None."""
    best, best_n = None, -1
    for p in glob.glob(os.path.join(repo, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    return best


def compare(
    prev_queries: dict[str, float],
    cur_queries: dict[str, float],
    prev_calib: list[float] | None = None,
    cur_calib: list[float] | None = None,
    threshold: float = THRESHOLD,
    abs_slack: float = ABS_SLACK_SEC,
) -> dict:
    """Return {"regressions": [...], "advisory": bool, ...}.

    ``regressions`` lists {name, prev, cur, ratio} for every shared
    query breaching BOTH the ratio and the absolute-slack gates.
    ``advisory`` is True when the current session's calibration says
    its absolute numbers are weather-inflated (treat findings as
    informational, don't fail a gate on them).
    """
    shared = sorted(set(prev_queries) & set(cur_queries))
    regs = []
    for name in shared:
        prev, cur = prev_queries[name], cur_queries[name]
        if prev <= 0:
            continue
        if cur > prev * threshold and cur - prev > abs_slack:
            regs.append(
                {
                    "name": name,
                    "prev": round(prev, 3),
                    "cur": round(cur, 3),
                    "ratio": round(cur / prev, 2),
                }
            )
    regs.sort(key=lambda r: -r["ratio"])
    advisory = False
    if prev_calib and cur_calib:
        # min of each pair: the quietest observed window per session
        if min(cur_calib) > min(prev_calib) * CALIB_NOISE_RATIO:
            advisory = True
    return {
        "regressions": regs,
        "advisory": advisory,
        "n_compared": len(shared),
        "threshold": threshold,
    }


def main(argv: list[str]) -> int:
    args = [a for a in argv if not a.startswith("--")]
    threshold = THRESHOLD
    for a in argv:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a else argv[argv.index(a) + 1])
    if len(args) == 2:
        prev_path, cur_path = args
    elif len(args) == 0:
        prev_path = latest_round_artifact()
        cur_path = os.path.join(REPO, "bench_detail.json")
        if prev_path is None or not os.path.exists(cur_path):
            print("bench_compare: nothing to compare (need BENCH_r*.json + bench_detail.json)")
            return 0
    else:
        print(__doc__)
        return 2
    prev_q, prev_c = _load_queries(prev_path)
    # bench_detail.json stores the gate stat per query under "spread"[0]
    # (min of warm); fall back to warm_median when comparing detail files
    try:
        cur_q, cur_c = _load_queries(cur_path)
    except ValueError:
        with open(cur_path) as fh:
            d = json.load(fh)
        cur_q = {k: float(v[0]) for k, v in d["spread"].items()}
        cur_c = d.get("calib_sec")
    out = compare(prev_q, cur_q, prev_c, cur_c, threshold=threshold)
    print(json.dumps(out, indent=1))
    if out["regressions"] and not out["advisory"]:
        print(
            f"FAIL: {len(out['regressions'])} quer{'y' if len(out['regressions']) == 1 else 'ies'} "
            f"regressed >{threshold}x vs {os.path.basename(prev_path)}",
            file=sys.stderr,
        )
        return 1
    if out["regressions"]:
        print("ADVISORY ONLY: current session calibration is noise-inflated", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
