"""Physical-plan audit over the whole query registry -> PLANS.md.

tests/test_plans_physical.py ENFORCES the plan invariants (no
row-at-a-time Python UDFs, NLJ only where declared, no unhinted
broadcasts of unbounded tables); this tool complements it with a
regenerable INVENTORY: for every registered query, the counts a
100 TB plan review starts from — shuffle exchanges, broadcast
attaches, scan pushdown, Python stages — so a reader can spot the
expensive shapes without running 199 explains by hand.

    python tools/plan_audit.py [sf_dir] [query ...]   # default sf0.01, all

Columns (node counts in the pre-execution physical plan string):
- shuffles:  Exchange hash/rangepartitioning — the scale currency;
  each is a full network pass over its input
- bcast:     BroadcastExchange — bounded sides attached map-side
- scans:     parquet file scans / scans carrying >= 1 pushed filter
  (a scan can legitimately carry none when the query reads the whole
  table — e.g. full-corpus aggregations)
- arrow:     Arrow-batched Python stages (ArrowEvalPython, MapInPandas,
  FlatMapGroupsInPandas, MapInArrow, pandas UDAFs) — the DECLARED
  vectorized slow path
- py_row:    row-at-a-time BatchEvalPython stages (invariant: zero)
- nlj/cart:  BroadcastNestedLoopJoin / CartesianProduct nodes (NLJ is
  legitimate only for the declared one-row/bounded-side attaches)

Whole-stage-codegen spans are not counted here: under AQE the
pre-execution plan string carries no codegen annotation, and running
all 199 queries to finalize plans is bench.py's job, not an audit's.

Planning only — nothing is executed except the eager prefixes some
iterative operators run (checkpointed rounds, KMeans fits), so run it
at a small SF.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

_ARROW = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
    "MapInArrow",
    "AggregateInPandas",
)


def audit_plan(plan: str) -> dict:
    scan_lines = re.findall(r"FileScan parquet[^\n]*", plan)
    return {
        "shuffles": len(
            re.findall(r"Exchange (?:hash|range)partitioning", plan)
        ),
        "bcast": plan.count("BroadcastExchange"),
        "scans": len(scan_lines),
        "scans_pushed": sum(
            1 for ln in scan_lines if re.search(r"PushedFilters: \[(?!\])", ln)
        ),
        "arrow": sum(plan.count(op) for op in _ARROW),
        "py_row": plan.count("BatchEvalPython"),
        "nlj": plan.count("BroadcastNestedLoopJoin"),
        "cart": plan.count("CartesianProduct"),
    }


def distinct_counts(jplan) -> tuple[int, int]:
    """(distinct shuffle exchanges, distinct parquet scans) by
    ``semanticHash`` — the same canonical-equality ReuseExchange / AQE
    stage reuse key off at runtime. A subtree referenced k times prints
    k exchange nodes in the plan STRING but executes once; these counts
    are the executed shape (round-8 verdict: triangle_count_neardup's
    122 printed shuffles execute as ~13)."""
    sh, sc = set(), set()
    stack = [jplan]
    while stack:
        n = stack.pop()
        cls = n.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            # AQE wraps the tree in a childless driver node; descend
            # into the initial plan it will execute/re-plan
            stack.append(n.initialPlan())
            continue
        if cls == "ShuffleExchangeExec":
            # mirror the string regex: hash/range partitioning only
            # (single-partition gathers are result collection, not a
            # corpus shuffle)
            part = n.outputPartitioning().getClass().getSimpleName()
            if part in ("HashPartitioning", "RangePartitioning"):
                sh.add(n.semanticHash())
        elif cls == "FileSourceScanExec":
            sc.add(n.semanticHash())
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        # cached/persisted branches hang off innerChildren (the plan
        # string prints them, children() doesn't) — walk them too so a
        # persisted subtree's scans/shuffles are counted once
        inner = n.innerChildren()
        it = inner.iterator()
        while it.hasNext():
            stack.append(it.next())
    return len(sh), len(sc)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    from tvbigdataproject_spark.queries import REGISTRY
    from tvbigdataproject_spark.session import get_spark

    spark = get_spark(
        app_name="plan-audit",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    rows = []
    failed = []
    for name in names or sorted(REGISTRY):
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            jqe = df._jdf.queryExecution()
            plan = jqe.executedPlan().toString()
            a = audit_plan(plan)
            a["uniq_sh"], a["uniq_scan"] = distinct_counts(jqe.executedPlan())
        except Exception as exc:
            failed.append((name, repr(exc)[:120]))
            continue
        rows.append((name, a))

    out = [
        "# PLANS.md — physical-plan audit (regenerate: `python tools/plan_audit.py`)",
        "",
        f"Scale factor dir: `{sf_dir}`. Column meanings in "
        "`tools/plan_audit.py`; invariants are ENFORCED by "
        "`tests/test_plans_physical.py` — this is the inventory.",
        "",
        "| query | shuffles | uniq | bcast | scans | uniq | pushed | arrow | py_row | nlj | cart |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        out.append(
            f"| {name} | {a['shuffles']} | {a['uniq_sh']} | {a['bcast']} | "
            f"{a['scans']} | {a['uniq_scan']} | "
            f"{a['scans_pushed']} | {a['arrow']} | "
            f"{a['py_row']} | {a['nlj']} | {a['cart']} |"
        )
    tot = {
        k: sum(a[k] for _, a in rows)
        for k in ("shuffles", "py_row", "nlj", "cart", "arrow")
    }
    out += [
        "",
        f"Totals over {len(rows)} plans: {tot['shuffles']} shuffle "
        f"exchanges, {tot['arrow']} Arrow-batched Python stages, "
        f"{tot['py_row']} row-at-a-time Python stages (invariant: 0), "
        f"{tot['nlj']} broadcast NLJ nodes (all in the declared "
        f"bounded-side set), {tot['cart']} cartesian products "
        "(invariant: 0).",
        "",
        "Iterative operators (pagerank, BFS/SSSP, LPA, MIS, k-core, "
        "dedup_components, bpe_merge_rounds) read as near-zero here: "
        "their per-round shuffles run EAGERLY during plan construction "
        "and the returned frame sits on checkpointed state — their "
        "per-round shapes are documented in SCALE.md's ladder instead.",
        "",
        "The `shuffles`/`scans` columns count plan-STRING nodes, which "
        "overstate executed stages for self-joining shapes: a subtree "
        "referenced k times prints k exchange nodes. The `uniq` columns "
        "next to each are the semanticHash-distinct counts — the same "
        "canonical equality ReuseExchange/AQE stage reuse keys off, "
        "i.e. what actually executes (triangle_count_neardup: ~120 "
        "printed exchanges, ~13 distinct). Review bench numbers against "
        "`uniq`, not the printed counts.",
    ]
    if failed:
        out += ["", "Failed to plan:"] + [f"- {n}: {e}" for n, e in failed]
    with open(os.path.join(REPO, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote PLANS.md ({len(rows)} plans, {len(failed)} failed)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
