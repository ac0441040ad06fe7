"""tools/plan_audit.py::audit_plan — node counting over a canned
simple-mode physical plan string (no Spark)."""

from __future__ import annotations

from tools.plan_audit import audit_plan

PLAN = """AdaptiveSparkPlan isFinalPlan=false
+- HashAggregate(keys=[k], functions=[count(1)])
   +- Exchange hashpartitioning(k#1, 32), ENSURE_REQUIREMENTS, [plan_id=9]
      +- BroadcastHashJoin [a#2], [b#3], Inner, BuildRight, false
         :- Filter isnotnull(a#2)
         :  +- FileScan parquet [a#2] Batched: true, PushedFilters: [IsNotNull(a)], ReadSchema: struct<a:bigint>
         +- BroadcastExchange HashedRelationBroadcastMode, [plan_id=5]
            +- FileScan parquet [b#3] Batched: true, PushedFilters: [], ReadSchema: struct<b:bigint>
"""


def test_counts_exchanges_scans_and_pushdown():
    a = audit_plan(PLAN)
    assert a["shuffles"] == 1
    assert a["bcast"] == 1
    assert a["scans"] == 2
    assert a["scans_pushed"] == 1  # the empty PushedFilters: [] is not
    assert a["py_row"] == 0 and a["cart"] == 0 and a["nlj"] == 0


def test_flags_python_and_join_antipatterns():
    plan = (
        "Exchange rangepartitioning(x#1 ASC, 32)\n"
        "+- BatchEvalPython [f(x#1)]\n"
        "   +- MapInPandas g(y#2)\n"
        "      +- BroadcastNestedLoopJoin BuildRight, LeftAnti\n"
        "         +- CartesianProduct\n"
    )
    a = audit_plan(plan)
    assert a["shuffles"] == 1
    assert a["py_row"] == 1
    assert a["arrow"] == 1
    assert a["nlj"] == 1
    assert a["cart"] == 1
