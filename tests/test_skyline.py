"""skyline_2d: exactness vs a brute-force dominance check, tie
handling, and the phase-2 broadcast shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tvbigdataproject_spark.operators.skyline import skyline_2d


def _brute_skyline(rows):
    out = []
    for p in rows:
        dominated = any(
            q[1] <= p[1]
            and q[2] >= p[2]
            and (q[1] < p[1] or q[2] > p[2])
            for q in rows
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def test_skyline_matches_brute_force(spark):
    rng = random.Random(7)
    rows = [
        (i, round(rng.uniform(1, 100), 2), rng.randint(1, 50))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, price double, size long").repartition(8)
    got = sorted(tuple(r) for r in skyline_2d(df, "price", "size").collect())
    assert got == _brute_skyline(rows)


def test_skyline_keeps_duplicate_extent_ties(spark):
    # two rows with the identical best (price, size) pair: neither
    # dominates the other, so BOTH survive.
    rows = [(1, 10.0, 9), (2, 10.0, 9), (3, 11.0, 9), (4, 10.0, 8)]
    df = spark.createDataFrame(rows, "id long, price double, size long")
    got = sorted(r["id"] for r in skyline_2d(df, "price", "size").collect())
    assert got == [1, 2]


def test_skyline_prefilter_never_drops_answers(spark):
    # degenerate all-on-the-front data: every point incomparable, the
    # pre-filter must pass all of them through.
    # price and size both increase: paying more always buys more, so
    # no point dominates any other.
    rows = [(i, float(i), i) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, price double, size long").repartition(6)
    assert skyline_2d(df, "price", "size").count() == 50


def test_skyline_phase2_is_broadcast(spark):
    rows = [(i, float(i % 9), i % 11) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, price double, size long")
    plan = skyline_2d(df, "price", "size")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan and "LeftAnti" in plan
    # phase 1 is the declared Arrow-batched scan-local pre-filter
    assert "MapInPandas" in plan


def test_registered_skyline_parts_uses_guarded_broadcast(spark):
    # the REGISTERED query must both arm the degenerate-front guard and
    # still take the broadcast path on real (small-front) data. The
    # guarded path runs eagerly and checkpoints its (small) result, so
    # the finisher choice is exposed as an attribute rather than in the
    # returned frame's plan.
    from tvbigdataproject_spark.queries.registry import REGISTRY

    df = REGISTRY["skyline_parts"].fn(spark, "/root/testdata/sf0.001")
    assert df.skyline_finisher == "broadcast"
    assert df.count() > 0


def test_skyline_guard_releases_candidate_cache(spark):
    # the guard persists the candidate front around the count; it must
    # release it before returning — repeated construction (bench runs a
    # query 5x) must not accumulate cached fronts.
    sc = spark.sparkContext
    rows = [(i, float(i % 9), i % 11) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, price double, size long")
    before = len(sc._jsc.getPersistentRDDs())
    for _ in range(3):
        skyline_2d(df, "price", "size", broadcast_limit=50_000).count()
    after = len(sc._jsc.getPersistentRDDs())
    # each invocation may leave its small checkpointed RESULT, but the
    # candidate cache itself must be gone (persist+unpersist pairs off)
    assert after - before <= 3


def test_skyline_window_fallback_matches_broadcast_path(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.uniform(0, 100), rng.randint(0, 50)) for i in range(300)]
    # force the guard to trip (limit 0 < any candidate count): the
    # shuffle-window finisher must agree with the broadcast finisher,
    # ties and all
    df = spark.createDataFrame(rows, "id long, price double, size long").repartition(5)
    broad = {tuple(r) for r in skyline_2d(df, "price", "size").collect()}
    windowed = {
        tuple(r)
        for r in skyline_2d(df, "price", "size", broadcast_limit=0).collect()
    }
    assert windowed == broad


def test_skyline_window_fallback_keeps_ties_on_degenerate_front(spark):
    # every point on the front, with duplicated extents — the windowed
    # path must keep whole tie-groups exactly like the broadcast path
    rows = [(i, float(i // 2), i // 2) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, price double, size long")
    got = sorted(
        r["id"] for r in skyline_2d(df, "price", "size", broadcast_limit=0).collect()
    )
    assert got == list(range(40))


def test_skyline_window_fallback_has_no_nlj(spark):
    from tvbigdataproject_spark.operators.skyline import _skyline_2d_window

    rows = [(i, float(i % 9), i % 11) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, price double, size long")
    # a tripped guard reports the window finisher...
    out = skyline_2d(df, "price", "size", broadcast_limit=0)
    assert out.skyline_finisher == "window"
    # ...and the window finisher's plan itself carries no NLJ (the
    # guarded path checkpoints its result, so inspect the inner plan)
    plan = (
        _skyline_2d_window(df, "price", "size")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
