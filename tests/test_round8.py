"""Round-8 operator tests: PQ assignment, k-truss support/peel,
interval coalescing, Mann-Whitney — each against a pure-Python model
or a structural invariant the oracle comparison cannot see."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ PQ


def test_pq_assign_matches_python_model(spark):
    from tvbigdataproject_spark.operators.clustering import (
        QUANT_SCALE,
        pq_assign,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()

    def half_away(v: float) -> int:
        # Spark HALF_UP / DuckDB round(): half away from zero —
        # Python's round() is half-EVEN and disagrees on exact ties
        import math

        return int(math.copysign(math.floor(abs(v) + 0.5), v))

    qv = {
        r.vec_id: [
            half_away(float(x) * QUANT_SCALE) for x in r.embedding
        ]
        for r in rows
    }

    def md5key(i):
        return (hashlib.md5(str(i).encode()).hexdigest(), i)

    seeds = sorted(qv, key=md5key)[:16]
    books = [qv[i] for i in seeds]  # codeword id = md5 rank

    def assign(v):
        codes, errs = [], []
        for s in range(4):
            lo = s * 16
            best = min(
                (
                    (
                        sum(
                            (v[j] - cw[j]) ** 2
                            for j in range(lo, lo + 16)
                        ),
                        ci,
                    )
                    for ci, cw in enumerate(books)
                ),
            )
            errs.append(best[0])
            codes.append(best[1])
        return codes, sum(errs)

    got = {
        r.vec_id: ((r.code0, r.code1, r.code2, r.code3), r.err_total)
        for r in pq_assign(emb).collect()
    }
    assert len(got) == len(qv)
    for vid, v in qv.items():
        codes, err = assign(v)
        assert got[vid] == (tuple(codes), err), vid


def test_pq_assign_invariant_to_partitioning(spark):
    from tvbigdataproject_spark.operators.clustering import pq_assign

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = sorted(map(tuple, pq_assign(emb).collect()))
    b = sorted(map(tuple, pq_assign(emb.repartition(7)).collect()))
    assert a == b


# ------------------------------------------------------------- k-truss


def test_ktruss_support_and_peel_on_hand_graph(spark):
    from tvbigdataproject_spark.queries.graph7 import _support

    # triangle 1-2-3 plus pendant edge 3-4 plus a second triangle 3-5-6
    # sharing only node 3: the pendant edge dies in peel 1, both
    # triangles survive with support 1 each edge
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (3, 6), (5, 6)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    sup = {
        (r.doc_a, r.doc_b): r.support for r in _support(pairs).collect()
    }
    # zero-support edges never appear in the wedge-join output
    assert (3, 4) not in sup
    for e in [(1, 2), (1, 3), (2, 3), (3, 5), (3, 6), (5, 6)]:
        assert sup[e] == 1, e
    # peel: survivors of support >= 1 are the two triangles
    e1 = [e for e, s in sup.items() if s >= 1]
    p1 = spark.createDataFrame(e1, "doc_a long, doc_b long")
    sup2 = {
        (r.doc_a, r.doc_b): r.support for r in _support(p1).collect()
    }
    assert set(sup2) == set(e1)
    assert all(s == 1 for s in sup2.values())


# -------------------------------------------------- interval coalesce


def test_interval_coalesce_hand_intervals(spark):
    # overlapping [0,10],[5,20] merge; touching [20,30] also merges
    # (start == running max end); [31,40] opens a new span; user 2
    # independent
    from pyspark.sql import Window

    rows = [
        (1, 100, 0, 10),
        (1, 101, 5, 20),
        (1, 102, 20, 30),
        (1, 103, 31, 40),
        (2, 200, 0, 5),
    ]
    iv = spark.createDataFrame(
        rows, "user_id long, event_id long, s_us long, e_us long"
    )
    order = [F.col("s_us"), F.col("e_us"), F.col("event_id")]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    opener = F.when(
        F.col("prev_max").isNull() | (F.col("s_us") > F.col("prev_max")), 1
    ).otherwise(0)
    g = (
        iv.withColumn("prev_max", F.max("e_us").over(w_prev))
        .select(
            "user_id",
            "s_us",
            "e_us",
            F.sum(opener).over(w_run).cast("long").alias("grp"),
        )
        .groupBy("user_id", "grp")
        .agg(
            F.min("s_us").alias("lo"),
            F.max("e_us").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    got = {
        (r.user_id, r.grp): (r.lo, r.hi, r.n) for r in g.collect()
    }
    assert got == {
        (1, 1): (0, 30, 3),
        (1, 2): (31, 40, 1),
        (2, 1): (0, 5, 1),
    }


def test_interval_coalesce_spans_cover_and_disjoint(spark):
    from tvbigdataproject_spark.queries.registry import REGISTRY

    out = REGISTRY["interval_coalesce_user"].fn(spark, SF_DIR).collect()
    by_user: dict = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(
            (r.span_start_us, r.span_end_us)
        )
    assert out, "no spans"
    for user, spans in by_user.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2, (user, (s1, e1), (s2, e2))  # strictly disjoint
            assert s1 <= e1 and s2 <= e2


# --------------------------------------------------- Mann-Whitney U


def test_mann_whitney_matches_python_ranks(spark):
    from tvbigdataproject_spark.queries.registry import REGISTRY

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    a = sorted(
        int(round(r.c_acctbal * 100))
        for r in cust
        if r.c_mktsegment == "BUILDING"
    )
    b = sorted(
        int(round(r.c_acctbal * 100))
        for r in cust
        if r.c_mktsegment == "MACHINERY"
    )
    pooled = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    # doubled average ranks, grouped by value
    r1_doubled = 0
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        dbl = (i + 1) + j  # 2 * avg of ranks i+1..j
        r1_doubled += sum(dbl for k in range(i, j) if pooled[k][1] == 0)
        i = j
    u1_doubled = r1_doubled - len(a) * (len(a) + 1)
    row = REGISTRY["mann_whitney_u"].fn(spark, SF_DIR).collect()[0]
    assert (row.n1, row.n2) == (len(a), len(b))
    assert row.r1_doubled == r1_doubled
    assert row.u1_doubled == u1_doubled
    assert abs(row.u1 - u1_doubled / 2.0) < 1e-9


# ----------------------------------------------- U-shaped attribution


def test_u_shaped_weights_sum_to_1000_per_purchase(spark):
    from tvbigdataproject_spark.queries.registry import REGISTRY

    out = REGISTRY["attribution_u_shaped"].fn(spark, SF_DIR).collect()
    assert out, "no attributed clicks"
    by_p: dict = {}
    for r in out:
        by_p.setdefault(r.purchase_id, []).append(r)
    for pid, rows in by_p.items():
        total = sum(r.weight_permille for r in rows)
        assert total == 1000, (pid, total)
        n = rows[0].n_clicks
        assert len(rows) == n
        w_by_pos = {r.pos: r.weight_permille for r in rows}
        if n >= 3:
            assert w_by_pos[1] == 400 and w_by_pos[n] == 400
            mids = [w_by_pos[p] for p in range(2, n)]
            # middles differ by at most 1 permille, earliest get extras
            assert max(mids) - min(mids) <= 1
            assert sorted(mids, reverse=True) == mids


# -------------------------------------------- label dispersion


def test_label_dispersion_matches_python(spark):
    from tvbigdataproject_spark.queries.registry import REGISTRY

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    by_label: dict = {}
    for r in emb:
        q = [int(_half_away(float(x) * (1 << 20))) for x in r.embedding]
        by_label.setdefault(r.label, []).append(q)
    want = {}
    for lb, vecs in by_label.items():
        n = len(vecs)
        cent = [
            int(__import__("math").floor(sum(v[i] for v in vecs) / n))
            for i in range(64)
        ]
        tot = sum(
            sum((v[i] - cent[i]) ** 2 for i in range(64)) for v in vecs
        )
        want[lb] = (n, tot, tot // n)
    got = {
        r.label: (r.n, r.total_disp, r.avg_disp)
        for r in REGISTRY["embed_label_dispersion"].fn(spark, SF_DIR).collect()
    }
    assert got == want


def _half_away(v: float) -> int:
    import math

    return int(math.copysign(math.floor(abs(v) + 0.5), v))
