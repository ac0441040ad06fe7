"""Layout ablation for iterative frontier joins (VERDICT r10 item 6):
wire the proven-shuffle-free bucketed layout (sources/io.py
write_bucketed, tests/test_bucketed_join.py) into the hot consumer it
was built for — the per-round edges-join-frontier of the iterative
graph family — and MEASURE what each layout saves per round.

Three layouts of the same static trade edge list, same K rounds of
(edges ⋈ frontier on src → groupBy dst → sum):

  shuffled    eager localCheckpoint of the raw edge plan — today's
              operators/pagerank.py shape; every round exchanges BOTH
              the edge side and the frontier side.
  colocated   repartition(N, src) BEFORE the checkpoint — LogicalRDD
              preserves the physical HashPartitioning, so every
              round's join proves the edge side already satisfies its
              distribution requirement and exchanges ONLY the
              (node-sized) frontier. Zero storage cost; works for
              in-session loops.
  bucketed    write_bucketed(..., bucket by src) + catalog read — the
              same co-location guarantee from DISK: the layout
              survives sessions/restarts and is what a 100 TB cluster
              pipeline would pre-materialize once and join against in
              every run.

    python tools/bucketed_iter_ladder.py [--rungs 10,100] [--rounds 5]

Per rung x layout: warm-min seconds for the K-round loop + the number
of ShuffleExchange nodes in one round's physical plan. Results go to
SCALE.md (the "co-located variant beats the shuffled one at c100"
ladder row the r10 verdict asked for).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

from scale_ladder import generate, out_dir  # noqa: E402


def _edges(spark, rung_dir: str):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{rung_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{rung_dir}/orders.parquet")
    e0 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (-F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    return e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _loop(spark, edges, rounds: int) -> tuple[float, int]:
    """K rounds of the frontier-join shape; returns (seconds, #exchanges
    in one round's plan). The frontier starts as unit mass per node and
    each round is edges⋈x on src → groupBy dst → exact integer sum —
    the pagerank/Katz/WL kernel stripped to its shuffle skeleton."""
    from pyspark.sql import functions as F

    x = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(1000000).cast("long").alias("m")
    )
    t0 = time.perf_counter()
    for _ in range(rounds):
        x = (
            edges.join(x.select(F.col("node").alias("src"), "m"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.expr("CAST(SUM(m) div 8 AS BIGINT)").alias("m"))
        )
    x.write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    one = (
        edges.join(
            edges.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.lit(1).alias("m"))
            .select(F.col("node").alias("src"), "m"),
            "src",
        )
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum("m").alias("m"))
    )
    n_ex = one._jdf.queryExecution().executedPlan().toString().count(
        "Exchange hashpartitioning"
    )
    return sec, n_ex


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rungs", default="10,100")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()
    rungs = [int(r) for r in args.rungs.split(",")]

    from tvbigdataproject_spark.session import get_spark
    from tvbigdataproject_spark.sources.io import read_bucketed, write_bucketed

    spark = get_spark(app_name="bucketed-iter-ladder")
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    report: dict = {"rounds": args.rounds, "nparts": nparts, "rungs": {}}
    for copies in rungs:
        rd = out_dir(copies)
        if not args.skip_gen or not os.path.isdir(f"{rd}/lineitem.parquet"):
            generate(spark, copies, tables=["lineitem", "orders"])
        raw = _edges(spark, rd)
        rung: dict = {}

        # deterministic checkpoint release between layouts (ADVICE
        # r11): DataFrame.unpersist() does NOT free localCheckpoint
        # blocks — the backing RDD lives outside the cacheManager —
        # so the earlier layouts' edge tables would stay persisted
        # while the later ones are timed, skewing the very ablation
        # this tool measures (c100 especially). Track the persisted
        # ids and release them explicitly instead.
        from tvbigdataproject_spark.operators.components import (
            _checkpoint_tracked,
            _unpersist_ids,
        )

        sc = spark.sparkContext
        ck, ids = _checkpoint_tracked(raw, sc)
        rung["shuffled"] = _time_layout(spark, ck, args)
        _unpersist_ids(sc, ids)

        ck, ids = _checkpoint_tracked(raw.repartition(nparts, "src"), sc)
        rung["colocated"] = _time_layout(spark, ck, args)
        _unpersist_ids(sc, ids)

        tbl = f"t_edges_b_c{copies}"
        t0 = time.perf_counter()
        write_bucketed(raw, tbl, ["src"], nparts, sort_cols=["src"])
        write_sec = round(time.perf_counter() - t0, 1)
        rung["bucketed"] = _time_layout(spark, read_bucketed(spark, tbl), args)
        rung["bucketed"]["write_sec"] = write_sec
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")

        report["rungs"][f"c{copies}"] = rung
        print(f"c{copies}: {json.dumps(rung)}", flush=True)
    print(json.dumps(report), flush=True)


def _time_layout(spark, edges, args) -> dict:
    best, n_ex = float("inf"), None
    for _ in range(args.reps):
        sec, n_ex = _loop(spark, edges, args.rounds)
        best = min(best, sec)
    return {"sec": round(best, 2), "round_exchanges": n_ex}


if __name__ == "__main__":
    main()
