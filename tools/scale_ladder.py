"""Two-decade Spark-only timing ladder (VERDICT r4 item 2): time the
shuffle-heaviest operators at 10-copy (~sf1) and 100-copy (~sf10)
scale and report the per-decade growth factor, catching any
super-linear term the single sf1 rung hides.

    python tools/scale_ladder.py [--rungs 10,100] [query ...]

Correctness at scale is tools/scale_parity.py's job (full oracle at
sf1); this tool answers only "does wall time grow ≤ linearly with
data?" — so it salts the generated copies to keep each op's OUTPUT
linear in the copy count:

- document text gets a per-copy prefix token, so near-dup groups never
  span copies (unsalted, k identical copies produce k(k-1)/2 pairs per
  group — output growth that is quadratic BY DEFINITION and would
  charge the engine for rows the problem itself added);
- embeddings get a per-copy offset added to dimension 0, decorrelating
  copies for the same reason;
- relational/graph keys are offset per copy exactly like
  scale_parity.py, so each copy is an internally-consistent world and
  graph ops see disjoint subgraphs.

Report: per query, rows + warm-min seconds per rung, and
ratio = t_hi / t_lo. With rungs 10->100 (10x data), ratio <= ~13
(1.3x of linear) is the pass bar; the JSON line carries the verdict.
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

SRC = "/root/testdata/sf0.1"
OFFSET = 50_000_000
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
BOUNDED = ("region", "nation")

DEFAULT_QUERIES = [
    # pair-producing tier
    "embed_neardup_pairs",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "pair_candidates_shared_parts",
    # iterative tier
    "dedup_components",
    "pagerank_trade_graph",
    "bfs_hops_trade",
    "lpa_communities",
    # span/window heavies
    "dedup_max_spans",
    "rolling_24h_stats",
]


def out_dir(copies: int) -> str:
    return f"/tmp/spark_graft_ladder_c{copies}"


def generate(spark, copies: int, tables: list[str] | None = None) -> None:
    """Materialize the salted rung. `tables` restricts to a subset of
    the widened tables (e.g. ["embeddings"] for the SemDeDup ladder,
    which needs none of the 60 GB relational tier)."""
    from pyspark.sql import functions as F

    out = out_dir(copies)
    os.makedirs(out, exist_ok=True)
    for t in BOUNDED:
        if tables is not None and t not in tables:
            continue
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    for t, keys in KEYS.items():
        if tables is not None and t not in tables:
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        widened = df.withColumn(
            "_copy", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
        )
        cols = []
        for c in df.columns:
            if c in keys:
                # long arithmetic: int _copy * 50M overflows int32 at
                # copy >= 43
                cols.append(
                    (
                        F.col(c) + F.col("_copy").cast("long") * OFFSET
                    ).alias(c)
                )
            elif t == "documents" and c == "text":
                # suffix EVERY token with the copy index: one prefix
                # token is not enough (copies still near-dup at 41x
                # pair fan-out, measured) — per-token salting makes
                # every shingle copy-unique while preserving the dup
                # structure inside each copy exactly
                cols.append(
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(F.col(c), " "),
                            lambda w: F.concat(
                                w, F.lit("§"), F.col("_copy").cast("string")
                            ),
                        ),
                    ).alias(c)
                )
            elif t == "embeddings" and c == "embedding":
                # per-copy Rademacher ISOMETRY: flip each dimension's
                # sign by a deterministic per-(copy, dim) pattern.
                # Intra-copy cosines are preserved bit-for-bit (diagonal
                # +/-1 matrix is orthogonal) while any two copies differ
                # in ~half the dims, killing cross-copy correlation even
                # for smooth/clustered vectors (a small rotation did
                # not: copies stayed near-dup at 25x fan-out, measured).
                # Multiplier never vanishes mod 101 for copy < 100, so
                # no two copies share a pattern.
                def rademacher(x, i):
                    h = F.pmod(
                        (F.col("_copy") + 1) * (i.cast("long") + 1) * 7919,
                        F.lit(101),
                    )
                    sign = F.when(h < 50, F.lit(-1.0)).otherwise(F.lit(1.0))
                    return (x * sign).cast("float")

                cols.append(F.transform(F.col(c), rademacher).alias(c))
            elif t == "embeddings" and c == "label":
                # per-copy cell space: the neardup blocker keys on the
                # label cell, and its documented 100 TB contract is
                # "cells scale with corpus density, bounding vectors
                # per cell". Sharing cells across copies grows each
                # cell's pair space quadratically; offsetting the cell
                # id per copy is exactly the contract at 10x density.
                # (The Rademacher flip alone is not enough here: the
                # query's 0.3 threshold sits inside the +/-1/sqrt(64)
                # random-cosine tail, measured 129k tail pairs at c10.)
                cols.append(
                    (F.col(c) + F.col("_copy") * 1000).cast("int").alias(c)
                )
            else:
                cols.append(F.col(c))
        widened.select(*cols).write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rungs", default="10,100")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    rungs = [int(x) for x in args.rungs.split(",")]
    names = args.queries or DEFAULT_QUERIES

    from tvbigdataproject_spark.queries import REGISTRY
    from tvbigdataproject_spark.session import get_spark

    spark = get_spark(
        app_name="scale-ladder",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for copies in rungs:
        if not args.skip_gen:
            t0 = time.time()
            generate(spark, copies)
            print(
                f"generated {copies}-copy rung under {out_dir(copies)} "
                f"in {time.time()-t0:.0f}s",
                flush=True,
            )

    results: dict[str, dict] = {}
    for name in names:
        fn = REGISTRY[name].fn
        rec: dict = {}
        for copies in rungs:
            sf = out_dir(copies)
            best, rows = float("inf"), None
            for rep in range(1 + args.reps):
                t0 = time.time()
                df = fn(spark, sf)
                df.write.format("noop").mode("overwrite").save()
                el = time.time() - t0
                if rep == 0:
                    rows = df.count()  # once; not part of timing
                else:
                    best = min(best, el)
            rec[f"c{copies}"] = {"rows": rows, "sec": round(best, 2)}
            print(f"{name} @c{copies}: {rows} rows, {best:.2f}s warm", flush=True)
            spark.sparkContext._jvm.System.gc()
        lo, hi = f"c{rungs[0]}", f"c{rungs[-1]}"
        scale = rungs[-1] / rungs[0]
        ratio = rec[hi]["sec"] / max(rec[lo]["sec"], 1e-9)
        rec["time_ratio"] = round(ratio, 2)
        rec["row_ratio"] = round(rec[hi]["rows"] / max(rec[lo]["rows"], 1), 2)
        rec["per_decade"] = round(ratio / scale, 2)
        rec["linear_ok"] = ratio <= 1.3 * scale
        results[name] = rec
        print(
            f"  -> {name}: {rec[lo]['sec']}s -> {rec[hi]['sec']}s "
            f"(x{rec['time_ratio']}, data x{scale:.0f}, "
            f"per-decade {rec['per_decade']}, "
            f"{'OK' if rec['linear_ok'] else 'SUPER-LINEAR'})",
            flush=True,
        )
    print(json.dumps({"rungs": rungs, "results": results}))


if __name__ == "__main__":
    main()
