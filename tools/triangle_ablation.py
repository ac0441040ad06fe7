"""Degree-orientation ablation for triangle counting (round-3 operator).

The scale hazard in triangle counting is the WEDGE count — the
intermediate of the two-hop join. Naive id-ordering puts all of a hub's
wedges at the hub: a boilerplate template shared by d documents yields
C(d, 2) wedges from that one node. Degree-ordering (orient every edge
toward the higher-(degree, id) endpoint, enumerate wedges at the lowest
corner) provably bounds total wedges at O(m^1.5) regardless of hubs.

This tool builds a hub-and-communities pair graph, runs
`triangle_corner_counts` (degree-oriented), and counts the wedge
intermediates under BOTH orientations so the mitigation is a measured
number, not a claim:

    python tools/triangle_ablation.py [--spokes 2000] [--communities 200]

Graph: one hub node connected to `spokes` spokes (star, no triangles
through the hub unless spokes interconnect), plus `communities` disjoint
5-cliques (10 edges, 10 triangles each) providing real triangles.
Expected: id-oriented wedges ≈ C(spokes, 2) + community wedges;
degree-oriented wedges ≈ community wedges only — the hub contributes
zero because every hub edge points INTO the hub (highest degree) and no
wedge roots there. Triangle counts must be identical either way.

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def build_graph(spark, spokes: int, communities: int):
    """Pair list: hub star + disjoint 5-cliques, ids disjoint."""
    from pyspark.sql import functions as F

    hub_id = 0
    star = spark.range(1, spokes + 1, numPartitions=16).select(
        F.lit(hub_id).alias("doc_a"), F.col("id").alias("doc_b")
    )
    # community c occupies ids base..base+4 with base = spokes+1 + 5c
    cliq = (
        spark.range(communities, numPartitions=16)
        .select((F.lit(spokes + 1) + F.col("id") * 5).alias("base"))
        .select(
            F.explode(
                F.expr(
                    "transform(flatten(transform(sequence(0,3), i -> "
                    "transform(sequence(i+1,4), j -> struct(i, j)))), "
                    "p -> struct(base + p.i AS a, base + p.j AS b))"
                )
            ).alias("e")
        )
        .select(F.col("e.a").alias("doc_a"), F.col("e.b").alias("doc_b"))
    )
    return star.unionByName(cliq)


def wedge_count(pairs, orientation: str) -> int:
    """Wedge-intermediate cardinality under the given orientation —
    mirrors triangle_corner_counts' internals for measurement."""
    from pyspark.sql import functions as F

    e = pairs.select("doc_a", "doc_b").distinct()
    if orientation == "degree":
        deg = (
            e.select(F.col("doc_a").alias("node"))
            .unionAll(e.select(F.col("doc_b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        ranked = (
            e.join(deg.selectExpr("node AS doc_a", "deg AS da"), "doc_a")
            .join(deg.selectExpr("node AS doc_b", "deg AS db"), "doc_b")
        )
        a_lower = (F.col("da") < F.col("db")) | (
            (F.col("da") == F.col("db")) & (F.col("doc_a") < F.col("doc_b"))
        )
        oriented = ranked.select(
            F.when(a_lower, F.col("doc_a")).otherwise(F.col("doc_b")).alias("lo"),
            F.when(a_lower, F.col("doc_b")).otherwise(F.col("doc_a")).alias("hi"),
        )
    else:
        oriented = e.select(
            F.least("doc_a", "doc_b").alias("lo"),
            F.greatest("doc_a", "doc_b").alias("hi"),
        )
    x, y = oriented.alias("x"), oriented.alias("y")
    return (
        x.hint("SHUFFLE_HASH")
        .join(
            y.hint("SHUFFLE_HASH"),
            (F.col("x.lo") == F.col("y.lo")) & (F.col("x.hi") < F.col("y.hi")),
        )
        .count()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spokes", type=int, default=2000)
    ap.add_argument("--communities", type=int, default=200)
    args = ap.parse_args()

    from tvbigdataproject_spark.operators.traversal import triangle_corner_counts
    from tvbigdataproject_spark.session import get_spark

    spark = get_spark(app_name="triangle-ablation")
    pairs_path = "/tmp/spark_graft_scale/triangle_pairs.parquet"
    os.makedirs(os.path.dirname(pairs_path), exist_ok=True)
    build_graph(spark, args.spokes, args.communities).write.mode(
        "overwrite"
    ).parquet(pairs_path)
    pairs = spark.read.parquet(pairs_path)

    out = {"spokes": args.spokes, "communities": args.communities}
    for orientation in ("id", "degree"):
        t0 = time.perf_counter()
        out[f"wedges_{orientation}"] = wedge_count(pairs, orientation)
        out[f"wedges_{orientation}_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    corners = triangle_corner_counts(pairs)
    total = corners.agg({"n_triangles": "sum"}).collect()[0][0]
    out["triangles_total_x3"] = int(total)  # each triangle has 3 corners
    out["expected_triangles"] = args.communities * 10
    out["operator_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
