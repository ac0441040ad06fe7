"""Scale validation for the shuffle-hazard operators (VERDICT r1 item 2).

/root/testdata tops out at sf0.1 and is read-only, so this tool
Spark-generates seeded scaled-up inputs under /tmp and drives the
operators whose cost is super-linear in theory — the dedup tiers
(candidate joins) and pair_candidates (hub-degree quadratic hazard) —
comparing wall time against the sf0.1 reference points.

    python tools/scale_check.py [--factor 10]

Prints one JSON line:
  {"documents_rows": ..., "dedup": {op: sec}, "dedup_sf01": {op: sec},
   "pair_candidates": {"uncapped_sec": ..., "capped_sec": ...,
                       "uncapped_pairs": ..., "capped_pairs": ...}}

Pass/fail judgement is left to the reader: the interesting signal is
whether a 10x input blows up an operator by ~10x (linear: fine) or
~100x (quadratic: the hazard fired).
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

SCRATCH = "/tmp/spark_graft_scale"

# the sf0.1 documents vocabulary (inspected 2026-08-13): ~50 short
# engine-ish words, single-space separated
VOCAB = (
    "spark part line column order small sort fast query agg table scan "
    "batch vector value filter customer stream hash join shuffle read "
    "write cache disk memory node task stage plan code gen row group "
    "page file block key map reduce merge split skew salt probe build"
).split()


def gen_documents(spark, n_docs: int, path: str) -> None:
    """Seeded synthetic documents: hash-driven word sampling (fully
    distributed — no driver-side data), ~4% exact duplicates via a
    shared text seed, doc lengths 10..80 words like the sf0.1 table."""
    from pyspark.sql import functions as F

    vocab = F.array(*[F.lit(w) for w in VOCAB])
    # every 25th doc reuses the previous doc's text seed → exact dup
    seed = F.when(
        F.col("id") % 25 == 0, F.col("id") - 1
    ).otherwise(F.col("id"))
    length = F.pmod(F.hash(seed.cast("string")), F.lit(71)) + 10
    words = F.transform(
        F.sequence(F.lit(1), length),
        lambda i: F.element_at(
            vocab, 1 + F.pmod(F.hash(F.concat_ws(":", seed, i)), F.lit(len(VOCAB))).cast("int")
        ),
    )
    (
        spark.range(n_docs, numPartitions=32)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", words).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("synthetic").alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
        .write.mode("overwrite").parquet(path)
    )


def gen_skewed_edges(spark, n_ents: int, hub_degree: int, path: str) -> None:
    """(ent, item) edges: 10 hash-random items per entity over a 50k-item
    space, plus one hub item shared by ``hub_degree`` entities — the
    viral-hashtag shape that makes pair enumeration quadratic."""
    from pyspark.sql import functions as F

    base = (
        spark.range(n_ents, numPartitions=32)
        .select(
            F.col("id").alias("ent"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(9)),
                    lambda j: F.pmod(F.hash(F.concat_ws(":", F.col("id"), j)), F.lit(50000)),
                )
            ).alias("item"),
        )
    )
    hub = (
        spark.range(hub_degree, numPartitions=8)
        .select(F.col("id").alias("ent"), F.lit(999_999).alias("item"))
    )
    base.unionByName(hub).write.mode("overwrite").parquet(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10, help="multiple of sf0.1 (5k docs)")
    ap.add_argument("--hub-degree", type=int, default=5000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tvbigdataproject_spark.operators.dedup import (
        exact_dedup_groups,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from tvbigdataproject_spark.operators.graph import pair_candidates
    from tvbigdataproject_spark.session import get_spark

    spark = get_spark(app_name="scale-check")
    n_docs = 5000 * args.factor
    docs_path = os.path.join(SCRATCH, f"documents_x{args.factor}.parquet")
    edges_path = os.path.join(SCRATCH, f"edges_hub{args.hub_degree}.parquet")
    gen_documents(spark, n_docs, docs_path)
    gen_skewed_edges(spark, 200_000, args.hub_degree, edges_path)

    docs = spark.read.parquet(docs_path)
    docs.select("doc_id").write.format("noop").mode("overwrite").save()  # page-cache warm
    ref_docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    ref_docs.select("doc_id").write.format("noop").mode("overwrite").save()

    dedup_ops = {
        "exact": lambda d: exact_dedup_groups(d),
        "minhash_lsh": lambda d: minhash_lsh_pairs(d, n=3, threshold=0.4),
        "simhash": lambda d: simhash_pairs(d, max_hamming=2),
        "ngram_jaccard": lambda d: ngram_jaccard_pairs(d, n=3, threshold=0.4),
    }

    def run(df_or_q) -> float:
        t0 = time.perf_counter()
        df_or_q.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    results = {"documents_rows": n_docs, "dedup": {}, "dedup_sf01": {}}
    for name, op in dedup_ops.items():
        run(op(ref_docs))  # JIT warm
        results["dedup_sf01"][name] = run(op(ref_docs))
        results["dedup"][name] = run(op(docs))

    # connected components: (a) end-to-end clustering of the 10x corpus's
    # near-dup pairs, (b) a 1M-node graph of 1000-node chains — the
    # worst-case diameter that makes plain propagation take 1000 rounds
    # and pointer jumping ~log2(1000) ≈ 10.
    from tvbigdataproject_spark.operators.components import connected_components

    pairs_path = os.path.join(SCRATCH, f"neardup_pairs_x{args.factor}.parquet")
    ngram_jaccard_pairs(docs, n=3, threshold=0.4).select("doc_a", "doc_b").write.mode(
        "overwrite"
    ).parquet(pairs_path)
    pairs = spark.read.parquet(pairs_path)
    t0 = time.perf_counter()
    n_clustered = connected_components(pairs, src="doc_a", dst="doc_b").count()
    t_cc = round(time.perf_counter() - t0, 2)

    chains = (
        spark.range(1_000_000, numPartitions=32)
        .where(F.col("id") % 1000 != 999)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    chains.write.mode("overwrite").parquet(os.path.join(SCRATCH, "chains.parquet"))
    chain_edges = spark.read.parquet(os.path.join(SCRATCH, "chains.parquet"))
    t0 = time.perf_counter()
    n_chain_nodes = connected_components(chain_edges, max_iter=30).count()
    t_chain = round(time.perf_counter() - t0, 2)
    results["components"] = {
        "neardup_nodes": n_clustered,
        "neardup_sec": t_cc,
        "chain_nodes": n_chain_nodes,
        "chain_sec": t_chain,
    }

    edges = spark.read.parquet(edges_path)
    edges.write.format("noop").mode("overwrite").save()
    uncapped = pair_candidates(edges, min_shared=2, src_col="ent", item_col="item")
    capped = pair_candidates(
        edges, min_shared=2, src_col="ent", item_col="item", max_item_degree=1000
    )
    t0 = time.perf_counter()
    n_unc = uncapped.count()
    t_unc = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    n_cap = capped.count()
    t_cap = round(time.perf_counter() - t0, 2)
    results["pair_candidates"] = {
        "hub_degree": args.hub_degree,
        "uncapped_sec": t_unc,
        "uncapped_pairs": n_unc,
        "capped_sec": t_cap,
        "capped_pairs": n_cap,
    }

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
