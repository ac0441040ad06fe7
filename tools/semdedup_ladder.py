"""Density-scaled SemDeDup ladder (two-decade, reuses scale_ladder rungs).

The registered gate query `semdedup_prune` seeds a FIXED 8-centroid
set — deterministic so DuckDB can replay it, but at a fixed cell count
the within-cell pair space is quadratic in the corpus BY CONSTRUCTION,
which would charge the engine for rows the problem shape added (the
same reason scale_ladder.py salts its copies). The operator's 100 TB
contract (operators/similarity.py::semdedup_survivors) is "cluster
count scales with corpus density, bounding vectors per cell" — so this
ladder times the operator under that contract: k = 8 * copies
centroids, hash-sampled deterministically across the corpus
(ORDER BY xxhash64(vec_id) LIMIT k — a TakeOrdered, no full sort).

    python tools/semdedup_ladder.py [--rungs 10,100] [--reps 2]

Self-contained: generates only the embeddings table of each rung via
scale_ladder.generate(tables=["embeddings"]) — the per-copy Rademacher
isometry plus per-copy cell offsets, ~80 MB at c100 vs the full
ladder's ~60 GB — unless the directory already holds one.
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

def out_dir(copies: int) -> str:
    return f"/tmp/spark_graft_ladder_c{copies}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rungs", default="10,100")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--threshold", type=float, default=0.3)
    args = ap.parse_args()
    rungs = [int(x) for x in args.rungs.split(",")]

    from pyspark.sql import functions as F
    from scale_ladder import generate

    from tvbigdataproject_spark.operators.similarity import semdedup_survivors
    from tvbigdataproject_spark.session import get_spark

    spark = get_spark(
        app_name="semdedup-ladder",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    rec: dict = {}
    for copies in rungs:
        sf = out_dir(copies)
        if not os.path.exists(f"{sf}/embeddings.parquet"):
            t0 = time.time()
            generate(spark, copies, tables=["embeddings"])
            print(
                f"generated embeddings-only c{copies} rung in "
                f"{time.time()-t0:.0f}s",
                flush=True,
            )
        # a salted rung compresses into 1-3 parquet splits — 3 of 32
        # cores. A real 100 TB corpus arrives in thousands of splits;
        # equalize parallelism so the ratio measures the ALGORITHM
        emb = (
            spark.read.parquet(f"{sf}/embeddings.parquet")
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        k = 8 * copies
        cent = (
            emb.select("vec_id", "embedding")
            .orderBy(F.xxhash64("vec_id"), "vec_id")
            .limit(k)
        )
        rec[f"c{copies}"] = {"k": k}
        for variant, two_level in (("flat", False), ("routed", True)):
            best, rows, cold = float("inf"), None, None
            for rep in range(1 + args.reps):
                t0 = time.time()
                df = semdedup_survivors(
                    emb, cent, threshold=args.threshold, two_level=two_level
                )
                df.write.format("noop").mode("overwrite").save()
                el = time.time() - t0
                if rep == 0:
                    cold = el
                    rows = df.count()
                else:
                    best = min(best, el)
            if best == float("inf"):
                # --reps 0: no warm rep ran — use the cold elapsed
                # rather than poisoning the ratio rows with inf
                best = cold
            rec[f"c{copies}"][variant] = {"rows": rows, "sec": round(best, 2)}
            print(
                f"semdedup[{variant}] @c{copies} (k={k}): {rows} rows, "
                f"{best:.2f}s warm",
                flush=True,
            )
    lo, hi = f"c{rungs[0]}", f"c{rungs[-1]}"
    scale = rungs[-1] / rungs[0]
    for variant in ("flat", "routed"):
        ratio = rec[hi][variant]["sec"] / max(rec[lo][variant]["sec"], 1e-9)
        rec[variant + "_time_ratio"] = round(ratio, 2)
        rec[variant + "_per_decade"] = round(ratio / scale, 2)
        rec[variant + "_linear_ok"] = ratio <= 1.3 * scale
    print(json.dumps({"rungs": rungs, "semdedup_density_scaled": rec}))


if __name__ == "__main__":
    main()
