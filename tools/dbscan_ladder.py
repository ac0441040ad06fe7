"""Density-scaled DBSCAN ladder (two-decade, reuses scale_ladder rungs).

The gate query `dbscan_embeddings` blocks neighbors by the `label`
cell; scale_ladder's embeddings rungs give every copy its own cell-id
offset, so the cell COUNT grows with the corpus while per-cell density
stays fixed — the operator's 100 TB contract. This times
operators/clustering.py::dbscan_cosine under that contract: the pair
join is per-cell-quadratic but cells are constant-size, and the
component step runs on core-core edges only.

    python tools/dbscan_ladder.py [--rungs 10,100] [--reps 2]
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
    ap.add_argument("--threshold", type=float, default=0.2)
    ap.add_argument("--min-pts", type=int, default=4)
    args = ap.parse_args()
    rungs = [int(x) for x in args.rungs.split(",")]

    from scale_ladder import generate

    from tvbigdataproject_spark.operators.clustering import dbscan_cosine
    from tvbigdataproject_spark.session import get_spark

    spark = get_spark(
        app_name="dbscan-ladder",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    rec: dict = {}
    for copies in rungs:
        sf = out_dir(copies)
        if not os.path.exists(f"{sf}/embeddings.parquet"):
            t0 = time.time()
            generate(spark, copies, tables=["embeddings"])
            print(f"generated embeddings-only c{copies} rung in "
                  f"{time.time()-t0:.0f}s", flush=True)
        # equalize split parallelism (see semdedup_ladder.py rationale)
        emb = (
            spark.read.parquet(f"{sf}/embeddings.parquet")
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        best, rows, cold = float("inf"), None, None
        for rep in range(1 + args.reps):
            t0 = time.time()
            # dbscan_cosine materializes its verdict eagerly — the call
            # itself is the timed unit
            df = dbscan_cosine(
                emb, threshold=args.threshold, min_pts=args.min_pts
            )
            el = time.time() - t0
            if rep == 0:
                cold = el
                rows = df.count()
            else:
                best = min(best, el)
        if best == float("inf"):
            # --reps 0: no warm rep ran — fall back to the cold elapsed
            # rather than poisoning time_ratio/per_decade with inf
            best = cold
        rec[f"c{copies}"] = {"rows": rows, "sec": round(best, 2)}
        print(f"dbscan @c{copies}: {rows} rows, {best:.2f}s warm", flush=True)
    lo, hi = f"c{rungs[0]}", f"c{rungs[-1]}"
    scale = rungs[-1] / rungs[0]
    ratio = rec[hi]["sec"] / max(rec[lo]["sec"], 1e-9)
    rec["time_ratio"] = round(ratio, 2)
    rec["per_decade"] = round(ratio / scale, 2)
    rec["linear_ok"] = ratio <= 1.3 * scale
    print(json.dumps({"rungs": rungs, "dbscan_density_scaled": rec}))


if __name__ == "__main__":
    main()
