"""Density-scaled multi-probe assignment ladder (the SemDeDup-study
discipline applied to nearest_cells_quantized).

The blocker's 100 TB contract scales cell count with corpus density
(k = CELLS_PER_COPY * copies, per-cell density fixed). Under that
contract the FLAT top-p assignment is O(N*k) = quadratic in the copy
count by construction; the two-level leader-routed path is O(N*sqrt(k)).
This times BOTH at the scale_ladder embeddings rungs so the growth
exponents are measured, not argued.

    python tools/multiprobe_ladder.py [--rungs 10,100] [--reps 2]
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

CELLS_PER_COPY = 16


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rungs", default="10,100")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--modes", default="flat,two_level")
    args = ap.parse_args()
    rungs = [int(x) for x in args.rungs.split(",")]

    from scale_ladder import generate, out_dir

    from tvbigdataproject_spark.operators.similarity import (
        nearest_cells_quantized,
    )
    from tvbigdataproject_spark.session import get_spark

    spark = get_spark(
        app_name="multiprobe-ladder",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    results: dict = {}
    modes = [(m, m == "two_level") for m in args.modes.split(",")]
    for mode, two_level in modes:
        rec: dict = {}
        for copies in rungs:
            sf = out_dir(copies)
            if not os.path.exists(f"{sf}/embeddings.parquet"):
                generate(spark, copies, tables=["embeddings"])
            emb = (
                spark.read.parquet(f"{sf}/embeddings.parquet")
                .repartition(32)
                .localCheckpoint(eager=True)
            )
            k = CELLS_PER_COPY * copies
            best, rows, cold = float("inf"), None, None
            for rep in range(1 + args.reps):
                t0 = time.time()
                df = nearest_cells_quantized(
                    emb, k=k, n_probes=2, two_level=two_level
                )
                df.write.format("noop").mode("overwrite").save()
                el = time.time() - t0
                if rep == 0:
                    cold = el
                    rows = df.count()
                else:
                    best = min(best, el)
            if best == float("inf"):
                best = cold
            rec[f"c{copies}"] = {"rows": rows, "k": k, "sec": round(best, 2)}
            print(
                f"{mode} @c{copies} (k={k}): {rows} rows, {best:.2f}s warm",
                flush=True,
            )
            emb.unpersist()
        lo, hi = f"c{rungs[0]}", f"c{rungs[-1]}"
        scale = rungs[-1] / rungs[0]
        ratio = rec[hi]["sec"] / max(rec[lo]["sec"], 1e-9)
        rec["time_ratio"] = round(ratio, 2)
        rec["per_decade"] = round(ratio / scale, 2)
        results[mode] = rec
        print(
            f"  -> {mode}: {rec[lo]['sec']}s -> {rec[hi]['sec']}s "
            f"(x{rec['time_ratio']}, data x{scale:.0f}, per-decade "
            f"{rec['per_decade']})",
            flush=True,
        )
    print(json.dumps({"rungs": rungs, "multiprobe_density_scaled": results}))


if __name__ == "__main__":
    main()
