"""MSF two-decade rung re-run (VERDICT r11 item 6): time
msf_trade_backbone at c10/c100 on the DEFAULT 16 GB heap after the
r12 contraction rewrite (operators/mst.py) — the r11 shape OOM'd the
c100 rung at 16 GB with edge + cross + labels concurrently live.

    python tools/msf_rung.py [--rungs 10,100] [--reps 2] [--skip-gen]

Reuses scale_ladder's salted generator restricted to lineitem+orders
(the only tables the query reads) and its warm-min protocol.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rungs", default="10,100")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()
    rungs = [int(x) for x in args.rungs.split(",")]

    from tvbigdataproject_spark.queries import REGISTRY
    from tvbigdataproject_spark.session import get_spark

    spark = get_spark(
        app_name="msf-rung",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    print(
        "driver heap:",
        spark.sparkContext.getConf().get("spark.driver.memory"),
        flush=True,
    )
    fn = REGISTRY["msf_trade_backbone"].fn
    rec: dict = {}
    for copies in rungs:
        sf = out_dir(copies)
        if not args.skip_gen or not os.path.isdir(f"{sf}/lineitem.parquet"):
            t0 = time.time()
            generate(spark, copies, tables=["lineitem", "orders"])
            print(f"generated c{copies} in {time.time()-t0:.0f}s", flush=True)
        best, rows = float("inf"), None
        for rep in range(1 + args.reps):
            t0 = time.time()
            df = fn(spark, sf)
            df.write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            if rep == 0:
                rows = df.count()
            else:
                best = min(best, el)
            print(f"c{copies} rep{rep}: {el:.1f}s", flush=True)
        rec[f"c{copies}"] = {"rows": rows, "sec": round(best, 2)}
        spark.sparkContext._jvm.System.gc()
    if len(rungs) > 1:
        lo, hi = f"c{rungs[0]}", f"c{rungs[-1]}"
        rec["time_ratio"] = round(
            rec[hi]["sec"] / max(rec[lo]["sec"], 1e-9), 2
        )
        rec["per_decade"] = round(
            rec["time_ratio"] / (rungs[-1] / rungs[0]), 2
        )
    rec["heap"] = spark.sparkContext.getConf().get("spark.driver.memory")
    print(json.dumps({"msf_trade_backbone": rec}), flush=True)


if __name__ == "__main__":
    main()
