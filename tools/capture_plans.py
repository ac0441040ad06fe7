"""Capture .explain("formatted") for queries into plans/r<N>/.

    python tools/capture_plans.py before [query ...]
    python tools/capture_plans.py after  [query ...]

Defaults to every bench.py HEADLINE query. Writes
plans/r12/<query>_<tag>.txt. Plan-only (no job execution), so it is
cheap and safe to run alongside other work. ``after`` files are only
written for queries that already have a ``before`` file unless names
are passed explicitly — the deliverable is the before/after pair for
TOUCHED queries; ``before`` captures everything so any later change
has its baseline.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

OUT_DIR = os.path.join(
    REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13")
)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    assert tag in ("before", "after"), tag
    names = sys.argv[2:]

    from bench import HEADLINE
    from tvbigdataproject_spark.queries import REGISTRY
    from tvbigdataproject_spark.session import get_spark

    explicit = bool(names)
    if not names:
        names = list(HEADLINE)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(
        app_name=f"capture-plans-{tag}",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for name in names:
        if tag == "after" and not explicit and not os.path.exists(
            os.path.join(OUT_DIR, f"{name}_before.txt")
        ):
            continue
        df = REGISTRY[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} ({tag}) @ {SF_DIR}\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
