"""Distributed 2-D skyline (pareto front): rows not dominated on a
(minimize, maximize) attribute pair.

Algorithm (the classic two-phase distributed skyline): the skyline of a
union equals the skyline of the union of per-partition skylines, and
any filter that only removes *dominated* rows preserves the final
answer. Phase 1 therefore runs a scan-local pareto pre-filter inside
each Arrow batch (mapInPandas — vectorized cummax over a sort, no
shuffle), shrinking each partition to its local front. Phase 2 takes
the union of the local fronts — O(front size), typically logarithmic in
row count for non-degenerate data — and finishes with an exact
dominance anti-join against its (now broadcastable) self.

The phase-1 filter is intentionally a slight over-approximation (it
keeps equal-extent ties for phase 2 to adjudicate), which keeps it a
one-pass cummax instead of a pairwise check; correctness rests solely
on phase 2, so the pre-filter can never change the result — only the
intermediate size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """Rows of ``df`` not dominated by any other row, where domination
    means <= on ``minimize`` and >= on ``maximize`` with at least one
    strict. Duplicate (minimize, maximize) pairs never dominate each
    other, so whole tie-groups survive together."""
    cols = df.columns

    def local_front(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            s = pdf.sort_values([minimize, maximize], ascending=[True, False])
            # a row survives iff it carries the running max of the
            # maximize attribute — anything below it is dominated by an
            # earlier (cheaper-or-equal, strictly-larger) row.
            yield s[s[maximize] >= s[maximize].cummax()]

    candidates = df.mapInPandas(local_front, df.schema)

    p = candidates.alias("p")
    q = candidates.alias("q")
    pm, px = F.col(f"p.{minimize}"), F.col(f"p.{maximize}")
    qm, qx = F.col(f"q.{minimize}"), F.col(f"q.{maximize}")
    dominated_by = (qm <= pm) & (qx >= px) & ((qm < pm) | (qx > px))
    # the union of local fronts is small by construction; broadcast it
    # so the non-equi dominance check is a broadcast nested-loop over a
    # bounded candidate set, not a shuffle of the full input.
    return p.join(F.broadcast(q), dominated_by, "left_anti").select(
        *[F.col(f"p.{c}").alias(c) for c in cols]
    )
