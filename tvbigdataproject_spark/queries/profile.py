"""Data-profiling pass: per-column statistics in one scan.

The ANALYZE-style profile every ingestion run computes before choosing
filters and join strategies (null rates feed quality gates, distinct
counts feed broadcast decisions, min/max feed partition pruning design).
One aggregate pass over the table — never one scan per column — then a
literal unpivot to one row per column.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# (column, is_numeric) — text min/max are lexicographic, fine for a profile
_DOC_COLS = (
    ("doc_id", True),
    ("text", False),
    ("lang", False),
    ("source", False),
    ("n_chars", True),
)


@query(
    "profile_documents",
    sql="""
    WITH base AS (
        SELECT
            COUNT(*) AS n_rows,
            {cols}
        FROM documents
    )
    {unpivot}
    """.format(
        cols=",\n            ".join(
            f"COUNT({c}) AS nn_{c}, COUNT(DISTINCT {c}) AS nd_{c}, "
            f"CAST(MIN({c}) AS VARCHAR) AS mn_{c}, CAST(MAX({c}) AS VARCHAR) AS mx_{c}"
            for c, _ in _DOC_COLS
        ),
        unpivot="\n    UNION ALL\n    ".join(
            f"SELECT '{c}' AS column_name, n_rows, n_rows - nn_{c} AS n_null, "
            f"nd_{c} AS n_distinct, mn_{c} AS min_repr, mx_{c} AS max_repr FROM base"
            for c, _ in _DOC_COLS
        ),
    ),
    tags=("profile", "stats"),
)
def profile_documents(spark, sf_dir):
    """Per-column profile of the documents table: row count, null count,
    exact distinct count, and min/max (rendered to string so one schema
    fits every column type). All columns ride ONE aggregate pass — the
    multi-distinct rewrite (Spark plans it as an expand + two-phase agg)
    still reads the table once, vs the naive per-column loop that scans
    it five times. At 100 TB swap the exact distinct for
    approx_count_distinct and this becomes a pure scan-stage profile;
    the exact form is kept here because the oracle checks it bitwise.
    """
    df = read_table(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, _ in _DOC_COLS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    base = df.agg(*aggs)
    per_col = [
        base.select(
            F.lit(c).alias("column_name"),
            F.col("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_null"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.col(f"mn_{c}").alias("min_repr"),
            F.col(f"mx_{c}").alias("max_repr"),
        )
        for c, _ in _DOC_COLS
    ]
    out = per_col[0]
    for nxt in per_col[1:]:
        out = out.unionByName(nxt)
    return out
