"""Arrow-bridged Python API surface: GROUPED_AGG pandas UDAF and
mapInArrow — the two remaining Python-execution paths next to the
repo's pandas_udf scalar kernel (functions/vectors.py), mapInPandas
(multimodal tier), and applyInPandas (clamp walk).

Both queries put the Python path in the plan ON PURPOSE and oracle it
against a native-SQL formulation — so the bridge itself (Arrow batch
shapes, type mapping, grouping semantics) is what gets value-checked.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


# DoubleType() instance (not a DDL string) so decoration needs no
# active session at import time — the functions/vectors.py convention.
@pandas_udf(DoubleType())
def _trimmed_mean_cents(cents: pd.Series) -> float:
    """10%-trimmed mean over integer cents: drop the lowest and
    highest n//10 values, average the rest. Sorting integer VALUES
    makes tie order irrelevant (the kept multiset is identical no
    matter how equal values permute), so the result is deterministic;
    the final float ops (cast, two divisions) mirror the oracle's
    CAST(SUM AS DOUBLE) / COUNT / 100.0 exactly."""
    arr = np.sort(cents.to_numpy())
    k = len(arr) // 10
    kept = arr[k : len(arr) - k] if k else arr
    return float(int(kept.sum())) / len(kept) / 100.0


@query(
    "trimmed_mean_udaf",
    sql="""
    WITH c AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    r AS (
        SELECT event_type, cents,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY cents) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM c
    )
    SELECT event_type,
           COUNT(*) AS n_kept,
           CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0 AS trimmed_mean
    FROM r WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY event_type
    """,
    tags=("agg", "pandas-udaf", "robust-stats"),
)
def trimmed_mean_udaf(spark, sf_dir):
    """10%-trimmed mean of event value per type computed by a
    GROUPED_AGG pandas UDAF — the custom-aggregate API (Arrow ships
    each group's column, Python returns one scalar) that closes the
    repo's Python-execution-path matrix. The oracle recomputes the
    trim with rank windows natively, so the UDAF's grouping, Arrow
    transfer, and arithmetic are all value-checked.

    Scale shape: a pandas UDAF forbids partial aggregation (the full
    group's values must co-locate), so this is ONE hash exchange on
    the group key and per-group vector math — fine when groups are
    bounded (segments, types); for unbounded keys prefer an algebraic
    decomposition like the rest of the repo's aggregates. n_kept
    comes from its own native agg joined back on the bounded key —
    Spark rejects mixing a pandas UDAF with JVM aggregates in one
    agg() (INVALID_PANDAS_UDF_PLACEMENT).
    """
    ev = read_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    grouped = ev.select("event_type", cents.alias("cents"))
    # a pandas UDAF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — compute the native group sizes
    # in their own agg and join on the bounded group key
    sizes = grouped.groupBy("event_type").agg(
        (
            F.count(F.lit(1)) - 2 * F.expr("CAST(count(1) AS BIGINT) DIV 10")
        ).alias("n_kept")
    )
    means = grouped.groupBy("event_type").agg(
        _trimmed_mean_cents(F.col("cents")).alias("trimmed_mean")
    )
    return sizes.join(means, "event_type").select(
        "event_type", "n_kept", "trimmed_mean"
    )


@query(
    "doc_bytes_arrow",
    sql="""
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
           CAST(length(text) AS BIGINT) AS char_len
    FROM documents
    """,
    tags=("llm", "arrow", "mapinarrow"),
)
def doc_bytes_arrow(spark, sf_dir):
    """Per-document byte and character lengths computed in a
    mapInArrow stage (pyarrow RecordBatch in, RecordBatch out — no
    pandas materialization at all, the zero-copy path for byte-level
    work like the multimodal tier's payload handling), oracled by the
    native strlen/length functions. What's verified is the Arrow
    bridge itself: batch iteration, schema declaration, and pyarrow
    compute parity with the JVM expressions.

    Scale shape: scan-stage map work over Arrow batches; one Python
    fence, vectorized inside.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")

    def batches(it):
        for batch in it:
            t = batch.column(1)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pc.cast(pc.binary_length(pc.cast(t, pa.binary())), pa.int64()),
                    pc.cast(pc.utf8_length(t), pa.int64()),
                ],
                ["doc_id", "byte_len", "char_len"],
            )

    return docs.mapInArrow(
        batches, schema="doc_id long, byte_len long, char_len long"
    )
