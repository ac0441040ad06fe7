"""Round-9 distribution-monitoring additions:

- tvd_value_drift          total-variation drift between the two halves
                           of the event window, over shared value bins
- ewma_daily_anomaly       finite-horizon EWMA baseline + deviation per
                           day, with exact rational weights
- quantile_normalize_chars cross-source quantile normalization of the
                           per-doc length score (the batch-effect
                           remover, applied to corpus mixing)

Cross-engine exactness: bin edges and splits are integer day indexes
and single-expression IEEE double arithmetic (both engines evaluate
``(v - vmin) * 10.0 / (vmax - vmin)`` identically); shares are integer
ppm quotients; the EWMA is an exact 128-bit integer dot product with
rational weights 3*7^(i-1)*10^(14-i) over denominator 10^14 - 7^14 —
no floating-point power chains, logs, or order-dependent double sums
anywhere before the single final division per column.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.queries._stable import sql_huge_to_double
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_TVD_BINS = 10


@query(
    "tvd_value_drift",
    sql=f"""
    WITH b AS (
        SELECT min(CAST(ts AS DATE)) AS d0,
               date_diff('day', min(CAST(ts AS DATE)),
                         max(CAST(ts AS DATE))) + 1 AS n_days,
               min(value) AS vmin, max(value) AS vmax
        FROM events
    ),
    pe AS (
        SELECT CASE WHEN date_diff('day', b.d0, CAST(e.ts AS DATE))
                         < b.n_days // 2
                    THEN 0 ELSE 1 END AS period,
               LEAST({_TVD_BINS - 1},
                     CAST(FLOOR((e.value - b.vmin) * {_TVD_BINS}.0
                                / (b.vmax - b.vmin)) AS BIGINT)) AS bin
        FROM events e CROSS JOIN b
    ),
    c AS (
        SELECT bin,
               COUNT(*) FILTER (WHERE period = 0) AS ca,
               COUNT(*) FILTER (WHERE period = 1) AS cb
        FROM pe GROUP BY 1
    ),
    g AS (
        SELECT t.i AS bin, COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb
        FROM range({_TVD_BINS}) t(i) LEFT JOIN c ON c.bin = t.i
    ),
    p AS (
        SELECT bin, ca, cb,
               1000000 * ca // SUM(ca) OVER () AS pa_ppm,
               1000000 * cb // SUM(cb) OVER () AS pb_ppm
        FROM g
    )
    SELECT bin, ca, cb, pa_ppm, pb_ppm,
           ABS(pa_ppm - pb_ppm) AS abs_diff_ppm,
           SUM(ABS(pa_ppm - pb_ppm)) OVER () // 2 AS tvd_ppm
    FROM p
    """,
    tags=("analytic", "drift", "monitoring"),
)
def tvd_value_drift(spark, sf_dir):
    """Total-variation distance between the event-value distributions
    of the first and second halves of the observed window — the
    log-free drift score a feed monitor alarms on (PSI needs ln, whose
    cross-engine rounding is not IEEE-pinned; TVD = max-event
    distribution gap carries the same signal as an exact rational).

    Binning: {_TVD_BINS} equi-width bins over the GLOBAL [vmin, vmax]
    (shared edges — per-period edges would hide the drift being
    measured); the half-split is an integer day-index comparison. The
    single double expression ``(v - vmin) * 10.0 / (vmax - vmin)`` is
    three IEEE-correctly-rounded ops, bit-identical in both engines,
    and FLOOR of it is exact.

    Scale shape: one bounds aggregate (one row, broadcast-attached —
    the intended NLJ), one scan binning every event, one grouped count
    to the {_TVD_BINS}-row bin table; the share and TVD windows run
    over that bounded table (allowlisted).
    """
    ev = read_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "value"
    )
    b = ev.agg(
        F.min("day").alias("d0"),
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("n_days"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    binned = ev.crossJoin(F.broadcast(b)).select(
        F.when(
            F.datediff(F.col("day"), F.col("d0"))
            < F.floor(F.col("n_days") / 2),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("period"),
        F.least(
            F.lit(_TVD_BINS - 1),
            F.floor(
                (F.col("value") - F.col("vmin"))
                * float(_TVD_BINS)
                / (F.col("vmax") - F.col("vmin"))
            ).cast("long"),
        ).alias("bin"),
    )
    c = binned.groupBy("bin").agg(
        F.count(F.when(F.col("period") == 0, 1)).alias("ca"),
        F.count(F.when(F.col("period") == 1, 1)).alias("cb"),
    )
    grid = spark.range(_TVD_BINS).select(F.col("id").alias("bin"))
    g = (
        grid.join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    w = Window.partitionBy()
    p = g.select(
        "bin",
        "ca",
        "cb",
        F.sum("ca").over(w).cast("long").alias("na"),
        F.sum("cb").over(w).cast("long").alias("nb"),
    ).select(
        "bin",
        "ca",
        "cb",
        F.expr("(1000000 * ca) div na").alias("pa_ppm"),
        F.expr("(1000000 * cb) div nb").alias("pb_ppm"),
    )
    diff = F.abs(F.col("pa_ppm") - F.col("pb_ppm"))
    return p.select(
        "bin",
        "ca",
        "cb",
        "pa_ppm",
        "pb_ppm",
        diff.alias("abs_diff_ppm"),
        F.expr(
            "sum(abs(pa_ppm - pb_ppm)) over () div 2"
        ).alias("tvd_ppm"),
    )


# EWMA over the trailing 14 observed days, alpha = 0.3 = 3/10:
# weight_i = 3 * 7^(i-1) * 10^(14-i) (lag i = 1..14), denominator
# W = sum(weight_i) = 10^14 - 7^14 — all exact integers.
_EWMA_L = 14
_EWMA_W = [3 * 7 ** (i - 1) * 10 ** (_EWMA_L - i) for i in range(1, _EWMA_L + 1)]
_EWMA_DEN = 10**_EWMA_L - 7**_EWMA_L
assert sum(_EWMA_W) == _EWMA_DEN


def _ewma_sql() -> str:
    terms = " + ".join(
        f"CAST(lag(cents, {i}) OVER w AS HUGEINT) * {w}::HUGEINT"
        for i, w in enumerate(_EWMA_W, start=1)
    )
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    e AS (
        SELECT day, cents, {terms} AS num,
               lag(cents, {_EWMA_L}) OVER w AS full_horizon
        FROM daily WINDOW w AS (ORDER BY day)
    )
    SELECT day, cents,
           {sql_huge_to_double('num')} / {_EWMA_DEN} AS ewma_cents,
           (CAST(cents AS DOUBLE) - {sql_huge_to_double('num')} / {_EWMA_DEN})
               / ({sql_huge_to_double('num')} / {_EWMA_DEN}) AS dev_ratio
    FROM e WHERE full_horizon IS NOT NULL
    """


@query(
    "ewma_daily_anomaly",
    sql=_ewma_sql(),
    tags=("analytic", "anomaly", "timeseries"),
)
def ewma_daily_anomaly(spark, sf_dir):
    """Per-day deviation of revenue from its exponentially-weighted
    trailing baseline — the classic smoothed-anomaly monitor, with the
    usually-floating EWMA recurrence replaced by an EXACT finite-horizon
    dot product: alpha=0.3 over the trailing {_EWMA_L} observed days
    gives rational weights 3*7^(i-1)/10^i, so scaling by 10^{_EWMA_L}
    makes every weight an integer and the denominator telescopes to
    10^{_EWMA_L} - 7^{_EWMA_L}. The dot product runs in 128-bit integers
    (daily cents ~1e12 at sf1 x weights ~3e13 overflows int64 — the
    target_encode_smoothed lesson), and each output column is exactly
    one final double cast/division.

    Days with fewer than {_EWMA_L} predecessors are warm-up and
    excluded (lag({_EWMA_L}) IS NULL), so every emitted baseline uses
    the full horizon.

    Scale shape: one grouped aggregate to the bounded day grid, then
    lag windows over that grid (allowlisted: bounded by calendar span).
    """
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("day")
    num = None
    for i, wt in enumerate(_EWMA_W, start=1):
        term = F.lag("cents", i).over(w).cast("decimal(38,0)") * F.lit(wt)
        num = term if num is None else num + term
    e = daily.select(
        "day",
        "cents",
        num.alias("num"),
        F.lag("cents", _EWMA_L).over(w).alias("full_horizon"),
    ).where(F.col("full_horizon").isNotNull())
    # dev_ratio chains on the ewma DOUBLE (not on a 128-bit cast of the
    # deviation numerator): DuckDB's HUGEINT->double conversion is not
    # correctly rounded at ~2^66 (1-ulp disagreement vs Spark's
    # BigDecimal cast, observed at sf0.001), while these three IEEE ops
    # on the already-agreed doubles are bit-identical in both engines.
    ewma = F.col("num").cast("double") / _EWMA_DEN
    return e.select(
        "day",
        "cents",
        ewma.alias("ewma_cents"),
        ((F.col("cents").cast("double") - ewma) / ewma).alias("dev_ratio"),
    )


_QN_BUCKETS = 100


@query(
    "quantile_normalize_chars",
    sql=f"""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               ntile({_QN_BUCKETS}) OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id
               ) AS bucket
        FROM documents
    ),
    ref AS (
        SELECT bucket, CAST(SUM(n_chars) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM ranked GROUP BY 1
    )
    SELECT r.doc_id, r.source, r.n_chars, r.bucket,
           f.s AS bucket_sum, f.c AS bucket_n,
           CAST(f.s AS DOUBLE) / f.c AS qnorm_chars
    FROM ranked r JOIN ref f ON r.bucket = f.bucket
    """,
    tags=("analytic", "normalization", "mixture"),
)
def quantile_normalize_chars(spark, sf_dir):
    """Cross-source quantile normalization of the per-document length
    score: rank each doc within its source into {_QN_BUCKETS} quantile
    buckets, then replace its score with the ALL-source mean of that
    bucket — the batch-effect remover (microarray lineage) applied to
    corpus mixing, where it puts sources with different length regimes
    on one comparable scale before quality gating.

    Determinism: ntile follows the SQL standard in both engines (bucket
    sizes differ by at most one, larger buckets first) and the ORDER BY
    carries the doc_id tiebreak, so bucket assignment is bit-identical;
    the replacement value stays an exact (sum, count) pair with one
    final division.

    Scale shape: one window partitioned BY SOURCE (the natural parallel
    key — no global sort), one grouped aggregate to the bounded
    {_QN_BUCKETS}-row reference table, and a broadcast-sized equi-join
    back.
    """
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    wsrc = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.withColumn("bucket", F.ntile(_QN_BUCKETS).over(wsrc))
    ref = ranked.groupBy("bucket").agg(
        F.sum("n_chars").cast("long").alias("bucket_sum"),
        F.count(F.lit(1)).alias("bucket_n"),
    )
    return (
        ranked.join(F.broadcast(ref), "bucket")
        .select(
            "doc_id",
            "source",
            "n_chars",
            "bucket",
            "bucket_sum",
            "bucket_n",
            (
                F.col("bucket_sum").cast("double") / F.col("bucket_n")
            ).alias("qnorm_chars"),
        )
    )
