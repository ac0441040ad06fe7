"""Reshaping + statistical aggregates: pivot, unpivot, posexplode,
exact percentiles, and correlation from exact component sums."""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@query(
    "pivot_event_counts",
    sql=f"""
    SELECT user_id,
           {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}" for t in _EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
    tags=("reshape", "pivot"),
)
def pivot_event_counts(spark, sf_dir):
    """Pivot (long→wide): one column per event type. The value list is
    explicit — at scale an unlisted pivot runs an extra distinct-values
    job and can explode the schema; listing keeps it one pass."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


@query(
    "unpivot_part_metrics",
    sql="""
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    """,
    tags=("reshape", "unpivot"),
)
def unpivot_part_metrics(spark, sf_dir):
    """Unpivot/melt (wide→long) — the inverse reshape, one generator pass."""
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("double").alias("p_size")
    )
    return part.unpivot("p_partkey", ["p_retailprice", "p_size"], "metric", "value")


@query(
    "posexplode_words",
    sql="""
    SELECT p_partkey, i - 1 AS pos, ws[i] AS word
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS ws FROM part),
         UNNEST(range(1, len(ws) + 1)) AS r(i)
    """,
    tags=("generator",),
)
def posexplode_words(spark, sf_dir):
    """posexplode: generator with element position (0-based)."""
    return read_table(spark, sf_dir, "part").select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word")
    )


@query(
    "percentile_acctbal",
    sql="""
    SELECT c_mktsegment,
           quantile_cont(c_acctbal, 0.25) AS p25,
           quantile_cont(c_acctbal, 0.50) AS p50,
           quantile_cont(c_acctbal, 0.90) AS p90
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("agg", "percentile"),
)
def percentile_acctbal(spark, sf_dir):
    """Exact interpolated percentiles per group. Both engines sort and
    linearly interpolate the same way on identical doubles (no
    accumulation, so no order sensitivity). The approximate sibling at
    100 TB is percentile_approx (one-pass sketch)."""
    c = read_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.percentile("c_acctbal", 0.25).alias("p25"),
        F.percentile("c_acctbal", 0.50).alias("p50"),
        F.percentile("c_acctbal", 0.90).alias("p90"),
    )


@query(
    "corr_qty_price",
    sql="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(ROUND(l_quantity) AS BIGINT))                                    AS sx,
               SUM(CAST(ROUND(l_extendedprice) AS BIGINT))                               AS sy,
               SUM(CAST(ROUND(l_quantity) AS BIGINT) * CAST(ROUND(l_extendedprice) AS BIGINT)) AS sxy,
               SUM(CAST(ROUND(l_quantity) AS BIGINT) * CAST(ROUND(l_quantity) AS BIGINT))      AS sxx,
               SUM(CAST(ROUND(l_extendedprice) AS BIGINT) * CAST(ROUND(l_extendedprice) AS BIGINT)) AS syy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS corr_qp
    FROM s
    """,
    tags=("agg", "stats"),
)
def corr_qty_price(spark, sf_dir):
    """Pearson correlation from exact integer component sums.

    Built-in corr() accumulates co-moments in floating point (Welford in
    one engine, naive in another) — unverifiable bitwise. Computing the
    five component sums exactly (values rounded to ints, BIGINT sums are
    associative and order-free) and assembling the coefficient in one
    deterministic double expression gives the same statistic with an
    engine-independent answer — the same trick _stable.py plays for sums.
    """
    li = read_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("long")
    y = F.round(F.col("l_extendedprice")).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    corr = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        F.sqrt(nd * F.col("sxx") - sxd * F.col("sx"))
        * F.sqrt(nd * F.col("syy") - syd * F.col("sy"))
    )
    return s.select("l_returnflag", corr.alias("corr_qp"))


_GK_ACC = 10_000  # 1/accuracy relative-rank error bound
_GK_QS = (0.5, 0.95, 0.99)


def _check_gk_quantiles(spark, sf_dir, rows, cols):
    """Per-group Greenwald-Khanna bound (no SQL twin: DuckDB's
    approx_quantile is a t-digest and legitimately disagrees in the
    last percentile). For EVERY group and every requested quantile q,
    the estimate must (a) be an actual observation of that group — GK
    returns real elements, never interpolations — and (b) sit between
    the exact order statistics at ranks (q ± 1/acc)·n, the sketch's
    published guarantee, checked per group rather than the old global
    bracket."""
    idx = {c: i for i, c in enumerate(cols)}
    vals: dict[str, list[float]] = {}
    for r in (
        read_table(spark, sf_dir, "events").select("event_type", "value").collect()
    ):
        vals.setdefault(r.event_type, []).append(float(r.value))
    if sorted(vals) != sorted(r[idx["event_type"]] for r in rows):
        return "group set differs from the source table's event types"
    eps = 1.0 / _GK_ACC
    for r in rows:
        group = r[idx["event_type"]]
        vs = sorted(vals[group])
        n = len(vs)
        members = set(vs)
        for q, col in zip(_GK_QS, ("p50", "p95", "p99")):
            est = float(r[idx[col]])
            if est not in members:
                return f"{group}.{col}: estimate {est} is not an observed value"
            # rank window [ceil((q-eps)n), ceil((q+eps)n)] with one
            # index of slack on each side for boundary conventions
            import math

            lo = vs[max(0, math.ceil((q - eps) * n) - 2)]
            hi = vs[min(n - 1, math.ceil((q + eps) * n))]
            if not (lo <= est <= hi):
                return (
                    f"{group}.{col}: estimate {est} outside GK rank window "
                    f"[{lo}, {hi}] (n={n}, eps={eps})"
                )
    return None


@query(
    "approx_quantiles_value",
    sql=None,  # engine-specific estimates; bounded per-group by _check_gk_quantiles
    tags=("agg", "approx", "sketch"),
    check=_check_gk_quantiles,
)
def approx_quantiles_value(spark, sf_dir):
    """Approximate quantiles (percentile_approx, Greenwald-Khanna) of
    event value per event type — the one-pass, mergeable,
    bounded-memory complement to the exact interpolated
    percentile_acctbal: exact percentiles need a per-group sort, GK
    sketches aggregate partially map-side and merge, which is the only
    viable shape for percentiles over 100 TB or over streams.

    Estimates are engine-specific (DuckDB's approx_quantile is a
    t-digest and disagrees in the last percentile), so no SQL twin;
    instead _check_gk_quantiles holds every per-group estimate to the
    sketch's published rank-error guarantee (and to being an observed
    value), and tests/test_sketches.py brackets it again in CI.
    """
    return (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile_approx("value", list(_GK_QS), _GK_ACC).alias("p"),
        )
        .select(
            "event_type",
            F.col("p")[0].alias("p50"),
            F.col("p")[1].alias("p95"),
            F.col("p")[2].alias("p99"),
        )
    )
