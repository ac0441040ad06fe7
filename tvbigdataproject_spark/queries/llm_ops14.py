"""LLM-ops batch 14: Count-Min sketch frequency audit.

cm_sketch_heavy_hitters builds a Count-Min sketch over the token
stream with md5-derived hash rows (the suite's portable hash family,
so the ENTIRE sketch — not just the exact side — is replayed
bit-for-bit by the DuckDB oracle) and reports, for the exact top-k
terms, the exact count next to the sketch estimate and its
overcount. The classic streaming-frequency structure: at 100 TB the
d x w counter grid is a few KB per executor regardless of corpus
size, estimates are one-sided (est >= exact, by construction), and
this query IS the calibration readout that tells an operator what w
buys at their skew.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_CM_D = 4  # hash rows
_CM_W = 256  # counters per row
_CM_TOPK = 20


def _cm_hash_sql(r: int, term: str) -> str:
    return (
        f"(('0x' || substr(md5('{r}:' || {term}), 1, 4))::BIGINT"
        f" % {_CM_W})"
    )


def _cm_sql() -> str:
    toks = """
    SELECT UNNEST(string_split(lower(text), ' ')) AS term FROM documents
    """
    tf = f"SELECT term, COUNT(*) AS n FROM ({toks}) GROUP BY 1"
    rows = " UNION ALL ".join(
        f"SELECT {r} AS r, {_cm_hash_sql(r, 'term')} AS b,"
        f" CAST(SUM(n) AS BIGINT) AS c FROM ({tf}) GROUP BY 1, 2"
        for r in range(_CM_D)
    )
    top = f"""
    SELECT term, n FROM ({tf})
    ORDER BY n DESC, term LIMIT {_CM_TOPK}
    """
    mins = ", ".join(f"c{r}.c" for r in range(_CM_D))
    joins = " ".join(
        f"JOIN cm c{r} ON c{r}.r = {r}"
        f" AND c{r}.b = {_cm_hash_sql(r, 't.term')}"
        for r in range(_CM_D)
    )
    return f"""
    WITH cm AS ({rows})
    SELECT t.term, t.n AS exact_n,
           LEAST({mins}) AS cm_estimate,
           CAST(LEAST({mins}) - t.n AS BIGINT) AS overcount
    FROM ({top}) t {joins}
    ORDER BY exact_n DESC, term
    """


@query(
    "cm_sketch_heavy_hitters",
    sql=_cm_sql(),
    tags=("llm", "sketch", "frequency"),
)
def cm_sketch_heavy_hitters(spark, sf_dir):
    """Count-Min sketch calibration readout: a {d} x {w} sketch over
    the token stream (md5-slice hash rows — the portable family, so
    the sketch itself is engine-reproducible), queried at the exact
    top-{k} terms: exact count, CM estimate (min over the {d} counter
    rows), and the overcount the collisions added. CM estimates are
    one-sided (>= exact) by construction; the overcount column is the
    empirical answer to "is w = {w} enough at this skew".

    Scale shape: one token aggregate (map-side combined) feeds both
    sides; the sketch is {d} keyed sums to a <= {d}x{w}-row grid
    (constant size at any corpus), the top-k is TakeOrdered, and the
    estimate lookup is {d} broadcast joins against the tiny grid.
    """
    docs = read_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def h(r: int, col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{r}:"), col)), 1, 4
                ),
                16,
                10,
            )
            .cast("long")
            % _CM_W
        )

    grid = None
    for r in range(_CM_D):
        leg = tf.groupBy(h(r, F.col("term")).alias("b")).agg(
            F.sum("n").cast("long").alias("c")
        ).select(F.lit(r).alias("r"), "b", "c")
        grid = leg if grid is None else grid.unionByName(leg)
    top = tf.orderBy(F.col("n").desc(), "term").limit(_CM_TOPK)
    out = top
    for r in range(_CM_D):
        cr = grid.where(F.col("r") == r).select(
            F.col("b").alias(f"b{r}"), F.col("c").alias(f"c{r}")
        )
        out = out.join(
            F.broadcast(cr), h(r, F.col("term")) == F.col(f"b{r}")
        )
    mins = F.least(*[F.col(f"c{r}") for r in range(_CM_D)])
    return out.select(
        "term",
        F.col("n").alias("exact_n"),
        mins.alias("cm_estimate"),
        (mins - F.col("n")).cast("long").alias("overcount"),
    ).orderBy(F.col("exact_n").desc(), "term")


cm_sketch_heavy_hitters.__doc__ = cm_sketch_heavy_hitters.__doc__.format(
    d=_CM_D, w=_CM_W, k=_CM_TOPK
)
