"""Portable-ln batch 3 + dimensionality-reduction audit.

- js_divergence_by_source   Jensen-Shannon divergence of each source's
                            token distribution vs the whole corpus —
                            the bounded, symmetric drift measure
                            (complements hellinger_source_profiles /
                            tvd_value_drift with the log-family member
                            the gate couldn't check before)
- rp_distortion_bands       Johnson-Lindenstrauss random-projection
                            distortion audit: project 64-dim embeddings
                            to 16 dims with deterministic +-1 signs and
                            histogram the norm-energy ratio — the
                            go/no-go check before swapping a cheap
                            projection into the ANN tier
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.portable import (
    apply_stages,
    plog_stages,
    sql_wrap_stages,
)
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table, read_table_spread

# ---------------------------------------------------------------- Q11

_JS_SCALE = 10**9
# ln 2 as the portable kernel would produce it is just the constant —
# the absent-token tail sums to (1 - B_s/N) * ln 2 in closed form
_LN2 = "CAST(0.6931471805599453 AS DOUBLE)"

# present-token terms: p = a/ns, q = b/N, m = (p + q)/2
#   p ln(p/m) = (a/ns) * (ln(2 a N) - ln(a N + b ns))
#   q ln(q/m) = (b/N)  * (ln(2 b ns) - ln(a N + b ns))
_JS_TERM = (
    "CAST(a AS DOUBLE) / CAST(ns AS DOUBLE) * (_l2an - _lm)"
    " + CAST(b AS DOUBLE) / CAST(n AS DOUBLE) * (_l2bn - _lm)"
)


def _js_sql() -> str:
    per = """
    SELECT sw.source, sw.a, w.b, ns.ns, t.n FROM
        (SELECT source, w, COUNT(*) AS a FROM
            (SELECT source, unnest(string_split(lower(text), ' ')) AS w
             FROM documents) GROUP BY 1, 2) sw
        JOIN (SELECT w, COUNT(*) AS b FROM
            (SELECT unnest(string_split(lower(text), ' ')) AS w
             FROM documents) GROUP BY 1) w ON sw.w = w.w
        JOIN (SELECT source, COUNT(*) AS ns FROM
            (SELECT source, unnest(string_split(lower(text), ' ')) AS w
             FROM documents) GROUP BY 1) ns ON sw.source = ns.source
        CROSS JOIN (SELECT COUNT(*) AS n FROM
            (SELECT unnest(string_split(lower(text), ' ')) AS w
             FROM documents)) t
    """
    for src, out, p in (
        ("2 * a * n", "_l2an", "_j1_"),
        ("2 * b * ns", "_l2bn", "_j2_"),
        ("a * n + b * ns", "_lm", "_j3_"),
    ):
        per = sql_wrap_stages(per, plog_stages(src, out, p))
    return f"""
    SELECT source, MAX(ns) AS n_tokens_src,
           CAST(CAST(SUM(CAST(ROUND(({_JS_TERM}) * {_JS_SCALE})
                             AS BIGINT)) AS DOUBLE)
                / CAST({_JS_SCALE} AS DOUBLE) / CAST(2 AS DOUBLE)
                + (CAST(1 AS DOUBLE)
                   - CAST(SUM(b) AS DOUBLE) / CAST(MAX(n) AS DOUBLE))
                  * {_LN2} / CAST(2 AS DOUBLE) AS DOUBLE) AS jsd_nats,
           sqrt(CAST(SUM(CAST(ROUND(({_JS_TERM}) * {_JS_SCALE})
                             AS BIGINT)) AS DOUBLE)
                / CAST({_JS_SCALE} AS DOUBLE) / CAST(2 AS DOUBLE)
                + (CAST(1 AS DOUBLE)
                   - CAST(SUM(b) AS DOUBLE) / CAST(MAX(n) AS DOUBLE))
                  * {_LN2} / CAST(2 AS DOUBLE)) AS js_distance
    FROM {per} GROUP BY source
    """


@query(
    "js_divergence_by_source",
    sql=_js_sql(),
    tags=("llm", "infotheory", "drift"),
)
def js_divergence_by_source(spark, sf_dir):
    """Jensen-Shannon divergence (nats) and JS distance of each
    source's unigram distribution against the whole corpus — the
    bounded symmetric drift number mixture monitors standardize on
    (0 = identical, ln 2 = disjoint support), now oracle-exact via the
    portable ln kernel.

    Exactness: for tokens PRESENT in the source, both log-ratios
    reduce to portable lns of INTEGER arguments (2aN, 2b*ns,
    aN + b*ns — products stay under 2^63 through ~sf100); tokens
    ABSENT from the source contribute q*ln2 each, which sums in closed
    form to (1 - B_s/N)*ln2 with B_s an exact integer — no dense
    source x vocab table is ever built. Per-source accumulation is the
    scaled-BIGINT stable sum; sqrt is IEEE-correctly-rounded.

    Scale shape: ONE corpus explode + (source, token) aggregate; the
    corpus counts, source totals, and grand total are integer sums
    over that aggregate (its identical exchange is planned once), and
    the only data-sized join is the tf-idf-shaped equi-join on the
    token key.
    """
    docs = read_table_spread(spark, sf_dir, "documents", "doc_id")
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    # corpus counts, source totals, and the grand total all derive from
    # the (source, token) AGGREGATE — one corpus explode+shuffle (the
    # identical sw exchange is planned once), then vocab-sized reshuffles
    sw = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("a"))
    wt = sw.groupBy("w").agg(F.sum("a").cast("long").alias("b"))
    ns = sw.groupBy("source").agg(F.sum("a").cast("long").alias("ns"))
    n = sw.agg(F.sum("a").cast("long").alias("n"))
    per = (
        sw.join(wt, "w")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(n))
    )
    for src, out, p in (
        ("2 * a * n", "_l2an", "_j1_"),
        ("2 * b * ns", "_l2bn", "_j2_"),
        ("a * n + b * ns", "_lm", "_j3_"),
    ):
        per = apply_stages(per, plog_stages(src, out, p))
    return per.groupBy("source").agg(
        F.max("ns").alias("n_tokens_src"),
        F.expr(
            f"CAST(CAST(SUM(CAST(ROUND(({_JS_TERM}) * {_JS_SCALE})"
            f" AS BIGINT)) AS DOUBLE)"
            f" / CAST({_JS_SCALE} AS DOUBLE) / CAST(2 AS DOUBLE)"
            f" + (CAST(1 AS DOUBLE)"
            f" - CAST(SUM(b) AS DOUBLE) / CAST(MAX(n) AS DOUBLE))"
            f" * {_LN2} / CAST(2 AS DOUBLE) AS DOUBLE)"
        ).alias("jsd_nats"),
        F.expr(
            f"sqrt(CAST(SUM(CAST(ROUND(({_JS_TERM}) * {_JS_SCALE})"
            f" AS BIGINT)) AS DOUBLE)"
            f" / CAST({_JS_SCALE} AS DOUBLE) / CAST(2 AS DOUBLE)"
            f" + (CAST(1 AS DOUBLE)"
            f" - CAST(SUM(b) AS DOUBLE) / CAST(MAX(n) AS DOUBLE))"
            f" * {_LN2} / CAST(2 AS DOUBLE))"
        ).alias("js_distance"),
    )


# ---------------------------------------------------------------- Q12

_RP_DIM = 64
_RP_OUT = 16
_RP_SCALE = 1000  # milli fixed-point (embed_covariance_pairs convention)

# deterministic +-1 sign: parity of a small integer mix — exact integer
# arithmetic, identical text/semantics in SQL and numpy
_RP_SIGN = "(CASE WHEN ((i * 73856093 + j * 19349663) % 97) % 2 = 0 THEN 1 ELSE -1 END)"


def _rp_sign_matrix():
    import numpy as np

    i = np.arange(1, _RP_DIM + 1).reshape(-1, 1)
    j = np.arange(1, _RP_OUT + 1).reshape(1, -1)
    return np.where(((i * 73856093 + j * 19349663) % 97) % 2 == 0, 1, -1)


@query(
    "rp_distortion_bands",
    sql=f"""
    WITH m AS (
        SELECT vec_id, t.i AS i,
               CAST(FLOOR(embedding[t.i]::DOUBLE * {_RP_SCALE}) AS BIGINT)
                   AS v
        FROM embeddings, UNNEST(range(1, {_RP_DIM + 1})) AS t(i)
    ),
    y AS (
        SELECT m.vec_id, t.j AS j,
               CAST(SUM({_RP_SIGN} * m.v) AS BIGINT) AS y
        FROM m, UNNEST(range(1, {_RP_OUT + 1})) AS t(j)
        GROUP BY 1, 2
    ),
    yn AS (SELECT vec_id, CAST(SUM(y * y) AS BIGINT) AS y2 FROM y
           GROUP BY 1),
    xn AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS x2 FROM m
           GROUP BY 1),
    r AS (
        SELECT yn.vec_id,
               CAST(yn.y2 AS DOUBLE)
                   / (CAST({_RP_OUT} AS DOUBLE) * CAST(xn.x2 AS DOUBLE))
                   AS ratio
        FROM yn JOIN xn ON yn.vec_id = xn.vec_id
        WHERE xn.x2 > 0
    )
    SELECT CAST(FLOOR(ratio * 20) AS BIGINT) AS band,
           COUNT(*) AS n_vectors,
           MIN(ratio) AS min_ratio,
           MAX(ratio) AS max_ratio,
           CAST(SUM(CAST(ROUND(ratio * 1000000000) AS BIGINT)) AS DOUBLE)
               / CAST(1000000000 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_ratio
    FROM r GROUP BY 1
    """,
    tags=("llm", "embeddings", "dimreduction"),
)
def rp_distortion_bands(spark, sf_dir):
    """Johnson-Lindenstrauss distortion audit of a +-1 random
    projection from {dim} to {out} dims: for every embedding, the
    energy ratio ||Sx||^2 / (r ||x||^2) (expectation 1 under the JL
    sign construction), histogrammed into 0.05-wide bands — the
    acceptance check before substituting the projection into distance
    computations (ANN candidate generation, dedup blocking).

    Exactness: vectors enter as exact milli-scaled int64 (the
    covariance-kernel convention); the sign matrix is a deterministic
    integer parity mix, so every projected coordinate and both squared
    norms are EXACT INTEGERS — the only doubles are one final division
    per vector and the band stats (scaled-int stable mean).

    Scale shape: the DataFrame side runs one mapInPandas stage whose
    int64 matmul (V @ S) emits three numbers per vector — the corpus
    never explodes to rows x dims in Spark; the per-band aggregate is
    a bounded ~25-row table. The DuckDB oracle brute-forces the same
    definition relationally (fine at sf0.01; the relational form is
    what does NOT survive 100x, which is the kernel's point).
    """
    import numpy as np
    import pandas as pd

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    sign = _rp_sign_matrix()

    def project(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.floor(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                * _RP_SCALE
            ).astype(np.int64)
            y = m @ sign
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "y2": (y * y).sum(axis=1).astype(np.int64),
                    "x2": (m * m).sum(axis=1).astype(np.int64),
                }
            )

    r = (
        emb.mapInPandas(project, schema="vec_id long, y2 long, x2 long")
        .where(F.col("x2") > 0)
        .selectExpr(
            "vec_id",
            f"CAST(y2 AS DOUBLE) / (CAST({_RP_OUT} AS DOUBLE)"
            " * CAST(x2 AS DOUBLE)) AS ratio",
        )
    )
    return r.groupBy(
        F.expr("CAST(FLOOR(ratio * 20) AS BIGINT)").alias("band")
    ).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("ratio").alias("min_ratio"),
        F.max("ratio").alias("max_ratio"),
        F.expr(
            "CAST(SUM(CAST(ROUND(ratio * 1000000000) AS BIGINT))"
            " AS DOUBLE) / CAST(1000000000 AS DOUBLE)"
            " / CAST(COUNT(*) AS DOUBLE)"
        ).alias("mean_ratio"),
    )


rp_distortion_bands.__doc__ = rp_distortion_bands.__doc__.format(
    dim=_RP_DIM, out=_RP_OUT
)
