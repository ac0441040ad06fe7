"""Text-index and trend-analysis operators: inverted-index
construction (the text-retrieval build step a document pipeline feeds)
and exact per-group OLS trend slopes (drift detection over event
streams).

Exactness: posting lists are sorted arrays of BIGINT doc ids (fully
deterministic); the regression moments are pure integer sums lifted to
DECIMAL(38,0) before combination (the degree_assortativity_trade
pattern — both engines' 128-bit paths round to the identical double).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries._stable import sql_huge_to_double
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "inverted_index_terms",
    sql="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    td AS (
        SELECT term, doc_id, COUNT(*) AS tf_doc
        FROM toks WHERE regexp_matches(term, '^[a-z]+$')
        GROUP BY term, doc_id
    )
    SELECT term,
           COUNT(*) AS df,
           CAST(SUM(tf_doc) AS BIGINT) AS tf,
           list_sort(list(doc_id)) AS postings
    FROM td GROUP BY term
    """,
    tags=("llm", "index", "retrieval"),
)
def inverted_index_terms(spark, sf_dir):
    """Full inverted index over the corpus: per term, document
    frequency, total term frequency, and the SORTED posting list of
    doc ids — the build step behind BM25/keyword retrieval and the
    exact-match side of hybrid search. The whole posting list rides
    the value hash, so a single missing or duplicated posting fails
    the gate.

    Scale shape: two-level aggregation — (term, doc) partial counts
    first (map-side combinable; the term-in-doc pair stream never
    re-shuffles raw text), then one term-keyed agg builds the posting
    array. Posting lists are per-term and sorted locally after the
    shuffle (sort_array, no global sort). At 100 TB the only skew risk
    is stopword-grade terms; those produce long arrays, not hot
    aggregation keys (the pair-level agg already collapsed their rows
    to one per document).
    """
    docs = read_table(spark, sf_dir, "documents")
    td = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .where(F.col("term").rlike("^[a-z]+$"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf_doc"))
    )
    return td.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf_doc").alias("tf"),
        F.sort_array(F.collect_list("doc_id")).alias("postings"),
    )


@query(
    "trend_slope_by_type",
    sql="""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events
        GROUP BY event_type, CAST(ts AS DATE)
    ),
    moments AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
               CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
               CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
               CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx
        FROM daily GROUP BY event_type
    )
    SELECT event_type, n,
           {TS_NUM}
               / {TS_DEN} / 100.0
               AS slope_per_day
    FROM moments
    """.replace(
        "{TS_NUM}", sql_huge_to_double("n * sxy - sx * sy")
    ).replace(
        "{TS_DEN}", sql_huge_to_double("n * sxx - sx * sx")
    ),
    tags=("analytics", "regression", "trend"),
)
def trend_slope_by_type(spark, sf_dir):
    """Per-event-type OLS trend of daily revenue (currency units per
    day): slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) over (day-index,
    daily-cents) points — the drift detector a monitoring pipeline
    runs per segment.

    Exactness: x is an integer day index against a fixed epoch, y an
    exact integer cents sum, so all four moments are integer; the
    combination is lifted to DECIMAL(38,0) (128-bit, no overflow at
    any SF — the degree_assortativity_trade lesson) and exactly two
    float operations happen at the end, identically on both engines.

    Scale shape: day-grain pre-aggregation first (map-side partials
    collapse the event stream to types x days rows), then a bounded
    second agg — the classic two-level "aggregate the aggregate"
    decomposition; no window, no sort.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"))
        .select(
            "event_type",
            F.datediff("day", F.lit("2024-01-01").cast("date")).alias("x"),
            "y",
        )
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        # accumulate IN decimal (not cast-after-sum): Spark's long sum
        # wraps silently on overflow, DuckDB's promotes to HUGEINT —
        # the degree_assortativity_trade sf1 lesson
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return m.select(
        "event_type", "n", (num / den / 100.0).alias("slope_per_day")
    )


_CMS_W = 64  # buckets per row
_CMS_D = 3   # hash rows


@query(
    "cms_term_counts",
    sql=f"""
    WITH vocab AS (
        SELECT term, COUNT(*) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ) WHERE regexp_matches(term, '^[a-z]+$')
        GROUP BY term
    ),
    buckets AS (
        SELECT term, n, j,
               ('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || '|' || term),
                               1, 4))::BIGINT % {_CMS_W} AS bucket
        FROM vocab CROSS JOIN (VALUES (0), (1), (2)) s(j)
    ),
    cells AS (
        SELECT j, bucket, CAST(SUM(n) AS BIGINT) AS total
        FROM buckets GROUP BY j, bucket
    ),
    probes AS (
        SELECT term, n FROM vocab ORDER BY n DESC, term LIMIT 20
    )
    SELECT p.term, p.n AS n_exact,
           MIN(c.total) AS cms_estimate,
           MIN(c.total) - p.n AS overestimate
    FROM probes p
    JOIN buckets b ON b.term = p.term
    JOIN cells c ON c.j = b.j AND c.bucket = b.bucket
    GROUP BY p.term, p.n
    """,
    tags=("llm", "sketch", "cms", "topk"),
)
def cms_term_counts(spark, sf_dir):
    """Count-min sketch (w=64, d=3, md5-portable hashes) over corpus
    term counts, probed at the 20 heaviest terms — with the EXACT
    count beside each estimate, so the CMS overestimate guarantee
    (estimate >= truth, tight for heavy hitters) rides the value hash.
    Unlike the HLL/approx tier (rows-only checks), a CMS with
    deterministic hashes is fully replayable in SQL: this is a sketch
    with a bitwise oracle.

    Scale shape: term counts compact the corpus to a vocab table
    first (one exploded agg with map-side partials); the sketch build
    then explodes 3 rows per VOCAB entry, not per token, and the cell
    table is w*d = 192 rows total — constant-size state, the entire
    point of a CMS at 100 TB (the cells would be merged across
    partitions/days in production; SUM is associative so the merge is
    the same agg).
    """
    from tvbigdataproject_spark.functions.hashing import hex16_hash

    docs = read_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term").rlike("^[a-z]+$"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bucket_cols = F.array(
        *[
            hex16_hash(F.concat(F.lit(f"cms{j}|"), F.col("term"))) % _CMS_W
            for j in range(_CMS_D)
        ]
    )
    buckets = vocab.select(
        "term", "n", F.posexplode(bucket_cols).alias("j", "bucket")
    )
    cells = buckets.groupBy("j", "bucket").agg(F.sum("n").alias("total"))
    probes = vocab.orderBy(F.desc("n"), "term").limit(20)
    return (
        probes.join(buckets.select("term", "j", "bucket"), "term")
        .join(cells, ["j", "bucket"])
        .groupBy("term", "n")
        .agg(F.min("total").alias("cms_estimate"))
        .select(
            "term",
            F.col("n").alias("n_exact"),
            "cms_estimate",
            (F.col("cms_estimate") - F.col("n")).alias("overestimate"),
        )
    )
