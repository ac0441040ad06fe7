"""Training-data plumbing a 100 TB pretraining pipeline runs after
cleaning/dedup: deterministic split assignment, sequence packing, and
per-document salient-term extraction (north-star surface — the
reference has no training-data tier).

All three are oracle-checked bitwise; every hash is the md5-portable
family (functions/hashing.py) so DuckDB replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.hashing import hex16_hash
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_PACK_CAPACITY = 256  # tokens per packed sequence


@query(
    "train_test_split_hash",
    sql="""
    SELECT doc_id, bucket,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'valid'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS bucket
        FROM documents
    ) t
    """,
    tags=("llm", "split"),
)
def train_test_split_hash(spark, sf_dir):
    """Deterministic 90/5/5 train/valid/test assignment by hashing the
    document id — the split survives re-runs, re-partitioning, and
    incremental corpus growth (a doc's split never changes), which
    random sampling cannot promise. Pure scan-stage map work: zero
    shuffles at any scale.
    """
    bucket = hex16_hash(F.col("doc_id").cast("string")) % 100
    return read_table(spark, sf_dir, "documents").select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 90, "train")
        .when(bucket < 95, "valid")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "pack_sequences",
    sql=f"""
    WITH sized AS (
        SELECT doc_id, lang, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    )
    SELECT doc_id, lang, source, n_tok,
           CAST(FLOOR(
               (SUM(n_tok) OVER (PARTITION BY lang, source ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tok) / {_PACK_CAPACITY}.0
           ) AS BIGINT) AS pack_id
    FROM sized
    """,
    tags=("llm", "packing"),
)
def pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing: documents are concatenated in
    deterministic (doc_id) order within a (lang, source) shard and each
    document is assigned the pack its first token lands in, for packs of
    256 tokens. This is the standard streaming packing used
    to build fixed-length LLM training sequences — one window shuffle on
    the shard key. At 100 TB the shard key must be fine-grained (here
    lang x source; in production add a date/file bucket) so no single
    window partition holds more than a task's worth of rows — the
    cumsum itself is O(rows-per-shard), never global.
    """
    sized = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first_token_index = F.sum("n_tok").over(w) - F.col("n_tok")
    return sized.select(
        "doc_id",
        "lang",
        "source",
        "n_tok",
        F.floor(first_token_index / F.lit(float(_PACK_CAPACITY))).alias("pack_id"),
    )


@query(
    "tfidf_top_terms",
    sql="""
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, term, tf * n_docs / df AS score
        FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, term, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
        FROM scored
    )
    SELECT doc_id, term, score, rnk FROM ranked WHERE rnk <= 3
    """,
    tags=("llm", "tfidf"),
)
def tfidf_top_terms(spark, sf_dir):
    """Top-3 salient terms per document by tf-idf with a *linear* idf
    (tf x N/df): transcendental log() is not bit-reproducible across
    engines, and rank order under any monotone idf is unchanged, so the
    linear form keeps the oracle comparison exact. Term and document
    frequencies are key-partitioned aggregations; the corpus size N is
    a one-row aggregate the optimizer broadcasts into the join — no
    driver round-trip, no global shuffle beyond the two keyed aggs and
    the per-doc top-k window.
    """
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # n_docs rides in as an intentional BroadcastNestedLoopJoin over a
    # one-row aggregate: a single broadcast row joined with no condition
    # is the cheapest way to attach a global scalar without a driver
    # round-trip (same shape as embed_cosine_topk's query-set attach).
    # A lit()-keyed equi-join cannot avoid this — Catalyst constant-folds
    # the foldable keys and plans the nested loop anyway — so the plan
    # test admits this query into its intended-NLJ set instead.
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.col("n_docs") / F.col("df")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "term", "score", "rnk")
    )
