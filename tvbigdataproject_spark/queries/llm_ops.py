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
    "chunk_boilerplate",
    sql="""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    idx AS (
        SELECT doc_id, t,
               UNNEST(range(CAST(floor(len(t) / 20) AS BIGINT))) AS i
        FROM toks
    ),
    chunks AS (
        SELECT doc_id,
               md5(array_to_string(t[(i * 20 + 1):(i * 20 + 20)], ' ')) AS chunk_hash
        FROM idx
    )
    SELECT chunk_hash,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occurrences
    FROM chunks
    GROUP BY chunk_hash
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    tags=("llm", "dedup", "boilerplate"),
)
def chunk_boilerplate(spark, sf_dir):
    """Cross-document repeated-chunk (boilerplate) detection: each
    document's token stream is cut into consecutive 20-token chunks,
    chunks are content-hashed, and any chunk appearing in ≥2 distinct
    documents is reported with its document and occurrence counts —
    the practical chunk-granularity approximation of exact-substring
    dedup (suffix-array substring dedup à la "Deduplicating Training
    Data Makes Language Models Better" is not expressible as relational
    algebra; fixed windows are what large pipelines actually ship).

    Scale shape: chunking is scan-local (one transform over the token
    array, no shuffle); the only exchange is the hash-keyed aggregate,
    and only 32-char digests travel — never chunk text. Downstream,
    an anti-join of (doc, chunk_hash) against these hashes strips the
    boilerplate from the corpus.
    """
    # the size guard matters: sequence(0, -1) infers a NEGATIVE step in
    # Spark (it counts down), so a <20-token doc would emit a bogus
    # negative-index chunk instead of none
    chunks = F.expr(
        "case when size(split(lower(text), ' ')) >= 20 then "
        "transform(sequence(0, cast(floor(size(split(lower(text), ' ')) / 20) as int) - 1), "
        "i -> md5(array_join(slice(split(lower(text), ' '), i * 20 + 1, 20), ' '))) "
        "else array() end"
    )
    return (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(chunks).alias("chunk_hash"))
        .groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= 2)
    )


@query(
    "domain_mixture_weights",
    sql="""
    WITH counts AS (
        SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2
    )
    SELECT lang, source, n,
           CAST(n AS DOUBLE) / SUM(n) OVER () AS share,
           (1.0 / COUNT(*) OVER ()) / (CAST(n AS DOUBLE) / SUM(n) OVER ()) AS weight
    FROM counts
    """,
    tags=("llm", "mixture"),
)
def domain_mixture_weights(spark, sf_dir):
    """Per-domain resampling weights toward a target mixture: every
    (lang, source) domain gets its corpus share and the multiplicative
    sampling weight that moves the corpus to the target (here uniform
    across domains — the target vector is a config in production).
    Feeding `weight` to sampleBy (or as a repetition factor when >1) is
    how pretraining runs rebalance domains without materializing a new
    corpus.

    Scale shape: one keyed aggregate over the corpus; the global-total
    window runs over the aggregated domain table, whose cardinality is
    bounded by langs x sources — a deliberate single-partition window
    over dozens of rows, never over the corpus.
    """
    counts = (
        read_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy()
    share = F.col("n").cast("double") / F.sum("n").over(w)
    return counts.select(
        "lang",
        "source",
        "n",
        share.alias("share"),
        ((F.lit(1.0) / F.count(F.lit(1)).over(w)) / share).alias("weight"),
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
