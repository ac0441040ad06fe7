"""LLM-data ops batch 10: n-gram language-model document scoring.

lm_bigram_doc_scores trains a bigram LM on the corpus itself and
scores every document by its average bigram probability — the
classic cheap fluency/quality proxy (CCNet's "perplexity bucket"
step, Wenzek et al. 2020, done with corpus-internal counts instead
of an external KenLM, which this container cannot host). Documents
whose word transitions are common corpus-wide score high; mangled or
boilerplate-unique text scores low.

Exactness: conditional probabilities are rationals cnt(w1,w2)/cnt(w1),
so each is materialized as a SCALED INTEGER (cnt2 * 2^30) // cnt1 —
exact integer arithmetic in both engines (BIGINT, numerator bounded by
max-bigram-count * 2^30; past ~10^9 occurrences of one head bigram
move the numerator to DECIMAL(38,0), the established convention in
queries/_stable.py). Per-document sums of those integers hash
bitwise; no float enters the pipeline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_LM_SCALE = 1 << 30


@query(
    "lm_bigram_doc_scores",
    sql=f"""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    bg AS (
        SELECT doc_id,
               UNNEST(t[1:len(t) - 1]) AS w1,
               UNNEST(t[2:len(t)]) AS w2
        FROM toks WHERE len(t) >= 2
    ),
    cnt2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
    cnt1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
    p AS (
        SELECT cnt2.w1, cnt2.w2,
               (c2 * {_LM_SCALE}) // c1 AS p_scaled
        FROM cnt2 JOIN cnt1 ON cnt2.w1 = cnt1.w1
    )
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(p_scaled) AS BIGINT) AS lm_score_scaled,
           CAST(SUM(p_scaled) // COUNT(*) AS BIGINT) AS avg_p_scaled
    FROM bg JOIN p ON bg.w1 = p.w1 AND bg.w2 = p.w2
    GROUP BY bg.doc_id
    """,
    tags=("llm", "ngram", "quality", "lm"),
)
def lm_bigram_doc_scores(spark, sf_dir):
    """Corpus-self-trained bigram LM score per document: for every
    bigram (w1, w2), p(w2|w1) = cnt(w1,w2)/cnt(w1) over the WHOLE
    corpus (denominator = occurrences of w1 as a bigram head, so the
    conditional sums to 1 per context); each document reports its
    bigram count, the exact scaled-integer sum of its bigrams'
    probabilities, and the scaled average (the ranking key).

    Scale shape: bigram formation is scan-local (zipped shifted
    slices, whole-stage codegen — the ngram_bigram_counts pattern).
    The probability table p is built once at bigram-vocab size, NOT
    corpus size, and both its construction (groupBy w1,w2 ->
    broadcast-joined head counts) and the corpus join key on
    (w1, w2), so the exploded corpus takes exactly ONE hash exchange
    on (w1, w2) that serves both the cnt2 aggregation and the scoring
    join (exchange reuse); the head-count join is unigram-vocab-sized
    and broadcast (a pathological corpus that pushes heads past the
    broadcast threshold: drop the hint and it is one more vocab-sized
    shuffle). Per-doc aggregation partial-aggregates map-side. At
    100 TB the only corpus-sized exchanges are the (w1, w2) hash and
    the final doc_id agg — the LM itself stays vocab-sized and
    Zipf-compacts.
    """
    docs = read_table(spark, sf_dir, "documents")
    t = F.col("t")
    zipped = F.arrays_zip(
        F.slice(t, 1, F.size(t) - 1), F.slice(t, 2, F.size(t) - 1)
    )
    bg = (
        docs.select("doc_id", F.split(F.lower(F.col("text")), " ").alias("t"))
        .select("doc_id", F.explode(zipped).alias("g"))
        .select(
            "doc_id",
            F.col("g.0").alias("w1"),
            F.col("g.1").alias("w2"),
        )
    )
    cnt2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    cnt1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    p = cnt2.join(F.broadcast(cnt1), "w1").select(
        "w1",
        "w2",
        F.expr(f"c2 * {_LM_SCALE}L div c1").alias("p_scaled"),
    )
    return (
        bg.join(p, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("p_scaled").alias("lm_score_scaled"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "lm_score_scaled",
            F.expr("lm_score_scaled div n_bigrams").alias("avg_p_scaled"),
        )
    )
