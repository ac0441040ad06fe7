"""Training-data pipeline operators, batch 9: retrieval scoring and
tokenizer application.

- bm25_topk: BM25 ranking over the documents table — the retrieval
  scorer that curation pipelines use for query-targeted corpus slices
  (and RAG stacks for lexical recall). Extends the tf-idf tier
  (llm_ops.py::tfidf_top_terms) with BM25's term-frequency saturation
  and document-length normalization — the two features that make BM25
  the default lexical ranker.
- bpe_encode_tokens: applies the BPE merges learned by
  llm_ops6.py::bpe_merge_rounds to every document — the ENCODE half of
  tokenization (induction alone never touches a training run; the
  encoder is what produces the token counts that size datasets,
  mixtures, and packing).

Cross-engine exactness: BM25's log-idf is transcendental (not
bit-reproducible across engines), so the idf keeps the linear N/df
form — the same monotone substitution tfidf_top_terms proved, leaving
ranks unchanged. k1/b use DYADIC constants (1.25, 0.75 — exactly
representable doubles) and every constant is CAST AS DOUBLE in the
oracle because DuckDB float literals are DECIMAL. The multi-term sum
is a fixed-order pivot (one MAX-of-singleton per term, then a
left-to-right add) because a groupBy SUM over doubles is
summation-order-dependent and would hash-mismatch at the last bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.llm_ops6 import _BPE_ROUNDS, _pair_counts
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# fixed lexical query — three mid-frequency corpus terms; a production
# run parameterizes these
_BM25_TERMS = ("vector", "hash", "scan")
_K1 = "1.25"  # dyadic: 5/4
_B = "0.75"  # dyadic: 3/4
_K1P1 = "2.25"  # k1 + 1, dyadic: 9/4
_ONE_MINUS_B = "0.25"  # dyadic: 1/4


def _bm25_body() -> str:
    in_list = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    pivot_cols = ",\n               ".join(
        f"COALESCE(MAX(CASE WHEN term = '{t}' THEN score END), "
        f"CAST(0 AS DOUBLE)) AS s_{t}"
        for t in _BM25_TERMS
    )
    add = " + ".join(f"s_{t}" for t in _BM25_TERMS)
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    qtf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks
        WHERE term IN ({in_list}) GROUP BY 1, 2
    ),
    df AS (SELECT term, COUNT(*) AS df FROM qtf GROUP BY 1),
    stats AS (
        SELECT CAST(d.n AS DOUBLE) AS n_docs,
               CAST(t.n AS DOUBLE) / CAST(d.n AS DOUBLE) AS avgdl
        FROM (SELECT COUNT(*) AS n FROM documents) d
        CROSS JOIN (SELECT COUNT(*) AS n FROM toks) t
    ),
    scored AS (
        SELECT qtf.doc_id, qtf.term,
               (stats.n_docs / CAST(df.df AS DOUBLE)) *
               ((CAST(qtf.tf AS DOUBLE) * CAST({_K1P1} AS DOUBLE)) /
                (CAST(qtf.tf AS DOUBLE) + CAST({_K1} AS DOUBLE) *
                 (CAST({_ONE_MINUS_B} AS DOUBLE) + CAST({_B} AS DOUBLE) *
                  (CAST(dl.dl AS DOUBLE) / stats.avgdl)))) AS score
        FROM qtf
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
    ),
    pivoted AS (
        SELECT doc_id,
               {pivot_cols}
        FROM scored GROUP BY 1
    )"""


def _bm25_sql() -> str:
    add = " + ".join(f"s_{t}" for t in _BM25_TERMS)
    return _bm25_body() + f"""
    SELECT doc_id, s_vector, s_hash, s_scan,
           {add} AS bm25
    FROM pivoted
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
    """


@query("bm25_topk", sql=_bm25_sql(), tags=("llm", "retrieval", "bm25"))
def bm25_topk(spark, sf_dir):
    """Top-10 documents by BM25 (Robertson & Spärck Jones; the Okapi
    form) for a fixed 3-term lexical query, with the per-term partial
    scores exposed. score(d, t) = idf(t) * tf * (k1+1) / (tf + k1 *
    (1 - b + b * dl/avgdl)) with k1=1.25, b=0.75 and a linear idf
    (N/df) — see module docstring for the exactness rules.

    Scale shape: one corpus scan explodes tokens; doc length and
    query-term tf are keyed aggregations with map-side partials; the
    3-row df table and the one-row corpus stats broadcast into the
    scored join (the stats attach is an intended one-row broadcast
    cross join, tfidf_top_terms' shape); the final top-10 is a
    TakeOrdered — no global sort, no window over the corpus. At 100 TB
    nothing here materializes more than (corpus tokens -> per-doc
    aggregates); the quadratic-free shape is why BM25 slicing runs
    casually over web-scale corpora.
    """
    return _bm25_pivot(read_table(spark, sf_dir, "documents")).orderBy(
        F.desc("bm25"), "doc_id"
    ).limit(10)


def _bm25_pivot(docs):
    """Per-doc BM25 pivot with per-term partials and the summed score —
    shared by bm25_topk (top-10) and bm25_rerank_proximity (top-20
    candidate pool)."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    qtf = (
        toks.where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    t = toks.agg(F.count(F.lit(1)).alias("tn"))
    stats = (
        n.crossJoin(F.broadcast(t))
        .select(
            F.col("n").cast("double").alias("n_docs"),
            (F.col("tn").cast("double") / F.col("n").cast("double")).alias(
                "avgdl"
            ),
        )
    )
    k1 = F.lit(float(_K1))
    k1p1 = F.lit(float(_K1P1))
    b = F.lit(float(_B))
    omb = F.lit(float(_ONE_MINUS_B))
    score = (
        (F.col("n_docs") / F.col("df").cast("double"))
        * (
            (F.col("tf").cast("double") * k1p1)
            / (
                F.col("tf").cast("double")
                + k1 * (omb + b * (F.col("dl").cast("double") / F.col("avgdl")))
            )
        )
    ).alias("score")
    scored = (
        qtf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", score)
    )
    aggs = [
        F.coalesce(
            F.max(F.when(F.col("term") == term, F.col("score"))), F.lit(0.0)
        ).alias(f"s_{term}")
        for term in _BM25_TERMS
    ]
    pivoted = scored.groupBy("doc_id").agg(*aggs)
    bm25 = F.col(f"s_{_BM25_TERMS[0]}")
    for term in _BM25_TERMS[1:]:
        bm25 = bm25 + F.col(f"s_{term}")
    return pivoted.withColumn("bm25", bm25)


def _bpe_encode_oracle_sql(rounds: int) -> str:
    """Unrolled-CTE oracle: re-learn the same `rounds` merges as
    bpe_merge_rounds (word column carried through the chain), then
    encode every document's alphabetic words against the final
    segmentation and count tokens."""
    parts = [
        """
    WITH words AS (
        SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ) WHERE regexp_matches(word, '^[a-z]+$')
        GROUP BY word
    ),
    w1 AS (
        SELECT word, regexp_replace(word, '(.)', '|\\1|', 'g') AS s, freq
        FROM words
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
    p{r} AS (
        SELECT a, b, SUM(freq) AS cnt FROM (
            SELECT unnest(toks) AS a, unnest(toks[2:]) AS b, freq FROM (
                SELECT string_split(substr(s, 2, length(s) - 2), '||') AS toks,
                       freq
                FROM w{r}
            )
        ) WHERE b IS NOT NULL GROUP BY a, b
    ),
    m{r} AS (
        SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1
    ),
    w{r + 1} AS (
        SELECT word, replace(s, '|' || a || '||' || b || '|',
                             '|' || a || b || '|') AS s, freq
        FROM w{r} CROSS JOIN m{r}
    )"""
        )
    parts.append(
        f""",
    vocab AS (
        SELECT word,
               (length(s) - length(replace(s, '|', ''))) // 2 AS n_toks
        FROM w{rounds + 1}
    ),
    docw AS (
        SELECT doc_id, word FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ) WHERE regexp_matches(word, '^[a-z]+$')
    )
    SELECT doc_id,
           CAST(SUM(n_toks) AS BIGINT) AS bpe_tokens,
           COUNT(*) AS alpha_words
    FROM docw JOIN vocab USING (word)
    GROUP BY doc_id"""
    )
    return "".join(parts)


@query(
    "bpe_encode_tokens",
    sql=_bpe_encode_oracle_sql(_BPE_ROUNDS),
    tags=("llm", "tokenize", "bpe", "iterative"),
)
def bpe_encode_tokens(spark, sf_dir):
    """Per-document BPE token counts under the merges that
    bpe_merge_rounds learns from this same corpus: re-derive the merge
    chain (identical argmax/tie-break/rewrite — the oracle value-checks
    all of it a second time through the encode path), then count each
    document's tokens. Words are encoded ONCE on the deduplicated
    vocabulary — token count per distinct word — and documents join
    that vocab instead of re-segmenting their text; per-doc totals are
    a keyed sum. This vocab-compacted encode is how production
    tokenizer passes scale: the corpus is touched twice total (word
    counts; the encode join), never per merge round.

    Scale shape: merge rounds run on the bounded vocab table (one-row
    broadcast attaches, bpe_merge_rounds' shape); the final encode is
    an exploded-words equi-join against the BROADCAST vocab (bounded
    by the language) with map-side partial sums — no shuffle carries
    document text.
    """
    docs = read_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = words.select(
        "word", F.regexp_replace("word", "(.)", r"|$1|").alias("s"), "freq"
    )
    for _ in range(_BPE_ROUNDS):
        best = _pair_counts(w).orderBy(F.desc("cnt"), "a", "b").limit(1)
        w = w.crossJoin(F.broadcast(best)).select(
            "word",
            F.replace(
                F.col("s"),
                F.concat(
                    F.lit("|"), F.col("a"), F.lit("||"), F.col("b"), F.lit("|")
                ),
                F.concat(F.lit("|"), F.col("a"), F.col("b"), F.lit("|")),
            ).alias("s"),
            "freq",
        )
    vocab = w.select(
        "word",
        F.expr("(length(s) - length(replace(s, '|', ''))) div 2").alias(
            "n_toks"
        ),
    )
    docw = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word").rlike("^[a-z]+$"))
    return (
        docw.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_toks").alias("bpe_tokens"),
            F.count(F.lit(1)).alias("alpha_words"),
        )
    )
