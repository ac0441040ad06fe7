"""BPE vocabulary induction — the iterative merge loop that tokenizer
training runs over a corpus, expressed Spark-first.

The reference's text tier stops at tokenization/counting (reference
bigdata/__init__.py's token pipeline); training a BPE vocabulary is the
natural next operator a 100 TB training-data pipeline needs, and its
iterative argmax-merge loop is a genuinely different shape from the
n-gram counters: each round's pair statistics depend on the previous
round's merge.

Scale design: the corpus is touched ONCE, to build the (word, freq)
vocabulary — every merge round then runs against the vocab table,
which is bounded by the language (millions of rows), not the corpus
(billions). This corpus→vocab compaction is exactly how production
BPE trainers scale; a per-document formulation would re-shuffle the
corpus every round.

Token-sequence encoding: a word's current segmentation is a string of
wrapped tokens, "|c1||c2||...||cn|". Merging pair (a,b) is then a
LITERAL string replace of "|a||b|" with "|ab|" — no regex, and the
wrappers make occurrences non-overlapping, so both engines'
left-to-right replace-all implements exactly BPE's greedy merge-all
semantics (including the "a a a" -> "aa a" left-bias).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

_BPE_ROUNDS = 3


def _bpe_oracle_sql(rounds: int) -> str:
    parts = [
        """
    WITH words AS (
        SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ) WHERE regexp_matches(word, '^[a-z]+$')
        GROUP BY word
    ),
    w1 AS (
        SELECT regexp_replace(word, '(.)', '|\\1|', 'g') AS s, freq
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
        SELECT replace(s, '|' || a || '||' || b || '|',
                       '|' || a || b || '|') AS s, freq
        FROM w{r} CROSS JOIN m{r}
    )"""
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS round, a AS left_tok, b AS right_tok, "
        f"cnt AS pair_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return "".join(parts) + "\n    " + selects


def _pair_counts(w: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the wrapped-token strings.
    Tokens are recovered inside whole-stage codegen (substring + split)
    and pairs come from the zipped-shifted-slices form — no HOF lambda
    touches the scan (transform() lambdas run interpreted and
    re-evaluate captured subexpressions per element)."""
    toks = F.split(F.expr("substring(s, 2, length(s) - 2)"), r"\|\|")
    z = F.arrays_zip(
        F.slice(toks, 1, F.size(toks) - 1).alias("a"),
        F.slice(toks, 2, F.size(toks) - 1).alias("b"),
    )
    return (
        w.select(F.explode(z).alias("p"), "freq")
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "freq")
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_round(w: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One BPE round: argmax pair (count desc, then lexicographic —
    fully deterministic), then merge it everywhere. The argmax is a
    TakeOrdered (no global sort materializes) and the merge attaches
    the ONE-ROW winner by broadcast cross join, so a round costs one
    keyed agg + one scan of the vocab."""
    best = _pair_counts(w).orderBy(F.desc("cnt"), "a", "b").limit(1)
    merged = w.crossJoin(F.broadcast(best)).select(
        F.replace(
            F.col("s"),
            F.concat(F.lit("|"), F.col("a"), F.lit("||"), F.col("b"), F.lit("|")),
            F.concat(F.lit("|"), F.col("a"), F.col("b"), F.lit("|")),
        ).alias("s"),
        "freq",
    )
    return best, merged


@query(
    "bpe_merge_rounds",
    sql=_bpe_oracle_sql(_BPE_ROUNDS),
    tags=("llm", "tokenize", "bpe", "iterative"),
)
def bpe_merge_rounds(spark, sf_dir):
    """First three BPE merges learned from the corpus: per round, the
    highest-frequency adjacent token pair (weighted by word frequency,
    ties broken lexicographically) and its count. The oracle unrolls
    the identical three rounds as chained CTEs, so the argmax, the
    tie-break, AND the merge rewriting are all value-checked — if the
    Spark merge mangled a single word's segmentation, round 2's counts
    would diverge.

    Scale shape: one corpus scan builds (word, freq); each round is a
    vocab-table agg with map-side partials + a one-row broadcast
    attach. Rounds are inherently sequential (that IS the algorithm);
    the vocab stays bounded by the language so 100 TB of corpus costs
    exactly one extra scan over round 1 of any smaller corpus.
    """
    docs = read_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = words.select(
        F.regexp_replace("word", "(.)", r"|$1|").alias("s"), "freq"
    )
    outs = []
    for r in range(1, _BPE_ROUNDS + 1):
        best, w = _merge_round(w)
        outs.append(
            best.select(
                F.lit(r).cast("int").alias("round"),
                F.col("a").alias("left_tok"),
                F.col("b").alias("right_tok"),
                F.col("cnt").alias("pair_count"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
