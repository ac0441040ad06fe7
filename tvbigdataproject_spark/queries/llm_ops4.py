"""Training-data pipeline operators, batch 4: winsorized length stats,
deterministic weighted sampling, Zipf rank-band mass, duplicate-span
coverage, and per-label embedding centroids.

Five more first-class LLM-corpus operations, each with a DuckDB oracle:

- winsorize_token_stats  percentile-clipped per-language length stats
                         (outlier-robust corpus statistics)
- sample_weighted_hash   reproducible per-source Bernoulli sampling in
                         pure integer space (corpus mixture control)
- zipf_band_mass         token mass per log2 rank band — the Zipf curve
                         without a single floating-point log
- dup_span_coverage      fraction of each document's 8-gram spans that
                         recur elsewhere (substring-level dup signal, the
                         scalable cousin of suffix-array span dedup)
- embed_centroid_by_label  class centroids of the embedding table
                         (the seed computation for IVF / k-means / label
                         drift monitoring)

Scale notes: all but zipf's final ranking are scan-stage maps or keyed
aggregations. The Zipf ranking is a global window over the VOCABULARY
(orders of magnitude below the corpus; at extreme vocab sizes the rank
would come from a range-partitioned sort, same result). Cross-engine
determinism: sampling and band edges are integer-exact (md5-prefix
buckets, bit-length bands), and every accumulated double goes through
the scaled-integer stable forms in queries/_stable.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.hashing import hex16_hash
from tvbigdataproject_spark.functions.text import shingles, simple_tokens
from tvbigdataproject_spark.queries._stable import sql_stable_sum, stable_sum
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table, read_table_spread


@query(
    "winsorize_token_stats",
    sql="""
    WITH sized AS (
        SELECT lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    ),
    cuts AS (
        SELECT lang,
               quantile_cont(n_tok, 0.05) AS lo,
               quantile_cont(n_tok, 0.95) AS hi
        FROM sized
        GROUP BY lang
    )
    SELECT sized.lang,
           COUNT(*) AS n_docs,
           MIN(lo) AS cut_lo,
           MIN(hi) AS cut_hi,
           {stable_mean} AS w_mean
    FROM sized JOIN cuts ON sized.lang = cuts.lang
    GROUP BY sized.lang
    """.format(
        stable_mean=sql_stable_sum(
            "LEAST(GREATEST(CAST(n_tok AS DOUBLE), lo), hi)", 4
        )
        + " / COUNT(*)"
    ),
    tags=("llm", "winsorize", "percentile"),
)
def winsorize_token_stats(spark, sf_dir):
    """Winsorized (5%/95% clipped) mean document length per language —
    the outlier-robust statistic quality dashboards want, since a few
    pathological documents can move a plain mean by orders of magnitude.

    Shape: one grouped percentile pass over the per-doc token counts
    (languages are bounded, so the cuts table is tiny), a broadcast
    join attaching each language's cuts, a clamp, and a grouped stable
    mean. The clamp values interpolate between INTEGER order statistics
    with the same h = p*(n-1) rule in both engines, so the cut doubles
    are bitwise-identical (same reliance as decile_assign_range_join);
    clipped values then accumulate via scaled-integer sums.
    """
    sized = read_table(spark, sf_dir, "documents").select(
        "lang", F.size(simple_tokens(F.col("text"))).cast("long").alias("n_tok")
    )
    cuts = sized.groupBy("lang").agg(
        F.percentile("n_tok", 0.05).alias("lo"),
        F.percentile("n_tok", 0.95).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("n_tok").cast("double"), F.col("lo")), F.col("hi"))
    return (
        sized.join(F.broadcast(cuts), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("lo").alias("cut_lo"),
            F.min("hi").alias("cut_hi"),
            (stable_sum(clipped, 4) / F.count(F.lit(1))).alias("w_mean"),
        )
    )


@query(
    "sample_weighted_hash",
    sql="""
    WITH rated AS (
        SELECT doc_id, source,
               CAST(substr(source, 4) AS BIGINT) % 10 + 1 AS rate10,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT AS h
        FROM documents
    )
    SELECT source,
           MIN(rate10) / 10.0 AS rate,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN h * 10 < 65536 * rate10 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM rated
    GROUP BY source
    """,
    tags=("llm", "sampling", "mixture"),
)
def sample_weighted_hash(spark, sf_dir):
    """Deterministic weighted (per-source rate) Bernoulli sampling — the
    mixture-control primitive: downsample each source to its target
    rate so the training mix matches a recipe, reproducibly. A document
    is kept iff its 16-bit md5 bucket falls under the source's rate,
    so membership is a pure function of (doc_id, source): re-runs,
    repartitioning, and incremental corpus growth never change a
    decision, and the keep test is INTEGER (h*10 < 65536*rate10) — no
    float threshold to disagree about. Here the rate derives from the
    source's numeric suffix ((k % 10 + 1)/10); in production it comes
    from a recipe table joined the same way. Scan-stage map + one
    grouped count; zero extra shuffles at any scale.
    """
    src_num = F.substring("source", 4, 10).cast("long")
    rate10 = src_num % 10 + 1
    h = hex16_hash(F.col("doc_id").cast("string"))
    kept = h * 10 < F.lit(65536) * rate10
    return (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "source", rate10.alias("rate10"), kept.alias("kept"))
        .groupBy("source")
        .agg(
            (F.min("rate10") / 10.0).alias("rate"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias("n_kept"),
        )
    )


@query(
    "zipf_band_mass",
    sql="""
    WITH tok AS (
        SELECT unnest(string_split(lower(text), ' ')) AS t
        FROM documents
    ),
    counts AS (SELECT t, COUNT(*) AS cnt FROM tok GROUP BY t),
    ranked AS (
        SELECT cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, t) AS rnk
        FROM counts
    )
    SELECT CAST(length(bin(rnk)) - 1 AS BIGINT) AS band,
           COUNT(*) AS n_types,
           SUM(cnt) AS mass,
           MAX(cnt) AS top_count
    FROM ranked
    GROUP BY band
    """,
    tags=("llm", "zipf", "vocab"),
)
def zipf_band_mass(spark, sf_dir):
    """Zipf profile of the corpus vocabulary: total token mass per
    geometric rank band (ranks 1, 2-3, 4-7, 8-15, ...). Under a Zipf
    law each band carries roughly equal mass, so the band table IS the
    fitted curve — readable by eye and comparable across corpus
    versions — without the log-log regression whose floating-point logs
    (libm vs StrictMath) are not bitwise portable across engines. The
    band index floor(log2(rank)) is computed as bit_length(rank)-1 via
    ``bin()`` string length: pure integer arithmetic in both engines.

    Scale: token counting is the map-heavy part (scan + one keyed agg).
    The oracle's ROW_NUMBER over the whole vocabulary is the semantic
    spec, but executing it is a vocab-sized SINGLE-TASK sort (billions
    of types at web scale), so the Spark plan never ranks rows at all:
    a tie run of m types sharing count c occupies the contiguous rank
    interval [r0, r0+m) REGARDLESS of the within-tie order, and band
    aggregates depend only on (rank, c) — so each run is split across
    the <=64 geometric bands it intersects in closed form. r0 itself
    (types with strictly higher count) comes from the bucket-offset
    decomposition with _b = floor(log2(c)): the only unpartitioned
    window runs over the <=64-row log2-bucket table, and the
    within-bucket cumulative partitions on _b.
    """
    tok = read_table(spark, sf_dir, "documents").select(
        F.explode(simple_tokens(F.lower(F.col("text")))).alias("t")
    )
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
    # tie runs: m types share count cnt; log2 bucket (<=64 values)
    runs = counts.groupBy("cnt").agg(F.count(F.lit(1)).alias("m"))
    runs = runs.withColumn("_b", (F.length(F.bin("cnt")) - 1).cast("long"))
    btot = runs.groupBy("_b").agg(F.sum("m").alias("_t"))
    # bounded: one row per occupied log2 band of the count domain
    w_off = Window.orderBy(F.desc("_b")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = btot.select(
        "_b",
        F.coalesce(F.sum("_t").over(w_off), F.lit(0).cast("long")).alias(
            "_off"
        ),
    )
    w_in = (
        Window.partitionBy("_b")
        .orderBy(F.desc("cnt"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        runs.join(F.broadcast(offsets), "_b")
        .select(
            "cnt",
            "m",
            (
                1
                + F.col("_off")
                + F.coalesce(F.sum("m").over(w_in), F.lit(0).cast("long"))
            ).alias("r0"),
        )
    )
    # split each run across the geometric rank bands it intersects:
    # band b covers ranks [2^b, 2^(b+1)); the run covers [r0, r0+m-1]
    spread = placed.select(
        "cnt",
        "m",
        "r0",
        F.explode(
            F.sequence(
                (F.length(F.bin("r0")) - 1).cast("long"),
                (F.length(F.bin(F.col("r0") + F.col("m") - 1)) - 1).cast(
                    "long"
                ),
            )
        ).alias("band"),
    )
    lo = F.greatest(
        F.col("r0"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(band AS INT))"),
    )
    hi = F.least(
        F.col("r0") + F.col("m") - 1,
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(band AS INT) + 1) - 1"),
    )
    sz = (hi - lo + 1).alias("sz")
    return (
        spread.select("cnt", "band", sz)
        .groupBy("band")
        .agg(
            F.sum("sz").alias("n_types"),
            F.sum(F.col("sz") * F.col("cnt")).alias("mass"),
            F.max("cnt").alias("top_count"),
        )
    )


@query(
    "dup_span_coverage",
    sql="""
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                     || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6]
                     || ' ' || ws[i+7] AS s
        FROM t, UNNEST(range(1, len(ws) - 6)) AS u(i)
        WHERE len(ws) >= 8
    ),
    gram_docs AS (SELECT s, COUNT(*) AS nd FROM sh GROUP BY s)
    SELECT doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               / CAST(COUNT(*) AS DOUBLE) AS dup_frac
    FROM sh JOIN gram_docs USING (s)
    GROUP BY doc_id
    """,
    tags=("llm", "dedup", "span"),
)
def dup_span_coverage(spark, sf_dir):
    """Duplicate-span coverage: for each document, the fraction of its
    distinct word-8-gram spans that also occur in some other document.
    This is the distributable stand-in for suffix-array substring dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): documents with high dup_frac are boilerplate-heavy or
    near-copies even when no single whole-document match exists, and
    the per-doc fraction is the usual removal threshold.

    Shape: one shingle pass (array expression, exploded once), a gram-
    keyed count — since the shingle set is per-doc distinct, COUNT(*)
    per gram IS its document frequency — and a join back on the gram
    to fold per-doc numerators. Both heavy stages key on the gram
    string, so the exchange is reused; no all-pairs anything.
    """
    docs = read_table_spread(spark, sf_dir, "documents", "doc_id")
    sh = docs.select(
        "doc_id",
        F.explode(shingles(F.col("text"), n=8, distinct=True)).alias("s"),
    )
    gram_docs = sh.groupBy("s").agg(F.count(F.lit(1)).alias("nd"))
    dup = F.when(F.col("nd") >= 2, 1).otherwise(0)
    return (
        sh.join(gram_docs, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(dup).cast("long").alias("n_dup"),
            (
                F.sum(dup).cast("long")
                / F.count(F.lit(1)).cast("double")
            ).alias("dup_frac"),
        )
    )


@query(
    "dedup_max_spans",
    sql="""
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    pos AS (
        SELECT doc_id, i,
               md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                         || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6]
                         || ' ' || ws[i+7]) AS g
        FROM t, UNNEST(range(1, len(ws) - 6)) AS u(i)
        WHERE len(ws) >= 8
    ),
    dup_grams AS (
        SELECT g FROM (
            SELECT g, COUNT(DISTINCT doc_id) AS df_ FROM pos GROUP BY g
        ) WHERE df_ >= 2
    ),
    dup_pos AS (
        SELECT doc_id, i FROM pos WHERE g IN (SELECT g FROM dup_grams)
    ),
    marked AS (
        SELECT doc_id, i,
               CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i) > 8
                    THEN 1 ELSE 0 END AS brk
        FROM dup_pos
    ),
    runs AS (
        SELECT doc_id, i,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS UNBOUNDED PRECEDING) AS run_id
        FROM marked
    )
    SELECT doc_id,
           MIN(i) AS span_start,
           MAX(i) + 7 AS span_end,
           MAX(i) + 7 - MIN(i) + 1 AS n_tokens,
           COUNT(*) AS n_grams
    FROM runs
    GROUP BY doc_id, run_id
    """,
    tags=("llm", "dedup", "span"),
)
def dedup_max_spans(spark, sf_dir):
    """Maximal repeated-span detection — the production form of
    substring dedup (see operators/dedup.py::max_dup_spans for the
    algorithm and scale shape). Where dup_span_coverage reports a
    per-doc FRACTION at fixed 8-gram granularity, this emits the
    actual maximal token spans [span_start, span_end] (1-based,
    inclusive) a pipeline would cut: runs of positions whose 8-gram
    occurs in >= 2 distinct documents, merged while the covered token
    regions stay contiguous (positional gap <= 8). The oracle replays
    the identical chain — md5 gram digests, document-frequency gate,
    lag/cumsum run merge — in pure SQL.
    """
    from tvbigdataproject_spark.operators.dedup import max_dup_spans

    docs = read_table_spread(spark, sf_dir, "documents", "doc_id")
    return max_dup_spans(docs, text_col="text", id_col="doc_id", n=8)


@query(
    "dedup_spans_applied",
    sql="""
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    pos AS (
        SELECT doc_id, i,
               md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                         || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6]
                         || ' ' || ws[i+7]) AS g
        FROM t, UNNEST(range(1, len(ws) - 6)) AS u(i)
        WHERE len(ws) >= 8
    ),
    dup_grams AS (
        SELECT g FROM (
            SELECT g, COUNT(DISTINCT doc_id) AS df_ FROM pos GROUP BY g
        ) WHERE df_ >= 2
    ),
    dup_pos AS (
        SELECT doc_id, i FROM pos WHERE g IN (SELECT g FROM dup_grams)
    ),
    marked AS (
        SELECT doc_id, i,
               CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i) > 8
                    THEN 1 ELSE 0 END AS brk
        FROM dup_pos
    ),
    runs AS (
        SELECT doc_id, i,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS UNBOUNDED PRECEDING) AS run_id
        FROM marked
    ),
    spans AS (
        SELECT doc_id, MIN(i) AS span_start, MAX(i) + 7 AS span_end
        FROM runs GROUP BY doc_id, run_id
    ),
    toks AS (
        SELECT doc_id, i AS pos, ws[i] AS tok
        FROM t, UNNEST(range(1, len(ws) + 1)) AS u(i)
    ),
    covered AS (
        SELECT doc_id, j AS pos
        FROM spans, UNNEST(range(span_start, span_end + 1)) AS v(j)
    ),
    kept AS (
        SELECT tk.doc_id, tk.pos, tk.tok
        FROM toks tk LEFT JOIN covered c USING (doc_id, pos)
        WHERE c.pos IS NULL
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS n,
               string_agg(tok, ' ' ORDER BY pos) AS ct
        FROM kept GROUP BY doc_id
    )
    SELECT doc_id,
           COALESCE(n, CAST(0 AS BIGINT)) AS n_tokens_kept,
           md5(COALESCE(ct, '')) AS clean_digest
    FROM documents LEFT JOIN agg USING (doc_id)
    """,
    tags=("llm", "dedup", "span"),
)
def dedup_spans_applied(spark, sf_dir):
    """Span-clipped corpus materialization — apply_span_removal on top
    of max_dup_spans: cut every maximal repeated token range out of
    each document and emit the cleaned corpus (as an md5 digest of the
    clean text, so the gate rows stay small while remaining bitwise on
    the full reassembled string). Production substring dedup ships the
    cleaned corpus, not just the spans (Lee et al.; RefinedWeb) — this
    closes that loop. The oracle replays the whole chain: span
    detection, token-range explosion, (doc, pos) anti-join, ordered
    re-concatenation.
    """
    from tvbigdataproject_spark.operators.dedup import (
        apply_span_removal,
        max_dup_spans,
    )

    docs = read_table_spread(spark, sf_dir, "documents", "doc_id")
    spans = max_dup_spans(docs, text_col="text", id_col="doc_id", n=8)
    clean = apply_span_removal(docs, spans, text_col="text", id_col="doc_id")
    return clean.select(
        "doc_id",
        "n_tokens_kept",
        F.md5("clean_text").alias("clean_digest"),
    )


@query(
    "embed_centroid_by_label",
    sql=f"""
    SELECT label,
           CAST(i AS BIGINT) AS pos,
           COUNT(*) AS n,
           {sql_stable_sum('CAST(embedding[i] AS DOUBLE)', 6)} / COUNT(*)
               AS centroid
    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    GROUP BY label, CAST(i AS BIGINT)
    """,
    tags=("llm", "embedding", "centroid"),
)
def embed_centroid_by_label(spark, sf_dir):
    """Per-label embedding centroids, one row per (label, dimension) —
    the seed computation for IVF cell assignment, k-means init, and
    label-drift monitoring. Emitting (label, pos, centroid) rows keeps
    the result engine-neutral (no array construction whose ordering an
    oracle could disagree on).

    Shape: posexplode fans each vector into (dim, value) rows that ride
    the scan stage — the groupBy on (label, pos) then map-side combines
    to |labels| x |dims| rows per task before one shuffle. float32
    inputs are cast to double (exact) and averaged via scaled-integer
    sums, so 32-way partials equal the oracle bitwise. At 100 TB the
    same plan holds: the fan-out factor is the dimension count, and the
    output is bounded by labels x dims regardless of row count.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "v")
    ).select(
        "label",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        F.col("v").cast("double").alias("v"),
    )
    return (
        exploded.groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (stable_sum(F.col("v"), 6) / F.count(F.lit(1))).alias("centroid"),
        )
    )


@query(
    "priority_sample_topk",
    sql="""
    WITH pri AS (
        SELECT doc_id, source, n_chars,
               (n_chars * 4294967296)
                   // (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT + 1)
                   AS prio
        FROM documents
    )
    SELECT doc_id, source, n_chars, prio
    FROM pri
    ORDER BY prio DESC, doc_id
    LIMIT 100
    """,
    tags=("llm", "sampling", "weighted"),
)
def priority_sample_topk(spark, sf_dir):
    """Priority sampling (Duffield-Lund-Thorup 2007): a weighted
    WITHOUT-replacement sample of k=100 documents, weight = n_chars, as
    the top-k by priority w/u with u a per-doc uniform. Complements
    sample_weighted_hash (per-source Bernoulli RATES) with the other
    production sampler: a fixed-SIZE weighted sample whose (k+1)-th
    priority is the Horvitz-Thompson threshold for unbiased sum
    estimates over the kept rows.

    Exactness: u is the 16-bit md5 bucket, and the priority is the
    INTEGER floor of w*2^32/(h+1) — membership and order are pure
    integer functions of (doc_id, n_chars), so re-runs, repartitioning,
    and both engines agree bit-for-bit (no pow()/ln() in the sort key —
    transcendental last-ULP disagreement is exactly what a cross-engine
    gate cannot carry). Floor-coarsened priorities tie at most on equal
    (w, h) pairs; doc_id breaks those deterministically.

    Scale shape: scan-local priority + TakeOrderedAndProject — no full
    sort, no shuffle beyond the k-row merge at any corpus size.
    """
    docs = read_table(spark, sf_dir, "documents")
    h = hex16_hash(F.col("doc_id").cast("string"))
    pri = docs.select(
        "doc_id", "source", "n_chars", h.alias("_h")
    ).select(
        "doc_id",
        "source",
        "n_chars",
        F.expr("(n_chars * 4294967296) div (_h + 1)").alias("prio"),
    )
    return pri.orderBy(F.col("prio").desc(), "doc_id").limit(100)


@query(
    "mixture_temperature_sample",
    sql="""
    WITH counts AS (
        SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2
    ),
    m AS (SELECT MIN(n) AS n_min FROM counts),
    rated AS (
        SELECT d.lang, d.source, c.n, m.n_min,
               ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::BIGINT AS h
        FROM documents d
        JOIN counts c ON d.lang = c.lang AND d.source = c.source
        CROSS JOIN m
    )
    SELECT lang, source, MIN(n) AS n_total, MIN(n_min) AS n_floor,
           CAST(SUM(CASE WHEN h * h * n < 4294967296 * n_min THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM rated GROUP BY 1, 2
    """,
    tags=("llm", "sampling", "mixture"),
)
def mixture_temperature_sample(spark, sf_dir):
    """Temperature-flattened mixture sampling (T = 2, the mT5/PaLM
    rebalancing family): each (lang, source) domain is Bernoulli-kept
    at rate sqrt(n_min / n_domain), so expected kept counts go from
    n_domain to sqrt(n_min * n_domain) — big domains compressed, the
    smallest kept whole, exactly the n^(1/T) flattening with T = 2.

    No float threshold anywhere: keep iff h^2 * n < 65536^2 * n_min,
    the squared form of h/65536 < sqrt(n_min/n) (h >= 0, both sides
    integer — h^2 <= 2^32 times n stays under 2^63 for domains below
    ~2^30 docs; shard the hash to fewer bits or lift to DECIMAL(38,0)
    beyond that). The decision is a pure function of (doc_id, domain
    count), so re-runs and repartitioning reproduce the same corpus.

    Scale shape: one grouped count (domain table, dozens of rows),
    broadcast back over one corpus scan, one grouped sum — the corpus
    never shuffles.
    """
    docs = read_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    n_min = counts.agg(F.min("n").alias("n_min"))
    h = hex16_hash(F.col("doc_id").cast("string"))
    rated = (
        docs.select("doc_id", "lang", "source")
        .join(F.broadcast(counts), ["lang", "source"])
        .crossJoin(F.broadcast(n_min))
        .select(
            "lang",
            "source",
            "n",
            "n_min",
            (h * h * F.col("n") < F.lit(4294967296) * F.col("n_min")).alias(
                "kept"
            ),
        )
    )
    return rated.groupBy("lang", "source").agg(
        F.min("n").alias("n_total"),
        F.min("n_min").alias("n_floor"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias("n_kept"),
    )
