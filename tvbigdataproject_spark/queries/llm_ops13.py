"""Round-9 retrieval/fingerprint additions:

- rrf_fused_retrieval     reciprocal-rank fusion of two exact lexical
                          rankers over bounded top-100 lists — the
                          standard hybrid-retrieval combiner, integer-
                          exact end to end
- winnowing_fingerprints  positional winnowing (window-min of k-gram
                          hashes) per document — the MOSS-style LOCAL
                          fingerprint text_fingerprint's global minhash
                          sketch cannot provide

Cross-engine exactness: ranks are row_numbers with doc_id tiebreaks
over totally-ordered bounded lists; RRF contributions are integer
parts-per-billion quotients (10^9 // (60 + rank)); winnowing hashes are
the standard md5-prefix 32-bit ints (functions/hashing.py) and the
window-min over them is integer. No doubles anywhere.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.hashing import hex_bits_hash
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table, read_table_spread

_RRF_TERMS = ("vector", "hash", "scan")  # the bm25_topk query terms
_RRF_K = 60  # the canonical RRF smoothing constant
_RRF_TOP = 100  # per-ranker candidate-list depth
_RRF_OUT = 50


def _rrf_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _RRF_TERMS)
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
        FROM documents
    ),
    m AS (
        SELECT tok.doc_id,
               CAST(COUNT(*) AS BIGINT) AS tf,
               CAST(COUNT(DISTINCT tok.t) AS BIGINT) AS coverage
        FROM tok WHERE tok.t IN ({terms})
        GROUP BY 1
    ),
    mw AS (
        SELECT m.doc_id, m.tf, m.coverage, d.n_chars
        FROM m JOIN documents d ON m.doc_id = d.doc_id
    ),
    a AS (
        SELECT doc_id, tf FROM mw
        ORDER BY tf DESC, doc_id LIMIT {_RRF_TOP}
    ),
    ar AS (
        SELECT doc_id, tf,
               row_number() OVER (ORDER BY tf DESC, doc_id) AS ra
        FROM a
    ),
    b AS (
        SELECT doc_id, coverage, n_chars FROM mw
        ORDER BY coverage DESC, n_chars, doc_id LIMIT {_RRF_TOP}
    ),
    br AS (
        SELECT doc_id, coverage, n_chars,
               row_number() OVER (
                   ORDER BY coverage DESC, n_chars, doc_id
               ) AS rb
        FROM b
    ),
    fused AS (
        SELECT COALESCE(ar.doc_id, br.doc_id) AS doc_id, ar.ra, br.rb,
               COALESCE(1000000000 // ({_RRF_K} + ar.ra), 0)
                   + COALESCE(1000000000 // ({_RRF_K} + br.rb), 0)
                   AS rrf_ppb
        FROM ar FULL OUTER JOIN br ON ar.doc_id = br.doc_id
    )
    SELECT doc_id, ra AS rank_tf, rb AS rank_cov, rrf_ppb
    FROM fused ORDER BY rrf_ppb DESC, doc_id LIMIT {_RRF_OUT}
    """


@query(
    "rrf_fused_retrieval",
    sql=_rrf_sql(),
    tags=("llm", "retrieval", "fusion"),
)
def rrf_fused_retrieval(spark, sf_dir):
    """Reciprocal-rank fusion of two retrieval rankers for the fixed
    query {_RRF_TERMS}: ranker A orders matching docs by total query-
    term frequency, ranker B by distinct-term coverage then brevity.
    RRF(doc) = sum over rankers of 1/(60 + rank) — the rank-only
    combiner that needs no score calibration, which is why it is the
    default hybrid (lexical + vector) fusion in production retrieval.

    Exactness: the 1/(60+r) contributions are integer parts-per-
    billion FLOOR quotients (10^9 // (60+r)) — distinct through rank
    939, far beyond the 100-deep lists, so fusion order is unaffected
    by the flooring; every ORDER BY carries a doc_id total-order
    tiebreak.

    Scale shape: one token scan + grouped match table; each ranker's
    candidate list is a TakeOrdered top-{_RRF_TOP} (never a global
    sort); ranks come from windows over those bounded lists
    (allowlisted) and the fusion is a {_RRF_TOP}x{_RRF_TOP} full outer
    join.
    """
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t")
    ).where(F.col("t").isin(*_RRF_TERMS))
    m = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("t").alias("coverage"),
    )
    mw = m.join(docs.select("doc_id", "n_chars"), "doc_id")
    a = mw.select("doc_id", "tf").orderBy(
        F.col("tf").desc(), "doc_id"
    ).limit(_RRF_TOP)
    ar = a.withColumn(
        "ra",
        F.row_number().over(Window.orderBy(F.col("tf").desc(), "doc_id")),
    )
    b = mw.select("doc_id", "coverage", "n_chars").orderBy(
        F.col("coverage").desc(), "n_chars", "doc_id"
    ).limit(_RRF_TOP)
    br = b.withColumn(
        "rb",
        F.row_number().over(
            Window.orderBy(F.col("coverage").desc(), "n_chars", "doc_id")
        ),
    )
    fused = (
        ar.select("doc_id", "ra")
        .join(br.select("doc_id", "rb"), "doc_id", "full_outer")
        .select(
            "doc_id",
            "ra",
            "rb",
            (
                F.coalesce(
                    F.expr(f"1000000000 div ({_RRF_K} + ra)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000000 div ({_RRF_K} + rb)"), F.lit(0)
                )
            ).alias("rrf_ppb"),
        )
    )
    return (
        fused.select(
            "doc_id",
            F.col("ra").alias("rank_tf"),
            F.col("rb").alias("rank_cov"),
            "rrf_ppb",
        )
        .orderBy(F.col("rrf_ppb").desc(), "doc_id")
        .limit(_RRF_OUT)
    )


_WIN_K = 4  # words per k-gram
_WIN_W = 4  # k-gram hashes per winnowing window


@query(
    "winnowing_fingerprints",
    sql=f"""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    gr AS (
        SELECT doc_id, i,
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                   AS gram
        FROM toks, UNNEST(range(1, len(ws) - {_WIN_K - 2})) AS t(i)
    ),
    h AS (
        SELECT doc_id, i,
               ('0x' || substr(md5(gram), 1, 8))::BIGINT AS hv,
               CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT)
                   AS n_grams
        FROM gr
    ),
    wm AS (
        SELECT doc_id, i, n_grams,
               MIN(hv) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING
               ) AS fp
        FROM h
    )
    SELECT doc_id,
           MAX(n_grams) AS n_grams,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fingerprints,
           MIN(fp) AS min_fingerprint
    FROM wm WHERE i <= n_grams - {_WIN_W - 1}
    GROUP BY doc_id
    """,
    tags=("llm", "dedup", "fingerprint"),
)
def winnowing_fingerprints(spark, sf_dir):
    """Winnowing fingerprints per document: hash every word-{_WIN_K}-
    gram, slide a window of {_WIN_W} consecutive hashes, and keep the
    window MINIMUM — the MOSS local-fingerprinting guarantee (any
    shared substring of >= k+w-1 words between two docs shares at least
    one selected fingerprint), which is what makes it the standard
    plagiarism / local-overlap detector. text_fingerprint's global
    minhash sketch answers "are these docs similar overall"; winnowing
    answers "do they share a PASSAGE" — a different dedup primitive.

    Emits the per-doc sketch profile (gram/window/distinct-fingerprint
    counts + the smallest fingerprint); the cross-doc passage join is a
    groupBy on fp over the selected set, linear in true overlaps.

    Determinism: hashes are the standard md5-prefix 32-bit ints; with
    232 distinct hash values per corpus word-window, ties inside a
    window are resolved by MIN on the VALUE (identical in both
    engines — no leftmost/rightmost position rule needed).

    Scale shape: grams explode scan-locally; both windows partition by
    doc_id (bounded by document length, the natural parallel key); one
    grouped aggregate per doc. No global window, no shuffle beyond the
    doc_id hash.
    """
    docs = read_table(spark, sf_dir, "documents")
    ws = F.split(F.lower("text"), " ")
    toks = docs.select("doc_id", ws.alias("ws"))
    n = F.size("ws")
    gram_idx = F.when(
        n >= _WIN_K, F.sequence(F.lit(1), n - (_WIN_K - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                gram_idx,
                lambda i: F.struct(
                    i.alias("i"),
                    F.concat_ws(
                        " ",
                        *[
                            F.element_at("ws", i + off)
                            for off in range(_WIN_K)
                        ],
                    ).alias("gram"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.i").alias("i"), F.col("g.gram").alias("gram"))
    h = grams.select(
        "doc_id",
        "i",
        hex_bits_hash(F.col("gram")).alias("hv"),
        F.count(F.lit(1))
        .over(Window.partitionBy("doc_id"))
        .cast("long")
        .alias("n_grams"),
    )
    wm = h.select(
        "doc_id",
        "i",
        "n_grams",
        F.min("hv")
        .over(
            Window.partitionBy("doc_id")
            .orderBy("i")
            .rowsBetween(Window.currentRow, _WIN_W - 1)
        )
        .alias("fp"),
    ).where(F.col("i") <= F.col("n_grams") - (_WIN_W - 1))
    return wm.groupBy("doc_id").agg(
        F.max("n_grams").alias("n_grams"),
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.countDistinct("fp").cast("long").alias("n_fingerprints"),
        F.min("fp").alias("min_fingerprint"),
    )


@query(
    "token_fertility_by_lang",
    sql="""
    WITH d AS (
        SELECT lang,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS toks,
               CAST(n_chars AS BIGINT) AS chars
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS tokens,
           CAST(SUM(chars) AS BIGINT) AS chars,
           1000000 * SUM(toks) // SUM(chars) AS tokens_per_mchar
    FROM d GROUP BY lang
    """,
    tags=("llm", "text", "tokenizer"),
)
def token_fertility_by_lang(spark, sf_dir):
    """Tokenizer fertility per language: tokens produced per character
    of raw text, the ratio that decides how much compute a language
    costs per byte of corpus (tokenizers trained lopsidedly emit 2-4x
    the tokens per char on underrepresented languages — this is the
    audit that catches it). Whitespace tokens stand in for the real
    tokenizer; the shape (scan-local tokenize + label-keyed aggregate)
    is identical for a BPE pandas_udf.

    Exactness: token and char counts are exact BIGINTs; fertility is
    an integer tokens-per-million-chars quotient.

    Scale shape: one scan, one aggregate keyed by the bounded language
    label set — map-side partials make the shuffle rows-per-language.
    """
    docs = read_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.size(F.split(F.lower("text"), " ")).cast("long").alias("toks"),
        F.col("n_chars").cast("long").alias("chars"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").cast("long").alias("tokens"),
        F.sum("chars").cast("long").alias("chars"),
        F.expr("(1000000 * sum(toks)) div sum(chars)").alias(
            "tokens_per_mchar"
        ),
    )


_PP_MIN_SHARED = 2  # fingerprints two docs must share to pair
_PP_FP_CAP = 100  # drop boilerplate fingerprints present in > cap docs


@query(
    "winnowing_passage_pairs",
    sql=f"""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    gr AS (
        SELECT doc_id, i,
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                   AS gram
        FROM toks, UNNEST(range(1, len(ws) - {_WIN_K - 2})) AS t(i)
    ),
    h AS (
        SELECT doc_id, i,
               ('0x' || substr(md5(gram), 1, 8))::BIGINT AS hv,
               CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT)
                   AS n_grams
        FROM gr
    ),
    wm AS (
        -- window BEFORE the boundary filter: a WHERE in the same
        -- SELECT would drop trailing hashes from the min-frame
        SELECT doc_id, i, n_grams,
               MIN(hv) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING
               ) AS fp
        FROM h
    ),
    sel AS (
        SELECT DISTINCT doc_id, fp
        FROM wm WHERE i <= n_grams - {_WIN_W - 1}
    ),
    kept AS (
        SELECT fp FROM sel GROUP BY fp
        HAVING COUNT(*) BETWEEN 2 AND {_PP_FP_CAP}
    ),
    cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.fp
        FROM sel a JOIN kept k ON a.fp = k.fp
        JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(COUNT(DISTINCT fp) AS BIGINT) AS shared_fps
    FROM cand GROUP BY 1, 2
    HAVING COUNT(DISTINCT fp) >= {_PP_MIN_SHARED}
    """,
    tags=("llm", "dedup", "fingerprint"),
)
def winnowing_passage_pairs(spark, sf_dir):
    """Document pairs sharing >= {_PP_MIN_SHARED} winnowing
    fingerprints — the cross-doc half of the MOSS pipeline: any shared
    passage of >= k+w-1 words leaves at least one common selected
    fingerprint, so pairs surviving this join are passage-level
    near-dup candidates (quote chains, boilerplate, templated spam)
    that whole-document Jaccard scores far below any dedup threshold.

    Hub hazard and its cap: a fingerprint occurring in d docs emits
    d*(d-1)/2 candidate rows, so ubiquitous boilerplate fingerprints
    would go quadratic — fingerprints in more than {_PP_FP_CAP} docs
    are dropped BEFORE the self-join (the ngram-dedup
    ``max_item_degree`` guard; what such fingerprints flag is
    boilerplate, which dup_span/chunk_boilerplate already measure).
    The join stays equi on fp, never a cross join.

    Scale shape: winnowing selection is doc-partitioned windows; the
    candidate join shuffles the SELECTED fingerprint set (a ~1/w
    sample of grams) keyed by fp; the cap bounds per-key fanout.
    """
    docs = read_table_spread(spark, sf_dir, "documents", "doc_id")
    ws = F.split(F.lower("text"), " ")
    toks = docs.select("doc_id", ws.alias("ws"))
    n = F.size("ws")
    gram_idx = F.when(
        n >= _WIN_K, F.sequence(F.lit(1), n - (_WIN_K - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                gram_idx,
                lambda i: F.struct(
                    i.alias("i"),
                    F.concat_ws(
                        " ",
                        *[
                            F.element_at("ws", i + off)
                            for off in range(_WIN_K)
                        ],
                    ).alias("gram"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.i").alias("i"), F.col("g.gram").alias("gram"))
    h = grams.select(
        "doc_id",
        "i",
        hex_bits_hash(F.col("gram")).alias("hv"),
        F.count(F.lit(1))
        .over(Window.partitionBy("doc_id"))
        .cast("long")
        .alias("n_grams"),
    )
    sel = (
        h.select(
            "doc_id",
            "i",
            "n_grams",
            F.min("hv")
            .over(
                Window.partitionBy("doc_id")
                .orderBy("i")
                .rowsBetween(Window.currentRow, _WIN_W - 1)
            )
            .alias("fp"),
        )
        .where(F.col("i") <= F.col("n_grams") - (_WIN_W - 1))
        .select("doc_id", "fp")
        .distinct()
    )
    kept = (
        sel.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= _PP_FP_CAP))
        .select("fp")
    )
    a = sel.join(kept, "fp").select(F.col("doc_id").alias("doc_a"), "fp")
    b = sel.select(F.col("doc_id").alias("doc_b"), "fp")
    cand = a.join(b, "fp").where(F.col("doc_a") < F.col("doc_b"))
    return (
        cand.groupBy("doc_a", "doc_b")
        .agg(F.countDistinct("fp").cast("long").alias("shared_fps"))
        .where(F.col("shared_fps") >= _PP_MIN_SHARED)
    )


_EDP_DIM = 64
_EDP_SCALE = 1000  # milli fixed-point: keeps sum-of-squares < 2^53 at any SF


@query(
    "embed_dim_profile",
    sql=f"""
    WITH d AS (
        SELECT t.i AS dim,
               CAST(FLOOR(embedding[t.i]::DOUBLE * {_EDP_SCALE}) AS BIGINT)
                   AS milli
        FROM embeddings, UNNEST(range(1, {_EDP_DIM + 1})) AS t(i)
    ),
    s AS (
        SELECT dim,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(milli) AS BIGINT) AS sum_milli,
               CAST(SUM(milli * milli) AS BIGINT) AS sumsq_milli,
               MIN(milli) AS min_milli,
               MAX(milli) AS max_milli
        FROM d GROUP BY dim
    )
    SELECT dim, n, sum_milli, sumsq_milli, min_milli, max_milli,
           CAST(sum_milli AS DOUBLE) / n AS mean_milli,
           CAST(sumsq_milli AS DOUBLE) / n
               - (CAST(sum_milli AS DOUBLE) / n)
                 * (CAST(sum_milli AS DOUBLE) / n) AS var_milli2
    FROM s
    """,
    tags=("llm", "embeddings", "quality"),
)
def embed_dim_profile(spark, sf_dir):
    """Per-dimension profile of the embedding matrix: count, fixed-
    point sum/min/max, mean and biased variance for each of the
    {_EDP_DIM} coordinates — the embedding-health audit that catches
    dead dimensions (variance ~ 0), collapsed/rogue dimensions
    (variance or |mean| far from siblings), and range drift after a
    model swap, before any ANN index is built on top.

    Fixed point at 1/{_EDP_SCALE}: FLOOR(float-widened-to-double *
    {_EDP_SCALE}) is exact IEEE in both engines, and milli-units keep
    the sum of squares below 2^53 at any plausible scale factor, so
    every aggregate is an exact BIGINT whose double cast is lossless —
    the variance is then three IEEE ops on agreed doubles (the
    HUGEINT->double 1-ulp hazard documented on ewma_daily_anomaly
    never arises).

    Scale shape: posexplode is scan-local; the aggregate is keyed by
    the bounded dimension set with map-side partials, so the shuffle
    carries {_EDP_DIM} rows per task regardless of corpus size.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    d = emb.select(
        F.posexplode("embedding").alias("pos", "e")
    ).select(
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("e").cast("double") * _EDP_SCALE)
        .cast("long")
        .alias("milli"),
    )
    s = d.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("milli").cast("long").alias("sum_milli"),
        F.sum(F.col("milli") * F.col("milli"))
        .cast("long")
        .alias("sumsq_milli"),
        F.min("milli").alias("min_milli"),
        F.max("milli").alias("max_milli"),
    )
    mean = F.col("sum_milli").cast("double") / F.col("n")
    return s.select(
        "dim",
        "n",
        "sum_milli",
        "sumsq_milli",
        "min_milli",
        "max_milli",
        mean.alias("mean_milli"),
        (F.col("sumsq_milli").cast("double") / F.col("n") - mean * mean).alias(
            "var_milli2"
        ),
    )


@query(
    "source_dup_overlap",
    sql="""
    WITH toks AS (
        SELECT source, string_split(lower(text), ' ') AS ws FROM documents
    ),
    d AS (
        SELECT DISTINCT source,
               md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS h
        FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i)
    ),
    src_tot AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_digests
        FROM d GROUP BY 1
    ),
    pair AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(COUNT(*) AS BIGINT) AS shared
        FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT p.src_a, p.src_b, p.shared,
           ta.n_digests AS na, tb.n_digests AS nb,
           1000000 * p.shared // (ta.n_digests + tb.n_digests - p.shared)
               AS jaccard_ppm,
           1000000 * p.shared // LEAST(ta.n_digests, tb.n_digests)
               AS containment_ppm
    FROM pair p
    JOIN src_tot ta ON ta.source = p.src_a
    JOIN src_tot tb ON tb.source = p.src_b
    """,
    tags=("llm", "dedup", "mixture"),
)
def source_dup_overlap(spark, sf_dir):
    """Cross-source content-overlap matrix at the word-3-gram shingle
    level: for every source pair, how many distinct shingle digests
    they share, with Jaccard and containment in ppm — the
    mixture-design question ("is crawl B mostly a re-crawl / remix of
    A?" decides dedup ORDER and per-source weights; high containment
    with low Jaccard is the re-crawl signature). Shingle-level rather
    than whole-document digests because cross-source duplication is
    almost never byte-exact — remixes share PASSAGES.

    Scale shape: shingle digests collapse to per-source distinct sets
    (one shuffle keyed by digest, 32-byte md5s — never text bodies);
    the pair join is equi on the digest; the final matrix is bounded
    (#sources^2 / 2 rows).

    Exactness: distinct digest counts are exact; Jaccard and
    containment are integer ppm floor quotients.
    """
    from tvbigdataproject_spark.functions import shingles

    docs = read_table_spread(spark, sf_dir, "documents", "doc_id")
    d = (
        docs.select(
            "source", F.explode(shingles(F.lower("text"), 3)).alias("s")
        )
        .select("source", F.md5("s").alias("h"))
        .distinct()
    )
    src_tot = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_digests")
    )
    a = d.select(F.col("source").alias("src_a"), "h")
    b = d.select(F.col("source").alias("src_b"), "h")
    pair = (
        a.join(b, "h")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    ta = src_tot.select(
        F.col("source").alias("src_a"), F.col("n_digests").alias("na")
    )
    tb = src_tot.select(
        F.col("source").alias("src_b"), F.col("n_digests").alias("nb")
    )
    return (
        pair.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            "shared",
            "na",
            "nb",
            F.expr(
                "(1000000 * shared) div (na + nb - shared)"
            ).alias("jaccard_ppm"),
            F.expr(
                "(1000000 * shared) div least(na, nb)"
            ).alias("containment_ppm"),
        )
    )


_TC_BAND_PPM = 50000  # 5%-wide Jaccard bands


def _threshold_curve_sql() -> str:
    from tvbigdataproject_spark.queries.dedup import _SH_SQL

    return f"""
    WITH {_SH_SQL},
    shdict AS (
        SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS sid
        FROM (SELECT DISTINCT s FROM sh)
    ),
    she AS (
        SELECT sh.doc_id, shdict.sid FROM sh JOIN shdict ON shdict.s = sh.s
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM she GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        FROM she a JOIN she b ON a.sid = b.sid AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT (1000000 * i // (sa.n + sb.n - i)) // {_TC_BAND_PPM} AS band
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
    ),
    hist AS (
        SELECT band, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM scored GROUP BY band
    )
    SELECT band,
           CAST(band * {_TC_BAND_PPM} AS BIGINT) AS band_lo_ppm,
           n_pairs,
           CAST(SUM(n_pairs) OVER (
               ORDER BY band DESC ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS pairs_at_or_above
    FROM hist
    """


@query(
    "neardup_threshold_curve",
    sql=_threshold_curve_sql(),
    tags=("llm", "dedup", "tuning"),
)
def neardup_threshold_curve(spark, sf_dir):
    """Near-duplicate pair counts by Jaccard band (5% bands over the
    shared-shingle candidate set) plus the cumulative
    pairs-at-or-above-threshold curve — the tuning plot behind every
    dedup threshold choice: the knee of this curve IS the threshold
    (dedup_ngram_jaccard runs at a point; this shows the whole
    trade-off, so raising 0.4 to 0.5 has a known pair cost BEFORE a
    full re-run).

    Scale shape: identical candidate machinery to dedup_ngram_jaccard
    (shared-shingle equi-join, never all-pairs — the quadratic-ORACLE
    family, so sf1 validation runs at the copies-3 protocol); the
    curve itself is a bounded <=21-row histogram, and the cumulative
    window runs over that bounded table (allowlisted).

    Exactness: Jaccard is the integer ppm floor quotient banded by
    integer division; counts exact.
    """
    from tvbigdataproject_spark.functions import shingles

    docs = read_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(shingles(F.col("text"), 3)).alias("s")
    ).where(F.col("s") != "")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "s")
    b = sh.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        a.join(b.hint("shuffle_hash"), "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    scored = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.expr(
                f"((1000000 * i) div (na + nb - i)) div {_TC_BAND_PPM}"
            ).alias("band")
        )
    )
    hist = scored.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    wcum = (
        Window.orderBy(F.col("band").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return hist.select(
        "band",
        (F.col("band") * _TC_BAND_PPM).cast("long").alias("band_lo_ppm"),
        "n_pairs",
        F.sum("n_pairs").over(wcum).cast("long").alias("pairs_at_or_above"),
    )
