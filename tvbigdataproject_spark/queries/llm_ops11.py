"""Training-data pipeline operators, batch 11: lexical diversity,
vocabulary growth, the hashing trick, and smoothed target encoding.

- token_gini_diversity  per-document Gini impurity of the token
                        frequency distribution — the log-free lexical
                        diversity score (entropy needs ln; Gini is an
                        exact rational, so it cross-checks bit-for-bit)
- vocab_growth_heaps    per-source type/token counts, hapax legomena,
                        and exact ppm ratios — the Heaps-law corpus
                        growth monitor
- feature_hash_buckets  the hashing trick: 64-bucket signed token-count
                        features per document from md5 buckets — the
                        fixed-width featurizer that needs no vocabulary
                        pass
- target_encode_smoothed  m-estimate (smoothed mean) target encoding of
                        customer segments by order value, as an exact
                        integer rational

Cross-engine exactness: the standard md5-prefix hashing for buckets and
signs; every ratio is either an integer ppm quotient or a num/den pair
whose single double division both engines perform on identical longs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.functions.hashing import hex16_hash
from tvbigdataproject_spark.functions.text import simple_tokens
from tvbigdataproject_spark.queries._stable import sql_huge_to_double
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "token_gini_diversity",
    sql="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
        FROM documents
    ),
    tc AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    d AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c * c) AS BIGINT) AS sq
        FROM tc GROUP BY 1
    )
    SELECT doc_id, n AS n_tokens,
           n * n - sq AS gini_num,
           n * n AS gini_den,
           CAST(n * n - sq AS DOUBLE) / CAST(n * n AS DOUBLE) AS gini
    FROM d
    """,
    tags=("llm", "text", "quality"),
)
def token_gini_diversity(spark, sf_dir):
    """Per-document lexical diversity as the Gini impurity of the token
    frequency distribution: 1 - sum_i (c_i/n)^2 = (n^2 - sum c_i^2) /
    n^2. Near 0 means one token dominates (boilerplate, keyword spam);
    near 1 means every token is distinct — the filter signal quality
    pipelines usually compute as Shannon entropy, chosen in Gini form
    because entropy needs a log (engine-divergent last bits) while Gini
    is an exact integer rational both engines agree on bit-for-bit.

    Scale shape: explode -> two partial-aggregated groupBys keyed by
    doc; nothing global. The num/den columns carry the exact rational;
    the double is one division of agreed longs.
    """
    docs = read_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "doc_id",
            F.explode(simple_tokens(F.lower(F.col("text")))).alias("t"),
        )
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    d = tc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sq"),
    )
    nn = F.col("n") * F.col("n")
    return d.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        (nn - F.col("sq")).alias("gini_num"),
        nn.alias("gini_den"),
        ((nn - F.col("sq")).cast("double") / nn.cast("double")).alias(
            "gini"
        ),
    )


@query(
    "vocab_growth_heaps",
    sql="""
    WITH tok AS (
        SELECT source, unnest(string_split(lower(text), ' ')) AS t
        FROM documents
    ),
    tc AS (SELECT source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2)
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax,
           CAST((1000000 * COUNT(*)) // SUM(c) AS BIGINT) AS ttr_ppm,
           CAST((1000000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS hapax_ppm
    FROM tc GROUP BY source
    """,
    tags=("llm", "text", "stats"),
)
def vocab_growth_heaps(spark, sf_dir):
    """Per-source vocabulary growth statistics: token count, type
    (distinct token) count, hapax legomena (types seen exactly once),
    and the exact-ppm type-token and hapax ratios. Against Heaps' law
    (types ~ tokens^beta) these expose which sources are linguistically
    saturated vs still growing — and a hapax ratio collapsing toward 0
    is the classic signature of template/boilerplate contamination.

    Exactness: ratios are integer ppm quotients (1e6*a div b) — no
    float shares. Scale shape: explode -> (source, token) partial
    aggregation -> one grouped reduce to a row per source; the widest
    intermediate is the per-source vocabulary, orders of magnitude
    below the corpus.
    """
    docs = read_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source",
            F.explode(simple_tokens(F.lower(F.col("text")))).alias("t"),
        )
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return tc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
        F.expr("(1000000 * count(1)) div sum(c)")
        .cast("long")
        .alias("ttr_ppm"),
        F.expr(
            "(1000000 * sum(case when c = 1 then 1 else 0 end)) div count(1)"
        )
        .cast("long")
        .alias("hapax_ppm"),
    )


_FH_BUCKETS = 64
_FH_DOC_MOD = 97  # deterministic 1-in-97 doc sample keeps output bounded


@query(
    "feature_hash_buckets",
    sql=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
        FROM documents WHERE doc_id % {_FH_DOC_MOD} = 0
    ),
    h AS (
        SELECT doc_id,
               ('0x' || substr(md5(t), 1, 4))::BIGINT % {_FH_BUCKETS}
                   AS bucket,
               CASE WHEN (('0x' || substr(md5(t), 1, 4))::BIGINT
                          // {_FH_BUCKETS}) % 2 = 1
                    THEN 1 ELSE -1 END AS sign
        FROM tok
    )
    SELECT doc_id, bucket, COUNT(*) AS n,
           CAST(SUM(sign) AS BIGINT) AS signed_sum
    FROM h GROUP BY doc_id, bucket
    """,
    tags=("llm", "features", "hashing"),
)
def feature_hash_buckets(spark, sf_dir):
    """The hashing trick (Weinberger et al. 2009): fixed-width signed
    token-count features without any vocabulary pass — bucket =
    md5_16(token) mod 64, sign from the next hash bit, feature value =
    sum of signs (the sign makes collisions cancel in expectation,
    which is what lets 64 buckets stand in for an unbounded
    vocabulary). The zero-shuffle featurizer for streaming/linear
    models over corpora whose vocabulary cannot be enumerated.

    The registered query samples a deterministic 1-in-97 of documents
    (doc_id modulus — reproducible, no RNG) to keep the oracle
    comparison bounded; the operator itself is a pure scan-stage map +
    one keyed aggregation at any corpus size. Bucket and sign reuse the
    engine's md5-prefix convention, so DuckDB replays them exactly.
    """
    docs = read_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % _FH_DOC_MOD == 0
    )
    tok = (
        docs.select(
            "doc_id",
            F.explode(simple_tokens(F.lower(F.col("text")))).alias("t"),
        )
        .select("doc_id", hex16_hash(F.col("t")).alias("_h"))
        .select(
            "doc_id",
            (F.col("_h") % _FH_BUCKETS).alias("bucket"),
            F.when(F.expr(f"(_h div {_FH_BUCKETS}) % 2") == 1, 1)
            .otherwise(-1)
            .alias("sign"),
        )
    )
    return tok.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("sign").cast("long").alias("signed_sum"),
    )


_TE_M = 100  # m-estimate smoothing pseudo-count
_TE_NUM = sql_huge_to_double(
    f"CAST(sum_cents AS HUGEINT) * n_all + {_TE_M} * CAST(s_all AS HUGEINT)"
)
_TE_DEN = sql_huge_to_double(f"CAST(n_all AS HUGEINT) * (n_orders + {_TE_M})")


@query(
    "target_encode_smoothed",
    sql=f"""
    WITH o AS (
        SELECT c.c_mktsegment AS segment,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    seg AS (
        SELECT segment, COUNT(*) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM o GROUP BY segment
    ),
    g AS (
        SELECT segment, n_orders, sum_cents,
               CAST(SUM(n_orders) OVER () AS BIGINT) AS n_all,
               CAST(SUM(sum_cents) OVER () AS BIGINT) AS s_all
        FROM seg
    )
    SELECT segment, n_orders, sum_cents,
           {_TE_NUM} AS enc_num,
           {_TE_DEN} AS enc_den,
           {_TE_NUM}
               / {_TE_DEN}
               AS enc_cents
    FROM g
    """,
    tags=("llm", "features", "encoding"),
)
def target_encode_smoothed(spark, sf_dir):
    """m-estimate target encoding of customer segments by order value:
    enc = (sum_seg + m * global_mean) / (n_seg + m) with m = 100 — the
    leakage-averse categorical encoder (rare categories shrink toward
    the global mean instead of memorizing their few targets). Kept as
    the exact rational enc_num/enc_den: clearing global_mean = S/N
    gives num = sum_seg*N + m*S, den = N*(n_seg + m) — pure integers,
    so both engines agree bit-for-bit before the one final division.

    Scale shape: one join + grouped aggregate to a row per segment; the
    global totals come from a window over that bounded segment table
    (never a one-row cross join). num overflows int64 from sf1 up
    (sum_cents*N ~ 1e19 — caught by the round-9 sf1 gate, the
    degree_assortativity lesson repeated), so the num/den combination
    runs in 128-bit integers (DECIMAL(38,0) / HUGEINT) and the exact
    values surface as deterministic double casts.
    """
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    o = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    seg = o.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    w = Window.partitionBy()
    g = seg.select(
        "segment",
        "n_orders",
        "sum_cents",
        F.sum("n_orders").over(w).cast("long").alias("n_all"),
        F.sum("sum_cents").over(w).cast("long").alias("s_all"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = d38("sum_cents") * F.col("n_all") + _TE_M * d38("s_all")
    den = d38("n_all") * (F.col("n_orders") + _TE_M)
    return g.select(
        "segment",
        "n_orders",
        "sum_cents",
        num.cast("double").alias("enc_num"),
        den.cast("double").alias("enc_den"),
        (num.cast("double") / den.cast("double")).alias("enc_cents"),
    )


_QA_K = 100  # total sample slots to allocate across sources


@query(
    "quota_sample_allocation",
    sql=f"""
    WITH counts AS (
        SELECT source, COUNT(*) AS n_s FROM documents GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n FROM counts),
    alloc AS (
        SELECT c.source, c.n_s,
               CAST((c.n_s * {_QA_K}) // t.n AS BIGINT) AS base,
               CAST(c.n_s * {_QA_K} - ((c.n_s * {_QA_K}) // t.n) * t.n
                    AS BIGINT) AS rem
        FROM counts c CROSS JOIN tot t
    ),
    leftover AS (
        SELECT CAST({_QA_K} - SUM(base) AS BIGINT) AS extra FROM alloc
    ),
    quota AS (
        SELECT source, n_s, base, rem,
               base + CASE WHEN ROW_NUMBER() OVER (
                   ORDER BY rem DESC, source) <= l.extra
                   THEN 1 ELSE 0 END AS quota
        FROM alloc CROSS JOIN leftover l
    ),
    ranked AS (
        SELECT d.doc_id, d.source,
               ROW_NUMBER() OVER (
                   PARTITION BY d.source
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
               ) AS rk
        FROM documents d
    )
    SELECT r.doc_id, r.source, r.rk, q.quota
    FROM ranked r JOIN quota q ON r.source = q.source
    WHERE r.rk <= q.quota
    """,
    tags=("llm", "sampling"),
)
def quota_sample_allocation(spark, sf_dir):
    """Proportional quota sampling with LARGEST-REMAINDER allocation
    (Hare quota): split 100 total sample slots across document
    sources proportional to source size — floor share first, then the
    unallocated remainder goes one slot at a time to the largest
    fractional remainders (ties -> source name) — and draw each
    source's quota by portable hash order (md5, doc_id). This is how a
    curation pipeline pins a FIXED total budget while keeping the
    source mixture unbiased; priority_sample_per_source is the
    fixed-per-group twin, this one allocates the group sizes
    themselves. Largest-remainder is exact integer arithmetic end to
    end (the remainder comparison is n_s*K mod N — no fractions).

    Scale shape: the allocation runs entirely on the bounded SOURCE
    table (one window over a handful of rows); the draw is one
    per-source-partitioned rank over the corpus with the quota table
    broadcast. One corpus shuffle total.
    """
    docs = read_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    tot = counts.agg(F.sum("n_s").cast("long").alias("n"))
    alloc = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_s",
        F.expr(f"(n_s * {_QA_K}) div n").cast("long").alias("base"),
        F.expr(f"n_s * {_QA_K} - ((n_s * {_QA_K}) div n) * n")
        .cast("long")
        .alias("rem"),
    )
    leftover = alloc.agg(
        (F.lit(_QA_K) - F.sum("base")).cast("long").alias("extra")
    )
    w_rem = Window.orderBy(F.desc("rem"), F.asc("source"))
    quota = (
        alloc.crossJoin(F.broadcast(leftover))
        .select(
            "source",
            "n_s",
            "base",
            "rem",
            (
                F.col("base")
                + F.when(
                    F.row_number().over(w_rem) <= F.col("extra"), 1
                ).otherwise(0)
            ).alias("quota"),
        )
    )
    w_src = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(w_src).alias("rk")
    )
    return ranked.join(
        F.broadcast(quota.select("source", "quota")), "source"
    ).where(F.col("rk") <= F.col("quota")).select(
        "doc_id", "source", "rk", "quota"
    )


@query(
    "interleave_sources_order",
    sql="""
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS r
        FROM documents
    ),
    counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1
    )
    SELECT d.doc_id, d.source, d.r,
           (SELECT CAST(SUM(LEAST(d.r - 1, c.n)
                    + CASE WHEN c.n >= d.r AND c.source < d.source
                           THEN 1 ELSE 0 END) AS BIGINT)
            FROM counts c) + 1 AS global_pos
    FROM ranked d
    """,
    tags=("llm", "sampling", "ordering"),
)
def interleave_sources_order(spark, sf_dir):
    """Deterministic source-interleaved corpus order: shuffle each
    source internally by portable hash (md5, doc_id), then interleave
    the sources round-robin — all rank-1 docs across sources first,
    then rank-2, and so on. This is the epoch ordering a training
    pipeline wants: reproducible "random" order WITHIN each source and
    no long single-source runs ACROSS them (a raw global hash order
    gives source runs proportional to source share; curriculum and
    mixture stability both prefer the interleave). global_pos is a
    permutation of 1..N by construction.

    Scale shape: NO global sort and no global window. The per-source
    shuffle rank is one source-partitioned window; the global position
    has a CLOSED FORM from the bounded per-source counts — pos(r, s) =
    sum_s' min(r-1, n_s') + |{s' < s : n_s' >= r}| + 1 (rows of
    earlier rounds, plus earlier sources still alive in this round) —
    evaluated scan-locally against one packed broadcast row of counts.
    """
    docs = read_table(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(w_src).cast("long").alias("r")
    )
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    packed = counts.agg(
        F.sort_array(F.collect_list(F.struct("source", "n"))).alias("_cs")
    )
    pos = (
        F.aggregate(
            F.col("_cs"),
            F.lit(0).cast("long"),
            lambda acc, c: acc
            + F.least(F.col("r") - 1, c["n"])
            + F.when(
                (c["n"] >= F.col("r")) & (c["source"] < F.col("source")),
                F.lit(1).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
        + 1
    )
    return (
        ranked.crossJoin(F.broadcast(packed))
        .select("doc_id", "source", "r", pos.alias("global_pos"))
    )
