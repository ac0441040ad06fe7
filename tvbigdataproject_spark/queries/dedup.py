"""Deduplication operators over the documents table — exact hash dedup,
n-gram Jaccard near-dup, MinHash+LSH, and SimHash (north-star surface).

Design for 100 TB:
- exact dedup is a single hash-groupBy (one shuffle on the digest);
- n-gram Jaccard never enumerates all pairs — candidates come from a
  shared-shingle equi-join;
- MinHash computes signatures with array expressions (no explode, no
  shuffle) and only explodes the B band keys per doc; candidate volume
  is controlled by band width;
- SimHash candidates come from pigeonhole banding (3 chunks of a 16-bit
  sketch: hamming ≤ 2 ⇒ some chunk matches exactly), so the verify join
  is equi, never a cross join. The DuckDB oracles brute-force the same
  definitions, which is fine at sf=0.01 and exactly what the Spark side
  must reproduce.

All hashes are md5-based (functions/hashing.py) so the oracle can
reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.functions import (
    lsh_bands,
    md5_seeded,
    minhash_signature,
    shingles,
)
from tvbigdataproject_spark.functions.hashing import hex16_hash
from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table

# Shared SQL fragment: distinct word-3-gram shingles per document.
_SH_SQL = """
    toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i)
    )
"""


@query(
    "dedup_exact_hash",
    sql="""
    SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
    tags=("dedup",),
)
def dedup_exact_hash(spark, sf_dir):
    """Exact dedup: group by content digest, keep the minimum doc_id.

    One shuffle on the digest; at 100 TB hash first (digest is 32 bytes
    vs arbitrarily long text) so the shuffle carries digests, not bodies.
    """
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@query(
    "dedup_ngram_jaccard",
    sql=f"""
    WITH {_SH_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, i * 1.0 / (sa.n + sb.n - i) AS jacc
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.4
    """,
    tags=("dedup", "similarity"),
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Near-duplicate pairs by word-3-gram Jaccard ≥ 0.4.

    Candidates from a shared-shingle equi-join (shingles of unrelated
    docs rarely collide, so the join output is ~linear in the number of
    true near-dups); the exact Jaccard then scores candidates from
    intersection/size counts. No cross join anywhere.
    """
    docs = read_table(spark, sf_dir, "documents")
    sh = (
        docs.select("doc_id", F.explode(shingles(F.col("text"), 3)).alias("s"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    scored = (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (F.col("i") / (F.col("sa.n") + F.col("sb.n") - F.col("i"))).alias("jacc_raw"),
        )
    )
    return scored.where(F.col("jacc_raw") >= 0.4).select(
        "doc_a", "doc_b", F.col("jacc_raw").alias("jacc")
    )


def _minhash_sql(num_hashes: int = 8, bands: int = 4, rows: int = 2, threshold: float = 0.4) -> str:
    # mirrors functions.hashing.minhash_signature: component i is the min
    # over shingles of hex slice (i%4)*8+1..+8 of digest md5((i//4) ':' s)
    sig_cols = ",\n               ".join(
        f"MIN(substr(md5('{i // 4}:' || s), {(i % 4) * 8 + 1}, 8)) AS h{i}"
        for i in range(num_hashes)
    )
    band_selects = "\n        UNION ALL\n        ".join(
        "SELECT doc_id, '{b}|' || h{lo} || '|' || h{hi} AS bk FROM sig".format(
            b=b, lo=b * rows, hi=b * rows + 1
        )
        for b in range(bands)
    )
    return f"""
    WITH {_SH_SQL},
    sig AS (
        SELECT doc_id,
               {sig_cols}
        FROM sh GROUP BY doc_id
    ),
    bands AS (
        {band_selects}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    inter AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS i
        FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           i * 1.0 / (sa.n + sb.n - i) AS jacc
    FROM cand c
    JOIN inter ON inter.doc_a = c.doc_a AND inter.doc_b = c.doc_b
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    WHERE i * 1.0 / (sa.n + sb.n - i) >= {threshold}
    """


@query("dedup_minhash_lsh", sql=_minhash_sql(), tags=("dedup", "lsh"))
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(8) + LSH(4 bands × 2 rows) near-dup pairs, verified with
    exact Jaccard ≥ 0.4.

    The signature is built with array_min over transform — the whole
    sketch is computed in the scan stage with zero shuffles; only the 4
    band keys per doc are exploded for the bucket join. Verification is
    candidate-local: each candidate pair pulls the two shingle *arrays*
    and scores exact Jaccard with array_intersect — no shingle explode,
    no self-join. At 100 TB this is the difference between LSH working
    and the verify step re-doing the all-pairs job the sketch avoids.
    (A band match implies ≥1 shared shingle, so no qualifying pair is
    lost by scoring candidates only.)
    """
    docs = read_table(spark, sf_dir, "documents")
    with_sh = docs.select("doc_id", shingles(F.col("text"), 3).alias("shs")).where(
        F.size("shs") > 0
    )
    sig = with_sh.select(
        "doc_id",
        "shs",
        minhash_signature(F.col("shs"), num_hashes=8).alias("sig"),
    )
    band_df = sig.select(
        "doc_id", F.explode(lsh_bands(F.col("sig"), bands=4, rows_per_band=2)).alias("bk")
    )
    cand = (
        band_df.alias("a")
        .join(
            band_df.alias("b"),
            (F.col("a.bk") == F.col("b.bk")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    shs_a = with_sh.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    shs_b = with_sh.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    attached = cand.join(shs_a, "doc_a").join(shs_b, "doc_b")
    i = F.size(F.array_intersect(F.col("shs_a"), F.col("shs_b")))
    union_size = F.size("shs_a") + F.size("shs_b") - i
    scored = attached.select(
        "doc_a", "doc_b", (i.cast("double") / union_size).alias("jacc_raw")
    )
    return scored.where(F.col("jacc_raw") >= 0.4).select(
        "doc_a", "doc_b", F.col("jacc_raw").alias("jacc")
    )


def _simhash_sql() -> str:
    # 16-bit simhash over distinct tokens; brute-force verify (oracle only).
    bit_sums = ",\n               ".join(
        f"SUM(((h >> {j}) & 1) * 2 - 1) AS s{j}" for j in range(16)
    )
    sim_expr = " + ".join(f"(CASE WHEN s{j} > 0 THEN 1 ELSE 0 END) * {1 << j}" for j in range(16))
    return f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, UNNEST(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 1, 4))::BIGINT AS h FROM toks
    ),
    bitsums AS (
        SELECT doc_id,
               {bit_sums}
        FROM hashed GROUP BY doc_id
    ),
    sim AS (SELECT doc_id, {sim_expr} AS simhash FROM bitsums)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sim a JOIN sim b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
    """


@query("dedup_simhash", sql=_simhash_sql(), tags=("dedup", "simhash"))
def dedup_simhash(spark, sf_dir):
    """SimHash(16-bit) near-dup pairs at hamming distance ≤ 2.

    Spark side finds candidates by pigeonhole banding — the 16-bit sketch
    splits into 3 chunks (6/5/5 bits); hamming ≤ 2 implies at least one
    chunk is identical, so candidates come from 3 equi-joins on chunk
    values instead of an O(n²) cross join. The oracle brute-forces the
    same predicate, which is exact at sf=0.01.
    """
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("tok")
    )
    hashed = tok.select("doc_id", hex16_hash(F.col("tok")).alias("h"))
    bit_sums = [
        F.sum((F.shiftright(F.col("h"), j).bitwiseAND(1) * 2 - 1)).alias(f"s{j}")
        for j in range(16)
    ]
    sums = hashed.groupBy("doc_id").agg(*bit_sums)
    sim_expr = None
    for j in range(16):
        term = F.when(F.col(f"s{j}") > 0, 1).otherwise(0) * (1 << j)
        sim_expr = term if sim_expr is None else sim_expr + term
    sim = sums.select("doc_id", sim_expr.alias("simhash"))
    # Pigeonhole chunks: bits [0,6), [6,11), [11,16).
    chunked = sim.select(
        "doc_id",
        "simhash",
        F.col("simhash").bitwiseAND(0x3F).alias("c0"),
        F.shiftright("simhash", 6).bitwiseAND(0x1F).alias("c1"),
        F.shiftright("simhash", 11).bitwiseAND(0x1F).alias("c2"),
    )
    cands = None
    for c in ("c0", "c1", "c2"):
        pair = (
            chunked.alias("a")
            .join(
                chunked.alias("b"),
                (F.col(f"a.{c}") == F.col(f"b.{c}")) & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.simhash").alias("sim_a"),
                F.col("b.simhash").alias("sim_b"),
            )
        )
        cands = pair if cands is None else cands.unionByName(pair)
    dist = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cands.distinct()
        .select("doc_a", "doc_b", dist.alias("hamming"))
        .where(F.col("hamming") <= 2)
    )
