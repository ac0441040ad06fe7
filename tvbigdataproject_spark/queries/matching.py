"""Entity-resolution and behavioral-sequence operators: a blocking-key
fuzzy-match join and an event transition matrix.

- fuzzy_name_pairs    classic entity-resolution shape: blocking key
                      (shared word) -> candidate pairs -> cheap filter
                      (length delta) -> exact verify (edit distance).
                      The fuzzy-string analogue of the shingle dedup
                      tier, with the same never-all-pairs discipline.
- event_transitions   first-order Markov transition matrix over each
                      user's event sequence (lead window + one grouped
                      count): the "what happens after X" table behind
                      funnel design and session simulation.

Cross-engine determinism: Levenshtein distance is an integer metric
with one classic DP definition (Spark ``levenshtein`` and DuckDB
``levenshtein`` agree exactly); transition probabilities divide two
BIGINTs in the same order in both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "fuzzy_name_pairs",
    sql="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    words AS (
        SELECT p_name, unnest(string_split(p_name, ' ')) AS w FROM names
    ),
    cand AS (
        SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
        FROM words a JOIN words b ON a.w = b.w AND a.p_name < b.p_name
    )
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
    FROM cand
    WHERE abs(len(name_a) - len(name_b)) <= 2
      AND levenshtein(name_a, name_b) <= 2
    """,
    tags=("matching", "fuzzy", "entity-resolution"),
)
def fuzzy_name_pairs(spark, sf_dir):
    """Near-identical part-name pairs (edit distance <= 2) via the
    canonical entity-resolution pipeline: block on a shared word,
    pre-filter on length delta, verify with exact Levenshtein.

    Never all-pairs: the word equi-join only generates candidates that
    share a full token (the blocking key), so the pair space is
    sum-of-squares over word groups, not |names|^2 — the same shape as
    the shared-shingle dedup joins, and like them the blocking is
    recall-oriented by design (a pair edited inside BOTH words has no
    shared key; production stacks add a second key — e.g. same first
    character, or a char-qgram — exactly like adding an LSH band). The
    blocked self-join is corpus x corpus, so the shuffle-hash strategy
    is pinned per the repo convention (operators/dedup.py docstring);
    the length filter is a no-DP-needed rejection ahead of the O(n*m)
    Levenshtein verify, and both engines compute the identical integer
    metric, so the oracle match is exact.
    """
    names = read_table(spark, sf_dir, "part").select("p_name").distinct()
    words = names.select(
        "p_name", F.explode(F.split("p_name", " ")).alias("w")
    )
    a = words.select(F.col("p_name").alias("name_a"), "w")
    b = words.select(F.col("p_name").alias("name_b"), "w")
    cand = (
        a.hint("SHUFFLE_HASH")
        .join(
            b.hint("SHUFFLE_HASH"),
            (a["w"] == b["w"]) & (F.col("name_a") < F.col("name_b")),
        )
        .select("name_a", "name_b")
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        cand.where(
            F.abs(F.length("name_a") - F.length("name_b")) <= 2
        )
        .where(dist <= 2)
        .select("name_a", "name_b", dist.cast("long").alias("dist"))
    )


@query(
    "event_transitions",
    sql="""
    WITH seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    counts AS (
        SELECT from_type, to_type, COUNT(*) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           n / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
    FROM counts
    """,
    tags=("matching", "sequence", "markov"),
)
def event_transitions(spark, sf_dir):
    """First-order transition matrix over per-user event sequences:
    for every (from_type, to_type), how often to_type immediately
    follows from_type, with the row-normalized probability.

    One lead() window partitioned by user (the natural shuffle key;
    sequences are per-user so no global sort exists), one grouped
    count, and a normalizing window over the |event_types|^2 grouped
    table — negligible at any SF. The probability divides the two
    exact BIGINT counts in the same order in both engines.
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    norm = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n") / F.sum("n").over(norm).cast("double")).alias("p"),
    )


@query(
    "er_entity_clusters",
    sql="""
    WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
    words AS (
        SELECT p_name, unnest(string_split(p_name, ' ')) AS w FROM names
    ),
    cand AS (
        SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
        FROM words a JOIN words b ON a.w = b.w AND a.p_name < b.p_name
    ),
    pairs AS (
        SELECT name_a, name_b FROM cand
        WHERE abs(len(name_a) - len(name_b)) <= 2
          AND levenshtein(name_a, name_b) <= 2
    ),
    er_edges AS (
        SELECT name_a AS a, name_b AS b FROM pairs
        UNION ALL
        SELECT name_b, name_a FROM pairs
    ),
    er_nodes AS (SELECT DISTINCT a AS node FROM er_edges),
    reach(node, r) AS (
        SELECT node, node FROM er_nodes
        UNION
        SELECT e.b, reach.r FROM reach JOIN er_edges e ON e.a = reach.node
    ),
    comp AS (SELECT node, MIN(r) AS entity FROM reach GROUP BY node)
    SELECT n.p_name,
           COALESCE(c.entity, n.p_name) AS entity,
           COALESCE(c.entity, n.p_name) = n.p_name AS is_canonical
    FROM names n LEFT JOIN comp c ON n.p_name = c.node
    """,
    tags=("matching", "entity-resolution", "components", "iterative"),
)
def er_entity_clusters(spark, sf_dir):
    """The COMPLETE entity-resolution pipeline: block -> fuzzy-verify
    (the fuzzy_name_pairs stage) -> TRANSITIVE CLUSTER. Pairwise
    matches alone don't resolve entities — A~B and B~C must land A, B,
    C in one cluster even when A and C differ by 4 edits. This runs
    connected components (min-LEXICOGRAPHIC label propagation — the
    operator is type-agnostic, so the canonical entity is the
    alphabetically first name) over the match graph and emits every
    distinct name with its canonical entity and a canonical flag —
    the survivorship table an MDM/dedup pipeline materializes.

    Scale shape: blocking bounds the pair space (sum-of-squares over
    word groups), and the component loop is the same checkpointed
    pointer-jumping as dedup_components; matched-name clusters are
    attached back to the full name list by one left join.
    """
    from tvbigdataproject_spark.operators.components import connected_components

    pairs = fuzzy_name_pairs(spark, sf_dir).select("name_a", "name_b")
    comp = connected_components(pairs, src="name_a", dst="name_b")
    names = read_table(spark, sf_dir, "part").select("p_name").distinct()
    return names.join(
        comp.select(F.col("node").alias("p_name"), F.col("label").alias("entity")),
        "p_name",
        "left",
    ).select(
        "p_name",
        F.coalesce(F.col("entity"), F.col("p_name")).alias("entity"),
        (
            F.coalesce(F.col("entity"), F.col("p_name")) == F.col("p_name")
        ).alias("is_canonical"),
    )
