"""Coverage queries for the remaining SURVEY.md §2 operator rows:
nested-struct projection (P1/P8), array-algebra aggregation (A5),
translate (F2), approximate distinct (A8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tvbigdataproject_spark.queries.registry import query
from tvbigdataproject_spark.sources import read_table


@query(
    "nested_struct_project",
    sql="""
    SELECT event_id, user_id AS uid, event_type AS kind FROM events
    """,
    tags=("projection", "struct"),
)
def nested_struct_project(spark, sf_dir):
    """Struct round-trip (P1/P8): build a two-level struct column, then
    project nested fields back out with dotted paths (the reference's
    tweet schema access pattern, RetweetTagsJaccardGraph.py:63 —
    `retweeted_status.user.id`). Catalyst collapses the construction and
    the GetStructField accesses, so the physical plan reads flat columns;
    the oracle states that flat equivalent."""
    ev = read_table(spark, sf_dir, "events")
    nested = ev.select(
        "event_id",
        F.struct(
            F.col("user_id").alias("uid"),
            F.struct(F.col("event_type").alias("kind")).alias("meta"),
        ).alias("u"),
    )
    return nested.select(
        "event_id",
        F.col("u.uid").alias("uid"),
        F.col("u.meta.kind").alias("kind"),
    )


@query(
    "array_agg_algebra",
    sql="""
    SELECT user_id,
           array_to_string(
               list_sort(list_filter(list_distinct(list(event_type)), t -> t <> 'error')),
               ',') AS types_csv
    FROM events GROUP BY user_id
    """,
    tags=("agg", "array"),
)
def array_agg_algebra(spark, sf_dir):
    """Aggregate-then-array-algebra (A5 — the reference's JC-partner
    list: agg(array_except(concat(collect_set(..)), array(..))) at
    RetweetTagsJaccardGraph.py:229-235): collect a set, subtract
    elements, sort, render. All native array expressions after a single
    hash aggregation."""
    ev = read_table(spark, sf_dir, "events")
    cleaned = F.array_sort(
        F.array_except(F.collect_set("event_type"), F.array(F.lit("error")))
    )
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", cleaned).alias("types_csv")
    )


@query(
    "string_translate",
    sql="""
    SELECT p_partkey, translate(lower(p_name), 'aeiou', '43105') AS leet_name
    FROM part
    """,
    tags=("scalar",),
)
def string_translate(spark, sf_dir):
    """Char-for-char translate (F2 — the reference's accent folding,
    bigdata/__init__.py:60-63; the full composite lives in
    functions.core.normalize_tags)."""
    return read_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.translate(F.lower("p_name"), "aeiou", "43105").alias("leet_name"),
    )


@query("approx_distinct_users", sql=None, tags=("agg", "approx"))
def approx_distinct_users(spark, sf_dir):
    """approx_count_distinct (A8) — the 100 TB default for distinct
    counting (HLL++ sketch: one pass, mergeable partials, no exact-set
    state). No SQL oracle: DuckDB's approx sketch differs, so the driver
    records the rows-only check; the exact twin is
    count_distinct_suppliers."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )
