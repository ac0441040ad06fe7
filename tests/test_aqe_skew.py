"""AQE skew-join: prove the session's skewJoin config actually splits
a skewed partition at runtime (the no-code-change half of the skew
story; the code-change half — explicit salting — is covered by
test_pagerank.py::test_salted_hub_bitwise_equals_unsalted and the
salted_type_counts query)."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    # one hot key carrying ~99% of the fact side; thresholds lowered so
    # the local-scale test trips the same machinery a 100 TB skewed key
    # would (defaults: 256 MB / factor 5)
    with _confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
        },
    ):
        fact = spark.range(0, 200_000).select(
            F.when(F.col("id") < 198_000, F.lit(0))
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("v"),
        )
        dim = spark.range(0, 97).select(
            F.col("id").alias("k"),
            F.concat(F.lit("dim-"), F.col("id")).alias("d"),
        )
        joined = fact.join(dim, "k")
        # collect through THIS DataFrame's own QueryExecution — count()
        # would plan a separate execution and leave this one un-finalized
        assert len(joined.collect()) == 200_000  # correctness under split
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        # the adaptive final plan marks the split join "skew=true"
        assert "skew=true" in final, final[:1500]
