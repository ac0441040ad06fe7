"""Query registry — one named query per operator in SURVEY.md §2.

Each registered query is a (spark_fn, oracle_sql) pair:
  spark_fn(spark, sf_dir) -> DataFrame    — the engine's DataFrame plan
  oracle_sql                              — equivalent ANSI SQL for DuckDB

The driver harness compares both at sf=0.01 (row count + schema +
order-insensitive value-hash), so every aggregate/computed column is
aliased identically on both sides, floats that accumulate (sum/avg) are
rounded on both sides, and any LIMIT is preceded by a total order.
"""

from tvbigdataproject_spark.queries.registry import REGISTRY, oracle_sql_map, query, spark_queries_map  # noqa: F401

# Importing the modules registers their queries.
from tvbigdataproject_spark.queries import relational  # noqa: F401,E402
from tvbigdataproject_spark.queries import windows  # noqa: F401,E402
from tvbigdataproject_spark.queries import temporal  # noqa: F401,E402
from tvbigdataproject_spark.queries import graph  # noqa: F401,E402
from tvbigdataproject_spark.queries import dedup  # noqa: F401,E402
from tvbigdataproject_spark.queries import textstats  # noqa: F401,E402
from tvbigdataproject_spark.queries import embeddings  # noqa: F401,E402
from tvbigdataproject_spark.queries import multimodal  # noqa: F401,E402
from tvbigdataproject_spark.queries import coverage  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic  # noqa: F401,E402
from tvbigdataproject_spark.queries import textstats2  # noqa: F401,E402
from tvbigdataproject_spark.queries import ann_lsh  # noqa: F401,E402
from tvbigdataproject_spark.queries import reshape  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_prep  # noqa: F401,E402
from tvbigdataproject_spark.queries import textstats3  # noqa: F401,E402
from tvbigdataproject_spark.queries import relational2  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_ops  # noqa: F401,E402
from tvbigdataproject_spark.queries import relational3  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_ops2  # noqa: F401,E402
from tvbigdataproject_spark.queries import graph2  # noqa: F401,E402
from tvbigdataproject_spark.queries import graph3  # noqa: F401,E402
from tvbigdataproject_spark.queries import temporal2  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_ops3  # noqa: F401,E402
from tvbigdataproject_spark.queries import temporal3  # noqa: F401,E402
from tvbigdataproject_spark.queries import profile  # noqa: F401,E402
from tvbigdataproject_spark.queries import relational4  # noqa: F401,E402
from tvbigdataproject_spark.queries import tpch_sub  # noqa: F401,E402
from tvbigdataproject_spark.queries import tpch_join  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_ops4  # noqa: F401,E402
from tvbigdataproject_spark.queries import matching  # noqa: F401,E402
from tvbigdataproject_spark.queries import quality  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic3  # noqa: F401,E402
from tvbigdataproject_spark.queries import graph4  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_ops5  # noqa: F401,E402
from tvbigdataproject_spark.queries import ops_maint  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic4  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic5  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_ops6  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_ops7  # noqa: F401,E402
from tvbigdataproject_spark.queries import layout  # noqa: F401,E402
from tvbigdataproject_spark.queries import pandas_api  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_ops8  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_ops9  # noqa: F401,E402
from tvbigdataproject_spark.queries import graph5  # noqa: F401,E402
from tvbigdataproject_spark.queries import scd  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_ops10  # noqa: F401,E402
from tvbigdataproject_spark.queries import semantic  # noqa: F401,E402
from tvbigdataproject_spark.queries import graph6  # noqa: F401,E402
from tvbigdataproject_spark.queries import datacard  # noqa: F401,E402
from tvbigdataproject_spark.queries import clustering  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic6  # noqa: F401,E402
from tvbigdataproject_spark.queries import dq2  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_ops11  # noqa: F401,E402
from tvbigdataproject_spark.queries import graph7  # noqa: F401,E402
from tvbigdataproject_spark.queries import temporal4  # noqa: F401,E402
from tvbigdataproject_spark.queries import ops_maint2  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic7  # noqa: F401,E402
from tvbigdataproject_spark.queries import embeddings2  # noqa: F401,E402
from tvbigdataproject_spark.queries import relational5  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic8  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic9  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_ops12  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic10  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_ops13  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic11  # noqa: F401,E402
from tvbigdataproject_spark.queries import embeddings3  # noqa: F401,E402
from tvbigdataproject_spark.queries import infotheory  # noqa: F401,E402
from tvbigdataproject_spark.queries import infotheory2  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic12  # noqa: F401,E402
from tvbigdataproject_spark.queries import infotheory3  # noqa: F401,E402
from tvbigdataproject_spark.queries import infotheory4  # noqa: F401,E402
from tvbigdataproject_spark.queries import infotheory5  # noqa: F401,E402
from tvbigdataproject_spark.queries import infotheory6  # noqa: F401,E402
from tvbigdataproject_spark.queries import infotheory7  # noqa: F401,E402
from tvbigdataproject_spark.queries import inference  # noqa: F401,E402
from tvbigdataproject_spark.queries import inference2  # noqa: F401,E402
from tvbigdataproject_spark.queries import glm  # noqa: F401,E402
from tvbigdataproject_spark.queries import survival  # noqa: F401,E402
from tvbigdataproject_spark.queries import resampling  # noqa: F401,E402
from tvbigdataproject_spark.queries import inference3  # noqa: F401,E402
from tvbigdataproject_spark.queries import graph8  # noqa: F401,E402
from tvbigdataproject_spark.queries import resampling2  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic13  # noqa: F401,E402
from tvbigdataproject_spark.queries import causal  # noqa: F401,E402
from tvbigdataproject_spark.queries import graph9  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_ops14  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic14  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic15  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_ops15  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic16  # noqa: F401,E402
from tvbigdataproject_spark.queries import embeddings4  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic17  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic18  # noqa: F401,E402
from tvbigdataproject_spark.queries import llm_ops16  # noqa: F401,E402
from tvbigdataproject_spark.queries import graph11  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic19  # noqa: F401,E402
from tvbigdataproject_spark.queries import analytic20  # noqa: F401,E402
from tvbigdataproject_spark.queries import graph10  # noqa: F401,E402
