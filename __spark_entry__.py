"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke at sf=0.001.
``queries()`` / ``oracle_sql()`` — the oracle-checked operator suite from
SURVEY.md §2 plus the north-star LLM-data-pipeline operators; definitions
live in tvbigdataproject_spark/queries/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from tvbigdataproject_spark.queries import REGISTRY
    from tvbigdataproject_spark.session import tune_for_session

    tune_for_session(spark)
    return REGISTRY["pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from tvbigdataproject_spark.queries import spark_queries_map

    return spark_queries_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted entries are
    non-SQL-expressible and get the driver's rows-only check)."""
    from tvbigdataproject_spark.queries import oracle_sql_map

    return oracle_sql_map()
