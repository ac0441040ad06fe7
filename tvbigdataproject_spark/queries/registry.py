"""Registry plumbing for the oracle-checked query suite."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: SparkQuery
    sql: str | None  # None → non-SQL-expressible; driver does rows-only check
    tags: tuple[str, ...] = ()
    # Optional bounded-value checker for sql=None queries: called by the
    # local parity harness as check(spark, sf_dir, rows, colnames) and
    # returns None on success or a failure message. Upgrades a query
    # from "rows-only" to "bounded" without pretending an engine-
    # specific result (sketch estimates, sampling) has a SQL twin.
    check: Callable | None = None


REGISTRY: dict[str, RegisteredQuery] = {}


def query(
    name: str,
    sql: str | None = None,
    tags: tuple[str, ...] = (),
    check: Callable | None = None,
):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = RegisteredQuery(
            name=name, fn=fn, sql=sql, tags=tags, check=check
        )
        return fn

    return deco


def spark_queries_map() -> dict[str, SparkQuery]:
    return {name: rq.fn for name, rq in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: rq.sql for name, rq in REGISTRY.items() if rq.sql is not None}
