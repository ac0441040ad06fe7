"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic event generator with real partition planning.

This exercises the engine surface a connector author uses — schema
declaration, partition planning (one InputPartition per logical split,
so the scan parallelizes across executors), and per-partition row
generation — with fully deterministic contents so the result of any
query over it can be oracle-checked against DuckDB's range() table
function.

The value formula is exact in both engines: a Knuth multiplicative
hash folded to < 2^20 stays well inside int64 during the multiply
(ids are bounded by rows*parts), and the final /100.0 is a correctly
rounded 2-decimal double.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_MULT = 2654435761  # Knuth's 2^32 golden-ratio multiplier
_MOD = 1000003


def synth_value(i: int) -> float:
    return ((i * _MULT) % _MOD) / 100.0


class SynthRangeDataSource(DataSource):
    """``spark.read.format("synthrange")`` — options:
    ``parts`` (default 8) input partitions x ``rows_per_part``
    (default 1000) rows; ids are globally dense [0, parts*rows)."""

    @classmethod
    def name(cls) -> str:
        return "synthrange"

    def schema(self) -> str:
        return "id bigint, part int, value double"

    def reader(self, schema) -> "SynthRangeReader":
        return SynthRangeReader(
            parts=int(self.options.get("parts", 8)),
            rows_per_part=int(self.options.get("rows_per_part", 1000)),
        )


class SynthRangeReader(DataSourceReader):
    def __init__(self, parts: int, rows_per_part: int) -> None:
        self.parts = parts
        self.rows_per_part = rows_per_part

    def partitions(self):
        # one InputPartition per split: Spark schedules one task each,
        # so the synthetic scan parallelizes like a real partitioned
        # source instead of funneling through a single generator task
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition):
        p = partition.value
        base = p * self.rows_per_part
        for i in range(base, base + self.rows_per_part):
            yield (i, p, synth_value(i))


def register_synth_source(spark) -> None:
    """Idempotently register the source on any session (the driver
    harness supplies a vanilla SparkSession that has never seen it)."""
    spark.dataSource.register(SynthRangeDataSource)
