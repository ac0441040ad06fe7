"""Session-scoped memo of REGISTRY[name].fn(spark, sf_dir) DataFrames.

The suite builds every registered query's DataFrame several times — the
smoke executor, the nested-loop and unpartitioned-window full-registry
audits, and the per-query Python-UDF fence — and an ITERATIVE query's
fn() executes its checkpointed rounds at call time, so every duplicate
call re-runs real Spark jobs. This memo makes each query's fn run once
per pytest session; the audits and the smoke counts read the same
DataFrame (identical plan, identical result). Test-harness only: the
library itself never memoizes query results, and the bench releases all
session caches before every timed rep.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"

_DF_CACHE: dict = {}


def registry_df(spark, name: str, sf_dir: str = SF_DIR):
    """The (lazily built, session-memoized) DataFrame of a registered
    query at ``sf_dir``."""
    from tvbigdataproject_spark.queries import REGISTRY

    key = (id(spark), name, sf_dir)
    if key not in _DF_CACHE:
        _DF_CACHE[key] = REGISTRY[name].fn(spark, sf_dir)
    return _DF_CACHE[key]
