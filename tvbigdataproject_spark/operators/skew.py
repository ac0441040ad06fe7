"""Manual salted equi-join for skewed keys.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin) is the first
line of defense and needs no code — but it only kicks in for sort-merge
joins whose partition-size stats cross the skew thresholds at runtime,
and it cannot help when the same hot key also dominates a downstream
aggregation. This operator is the explicit fallback: replicate the
build side SALT_N ways, scatter the probe side's hot keys across the
replicas with a deterministic row-derived salt, and join on
(key, salt). Logical result is identical to the plain join (the oracle
for salted_join_revenue proves it); only the physical distribution
changes — the hot key's rows spread over SALT_N tasks instead of one
straggler.

Cost model: the build side is shuffled SALT_N times its size, so this
pays off only when the probe side's skew dwarfs build×SALT_N — the same
arithmetic as broadcast vs shuffle. Keep SALT_N small (8-32) and prefer
AQE when it applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `probe` (skewed side) with `build` on
    probe_key == build_key, distributing each probe key over `n_salt`
    shuffle partitionings.

    The probe salt is derived from the whole row (xxhash64 over all
    columns) so it is deterministic under re-partitioning and re-runs —
    monotonically_increasing_id would not be. The build side is
    replicated once per salt via an exploded literal range: a narrow
    transform, no driver loop, no union-of-N plans.
    """
    salted_probe = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salt))
    )
    replicated_build = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    joined = salted_probe.join(
        replicated_build,
        (F.col(probe_key) == F.col(build_key)) & (salted_probe._salt == replicated_build._salt),
        how,
    )
    return joined.drop("_salt")
