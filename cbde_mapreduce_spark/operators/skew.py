"""Skew mitigation: salted two-phase aggregation (SURVEY.md §4).

MapReduce parity: the MR hand-pattern is appending a random salt to hot
keys so one reducer doesn't receive the whole group; a second job merges
the salted partials. Spark gives skew-join splitting via AQE, but *group-by*
skew on a hot key still concentrates one reducer — the salted two-phase
aggregate below is the standard fix and composes from pure DataFrame ops.

Only algebraic (partial-mergeable) aggregates are supported: each phase-1
partial must merge losslessly in phase 2 (sum/count/min/max — avg as
sum+count).

At 100 TB: phase 1 spreads a hot key over ``n_salts`` reducers; phase 2
shuffles only ``n_salts`` rows per key. Deterministic results (the salt only
changes partitioning, never values) — so it stays oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted group-by.

    ``aggs`` maps output name -> (merge_fn, phase1_expr) where merge_fn is
    'sum' | 'min' | 'max' | 'count' (phase-2 merge is sum for count).

    Example::

        salted_aggregate(events, ["event_type"],
                         {"n": ("count", F.count(F.lit(1))),
                          "sum_value": ("sum", F.sum("value"))})
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (_, expr) in aggs.items()]
    )
    merge = {
        "sum": F.sum,
        "count": F.sum,  # counts merge by summation
        "min": F.min,
        "max": F.max,
    }
    return phase1.groupBy(*keys).agg(
        *[
            merge[how](f"__p_{name}").alias(name)
            for name, (how, _) in aggs.items()
        ]
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof equi-join: replicate the dim side ``n_salts`` times and
    spread each hot fact key over ``n_salts`` shuffle partitions.

    The MR hand-pattern for a hot join key (one reducer receives the whole
    key's rows): fact rows get salt = hash(row) % n_salts, the dim side is
    cross-joined with the salt domain, and the join key becomes
    (key, salt) — the hot key's traffic fans out n_salts ways. Values are
    unchanged (the salt never reaches the output), so the operator stays
    oracle-checkable against the plain join.

    At 100 TB this is the manual fallback when AQE's skew-join splitting
    can't apply (e.g. broadcast-disabled aggregations downstream, or
    pre-AQE engines); dim replication cost is n_salts × |dim|, so it suits
    dims small enough to replicate but too hot-keyed to shuffle naively.
    Deterministic: the salt is a hash of stable fact columns, not rand().
    """
    salt_values = F.array(*[F.lit(i) for i in range(n_salts)])
    fact_salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts)).cast("int")
    )
    dim_salted = dim.withColumn("__salt", F.explode(salt_values))
    out = fact_salted.join(dim_salted, [key, "__salt"])
    return out.drop("__salt")
