"""As-of join (nearest right-row with ts <= left ts, per entity).

MapReduce parity (SURVEY.md §2.3 'as-of join'): the MR realization is the
secondary-sort trick — co-shuffle both tagged streams by entity, order by
(ts, tag), and carry the latest right-side value forward in a single reducer
pass. The Spark realization below is that exact algorithm expressed
declaratively: union the tagged streams, then a single window pass with
``last(value, ignorenulls=True)``.

Scale notes: ONE shuffle on the entity key (the window partition), no
row-multiplying range join, no per-group pandas materialization. Skewed
entities are split by AQE. This beats the naive `left.join(right, ts <=)`
+ argmax plan, which multiplies rows quadratically per entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the latest right ``value_cols`` at or before
    its ``ts``, matching on entity column ``by``.

    ``right`` must be unique per (by, ts) — pre-aggregate if it isn't, or the
    carried value at equal timestamps is nondeterministic.

    NULL semantics: the carried payload is a struct-of-values that is non-NULL
    for every right ROW, so ``last(..., ignorenulls=True)`` keys on row
    presence, not on any value column. A matched right row whose value is
    legitimately NULL therefore yields NULL (ASOF-join semantics, matches
    DuckDB) instead of skipping back to an older non-NULL value.
    """
    lcols = left.columns
    payload = "__r_payload"
    tagged_left = left.withColumn("__tag", F.lit(1)).withColumn(
        payload,
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols) + ">"
        ),
    )
    # SQL equality never matches a NULL key (ASOF ... ON l.by = r.by drops
    # them), but a window partitioned by the key groups all NULL-key rows
    # TOGETHER — a NULL-key left row would wrongly carry a NULL-key right
    # row (NULL-FK value-parity sweep). Excluding NULL-key right rows
    # restores join semantics: NULL-key left rows emit a NULL payload.
    tagged_right = right.where(F.col(by).isNotNull()).select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in (by, ts) else F.col(c) for c in lcols],
        F.lit(0).alias("__tag"),
        F.struct(*[F.col(c) for c in value_cols]).alias(payload),
    )
    unioned = tagged_left.unionByName(tagged_right)
    # right rows (tag 0) sort before left rows (tag 1) at equal ts => inclusive (<=) semantics
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__carried", F.last(payload, ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("__tag") == 1)
        .select(*lcols, *[F.col(f"__carried.{c}").alias(c) for c in value_cols])
    )
