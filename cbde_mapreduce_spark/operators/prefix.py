"""Distributed prefix sum (exclusive running total over a global order).

The global-ordered cumulative sum is the core of sequence packing, pagination
offsets, and chunked writes — but the obvious Spark expression
(``sum().over(Window.orderBy(col))`` with no partitionBy) collapses the whole
table into ONE partition, the classic scale-killer (see round-1 verdict on
``ntile_percentile_orders``).

This operator is the two-phase distributed realization, the same shape every
MPP engine uses for ordered analytics:

1. range-partition + locally sort on the order column (Spark's total-order
   sort machinery — sampled range boundaries, P-way parallel);
2. per-partition local exclusive cumsum (a window WITHIN each partition —
   P-way parallel, no single-reducer stage);
3. per-partition totals (P rows, collected to the driver — bytes, not data)
   → exclusive prefix of totals → broadcast back as a pid→offset map;
4. global offset = local cumsum + partition offset.

Only step 3 touches the driver and it moves O(P) scalars. Every data-bearing
stage is P-way parallel, so the operator survives a 100× scale-up by raising
``num_partitions``.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exclusive_prefix_sum(
    df: DataFrame,
    order_col: str | list[str],
    value_col: str,
    out_col: str = "start_off",
    num_partitions: int = 32,
) -> DataFrame:
    """Add ``out_col`` = sum of ``value_col`` over all rows strictly before
    this row in ``order_col`` order. ``order_col`` may be one column name or
    a list (lexicographic composite order); the (composite) key must be
    unique.

    Deterministic: range partitioning on fixed columns with locally sorted
    partitions; the per-partition offset table is keyed by the partition's
    minimum order value (not by the physical partition id, which is not a
    stable identity across recomputations).
    """
    cols = [order_col] if isinstance(order_col, str) else list(order_col)
    # localCheckpoint PINS one materialized partitioning: RangePartitioner
    # samples with an RDD-id-derived seed, so re-executing the exchange in a
    # second job can draw DIFFERENT boundaries — and the offset table would
    # then describe a partitioning the cumsum pass never saw (off-by-a-few
    # global offsets, both signs). Steps 2 and 3 below are separate jobs
    # over `part`, so the partitioning must be computed exactly once.
    part = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )

    # Step 2: local exclusive cumsum. Window.partitionBy(__pid) keeps each
    # window group = one range partition -> P-way parallel, never a single
    # global sort partition.
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = part.withColumn(
        "__local_off", F.coalesce(F.sum(value_col).over(local_w), F.lit(0)).cast("bigint")
    )

    # Step 3: P partition totals -> driver -> exclusive prefix -> tiny map.
    totals = (
        part.groupBy("__pid")
        .agg(
            F.min(F.struct(*cols)).alias("__lo"),
            F.sum(value_col).cast("bigint").alias("__tot"),
        )
        .orderBy("__lo")
        .collect()
    )
    # NULL-aware: an all-NULL partition sums to None (mirrors
    # exclusive_prefix_min's handling) and must contribute 0 to the prefix.
    prefix = list(itertools.accumulate([0] + [r["__tot"] or 0 for r in totals]))[:-1]
    offsets = {r["__pid"]: off for r, off in zip(totals, prefix)}
    if not offsets:  # empty input: nothing to offset
        return df.withColumn(out_col, F.lit(0).cast("bigint"))

    offset_expr: Column = F.element_at(
        F.create_map(
            *itertools.chain.from_iterable(
                (F.lit(pid), F.lit(off)) for pid, off in offsets.items()
            )
        ),
        F.col("__pid"),
    )
    return local.withColumn(
        out_col, (F.col("__local_off") + F.coalesce(offset_expr, F.lit(0))).cast("bigint")
    ).drop("__pid", "__local_off")


def exclusive_prefix_min(
    df: DataFrame,
    order_col: str | list[str],
    value_col: str,
    out_col: str = "prefix_min",
    num_partitions: int = 32,
) -> DataFrame:
    """Min-monoid twin of :func:`exclusive_prefix_sum`: ``out_col`` = min of
    ``value_col`` over all rows strictly before this row in ``order_col``
    order (NULL for the global first row — the empty-prefix identity).

    Same two-phase shape: range partition + per-partition window (P-way
    parallel), then a P-row driver-side exclusive scan of partition minima
    broadcast back as a pid→min map. This is the scale-safe realization of
    ``min().over(Window.orderBy(...))`` — which Spark executes in ONE
    partition — and powers dominance/skyline queries (plans/agg_ext.py).
    """
    cols = [order_col] if isinstance(order_col, str) else list(order_col)
    part = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()  # pin the sampled range boundaries (see above)
    )

    local_w = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = part.withColumn("__local_min", F.min(value_col).over(local_w))

    totals = (
        part.groupBy("__pid")
        .agg(
            F.min(F.struct(*cols)).alias("__lo"),
            F.min(value_col).alias("__min"),
        )
        .orderBy("__lo")
        .collect()
    )
    if not totals:
        vtype = df.schema[value_col].dataType
        return df.withColumn(out_col, F.lit(None).cast(vtype))

    running = None
    prefix: list = []
    for r in totals:
        prefix.append(running)
        v = r["__min"]
        if v is not None:
            running = v if running is None else min(running, v)

    vtype = df.schema[value_col].dataType
    pairs = [
        (F.lit(r["__pid"]), F.lit(p).cast(vtype))
        for r, p in zip(totals, prefix)
        if p is not None
    ]
    if pairs:
        offset_expr: Column = F.element_at(
            F.create_map(*itertools.chain.from_iterable(pairs)), F.col("__pid")
        )
    else:
        offset_expr = F.lit(None).cast(vtype)
    # least() skips NULLs, so empty-prefix rows keep NULL and interior rows
    # take min(local prefix min, prior-partition min).
    return local.withColumn(out_col, F.least("__local_min", offset_expr)).drop(
        "__pid", "__local_min"
    )
