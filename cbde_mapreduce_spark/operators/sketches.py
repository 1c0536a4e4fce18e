"""Count-min sketch: sublinear frequency estimation (SURVEY.md §2.4 sketch
family, alongside HLL / MinHash / SimHash / PQ).

The sketch is a depth × width counter matrix; each item increments one
counter per row (row i uses hash_i = xxhash64(item, i) mod width), and the
frequency estimate is the MIN across rows. Guarantees: estimates NEVER
undercount (one-sided error), and overcount by <= e/width · N with
probability 1 - e^-depth — both asserted in tests/test_aggregates.py.

Distributed shape: counter updates are a plain groupBy(row, bucket) count —
map-side combinable, mergeable across partitions/batches by cell-wise sum
(the sketch of a union is the sum of sketches). Only depth·width cells ever
leave the executors, independent of N — the whole point at 100 TB. Estimation
joins items back to the tiny sketch (broadcast) d times and takes the min.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 1024


def cm_build(items: DataFrame, col: str, depth: int = DEPTH, width: int = WIDTH) -> DataFrame:
    """Build the sketch: DataFrame of (row, bucket, cnt), <= depth·width rows.

    ONE pass over the item stream: each item explodes to its `depth`
    (row, bucket) cells inline (a union of d projections would re-scan —
    and re-explode any upstream tokenization — d times), and the groupBy
    partial-aggregates before the (tiny) shuffle.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        items.select(F.explode(cells).alias("rb"))
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _cm_build_union(items: DataFrame, col: str, depth: int = DEPTH, width: int = WIDTH) -> DataFrame:
    """Round-1 build shape kept for the equality test: d unioned passes."""
    rows = [
        items.select(
            F.lit(i).alias("row"),
            F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(width)).alias("bucket"),
        )
        for i in range(depth)
    ]
    union = reduce(DataFrame.unionAll, rows)
    return union.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cm_estimate(
    queries: DataFrame, col: str, sketch: DataFrame, depth: int = DEPTH, width: int = WIDTH
) -> DataFrame:
    """Estimate each distinct query item's frequency: min over the sketch rows.

    The sketch is broadcast (depth·width cells, size-independent of the
    corpus); absent cells count 0 — coalesce, since min(x, 0-cell) = 0 is
    the correct estimate for a never-seen item.
    """
    q = queries.select(col).distinct()
    probes = [
        q.select(
            F.col(col),
            F.lit(i).alias("row"),
            F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(width)).alias("bucket"),
        )
        for i in range(depth)
    ]
    union = reduce(DataFrame.unionAll, probes)
    return (
        union.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .select(col, F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .groupBy(col)
        .agg(F.min("cnt").alias("est"))
    )
