"""Count-min sketch: sublinear frequency estimation (SURVEY.md §2.4 sketch
family, alongside HLL / MinHash / SimHash / PQ).

The sketch is a depth × width counter matrix; each item increments one
counter per row (row i buckets by an ENGINE-PORTABLE universal hash:
a_i·(md5_60(item) mod p) + b_i mod p mod width — the same md5-affine
family as MinHash, frozen constants in CM_AFFINE, reproducible in DuckDB
SQL so the whole heavy-hitter pipeline is oracle-checkable; round 11,
previously xxhash64 → rows-only), and the frequency estimate is the MIN
across rows. Guarantees: estimates NEVER undercount (one-sided error),
and overcount by <= e/width · N with probability 1 - e^-depth — both
asserted in tests/test_aggregates.py.

Distributed shape: counter updates are a plain groupBy(row, bucket) count —
map-side combinable, mergeable across partitions/batches by cell-wise sum
(the sketch of a union is the sum of sketches). Only depth·width cells ever
leave the executors, independent of N — the whole point at 100 TB. Estimation
joins items back to the tiny sketch (broadcast) d times and takes the min.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cbde_mapreduce_spark.operators.dedup import MH_PRIME

DEPTH = 4
WIDTH = 1024


def _cm_affine_constants() -> list[tuple[int, int]]:
    import random

    rng = random.Random(0xC0_5EED)
    return [
        (rng.randrange(1, MH_PRIME), rng.randrange(0, MH_PRIME))
        for _ in range(DEPTH)
    ]


#: frozen per-row (a_i, b_i) — embedded verbatim in the DuckDB oracle
CM_AFFINE = _cm_affine_constants()


def cm_bucket(col: str, i: int, width: int) -> Column:
    """Row-i bucket of an item: portable md5-60-bit hash -> universal
    affine hash mod width (bit-identical in DuckDB — see the module
    docstring)."""
    h = F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")
    a, b = CM_AFFINE[i]
    hm = h % F.lit(MH_PRIME).cast("bigint")
    return (
        (F.lit(a).cast("bigint") * hm + F.lit(b).cast("bigint"))
        % F.lit(MH_PRIME).cast("bigint")
    ) % F.lit(width)


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
                cm_bucket(col, i, width).alias("bucket"),
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
            cm_bucket(col, i, width).alias("bucket"),
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
            cm_bucket(col, i, width).alias("bucket"),
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


def mg_partials(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: each partition reduces its
    stream to <= k (item, cnt) counters — the deterministic mergeable
    heavy-hitter summary (Agarwal et al., "Mergeable Summaries"), the
    counter-based complement of the hash-based count-min sketch.

    State lives across Arrow batches inside one mapInPandas partition
    (the setup/accumulate/emit lifecycle); per batch the update is
    vectorized: value_counts merges into the counter dict, then if more
    than k counters survive, the (k+1)-th largest count is subtracted
    from all and non-positive counters drop — the summary-merge form of
    the classic decrement step, same error bound (<= n/(k+1) per item).
    """
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for item, c in pdf[col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                t = sorted(counters.values(), reverse=True)[k]
                counters = {
                    i: c - t for i, c in counters.items() if c - t > 0
                }
        yield pd.DataFrame(
            {"item": list(counters.keys()), "cnt": list(counters.values())}
        )

    return items.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, "item string, cnt bigint"
    )


def mg_merge(partials: DataFrame, k: int) -> DataFrame:
    """Merge per-partition MG summaries into one: pointwise sum, then
    subtract the (k+1)-th largest combined count and keep the positive
    remainder. Input is summary-sized (<= k rows per partition), so the
    rank window and the scalar threshold touch bytes, not data."""
    from pyspark.sql import Window

    summed = partials.groupBy("item").agg(F.sum("cnt").alias("cnt"))
    ranked = summed.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("item"))),
    )
    tail = ranked.filter(F.col("rk") == k + 1).select("cnt").collect()
    t = tail[0]["cnt"] if tail else 0
    return (
        ranked.select("item", (F.col("cnt") - F.lit(t)).alias("est"))
        .filter(F.col("est") > 0)
    )


def mg_heavy_hitters(items: DataFrame, col: str, k: int) -> DataFrame:
    """End-to-end Misra-Gries: per-partition summaries -> one merged
    <=k-counter summary. Guarantees (asserted in tests/test_sketches_mg.py):
    est(x) <= true(x) <= est(x) + n/(k+1), so every item with true
    frequency > n/(k+1) appears. Deterministic given the data (no hashing);
    counts depend on partition layout only within the guarantee band."""
    return mg_merge(mg_partials(items, col, k), k)
