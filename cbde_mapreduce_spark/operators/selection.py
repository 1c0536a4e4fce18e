"""Distributed exact selection (k-th smallest) by iterative histogram
narrowing — the classic multi-round MR selection algorithm, and the scale
path for exact percentiles when a global sort (or a single-JVM
``percentile`` aggregate over the full column) is off the table.

Each round runs ONE combinable aggregation over the surviving rows: a
fixed-width B-bucket histogram of the current value range. The driver sees
only the B counts (bytes, not data), picks the bucket containing the target
rank, and the next round filters to that bucket — the candidate set shrinks
by ~B× per round, so rounds = log_B(n / final_limit). The finish is an
exact top-k over the ≤final_limit survivors (TakeOrdered — bounded).

Boundary discipline: the filter reuses the EXACT bucket expression that
built the histogram (never a reconstructed `[lo2, hi2)` range predicate),
so float rounding at bucket edges cannot disagree between the count pass
and the filter pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kth_smallest(
    df: DataFrame,
    col: str,
    k: int,
    buckets: int = 32,
    final_limit: int = 4096,
    max_rounds: int = 64,
) -> float:
    """Exact k-th smallest value of ``df[col]`` (1-based, NULLs excluded).

    Driver participation is O(buckets) counts per round plus the final
    ≤final_limit-row top-k — never the data itself.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cur = df.select(F.col(col).cast("double").alias("x")).filter(
        F.col("x").isNotNull()
    )
    kk = k
    for _ in range(max_rounds):
        lo, hi, n = cur.agg(
            F.min("x"), F.max("x"), F.count("x")
        ).first()
        if n < kk:
            raise ValueError(f"k={k} exceeds non-null row count")
        if n <= final_limit or lo == hi:
            break
        width = (hi - lo) / buckets
        b = F.least(
            F.lit(buckets - 1), F.floor((F.col("x") - F.lit(lo)) / F.lit(width))
        ).cast("int")
        hist = {
            r["b"]: r["c"]
            for r in cur.groupBy(b.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        run = 0
        target = buckets - 1
        for i in range(buckets):
            c = hist.get(i, 0)
            if run + c >= kk:
                target = i
                kk -= run
                break
            run += c
        cur = cur.filter(b == target)
    # kk-th smallest of the bounded survivor set: max of the first kk
    return cur.orderBy("x").limit(kk).agg(F.max("x")).first()[0]
