"""Z-order (Morton) clustering for multi-column data skipping.

(Public technique: Morton 1966 interleaved codes; used by every modern
lakehouse layout optimizer for multi-dimensional min/max pruning.)

Why: parquet readers skip row groups whose column min/max stats exclude the
predicate. A single-column sort gives perfect stats on ONE column and random
stats on the others; interleaving the bits of several columns' bucket ranks
clusters rows so that EVERY z-ordered column has tight per-row-group ranges —
multi-dimensional point/range predicates then prune most of a 100 TB table
at scan time.

All JVM-side: one min/max aggregate pass per call (2 scalars per column to
the driver), then width_bucket + static shiftleft expressions — the same
generated-per-bit pattern as SimHash (plans/text.py), no Python on the data
path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Morton-interleaved key over ``cols`` (each quantized to 2**bits
    ranks via width_bucket on its [min, max] span)."""
    stats = df.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in cols],
        *[F.max(c).alias(f"__mx_{c}") for c in cols],
    ).collect()[0]
    n_buckets = 1 << bits
    ranks = []
    for c in cols:
        mn, mx = float(stats[f"__mn_{c}"]), float(stats[f"__mx_{c}"])
        if mx <= mn:  # constant column: rank 0 everywhere
            ranks.append(F.lit(0).cast("bigint"))
            continue
        # width_bucket returns 1..n+1; clamp into 0..n-1
        ranks.append(
            F.least(
                F.lit(n_buckets - 1),
                F.width_bucket(F.col(c).cast("double"), F.lit(mn), F.lit(mx), F.lit(n_buckets)) - 1,
            ).cast("bigint")
        )
    key = F.lit(0).cast("bigint")
    # interleave: output bit (b * len(cols) + i) = bit b of rank_i
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * len(ranks) + i)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the z-order of ``cols``.

    repartitionByRange on the key splits the z-curve into contiguous file
    spans; sortWithinPartitions tightens row-group stats inside each file.
    The written data is row-identical to ``df`` — only layout changes.
    """
    key = zorder_key(df, cols, bits)
    (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
