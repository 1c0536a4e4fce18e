"""Small-files compaction (SURVEY.md §2.1 sink maintenance).

Long-running ingest (streaming micro-batches, per-task writes at high
parallelism) litters a table directory with thousands of tiny files; at
100 TB the resulting per-file open/footer cost dominates scan time and the
driver's file index bloats. Compaction rewrites a directory to a bounded
file count with range-clustered contents, preserving rows exactly.

Why range, not hash: `repartitionByRange(sort_key)` makes every output file
cover a disjoint key interval, so min/max file statistics stay tight and
post-compaction scans with key predicates prune whole files — compaction is
the natural moment to (re)establish clustering for free. For multi-column
probes, zorder.py's Morton path composes with the same write.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def plan_target_files(n_rows: int, rows_per_file: int) -> int:
    """Bounded file count: ceil(n_rows / rows_per_file), at least 1."""
    return max(1, math.ceil(n_rows / max(1, rows_per_file)))


def compact_files(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    sort_key: str,
    rows_per_file: int,
) -> int:
    """Rewrite ``src_dir``'s parquet into ``dest_dir`` as ~rows_per_file-row
    range-clustered files. Returns the target file count.

    One count pass (metadata-cheap on parquet) sizes the job, one
    repartitionByRange + sortWithinPartitions produces globally
    range-ordered output — each file a disjoint ``sort_key`` interval.
    """
    df: DataFrame = spark.read.parquet(src_dir)
    target = plan_target_files(df.count(), rows_per_file)
    (
        df.repartitionByRange(target, sort_key)
        .sortWithinPartitions(sort_key)
        .write.mode("overwrite")
        .parquet(dest_dir)
    )
    return target
