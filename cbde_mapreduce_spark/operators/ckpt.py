"""Local-checkpoint lifecycle hygiene for iterative operators (SURVEY.md §2
iterative family: connected components, BFS/PPR/SSSP, incremental BPE).

``DataFrame.localCheckpoint()`` truncates lineage by pinning the round's
state as storage blocks, but Spark never reclaims those blocks until the
JVM-side Dataset is garbage collected — in a long session running many
iterative queries the SUPERSEDED per-round checkpoints accumulate and can
exhaust the shared heap (observed: a 25-heavy-query single session OOMing
at position ~22 while every query passes in isolation). The fix is to
release each round's checkpoint as soon as the next round's checkpoint has
materialized and nothing lazy references the old one.

``release_local_checkpoint`` drops the blocks behind a checkpointed
DataFrame explicitly. Two safety rules, enforced by the CALLER (the loop
author, who knows the dependency structure):

* only release a checkpoint whose every downstream consumer has already
  materialized — a local checkpoint is unrecoverable by design, so a later
  read of a released one fails hard (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND)
  rather than silently recomputing;
* never release the checkpoint backing the operator's RETURNED plan — the
  caller evaluates it after the function exits. One live round of state per
  query is the intended steady-state footprint.

Mechanism: a locally-checkpointed DataFrame's analyzed plan is a
``LogicalRDD`` over the persisted RDD, so the RDD id is read off the plan
and unpersisted through the SparkContext's persistent-RDD registry (both
stable public-ish surfaces; verified on Spark 4.1). Release is advisory —
any failure to resolve the id is swallowed, because cleanup must never
fail a correct query.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def local_checkpoint_disk(df: DataFrame) -> DataFrame:
    """Eager local checkpoint at ``DISK_ONLY`` — for DATA-SIZED state (edge
    sets, not per-round vertex tables).

    The default ``MEMORY_AND_DISK`` level pins the checkpoint in the unified
    memory pool's storage half; a ~100M-row edge set (a few GB deserialized)
    then starves execution memory for every later stage that scans it while
    aggregating — measured as hard AGGREGATE_OUT_OF_MEMORY at the 100×
    replicated scale even in a fresh session, while the identical plan over
    a DISK_ONLY checkpoint runs in seconds (SCALING.md round 7). Per-round
    vertex-sized state keeps the default level: it is small, read exactly
    once, and released as soon as it is superseded."""
    return df.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)


def persist_disk(df: DataFrame) -> DataFrame:
    """``persist(DISK_ONLY)`` — for DATA-SIZED state whose physical LAYOUT
    (partitioning + in-partition order) later operators must reuse.

    The round-12 optimization measurement: under AQE (the production session
    default) ``localCheckpoint`` records ``UnknownPartitioning`` in its
    LogicalRDD, so an edge set repartitioned on the round join key still
    re-shuffles in every round's join. An ``InMemoryRelation`` keeps its
    cached plan's outputPartitioning/outputOrdering regardless of AQE
    (``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`` defaults
    false), so ``repartition(key).sortWithinPartitions(...).persist`` makes
    every later same-key join/groupBy exchange-free AND sort-free — pinned
    by tests/test_optimization_r12.py.

    Trade-offs vs ``local_checkpoint_disk``: lineage is kept (fine for a
    built-once edge set; it is the GROWING per-round state that needs
    truncation), materialization is lazy (first round's action fills it),
    eviction recomputes instead of failing hard, and release is the plain
    ``df.unpersist()`` rather than ``release_local_checkpoint``."""
    return df.persist(StorageLevel.DISK_ONLY)


def persist_mem(df: DataFrame) -> DataFrame:
    """``persist(MEMORY_AND_DISK)`` — for VERTEX-SIZED per-round state whose
    physical layout later rounds must reuse.

    Same partitioning/ordering-preservation rationale as ``persist_disk``
    (InMemoryRelation keeps its cached plan's layout under AQE, a
    localCheckpoint does not), but at the storage level the ckpt doctrine
    assigns to per-round vertex state: it is small, read once or twice, and
    released as soon as it is superseded — DISK_ONLY would pay a
    serialize+write+read round trip every round for blocks that fit in
    memory trivially (measured r13: sssp_trade_graph at sf10 read ~15%
    slower with DISK_ONLY round-state than with the old memory-level
    checkpoint; MEMORY_AND_DISK spills gracefully if a giant vertex table
    ever does not fit). Data-sized EDGE sets keep ``persist_disk``: their
    blocks pinned in the memory pool starve later aggregations
    (SCALING.md round 7)."""
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def release_local_checkpoint(df: DataFrame | None) -> None:
    """Free the storage blocks behind a superseded ``localCheckpoint`` df.

    No-op on ``None`` and on DataFrames that are not checkpoint-backed
    (callers can pass the loop-carried variable unconditionally; the first
    iteration's seed is usually a plain plan).
    """
    if df is None:
        return
    try:
        analyzed = df._jdf.queryExecution().analyzed()
        rdd_id = analyzed.rdd().id()  # LogicalRDD only; raises otherwise
    except Exception:
        return  # not checkpoint-backed (or reflection surface moved)
    try:
        jmap = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
        jrdd = jmap.get(rdd_id)
        if jrdd is not None:
            jrdd.unpersist(False)
    except Exception:
        pass  # cleanup is best-effort; never fail the query over it
