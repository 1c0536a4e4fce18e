"""Similarity search over embedding columns (SURVEY.md §2.11).

Two paths, same semantics:

- **Blocked brute force** (`cosine_topk_pairs`): the query side streams
  through executors via ``mapInPandas``; the target matrix (id, L2-normalized
  rows) is a Spark broadcast — legitimate because it is the *small* side,
  exactly like a broadcast hash join's build side. Each Arrow batch computes
  a numpy matmul block and emits only its local top-k (the MR per-mapper-heap
  pattern, SURVEY §2.6); the global top-k merges k·p rows, never the full
  O(n²) pair set. 100 TB scaling: when the target side outgrows a broadcast,
  shard it (IVF/LSH below) — the kernel is unchanged.

- **Random-hyperplane LSH ANN** (`ann_lsh_topk`): multi-table sign-bucket
  blocking (Charikar 2002). Deterministic hyperplanes from a fixed seed;
  candidates = pairs sharing a (table, bucket); exact re-rank of candidates
  only. Approximate ⇒ rows-only check; recall is asserted against the
  brute-force result in tests/test_similarity.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PAIR_SCHEMA = "qid bigint, nid bigint, sim double"


def _normalized_matrix(emb: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Collect (ids, row-normalized float64 matrix) for the broadcast side."""
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    if not len(ids):
        return ids, np.zeros((0, 0), dtype=np.float64)
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return ids, m


def cosine_topk_pairs(
    emb: DataFrame, k: int = 100, digits: int = 6, parallelism: int = 8
) -> DataFrame:
    """Deterministic global top-k most-similar pairs (qid < nid).

    Output (qid, nid, sim) ordered by (round(sim, digits) DESC, qid, nid) —
    the rounding + unique tiebreak makes the cutoff engine-stable.

    Kernel shape (per Arrow batch): one matmul block, invalid pairs masked
    to -inf in place, k-th-value threshold via np.partition, then an exact
    lexsort of only the ≥threshold survivors — no index meshgrids, no
    O(batch·n) integer materialization. The local top-k is exact under the
    same total order as the global merge, so correctness is unaffected by
    how rows are batched.
    """
    spark = emb.sparkSession
    ids, m = _normalized_matrix(emb)
    bc = spark.sparkContext.broadcast((ids, m))
    src = emb.select("vec_id", "embedding")
    if src.rdd.getNumPartitions() < parallelism:
        src = src.repartition(parallelism)

    def block_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_m = bc.value
        for pdf in batches:
            if not len(pdf) or not b_ids.size:
                continue
            q_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = np.round(q @ b_m.T, digits)  # (batch, n_target)
            sims[q_ids[:, None] >= b_ids[None, :]] = -np.inf  # qid<nid only
            flat = sims.ravel()
            if flat.size > k:
                thresh = np.partition(flat, flat.size - k)[flat.size - k]
                sel = np.nonzero(flat >= thresh)[0]  # ≥k survivors, ties kept
            else:
                sel = np.nonzero(flat > -np.inf)[0]
            qi, bi = np.divmod(sel, b_ids.size)
            cq, cb, cs = q_ids[qi], b_ids[bi], flat[sel]
            order = np.lexsort((cb, cq, -cs))[:k]
            yield pd.DataFrame({"qid": cq[order], "nid": cb[order], "sim": cs[order]})

    local = src.mapInPandas(block_topk, PAIR_SCHEMA)
    return local.orderBy(F.desc("sim"), F.asc("qid"), F.asc("nid")).limit(k)


def ann_lsh_topk(
    emb: DataFrame,
    k: int = 10,
    n_tables: int = 8,
    n_bits: int = 5,
    seed: int = 42,
    digits: int = 6,
) -> DataFrame:
    """Approximate k-NN per vector via multi-table sign-random-projection LSH.

    Output (qid, nid, sim, rn): for each qid, its top-k candidates by exact
    cosine among LSH-colliding vectors. Deterministic given the seed.
    """
    spark = emb.sparkSession
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_tables, n_bits, 64)
    bc_planes = spark.sparkContext.broadcast(planes)

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bc_planes.value
        weights = (1 << np.arange(n_bits)).astype(np.int64)
        for pdf in batches:
            v_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            out = []
            for t in range(pl.shape[0]):
                bits = (m @ pl[t].T > 0).astype(np.int64)  # (n, n_bits)
                out.append(
                    pd.DataFrame(
                        {
                            "vec_id": v_ids,
                            "table_id": t,
                            "bucket": bits @ weights,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    buckets = emb.select("vec_id", "embedding").mapInPandas(
        bucketize, "vec_id bigint, table_id int, bucket bigint"
    )
    l, r = buckets.alias("l"), buckets.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.table_id") == F.col("r.table_id"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") != F.col("r.vec_id")),
        )
        .select(F.col("l.vec_id").alias("qid"), F.col("r.vec_id").alias("nid"))
        .distinct()
    )
    from cbde_mapreduce_spark.functions.vectors import dot, l2_norm

    # precompute norms once per vector; candidate re-rank then costs a
    # single dot fold per pair
    n = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    e1 = n.select(F.col("vec_id").alias("qid"), F.col("e").alias("ea"), F.col("nrm").alias("na"))
    e2 = n.select(F.col("vec_id").alias("nid"), F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    scored = (
        cand.join(e1, "qid")
        .join(e2, "nid")
        .select(
            "qid",
            "nid",
            F.round(
                dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), digits
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
    )
