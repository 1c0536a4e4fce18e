"""Similarity search over embedding columns (SURVEY.md §2.11).

Two paths, same semantics:

- **Blocked brute force** (`cosine_topk_pairs`): the query side streams
  through executors via ``mapInPandas``; the target matrix (id, L2-normalized
  rows) is a Spark broadcast — legitimate because it is the *small* side,
  exactly like a broadcast hash join's build side. Each Arrow batch computes
  a numpy matmul block and emits only its local top-k (the MR per-mapper-heap
  pattern, SURVEY §2.6); the global top-k merges k·p rows, never the full
  O(n²) pair set.

- **Sharded block matmul** (`cosine_topk_pairs_sharded`): the 100 TB path —
  NO driver-side collect, NO broadcast of the target. Vectors hash into S
  shards; each of the S(S+1)/2 shard-pair blocks is an independent
  ``applyInPandas`` group running the same matmul/local-top-k kernel; the
  global merge sees only block-count·k rows. Communication = each shard
  replicated (S+1)/2 times on average — the classic exact all-pairs
  block-matrix trade (choose S so two shards fit one executor's memory).
  `cosine_topk_pairs` auto-dispatches between the two on target row count.

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

#: Peak cells (float64) of one sims block: 16M cells = 128 MB per worker.
#: Without this bound a worker's block is batch_rows x n_targets — at 200k
#: targets a 10k-row Arrow batch is a 16 GB allocation, which killed the
#: Python worker in the 100x replicated-scale study (SCALING.md round 6).
_MAX_BLOCK_CELLS = 16_000_000


def nonzero_embedding(col: str = "embedding"):
    """Predicate: the array has a nonzero element (i.e. a defined cosine).

    Zero-norm vectors have NO cosine to anything — the matmul kernels drop
    their NaN rows — so the duplicate-group expansion paths must not
    synthesize sim-1.0 twin pairs for them either. Shared by the operator
    entry points so callers that bypass the registry's upstream
    ``_nonzero_embeddings`` policy (plans/similarity_q.py) get the same
    semantics."""
    return (
        F.aggregate(
            F.transform(F.col(col), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        > 0
    )


def _merge_local_topk(parts: list[pd.DataFrame], k: int) -> pd.DataFrame:
    """Re-cut per-slice exact top-k frames to one exact top-k under the
    global total order (sim DESC, qid, nid) — lossless because any globally
    qualifying pair is in its slice's top-k and the order is total."""
    cat = pd.concat(parts, ignore_index=True)
    order = np.lexsort(
        (cat["nid"].to_numpy(), cat["qid"].to_numpy(), -cat["sim"].to_numpy())
    )[:k]
    return cat.iloc[order].reset_index(drop=True)


def _normalized_matrix(emb: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Collect (ids, row-normalized float64 matrix) for the broadcast side.

    Zero-norm rows are DROPPED before the divide (round-8 advice fix):
    dividing by a zero norm made NaN rows, and a NaN sim cell poisons the
    top-k threshold in _block_pairs_topk — np.partition ranks NaN largest,
    so with >=k NaN cells ``flat >= thresh`` selected NOTHING and the block
    returned empty, silently losing every valid pair."""
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    if not len(ids):
        return ids, np.zeros((0, 0), dtype=np.float64)
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(m, axis=1)
    keep = norms > 0
    if not keep.all():
        ids, m, norms = ids[keep], m[keep], norms[keep]
    return ids, m / norms[:, None]


def _block_pairs_topk(
    q_ids: np.ndarray,
    qm: np.ndarray,
    t_ids: np.ndarray,
    tm: np.ndarray,
    k: int,
    digits: int,
    mask_ordered: bool,
) -> pd.DataFrame:
    """Shared matmul kernel: exact local top-k pairs of one (query, target)
    block under the global total order (round(sim) DESC, qid, nid).

    ``mask_ordered=True`` keeps only qid < nid (both sides drawn from the
    same id space); ``False`` assumes the id sets are disjoint and
    normalizes each emitted pair to (min, max). Masked -inf cells are
    dropped explicitly so a block with fewer than k valid pairs never
    leaks sentinel rows (round-1 advice fix).

    Peak memory is bounded on BOTH axes: a target side wider than the cell
    budget is tiled first (so the invariant holds even when one query row
    times n_targets would exceed it), then the query side is sliced so one
    sims block never exceeds ``_MAX_BLOCK_CELLS`` cells. Each slice's exact
    local top-k is merged and re-cut under the same total order, which is
    lossless (any globally qualifying pair is in its slice's top-k, and
    the (sim, qid, nid) order is total since (qid, nid) is unique; the
    ordered mask applies per CELL by ids, so it is tiling-invariant).
    """
    if t_ids.size > _MAX_BLOCK_CELLS:
        parts = [
            _block_pairs_topk(
                q_ids, qm, t_ids[j : j + _MAX_BLOCK_CELLS],
                tm[j : j + _MAX_BLOCK_CELLS], k, digits, mask_ordered,
            )
            for j in range(0, t_ids.size, _MAX_BLOCK_CELLS)
        ]
        return _merge_local_topk(parts, k)
    step = max(1, _MAX_BLOCK_CELLS // max(1, t_ids.size))
    if q_ids.size > step:
        parts = [
            _block_pairs_topk(
                q_ids[i : i + step], qm[i : i + step], t_ids, tm, k, digits, mask_ordered
            )
            for i in range(0, q_ids.size, step)
        ]
        return _merge_local_topk(parts, k)
    sims = np.round(qm @ tm.T, digits)
    # belt-and-braces: _norm_rows/_normalized_matrix drop zero-norm rows, so
    # no NaN should reach here — but a NaN cell would poison the partition
    # threshold below (NaN ranks largest; `flat >= NaN` selects nothing and
    # the whole block would return EMPTY), so sanitize regardless of caller
    if np.isnan(sims).any():
        sims = np.where(np.isnan(sims), -np.inf, sims)
    if mask_ordered:
        sims[q_ids[:, None] >= t_ids[None, :]] = -np.inf
    flat = sims.ravel()
    if flat.size > k:
        thresh = np.partition(flat, flat.size - k)[flat.size - k]
        sel = np.nonzero(flat >= thresh)[0]  # ≥k survivors, ties kept
    else:
        sel = np.arange(flat.size)
    sel = sel[flat[sel] > -np.inf]  # drop masked cells even when thresh=-inf
    qi, ti = np.divmod(sel, t_ids.size)
    cq, cn, cs = q_ids[qi], t_ids[ti], flat[sel]
    if not mask_ordered:
        cq, cn = np.minimum(cq, cn), np.maximum(cq, cn)
    order = np.lexsort((cn, cq, -cs))[:k]
    return pd.DataFrame({"qid": cq[order], "nid": cn[order], "sim": cs[order]})


def _norm_rows(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(ids, unit rows) with zero-norm rows DROPPED before the divide —
    see _normalized_matrix's docstring for the NaN-threshold hazard this
    closes (round-8 advice fix). Callers that extract other columns from
    ``pdf`` (labels) must pre-filter with _drop_zero_norm to stay aligned."""
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(m, axis=1)
    keep = norms > 0
    if not keep.all():
        ids, m, norms = ids[keep], m[keep], norms[keep]
    return ids, m / norms[:, None]


def _drop_zero_norm(pdf: pd.DataFrame) -> pd.DataFrame:
    """Drop rows whose embedding has zero norm (no defined cosine), so a
    caller reading side columns (e.g. labels) stays row-aligned with the
    matrix _norm_rows builds from the same frame."""
    if not len(pdf):
        return pdf
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return pdf[np.linalg.norm(m, axis=1) > 0]


def embedding_dup_groups(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding, gid, gsz): identical-embedding duplicate groups.

    gid = group min vec_id (the representative). Identical vectors have
    identical cosine to everything, so every pairwise kernel can run over
    representatives and expand — O(distinct²) instead of
    O((dup·distinct)²) matmul work on a dup-heavy corpus (the 100×
    replicated study: 200k vectors, 2000 distinct, brute force 160 s →
    sub-second collapsed; SCALING.md r6).

    Shape (round-7 fix): a map-side-combinable groupBy on the embedding
    value joined back by the same key — NOT a window partitioned by
    embedding, which lands an extreme duplicate group's every copy PLUS
    full vector payloads in one window task. The group table carries one
    row per distinct vector; the sort-merge join streams the member side,
    so the largest group is never materialized in a single task's memory.
    Grouping compares the float arrays bitwise-after-normalization (Spark
    canonicalizes -0.0 and NaN identically in groupBy and join keys), the
    same equality the window version used.
    """
    return embedding_dup_tables(emb)[0]


def embedding_dup_tables(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(membership, reps) of identical-embedding duplicate groups.

    ``membership`` is embedding_dup_groups' (vec_id, embedding, gid, gsz);
    ``reps`` is the representative table (vec_id=gid, embedding) read
    DIRECTLY off the group aggregate — one row per distinct vector with no
    join in its lineage, so kernels that evaluate the rep set repeatedly
    (a dispatch count, a driver collect, a shard scan) never re-run the
    membership join (round-7: shaved the collapse overhead the join-back
    added to the brute-force cosine path). ``membership`` is needed only
    by the expansion step.

    NULL embeddings (round-8 advice fix): groupBy treats NULL keys as
    equal, so NULL-embedding rows form one group in ``g`` — but a plain
    equi-join-back silently dropped them (NULL keys never match under
    ``=``), a regression vs the pre-r7 window version which kept them as
    their own partition. The join-back is therefore NULL-SAFE (``<=>``,
    still an equi-join for Catalyst's hash/sort-merge strategies), and
    ``reps`` excludes the NULL group: like zero-norm vectors, NULL has no
    defined cosine, so it must never enter a matmul kernel (np.stack over
    None would crash) nor synthesize self pairs — the nz/nonzero guards
    downstream evaluate to NULL on it and exclude it everywhere."""
    g = emb.groupBy("embedding").agg(
        F.min("vec_id").alias("gid"), F.count(F.lit(1)).alias("gsz")
    )
    gk = g.withColumnRenamed("embedding", "__gemb")
    m = emb.join(
        gk, F.col("embedding").eqNullSafe(F.col("__gemb"))
    ).select("vec_id", "embedding", "gid", "gsz")
    reps = g.filter(F.col("embedding").isNotNull()).select(
        F.col("gid").alias("vec_id"), "embedding"
    )
    return m, reps


def _expand_rep_topk(
    m: DataFrame, rep_top: DataFrame, k: int
) -> DataFrame:
    """Expand gid-level top-k pairs (qid, nid, sim) back to vec-level pairs.

    Exact for a global top-k under (sim DESC, qid, nid) — the sparse-cosine
    expansion argument (plans/text.py): a vec pair using an id outside its
    group's k+1 smallest is dominated by k+1 smaller same-sim pairs; a rep
    pair outside the top-k by (sim, best-expanded-pair) is dominated by k
    rep pairs each contributing a better vec pair. Cross rep pair (g1 < g2)
    best expansion is (g1, g2) itself (gids are group minima); a duplicate
    group's best internal pair is its two smallest ids at sim 1.0 —
    EXCEPT zero-norm groups, whose cosine is undefined: the matmul kernels
    drop their NaN rows, so the self-pair branch drops them too (round-7
    advice fix; previously duplicated zero vectors synthesized spurious
    top-ranked sim-1.0 pairs when the operator was called directly, i.e.
    without the registry's upstream ``_nonzero_embeddings`` policy).
    """
    wg = Window.partitionBy("gid").orderBy("vec_id")
    small = (
        m.select(
            "gid", "vec_id",
            F.row_number().over(wg).alias("rn"),
            nonzero_embedding().alias("nz"),
        )
        .filter(F.col("rn") <= k + 1)
    )
    selfp = (
        small.filter((F.col("rn") <= 2) & F.col("nz"))
        .groupBy("gid")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("vec_id"))).alias("bd1"),
            F.min(F.when(F.col("rn") == 2, F.col("vec_id"))).alias("bd2"),
        )
        .filter(F.col("bd2").isNotNull())
        .select(
            F.col("gid").alias("qid"),
            F.col("gid").alias("nid"),
            F.lit(1.0).alias("sim"),
            "bd1",
            "bd2",
        )
    )
    cand = rep_top.select(
        "qid", "nid", "sim", F.col("qid").alias("bd1"), F.col("nid").alias("bd2")
    ).unionByName(selfp)
    top = cand.orderBy(F.desc("sim"), F.asc("bd1"), F.asc("bd2")).limit(k)
    m1 = small.select(
        F.col("gid").alias("qid"), F.col("vec_id").alias("i1"), F.col("rn").alias("r1")
    )
    m2 = small.select(
        F.col("gid").alias("nid"), F.col("vec_id").alias("i2"), F.col("rn").alias("r2")
    )
    ex_cross = (
        F.broadcast(top.filter(F.col("qid") != F.col("nid")).drop("bd1", "bd2"))
        .join(m1, "qid")
        .join(m2, "nid")
        .select(
            F.least("i1", "i2").alias("qid"),
            F.greatest("i1", "i2").alias("nid"),
            "sim",
        )
    )
    ex_self = (
        F.broadcast(
            top.filter(F.col("qid") == F.col("nid")).drop("nid", "bd1", "bd2")
        )
        .join(m1, "qid")
        .join(m2.withColumnRenamed("nid", "qid"), "qid")
        .filter(F.col("r1") < F.col("r2"))
        .select(F.col("i1").alias("qid"), F.col("i2").alias("nid"), "sim")
    )
    out = ex_cross.unionByName(ex_self)
    return out.orderBy(F.desc("sim"), F.asc("qid"), F.asc("nid")).limit(k)


def cosine_topk_pairs(
    emb: DataFrame,
    k: int = 100,
    digits: int = 6,
    parallelism: int = 8,
    broadcast_threshold_rows: int = 2_000_000,
) -> DataFrame:
    """Deterministic global top-k most-similar pairs (qid < nid).

    Output (qid, nid, sim) ordered by (round(sim, digits) DESC, qid, nid) —
    the rounding + unique tiebreak makes the cutoff engine-stable.

    Identical vectors are collapsed first (embedding_dup_groups) and the
    matmul kernel runs over representatives; rep pairs expand exactly back
    to vec pairs (_expand_rep_topk). Dispatch: rep counts up to
    ``broadcast_threshold_rows`` use the broadcast kernel (one pass over
    the query side, target matrix shipped once per executor); above it,
    the sharded block-matmul path, which never collects the target to the
    driver. All paths produce identical output.
    """
    m, reps = embedding_dup_tables(emb)
    # Dispatch on a cheap upper bound first: |reps| <= |emb| always, and
    # counting the INPUT relation is one scan (+ the caller's row filter) —
    # no dup-collapse md5/groupBy/join execution. Only when the whole input
    # exceeds the gate can the rep count matter, and only then is the exact
    # |reps| (a full dup-collapse pipeline pass at plan-build time, ~0.75 s
    # of bench planning_sec at sf0.1, a blocking driver round-trip at
    # cluster scale) worth paying. The dispatch DECISION is identical in
    # every case: below the shortcut, reps.count() <= emb.count() <= gate.
    if (
        emb.count() > broadcast_threshold_rows
        and reps.count() > broadcast_threshold_rows
    ):
        rep_top = _sharded_rep_topk(reps, k=k, digits=digits)
    else:
        rep_top = _broadcast_rep_topk(reps, k, digits, parallelism)
    return _expand_rep_topk(m, rep_top, k)


def _broadcast_rep_topk(
    src: DataFrame, k: int, digits: int, parallelism: int
) -> DataFrame:
    """Global top-k pairs over ``src`` via the broadcast matmul kernel."""
    spark = src.sparkSession
    ids, mm = _normalized_matrix(src)
    bc = spark.sparkContext.broadcast((ids, mm))
    if src.rdd.getNumPartitions() < parallelism:
        src = src.repartition(parallelism)

    def block_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_m = bc.value
        for pdf in batches:
            if not len(pdf) or not b_ids.size:
                continue
            q_ids, q = _norm_rows(pdf)
            yield _block_pairs_topk(q_ids, q, b_ids, b_m, k, digits, mask_ordered=True)

    local = src.mapInPandas(block_topk, PAIR_SCHEMA)
    return local.orderBy(F.desc("sim"), F.asc("qid"), F.asc("nid")).limit(k)


def cosine_topk_pairs_sharded(
    emb: DataFrame, k: int = 100, digits: int = 6, n_shards: int = 8
) -> DataFrame:
    """Exact global top-k pairs with NO driver-side collect and NO broadcast
    of the embedding matrix — the scale path past broadcast-sized targets.

    Identical vectors collapse to representatives first (see
    cosine_topk_pairs); the sharded kernel below runs on representatives.

    Algorithm (block all-pairs): hash every vector into one of ``n_shards``
    shards; enumerate the S(S+1)/2 unordered shard pairs as blocks; ship each
    shard to its blocks via a broadcast join on a tiny (block, shard, role)
    table; one ``applyInPandas`` group per block runs the same matmul kernel
    on (role-q rows × role-t rows) and emits its local top-k; the global
    merge orders block-count·k candidate rows.

    Exactness: hash-sharding partitions the id space, so every unordered
    pair {a,b} lands in exactly one block — the diagonal block of their
    shared shard (masked to qid<nid) or the single (shard_a, shard_b) block
    (ids disjoint; emitted normalized to (min,max)). The per-block top-k uses
    the same total order as the global merge, so no qualifying pair is lost.

    Scale: each shard is replicated (S+1)/2 times on average — the standard
    exact all-pairs communication trade. Choose S so TWO shards fit in one
    executor's memory; at n rows × d dims × 8 bytes, S ≈ 2·n·d·8 / mem.
    """
    m, reps = embedding_dup_tables(emb)
    rep_top = _sharded_rep_topk(reps, k=k, digits=digits, n_shards=n_shards)
    return _expand_rep_topk(m, rep_top, k)


def _sharded_rep_topk(
    src: DataFrame, k: int = 100, digits: int = 6, n_shards: int = 8
) -> DataFrame:
    """Global top-k pairs over ``src`` via the sharded block-matmul kernel."""
    spark = src.sparkSession
    src = src.select(
        "vec_id",
        "embedding",
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_shards)).cast("int").alias("__shard"),
    )
    roles = [
        (si * n_shards + sj, shard, role, si == sj)
        for si in range(n_shards)
        for sj in range(si, n_shards)
        for shard, role in ((si, 0), (sj, 1))
    ]
    role_df = spark.createDataFrame(
        roles, "block_id int, __shard int, role int, diagonal boolean"
    )
    tagged = src.join(F.broadcast(role_df), "__shard")

    def block_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"qid": [], "nid": [], "sim": []})
        diagonal = bool(pdf["diagonal"].iat[0])
        q = pdf[pdf["role"] == 0]
        t = q if diagonal else pdf[pdf["role"] == 1]
        if q.empty or t.empty:
            return empty
        q_ids, qm = _norm_rows(q)
        t_ids, tm = (q_ids, qm) if diagonal else _norm_rows(t)
        return _block_pairs_topk(q_ids, qm, t_ids, tm, k, digits, mask_ordered=diagonal)

    local = tagged.groupBy("block_id").applyInPandas(block_topk, PAIR_SCHEMA)
    return local.orderBy(F.desc("sim"), F.asc("qid"), F.asc("nid")).limit(k)


def lsh_buckets(
    emb: DataFrame, n_tables: int = 8, n_bits: int = 5, seed: int = 42
) -> DataFrame:
    """(vec_id, table_id, bucket): multi-table sign-random-projection buckets
    (Charikar 2002). Deterministic hyperplanes from the seed; one Arrow pass,
    n_tables rows out per vector. Shared blocking primitive for ANN top-k and
    embedding near-dedup."""
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

    return emb.select("vec_id", "embedding").mapInPandas(
        bucketize, "vec_id bigint, table_id int, bucket bigint"
    )


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

    Duplicate-collapse (round-6 scale fix): identical vectors have
    identical signatures, so a g-copy group floods every bucket it touches
    with g members — the in-bucket matmul payload grew Ω(dup²) and OOMed
    the Arrow transfer at 100× replication (SCALING.md r6). Bucketing and
    scoring now run over identical-vector representatives; per-qid top-k
    candidates expand exactly: every copy collides with its g-1 twins at
    sim 1.0 (identical signatures collide in every band) and with the
    members of its rep's colliding groups at the rep-pair sim. Coverage of
    the expansion is the usual argument — per group only the k+1 smallest
    ids can appear in anyone's top-k at a tied sim, and a rep neighbor
    outside a group's top-k by (sim, neighbor-gid) is dominated by k
    better candidates (gids are group minima).
    """
    m, reps = embedding_dup_tables(emb)
    mem = m.select("vec_id", "gid", nonzero_embedding().alias("nz"))
    pairs = _lsh_pair_scores(reps, n_tables, n_bits, seed, digits)
    # undirected scored rep pairs -> both query directions
    both = pairs.unionAll(
        pairs.select(F.col("nid").alias("qid"), F.col("qid").alias("nid"), "sim")
    )
    return expand_rep_qtopk(mem, both, k)


def expand_rep_qtopk(mem: DataFrame, rep_scores: DataFrame, k: int) -> DataFrame:
    """Expand DIRECTED gid-level candidate scores (qid, nid, sim) to
    vec-level per-qid top-k (qid, nid, sim, rn) under (sim DESC, nid ASC).

    Used by every per-query ANN operator after identical-vector collapse:
    each copy's candidates are its group's twins at sim 1.0 plus the
    members of its rep's candidate groups at the rep sim. Coverage: only a
    group's k+1 smallest ids can appear in any top-k at a tied sim, and a
    rep candidate outside a group's top-k by (sim, gid) is dominated by k
    candidates each contributing a better (sim, nid) row (gids are group
    minima, so the candidate group's best nid IS its gid).

    ``mem`` must carry (vec_id, gid, nz) where ``nz`` marks a nonzero
    embedding (nonzero_embedding()): a zero vector's cosine is undefined,
    so its duplicate group gets NO synthesized sim-1.0 twin candidates
    (round-7 advice fix — mirrors _expand_rep_topk; previously zero-norm
    twins surfaced as spurious top candidates when the operator was called
    outside the registry's ``_nonzero_embeddings`` policy)."""
    wrep = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    rep_top = (
        rep_scores.withColumn("rr", F.row_number().over(wrep))
        .filter(F.col("rr") <= k)
        .select(F.col("qid").alias("gq"), F.col("nid").alias("gn"), "sim")
    )
    wg = Window.partitionBy("gid").orderBy("vec_id")
    small = (
        mem.select("gid", "vec_id", F.row_number().over(wg).alias("srn"))
        .filter(F.col("srn") <= k + 1)
    )
    internal = (
        mem.filter(F.col("nz"))
        .select(F.col("vec_id").alias("qid"), "gid")
        .join(small.select("gid", F.col("vec_id").alias("nid")), "gid")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.lit(1.0).alias("sim"))
    )
    cross = (
        mem.select(F.col("vec_id").alias("qid"), F.col("gid").alias("gq"))
        .join(rep_top, "gq")
        .join(
            small.filter(F.col("srn") <= k).select(
                F.col("gid").alias("gn"), F.col("vec_id").alias("nid")
            ),
            "gn",
        )
        .select("qid", "nid", "sim")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (
        internal.unionByName(cross)
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
    )


def expand_rep_qtopk_by_dist(
    mem: DataFrame,
    rep_cross: DataFrame,
    rep_self: DataFrame,
    k: int,
    dist_col: str = "adc_dist",
) -> DataFrame:
    """Distance-ordered twin of ``expand_rep_qtopk`` for the PQ family.

    ``rep_cross``: directed gid-level candidates (qid, nid, dist), qid≠nid.
    ``rep_self``: (gid, dist) — each representative's distance to its OWN
    code (what a row-level scan computes for a duplicate twin, since twins
    share the code). Expansion is per-qid top-k under (dist ASC, nid ASC):
    internal candidates score the group's self-distance, cross candidates
    the rep distance; the k+1-smallest-ids / rep-domination coverage
    argument is the ascending mirror of expand_rep_qtopk's."""
    wrep = Window.partitionBy("qid").orderBy(F.asc(dist_col), F.asc("nid"))
    rep_top = (
        rep_cross.withColumn("rr", F.row_number().over(wrep))
        .filter(F.col("rr") <= k)
        .select(F.col("qid").alias("gq"), F.col("nid").alias("gn"), dist_col)
    )
    wg = Window.partitionBy("gid").orderBy("vec_id")
    small = (
        mem.select("gid", "vec_id", F.row_number().over(wg).alias("srn"))
        .filter(F.col("srn") <= k + 1)
    )
    internal = (
        mem.select(F.col("vec_id").alias("qid"), "gid")
        .join(small.select("gid", F.col("vec_id").alias("nid")), "gid")
        .filter(F.col("qid") != F.col("nid"))
        .join(rep_self.select("gid", dist_col), "gid")
        .select("qid", "nid", dist_col)
    )
    cross = (
        mem.select(F.col("vec_id").alias("qid"), F.col("gid").alias("gq"))
        .join(rep_top, "gq")
        .join(
            small.filter(F.col("srn") <= k).select(
                F.col("gid").alias("gn"), F.col("vec_id").alias("nid")
            ),
            "gn",
        )
        .select("qid", "nid", dist_col)
    )
    w = Window.partitionBy("qid").orderBy(F.asc(dist_col), F.asc("nid"))
    return (
        internal.unionByName(cross)
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
    )


def _lsh_pair_scores(
    emb: DataFrame, n_tables: int, n_bits: int, seed: int, digits: int
) -> DataFrame:
    """Deduped (qid < nid, sim) cosine scores of all LSH-colliding pairs.

    The kernel is BUCKET-LOCAL: vectors ride with their bucket rows
    (n·n_tables rows cross Arrow once), and each (table, bucket) group
    scores its members with ONE normalized matmul — per-pair work never
    touches Python row-wise and embedding arrays never shuffle onto
    candidate pairs (both earlier shapes measured Arrow-transfer-bound at
    ~6 GB; this moves ~20 MB of vectors + scalar pair rows). A pair
    colliding in several tables is scored identically per collision and
    deduped by max. At 100 TB, n_bits is the bucket-width knob; the skew
    guard is the same salting used elsewhere (operators/skew.py).
    """
    buckets = lsh_buckets(emb, n_tables, n_bits, seed).join(
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        ),
        "vec_id",
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame({"qid": [], "nid": [], "sim": []}).astype(
                {"qid": np.int64, "nid": np.int64, "sim": np.float64}
            )
        m = np.stack(pdf["e"].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(m, axis=1)
        nrm[nrm == 0] = 1.0
        g = (m / nrm[:, None]) @ (m / nrm[:, None]).T
        iu, ju = np.triu_indices(len(ids), k=1)
        qi, ni = ids[iu], ids[ju]
        swap = qi > ni
        return pd.DataFrame(
            {
                "qid": np.where(swap, ni, qi),
                "nid": np.where(swap, qi, ni),
                "sim": np.round(g[iu, ju], digits),
            }
        )

    scored = buckets.groupBy("table_id", "bucket").applyInPandas(
        score, "qid bigint, nid bigint, sim double"
    )
    return scored.groupBy("qid", "nid").agg(F.max("sim").alias("sim"))


def embedding_neardup_lsh(
    emb: DataFrame,
    threshold: float = 0.42,
    n_tables: int = 8,
    n_bits: int = 5,
    seed: int = 42,
    digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (qid < nid, sim >= threshold)
    via LSH blocking — the scale path of the embedding-dedup family.

    Candidates = pairs sharing a (table, bucket); exact cosine re-rank of
    candidates only, then the threshold filter. Mirrors the text family's
    MinHash-LSH/exact-Jaccard split: the all-pairs HOF twin
    (plans/similarity_q.py::embedding_neardup_pairs) is the oracle, this is
    what runs at corpus scale. Approximate: a pair colliding in no table is
    missed — recall vs the exact twin is asserted in tests/test_similarity.py
    (sign-LSH collision probability rises with cosine, so high-sim pairs are
    the least likely to be missed).

    Precondition: ``threshold`` ∈ (0, 1]. A near-dup threshold at or below
    zero is meaningless (every colliding pair "passes"), and on such inputs
    this path intentionally diverges from the row-level twin on one corner:
    duplicated ZERO-NORM vectors are never emitted (their cosine is
    undefined; the row-level kernel scored them 0.0 under its norm guard,
    which only a threshold <= 0 could admit). Values above 1.0 are honored
    literally: no pair passes, including exact twins.
    """
    # same bucket-local matmul kernel as ann_lsh_topk (see _lsh_pair_scores),
    # with the same identical-vector collapse (round-6): twins share every
    # bucket, so without it the in-bucket matmul is Ω(dup²). Copies of one
    # vector collide with certainty and re-rank to sim 1.0, so duplicate
    # groups expand to threshold-passing cliques directly; rep pairs expand
    # through the membership map — exactly the row-level output.
    m, reps = embedding_dup_tables(emb)
    mem = m.select("vec_id", "gid")
    rep_pairs = _lsh_pair_scores(reps, n_tables, n_bits, seed, digits).filter(
        F.col("sim") >= threshold
    )
    ia = mem.select(F.col("gid").alias("qid"), F.col("vec_id").alias("ia"))
    ib = mem.select(F.col("gid").alias("nid"), F.col("vec_id").alias("ib"))
    ex_cross = (
        rep_pairs.join(ia, "qid")
        .join(ib, "nid")
        .select(
            F.least("ia", "ib").alias("qid"),
            F.greatest("ia", "ib").alias("nid"),
            "sim",
        )
    )
    # zero-norm twins score 0 in the kernel (nrm==0 -> 1 guard), never 1.0:
    # keep them out of the clique expansion like the row-level path did
    dup = (
        m.filter(
            (F.col("gsz") >= 2) & nonzero_embedding() & F.lit(threshold <= 1.0)
        )
        .select("gid", "vec_id")
    )
    ex_self = (
        dup.select("gid", F.col("vec_id").alias("qid"))
        .join(dup.select("gid", F.col("vec_id").alias("nid")), "gid")
        .filter(F.col("qid") < F.col("nid"))
        .select("qid", "nid", F.lit(1.0).alias("sim"))
    )
    return ex_cross.unionByName(ex_self)


MAXSIM_PARTIAL_SCHEMA = "qid bigint, ql int, dl int, m double"


def maxsim_label_scores_sharded(
    emb: DataFrame, digits: int = 6, n_shards: int = 4
) -> DataFrame:
    """Multi-vector MaxSim between label groups — the block-matmul scale
    path: avg over query vectors of (max over doc vectors of cosine),
    with NO broadcast of either vector set and NO driver collect.

    Unlike top-k pairs, MaxSim's reduction is fully combinable: max (per
    (query vector, doc label)) and avg (per label pair) are associative, so
    hash-shard both sides, run the S² cross blocks independently (each a
    (|q-shard| × |d-shard|) matmul emitting PARTIAL per-(qid, dlabel)
    maxima), and let two ordinary groupBy stages finish the job. No
    candidate loss is possible — every (q vector, d vector) product is
    computed in exactly one block and max/avg see all of them.

    Scale: each vector is shipped to 2S blocks (S as query, S as doc) —
    the standard exact all-pairs communication trade; pick S so two shards
    fit one executor. The declarative twin (plans/similarity_q.py::
    maxsim_label_topk) is the value oracle.

    Duplicate-collapse (round-6): identical (vector, label) rows collapse
    to a representative before sharding — the per-(qid, dlabel) max is
    duplication-invariant and the final avg weights each representative by
    its group size (Σ m·gsz / Σ gsz ≡ the row-level avg). Identity on
    all-distinct data.
    """
    spark = emb.sparkSession
    # one groupBy on the (embedding, label) value — NOT a window partitioned
    # by the vector payload (whale-group hazard), and NOT a join-back either:
    # the output is label-level, so the representative table and the group
    # sizes are both read DIRECTLY off the aggregate; no per-member
    # membership map exists in this operator at all (round-7 simplification)
    gtab = emb.groupBy("embedding", "label").agg(
        F.min("vec_id").alias("gid"), F.count(F.lit(1)).alias("gsz")
    )
    gsz_df = gtab.select(F.col("gid").alias("qid"), "gsz")
    emb = gtab.select(F.col("gid").alias("vec_id"), "label", "embedding")
    src = emb.select(
        "vec_id",
        "label",
        "embedding",
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_shards)).cast("int").alias("__shard"),
    )
    roles = []
    for bi in range(n_shards):
        for bj in range(n_shards):
            block = bi * n_shards + bj
            roles.append((block, bi, 0))
            if bi != bj:
                roles.append((block, bj, 1))
    role_df = spark.createDataFrame(roles, "block_id int, __shard int, role int")
    tagged = src.join(F.broadcast(role_df), "__shard")

    def block_max(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"qid": [], "ql": [], "dl": [], "m": []})
        # zero-norm rows have no cosine: drop BEFORE label extraction so the
        # label arrays stay aligned with _norm_rows' (filtered) matrices
        pdf = _drop_zero_norm(pdf)
        q = pdf[pdf["role"] == 0]
        d = pdf if (pdf["role"] == 1).sum() == 0 else pdf[pdf["role"] == 1]
        if q.empty or d.empty:
            return empty
        q_ids, qm = _norm_rows(q)
        q_lab = q["label"].to_numpy(dtype=np.int32)
        d_ids, dm = (q_ids, qm) if d is pdf else _norm_rows(d)
        d_lab = q_lab if d is pdf else d["label"].to_numpy(dtype=np.int32)
        sims = qm @ dm.T  # (nq, nd)
        out_q, out_ql, out_dl, out_m = [], [], [], []
        for dl in np.unique(d_lab):
            cols = d_lab == dl
            col_max = sims[:, cols].max(axis=1)
            keep = q_lab != dl  # same-label pairs are excluded from MaxSim
            out_q.append(q_ids[keep])
            out_ql.append(q_lab[keep])
            out_dl.append(np.full(int(keep.sum()), dl, dtype=np.int32))
            out_m.append(col_max[keep])
        if not out_q:
            return empty
        return pd.DataFrame(
            {
                "qid": np.concatenate(out_q),
                "ql": np.concatenate(out_ql),
                "dl": np.concatenate(out_dl),
                "m": np.concatenate(out_m),
            }
        )

    partial = tagged.groupBy("block_id").applyInPandas(block_max, MAXSIM_PARTIAL_SCHEMA)
    mx = partial.groupBy("qid", "ql", "dl").agg(F.max("m").alias("m"))
    # gsz has one row per DISTINCT vector — data-sized, so it must join
    # shuffled, never broadcast (the no-vector-broadcast plan gate)
    return mx.join(gsz_df.hint("shuffle_hash"), "qid").groupBy(
        F.col("ql").alias("qlabel"), F.col("dl").alias("dlabel")
    ).agg(
        F.round(F.sum(F.col("m") * F.col("gsz")) / F.sum("gsz"), digits).alias(
            "maxsim"
        )
    )
