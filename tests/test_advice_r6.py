"""Pinning tests for the round-6 ADVICE items (all in operators/similarity.py).

1. `_expand_rep_topk` must not synthesize sim-1.0 self pairs for duplicated
   ZERO-NORM vectors when the operator is called directly (the registry's
   `_nonzero_embeddings` policy guards plan-level callers only).
2. `embedding_dup_groups` is a groupBy + join-back (no window partitioned by
   the embedding payload) and still produces exact (gid, gsz).
3. `_block_pairs_topk` tiles the TARGET axis too, so the peak-cells
   invariant holds even when n_targets alone exceeds the cell budget.
4. `embedding_neardup_lsh` documents threshold ∈ (0, 1]; duplicated
   zero-norm vectors are never emitted at any threshold.
"""

from __future__ import annotations

import numpy as np

from cbde_mapreduce_spark.operators import similarity as S
from cbde_mapreduce_spark.operators.similarity import (
    cosine_topk_pairs,
    cosine_topk_pairs_sharded,
    embedding_dup_groups,
    embedding_neardup_lsh,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_duplicated_zero_vectors_emit_no_pairs(spark):
    """Two copies of the zero vector: their cosine is undefined, so neither
    the kernel (NaN-dropped) nor the duplicate-group expansion may emit the
    twin pair — previously it surfaced as a spurious top-ranked sim 1.0."""
    d = 64  # lsh_buckets draws 64-dim hyperplanes (the fixture width)
    zero = [0.0] * d
    e0 = [1.0] + [0.0] * (d - 1)
    e1 = [0.0, 1.0] + [0.0] * (d - 2)
    rows = [(1, zero), (2, zero), (3, e0), (4, e0), (5, e1)]
    emb = _emb(spark, rows)
    for df in (
        cosine_topk_pairs(emb, k=50),
        cosine_topk_pairs_sharded(emb, k=50, n_shards=2),
    ):
        top = df.toPandas()
        ids = set(zip(top.qid, top.nid))
        assert (1, 2) not in ids, "zero-norm twin pair emitted"
        assert (3, 4) in ids  # genuine duplicate group still expands
        one = top[(top.qid == 3) & (top.nid == 4)].sim.iloc[0]
        assert one == 1.0
        assert np.isfinite(top.sim).all()
    lsh = embedding_neardup_lsh(emb, threshold=0.9).toPandas()
    lsh_ids = set(zip(lsh.qid, lsh.nid))
    assert (1, 2) not in lsh_ids and (3, 4) in lsh_ids
    # per-query ANN expansion (expand_rep_qtopk): no synthesized sim-1.0
    # twin candidates for the zero-norm group either
    from cbde_mapreduce_spark.operators.iterative import ivf_topk
    from cbde_mapreduce_spark.operators.similarity import ann_lsh_topk

    for qdf in (ann_lsh_topk(emb, k=5), ivf_topk(emb, k=5, n_clusters=2)):
        q = qdf.toPandas()
        twins = q[(q.sim == 1.0) & (q.qid.isin([1, 2]) | q.nid.isin([1, 2]))]
        assert twins.empty, "zero-norm twin surfaced as a sim-1.0 candidate"
        assert ((q.qid == 3) & (q.nid == 4) & (q.sim == 1.0)).any()


def test_dup_groups_exact_without_payload_window(spark):
    rows = [
        (10, [1.0, 2.0]),
        (11, [1.0, 2.0]),
        (12, [1.0, 2.0]),
        (20, [3.0, 4.0]),
        (30, [5.0, 6.0]),
    ]
    got = {
        (r.vec_id, r.gid, r.gsz)
        for r in embedding_dup_groups(_emb(spark, rows)).collect()
    }
    assert got == {(10, 10, 3), (11, 10, 3), (12, 10, 3), (20, 20, 1), (30, 30, 1)}
    # and the plan really has no Window operator (the whale-group hazard)
    plan = (
        embedding_dup_groups(_emb(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_target_axis_tiling_lossless(monkeypatch):
    """With a cell budget SMALLER than n_targets (the regime where the old
    query-side slicing degenerated to 1 x n_targets > budget blocks), the
    kernel must tile the target axis and stay cell-exact."""
    rng = np.random.RandomState(11)
    n, d, k = 120, 8, 25
    ids = np.arange(n, dtype=np.int64)
    m = rng.randn(n, d)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    for mask_ordered in (True, False):
        t_ids = ids if mask_ordered else ids + 5_000
        ref = S._block_pairs_topk(ids, m, t_ids, m, k, 6, mask_ordered)
        monkeypatch.setattr(S, "_MAX_BLOCK_CELLS", n - 7)  # < n_targets
        tiled = S._block_pairs_topk(ids, m, t_ids, m, k, 6, mask_ordered)
        monkeypatch.setattr(S, "_MAX_BLOCK_CELLS", 16_000_000)
        assert ref[["qid", "nid"]].equals(tiled[["qid", "nid"]])
        assert np.array_equal(ref.sim.to_numpy(), tiled.sim.to_numpy())
