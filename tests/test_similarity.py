"""Similarity operators: numpy kernel vs HOF twin, ANN recall (SURVEY.md §5.3)."""

from __future__ import annotations

import numpy as np

from cbde_mapreduce_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk_pairs,
    cosine_topk_pairs_sharded,
)
from cbde_mapreduce_spark.plans import REGISTRY
from cbde_mapreduce_spark.sources import load_table


def test_numpy_kernel_matches_hof_twin(spark, sf_oracle):
    """The blocked-matmul path and the zip_with/aggregate path must agree
    cell-exactly (both round to 6 and share the tiebreak order)."""
    a = (
        REGISTRY["cosine_topk_similarity"].fn(spark, sf_oracle)
        .toPandas()
        .reset_index(drop=True)
    )
    b = (
        REGISTRY["cosine_topk_hof"].fn(spark, sf_oracle)
        .toPandas()
        .reset_index(drop=True)
    )
    assert a[["qid", "nid"]].equals(b[["qid", "nid"]])
    assert np.allclose(a.sim, b.sim, atol=0, rtol=0)


def test_ann_lsh_recall_vs_bruteforce(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf.vec_id.to_numpy()
    m = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -2)
    exact = {ids[i]: set(ids[np.argsort(-sims[i])[:10]]) for i in range(len(ids))}
    ann = ann_lsh_topk(emb, k=10).toPandas()
    got = ann.groupby("qid")["nid"].apply(set).to_dict()
    recall = np.mean([len(exact[q] & got.get(q, set())) / 10 for q in exact])
    # embeddings are near-random (max pair sim ~0.51) — 0.46 measured; the
    # bound guards against regressions, not state-of-the-art recall.
    assert recall >= 0.30, f"ANN recall {recall:.3f} regressed"
    # and it must actually prune: candidate sets ≪ all-pairs
    assert len(ann) <= len(ids) * 10


def test_cosine_topk_k_and_order(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    top = cosine_topk_pairs(emb, k=25).toPandas()
    assert len(top) == 25
    assert (top.sim.values[:-1] >= top.sim.values[1:]).all()
    assert (top.qid < top.nid).all()


def test_sharded_matches_broadcast_kernel(spark, sf_oracle):
    """The beyond-broadcast block-matmul path must agree cell-exactly with
    the broadcast kernel (same rounding, same total order)."""
    emb = load_table(spark, sf_oracle, "embeddings")
    a = cosine_topk_pairs(emb, k=100).toPandas().reset_index(drop=True)
    for n_shards in (1, 3, 8):
        b = (
            cosine_topk_pairs_sharded(emb, k=100, n_shards=n_shards)
            .toPandas()
            .reset_index(drop=True)
        )
        assert a[["qid", "nid"]].equals(b[["qid", "nid"]]), f"S={n_shards}"
        assert np.allclose(a.sim, b.sim, atol=0, rtol=0), f"S={n_shards}"


def test_auto_dispatch_above_threshold_uses_sharded(spark, sf_smoke, monkeypatch):
    """Targets above broadcast_threshold_rows must route to the sharded path
    (no driver-side collect of the matrix)."""
    import cbde_mapreduce_spark.operators.similarity as sim

    def boom(_):
        raise AssertionError("broadcast path collected the target matrix")

    monkeypatch.setattr(sim, "_normalized_matrix", boom)
    emb = load_table(spark, sf_smoke, "embeddings")
    top = sim.cosine_topk_pairs(emb, k=10, broadcast_threshold_rows=1).toPandas()
    assert len(top) == 10


def test_embedding_neardup_lsh_recall_vs_exact(spark, sf_oracle):
    """Every LSH-found pair must be a genuine >=threshold pair (precision 1
    by construction — exact re-rank); recall vs the exact twin is bounded
    below and all high-sim pairs must be found (collision probability rises
    with cosine)."""
    exact = (
        REGISTRY["embedding_neardup_pairs"].fn(spark, sf_oracle).toPandas()
    )
    lsh = REGISTRY["embedding_neardup_lsh"].fn(spark, sf_oracle).toPandas()
    exact_pairs = set(zip(exact.qid, exact.nid))
    lsh_pairs = set(zip(lsh.qid, lsh.nid))
    assert lsh_pairs <= exact_pairs, "LSH emitted a below-threshold pair"
    assert len(exact_pairs) > 0
    recall = len(lsh_pairs) / len(exact_pairs)
    assert recall >= 0.5, f"near-dup recall {recall:.2f} regressed"
    top = exact.nlargest(5, "sim")
    for p in zip(top.qid, top.nid):
        assert p in lsh_pairs, f"highest-sim pair {p} missed by LSH"


def test_block_kernel_memory_slicing_lossless(monkeypatch):
    """The query-side slicing that bounds one sims block to _MAX_BLOCK_CELLS
    must be lossless: forcing many tiny slices yields cell-identical top-k
    to the single-block evaluation AND to a brute-force reference (the
    100x-scale worker-OOM fix, SCALING.md round 6)."""
    from cbde_mapreduce_spark.operators import similarity as S

    rng = np.random.RandomState(7)
    n, d, k = 300, 16, 40
    ids = np.arange(n, dtype=np.int64)
    m = rng.randn(n, d)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    for mask_ordered in (True, False):
        t_ids = ids if mask_ordered else ids + 10_000
        one = S._block_pairs_topk(ids, m, t_ids, m, k, 6, mask_ordered)
        # force a slice width of ceil(37/n_targets)=1 query row per block
        monkeypatch.setattr(S, "_MAX_BLOCK_CELLS", 37)
        sliced = S._block_pairs_topk(ids, m, t_ids, m, k, 6, mask_ordered)
        monkeypatch.setattr(S, "_MAX_BLOCK_CELLS", 16_000_000)
        assert one[["qid", "nid"]].equals(sliced[["qid", "nid"]])
        assert np.array_equal(one.sim.to_numpy(), sliced.sim.to_numpy())
    # brute-force reference for the mask_ordered=True case
    sims = np.round(m @ m.T, 6)
    iu = np.triu_indices(n, 1)
    flat = sorted(
        zip(-sims[iu], iu[0], iu[1]),
    )[:k]
    ref_q = np.array([q for _, q, _ in flat])
    ref_n = np.array([t for _, _, t in flat])
    top = S._block_pairs_topk(ids, m, ids, m, k, 6, True)
    assert np.array_equal(top.qid.to_numpy(), ref_q)
    assert np.array_equal(top.nid.to_numpy(), ref_n)


def test_fewer_than_k_valid_pairs_no_sentinel_rows(spark):
    """A corpus with fewer than k valid (qid<nid) pairs must emit only the
    genuine pairs — no -inf sentinels (round-2 advice fix)."""
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for df in (
        cosine_topk_pairs(emb, k=100),
        cosine_topk_pairs_sharded(emb, k=100, n_shards=2),
    ):
        top = df.toPandas()
        assert len(top) == 3  # C(3,2) valid pairs only
        assert (top.qid < top.nid).all()
        assert np.isfinite(top.sim).all()


def test_dup_collapse_matches_bruteforce(spark):
    """Round-6 duplicate collapse: identical vectors are grouped before the
    matmul kernel and rep pairs expand exactly back to vec pairs. On a
    dup-heavy set (groups of 1/2/7/30 copies — one group > k+1 so the
    expansion truncation bites at k=25) both kernels must equal the
    brute-force top-k under (sim DESC, qid, nid)."""
    import pandas as pd

    rng = np.random.RandomState(11)
    base = rng.randn(12, 16)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    copies = [30, 7, 2, 1, 2, 1, 1, 2, 7, 1, 2, 1]
    vecs, ids = [], []
    nxt = 0
    for i, c in enumerate(copies):
        for j in range(c):
            vecs.append(base[i])
            ids.append(nxt + j * 5)  # interleave ids across groups
        nxt += 1
    seen = set()
    uniq = []
    for i in ids:
        while i in seen:
            i += 1
        seen.add(i)
        uniq.append(i)
    pdf = pd.DataFrame(
        {"vec_id": uniq, "embedding": [v.astype(np.float32).tolist() for v in vecs]}
    )
    emb = spark.createDataFrame(pdf, "vec_id bigint, embedding array<float>")
    k = 25
    m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf.embedding])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(m @ m.T, 6)
    n = len(uniq)
    ref = sorted(
        (-sims[i, j], min(uniq[i], uniq[j]), max(uniq[i], uniq[j]))
        for i in range(n)
        for j in range(i + 1, n)
    )[:k]
    want = [(q, t, -s) for s, q, t in ref]
    for fn, kw in (
        (cosine_topk_pairs, {}),
        (cosine_topk_pairs_sharded, {"n_shards": 3}),
    ):
        got = [tuple(r) for r in fn(emb, k=k, **kw).collect()]
        assert got == want, f"{fn.__name__}: {got[:5]} vs {want[:5]}"


def test_ann_lsh_dup_collapse_matches_row_level(spark):
    """The rep-level LSH + expansion must emit EXACTLY the rows the
    row-level algorithm produced: copies collide with their twins in every
    band (sim 1.0) and with their rep's colliding groups at the rep sim."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import pandas as pd
    from cbde_mapreduce_spark.operators import similarity as S

    rng = np.random.RandomState(23)
    base = rng.randn(10, 64)  # lsh_buckets hyperplanes are 64-dim
    copies = [9, 4, 1, 2, 1, 3, 1, 1, 2, 1]
    vecs, ids, nxt = [], [], 0
    for i, c in enumerate(copies):
        for j in range(c):
            vecs.append(base[i]), ids.append(nxt + j * 3)
        nxt += 1
    seen, uniq = set(), []
    for i in ids:
        while i in seen:
            i += 1
        seen.add(i), uniq.append(i)
    pdf = pd.DataFrame(
        {"vec_id": uniq, "embedding": [v.astype(np.float32).tolist() for v in vecs]}
    )
    emb = spark.createDataFrame(pdf, "vec_id bigint, embedding array<float>")
    k = 5
    got = sorted(tuple(r) for r in ann_lsh_topk(emb, k=k).collect())
    # row-level reference: score ALL colliding pairs, then per-qid top-k
    pairs = S._lsh_pair_scores(emb, 8, 5, 42, 6)
    both = pairs.unionAll(
        pairs.select(F.col("nid").alias("qid"), F.col("qid").alias("nid"), "sim")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    want = sorted(
        tuple(r)
        for r in both.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .collect()
    )
    assert got == want
