"""Similarity operators: numpy kernel vs HOF twin, ANN recall (SURVEY.md §5.3)."""

from __future__ import annotations

import numpy as np

from cbde_mapreduce_spark.operators.similarity import ann_lsh_topk, cosine_topk_pairs
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
