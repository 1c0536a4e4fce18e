"""k-means: distributed runs must match a single-process reference exactly."""

from __future__ import annotations

import numpy as np

from cbde_mapreduce_spark.operators.iterative import kmeans_assignments
from cbde_mapreduce_spark.sources import load_table


def _reference_kmeans(ids, m, k, iters):
    order = np.argsort(ids)
    seed_ids = order[:k]  # k smallest vec_ids
    centroids = m[seed_ids].copy()
    for _ in range(iters):
        d2 = ((m * m).sum(1, keepdims=True) - 2 * (m @ centroids.T)
              + (centroids * centroids).sum(1)[None, :])
        cl = np.argmin(d2, axis=1)
        for c in range(k):
            if (cl == c).any():
                centroids[c] = m[cl == c].mean(axis=0)
    d2 = ((m * m).sum(1, keepdims=True) - 2 * (m @ centroids.T)
          + (centroids * centroids).sum(1)[None, :])
    cl = np.argmin(d2, axis=1)
    dist = np.sqrt(np.maximum(d2[np.arange(len(cl)), cl], 0.0))
    return cl, dist


def test_kmeans_matches_reference_impl(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    got = kmeans_assignments(emb, k=10, iters=3).toPandas().sort_values("vec_id")
    pdf = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    ids = pdf.vec_id.to_numpy()
    m = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    cl, dist = _reference_kmeans(ids, m, k=10, iters=3)
    assert (got.cluster.to_numpy() == cl).all()
    assert np.allclose(got.dist.to_numpy(), np.round(dist, 6), atol=1e-9)
    # every cluster is non-trivial on this fixture
    assert got.cluster.nunique() > 1


def test_kmeans_deterministic(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    a = kmeans_assignments(emb, k=5, iters=2).toPandas().sort_values("vec_id")
    b = kmeans_assignments(emb, k=5, iters=2).toPandas().sort_values("vec_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_ivf_ann_recall_and_pruning(spark, sf_oracle):
    from cbde_mapreduce_spark.operators.iterative import ivf_topk

    emb = load_table(spark, sf_oracle, "embeddings")
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf.vec_id.to_numpy()
    m = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    np.fill_diagonal(sims, -2)
    exact = {ids[i]: set(ids[np.argsort(-sims[i])[:10]]) for i in range(len(ids))}
    ann = ivf_topk(emb, k=10, n_clusters=10, n_probe=3).toPandas()
    got = ann.groupby("qid")["nid"].apply(set).to_dict()
    recall = np.mean([len(exact[q] & got.get(q, set())) / 10 for q in exact])
    assert recall >= 0.30, f"IVF recall {recall:.3f} regressed"
    # pruning: probes 3/10 clusters, so candidates < half of all pairs
    assert len(ann) <= len(ids) * 10
