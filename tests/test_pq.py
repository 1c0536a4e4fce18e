"""Product quantization: compression contract, determinism, ADC recall."""

from __future__ import annotations

import numpy as np

from cbde_mapreduce_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_train_codebooks,
)
from cbde_mapreduce_spark.sources import load_table


def test_pq_codes_compression_and_determinism(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    books = pq_train_codebooks(emb, m=8, k=16)
    assert books.shape == (8, 16, 8)  # 64 dims / 8 subspaces
    a = pq_encode(emb, books).toPandas().set_index("vec_id")
    assert (a.codes.map(lambda b: len(bytes(b))) == 8).all()  # 32x vs 64 floats
    b = pq_encode(emb.repartition(5), books).toPandas().set_index("vec_id")
    for i in a.index:
        assert bytes(a.loc[i, "codes"]) == bytes(b.loc[i, "codes"])


def test_pq_adc_recall_vs_exact(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf.vec_id.to_numpy()
    m = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    d2 = ((m[:, None, :] - m[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.inf)
    exact = {ids[i]: set(ids[np.argsort(d2[i])[:10]]) for i in range(len(ids))}
    got = pq_adc_topk(emb, k=10).toPandas()
    got_n = got.groupby("qid")["nid"].apply(set).to_dict()
    recall = np.mean([len(exact[q] & got_n.get(q, set())) / 10 for q in exact])
    # near-random embeddings are PQ's worst case; the floor guards regressions
    assert recall >= 0.25, f"PQ-ADC recall {recall:.3f} regressed"
    assert all(len(v) == 10 for v in got_n.values())


def test_ivf_pq_recall_and_distribution_contract(spark, sf_oracle):
    """IVF-PQ: per-cluster cogrouped ADC finds most of what full ADC finds."""
    from cbde_mapreduce_spark.operators.pq import ivf_pq_topk

    emb = load_table(spark, sf_oracle, "embeddings")
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf.vec_id.to_numpy()
    m = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    d2 = ((m[:, None, :] - m[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.inf)
    exact = {ids[i]: set(ids[np.argsort(d2[i])[:10]]) for i in range(len(ids))}

    got = ivf_pq_topk(emb, k=10, n_clusters=8, n_probe=3).toPandas()
    got_n = got.groupby("qid")["nid"].apply(set).to_dict()
    assert set(got_n) == set(exact)  # every vector got neighbors
    assert (got.groupby("qid").size() <= 10).all()
    recall = np.mean([len(exact[q] & got_n.get(q, set())) / 10 for q in exact])
    # IVF probing prunes clusters on top of PQ quantization loss; floor
    # guards regressions (measured ~0.3+ on the near-random fixture).
    assert recall >= 0.2, f"IVF-PQ recall {recall:.3f} regressed"


def test_ivf_pq_determinism(spark, sf_oracle):
    from cbde_mapreduce_spark.operators.pq import ivf_pq_topk

    emb = load_table(spark, sf_oracle, "embeddings")
    a = ivf_pq_topk(emb, k=5).toPandas().sort_values(["qid", "rn"]).reset_index(drop=True)
    b = (
        ivf_pq_topk(emb.repartition(5), k=5)
        .toPandas()
        .sort_values(["qid", "rn"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_ivf_pq_rerank_improves_recall(spark, sf_oracle):
    """The exact re-rank tail must dominate raw ADC ordering: recall vs the
    true L2 neighbors is >= ADC-only at the same probe settings, and every
    returned distance is the true squared L2 (spot-checked)."""
    from cbde_mapreduce_spark.operators.pq import ivf_pq_rerank_topk, ivf_pq_topk

    emb = load_table(spark, sf_oracle, "embeddings")
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf.vec_id.to_numpy()
    m = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    d2 = ((m[:, None, :] - m[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.inf)
    exact = {ids[i]: set(ids[np.argsort(d2[i])[:10]]) for i in range(len(ids))}

    adc = ivf_pq_topk(emb, k=10, n_clusters=8, n_probe=3).toPandas()
    rr = ivf_pq_rerank_topk(emb, k=10, rerank=30, n_clusters=8, n_probe=3).toPandas()
    r_adc = np.mean(
        [len(exact[q] & s) / 10 for q, s in adc.groupby("qid")["nid"].apply(set).items()]
    )
    r_rr = np.mean(
        [len(exact[q] & s) / 10 for q, s in rr.groupby("qid")["nid"].apply(set).items()]
    )
    assert r_rr >= r_adc, f"re-rank recall {r_rr:.3f} < ADC-only {r_adc:.3f}"

    # distances are the TRUE squared L2 of the pair
    lookup = {v: i for i, v in enumerate(ids)}
    sample = rr.head(50)
    for _, row in sample.iterrows():
        true = d2[lookup[row.qid], lookup[row.nid]]
        assert abs(row.l2_dist - true) < 1e-4, (row.qid, row.nid, row.l2_dist, true)


def test_residual_ivf_pq_noninferior_recall(spark, sf_oracle):
    """Residual quantization (IVFADC): codes over x − centroid must recall
    at least as well as raw-vector IVF-PQ (minus noise slack) — residuals
    have less variance, so the same code budget quantizes finer."""
    from cbde_mapreduce_spark.operators.pq import ivf_pq_topk, ivf_rpq_topk

    emb = load_table(spark, sf_oracle, "embeddings")
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf.vec_id.to_numpy()
    m = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    d2 = ((m[:, None, :] - m[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.inf)
    exact = {ids[i]: set(ids[np.argsort(d2[i])[:10]]) for i in range(len(ids))}

    def recall(df):
        got = df.toPandas().groupby("qid")["nid"].apply(set).to_dict()
        return np.mean([len(exact[q] & got.get(q, set())) / 10 for q in exact])

    r_plain = recall(ivf_pq_topk(emb, k=10, n_clusters=8, n_probe=3))
    r_resid = recall(ivf_rpq_topk(emb, k=10, n_clusters=8, n_probe=3))
    assert r_resid >= r_plain - 0.02, f"residual {r_resid:.3f} << plain {r_plain:.3f}"
    assert r_resid >= 0.25


def test_pq_dup_collapse_twins_rank_first(spark):
    """Round-6 identical-vector collapse in the PQ family: on a dup-heavy
    set every query's nearest candidates are its twins at the self-code
    ADC distance (codes are shared), expanded from the rep-level scan."""
    import numpy as np
    import pandas as pd

    from cbde_mapreduce_spark.operators.pq import ivf_pq_topk, pq_adc_topk

    rng = np.random.RandomState(31)
    base = rng.randn(12, 64).astype(np.float32)
    copies = [6, 3, 1, 2, 1, 4, 1, 1, 2, 1, 3, 1]
    vecs, ids, nxt = [], [], 0
    for i, c in enumerate(copies):
        for j in range(c):
            vecs.append(base[i]), ids.append(nxt + j * 7)
        nxt += 1
    seen, uniq = set(), []
    for i in ids:
        while i in seen:
            i += 1
        seen.add(i), uniq.append(i)
    pdf = pd.DataFrame({"vec_id": uniq, "embedding": [v.tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf, "vec_id bigint, embedding array<float>")
    k = 4
    gid_of = {}
    nxt = 0
    pos = 0
    groups = {}
    for i, c in enumerate(copies):
        members = uniq[pos : pos + c]
        for v in members:
            gid_of[v] = i
        groups[i] = sorted(members)
        pos += c
    for fn in (ivf_pq_topk, pq_adc_topk):
        out = fn(emb, k=k).toPandas()
        per = out.groupby("qid")
        for qid, rows in per:
            rows = rows.sort_values("rn")
            g = gid_of[qid]
            twins = [v for v in groups[g] if v != qid]
            n_twins = min(len(twins), k)
            # twins share the query's code -> self-code distance, which is
            # <= any cross-code distance ties included; they must lead the
            # list in nid order
            lead = list(rows["nid"].head(n_twins))
            assert lead == sorted(twins)[:n_twins], (
                f"{fn.__name__} qid={qid}: {lead} vs {sorted(twins)[:n_twins]}"
            )
            assert (rows["rn"].to_numpy() == np.arange(1, len(rows) + 1)).all()
