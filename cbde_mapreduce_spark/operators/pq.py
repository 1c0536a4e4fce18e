"""Product quantization (PQ) for embedding compression + ADC search.

(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
TPAMI 2011 — public algorithm.)

The memory path of the similarity family: each d-dim float vector compresses
to ``m`` one-byte codes (here 64×4 B → 8 B, a 32× cut), and asymmetric
distance computation (ADC) scores a query against a code with ``m`` table
lookups instead of a d-dim dot product.

Scale shape:
- **Codebook training** is driver-side k-means over a bounded deterministic
  SAMPLE (``n_sample`` rows — the standard PQ practice; codebooks are
  m·k·(d/m) floats ≈ KBs regardless of corpus size).
- **Encoding** is one Arrow pass over executors with the codebook broadcast
  — never collects vectors.
- **ADC search** broadcasts the CODES (the point of PQ: 10⁸ vectors ≈ 800 MB
  of codes vs 25 GB of floats); each query batch builds its m×k lookup
  tables once and scans codes with numpy takes. Past code-broadcast size,
  compose with IVF (operators/iterative.py) so ADC runs per probed cluster —
  the classic IVF-PQ layout.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sampled_matrix(emb: DataFrame, n_sample: int, seed: int) -> np.ndarray:
    """Deterministic bounded training sample (hash-ordered, driver-sized)."""
    sample = (
        emb.select("vec_id", "embedding")
        .orderBy(F.xxhash64(F.col("vec_id") + F.lit(seed)))
        .limit(n_sample)
        .toPandas()
    )
    if not len(sample):  # empty corpus: nothing to train on
        return None
    return np.stack(sample["embedding"].to_numpy()).astype(np.float64)


def pq_train_codebooks(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    n_sample: int = 2048,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """(m, k, d/m) codebooks: per-subspace Lloyd k-means on a bounded sample.

    Deterministic: sample selection is hash-ordered, initial centroids are
    the first k distinct sample rows per subspace.
    """
    x = _sampled_matrix(emb, n_sample, seed)
    if x is None:  # empty corpus: callers emit a typed empty result
        return None
    d = x.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    sub = d // m
    books = np.empty((m, k, sub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cent = xs[:k].copy()
        if cent.shape[0] < k:
            # fewer sample rows than centroids (tiny/collapsed corpora):
            # cycle the sample deterministically; duplicate centroids just
            # leave their clusters empty
            cent = np.tile(cent, (-(-k // cent.shape[0]), 1))[:k]
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = xs[mask].mean(axis=0)
        books[j] = cent
    return books


def pq_encode(emb: DataFrame, codebooks: np.ndarray) -> DataFrame:
    """(vec_id, codes: binary): m one-byte codes per vector, one Arrow pass.

    The codebook rides a Spark broadcast; vectors never leave executors.
    """
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)
    m, _, sub = codebooks.shape

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            codes = np.empty((len(x), m), dtype=np.uint8)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "codes": [c.tobytes() for c in codes],
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        encode, "vec_id bigint, codes binary"
    )


def ivf_pq_topk(
    emb: DataFrame,
    k: int = 10,
    n_clusters: int = 8,
    n_probe: int = 3,
    m: int = 8,
    n_centroids: int = 16,
    n_sample: int = 2048,
    kmeans_iters: int = 3,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ: coarse quantizer routes queries to ``n_probe`` clusters; ADC
    scores only the PQ codes stored in those clusters (the classic IVF-PQ
    layout — Jégou et al. 2011 §V).

    This is the past-code-broadcast composition the plain ``pq_adc_topk``
    path can't reach: codes are PARTITIONED by cluster id (the inverted
    file), queries are routed to their probed clusters, and each (cluster ×
    query-batch) ADC scan runs executor-side via ``cogroup.applyInPandas``
    — no driver collect and no full-code broadcast anywhere. A probe
    touches n_probe/n_clusters of the index regardless of corpus size.

    Output (qid, nid, adc_dist, rn): top-k per query by ADC distance over
    probed clusters. Approximate ⇒ rows-only in the driver; recall vs the
    exact L2 neighbors is asserted in tests/test_pq.py.

    Duplicate-collapse (round-6 scale fix): identical vectors share the
    cluster assignment, the code, AND the probe list, so a g-copy group
    multiplies every probed inverted list and the routed-query side by g —
    the per-cluster ADC scan grew Ω(dup²) at 100× replication (SCALING.md
    r6). Quantizer, codes, and the cogrouped scan now run over
    identical-vector representatives; the scan additionally emits each
    query's SELF row (its ADC distance to its own code — exactly what a
    row-level scan computes for a twin, codes being shared), and the
    per-qid top-k expands through the membership map
    (expand_rep_qtopk_by_dist). Identity on all-distinct data.
    """
    from cbde_mapreduce_spark.operators.similarity import expand_rep_qtopk_by_dist

    res = _ivf_pq_rep_scan(
        emb,
        k,
        n_clusters=n_clusters,
        n_probe=n_probe,
        m=m,
        n_centroids=n_centroids,
        n_sample=n_sample,
        kmeans_iters=kmeans_iters,
        seed=seed,
    )
    if res is None:  # empty corpus
        return emb.sparkSession.createDataFrame(
            [], "qid bigint, nid bigint, adc_dist double, rn bigint"
        )
    mem, _reps, scanned = res
    rep_cross = scanned.filter(F.col("qid") != F.col("nid"))
    rep_self = scanned.filter(F.col("qid") == F.col("nid")).select(
        F.col("qid").alias("gid"), "adc_dist"
    )
    return expand_rep_qtopk_by_dist(mem, rep_cross, rep_self, k)


def _ivf_pq_rep_scan(
    emb: DataFrame,
    k: int,
    n_clusters: int = 8,
    n_probe: int = 3,
    m: int = 8,
    n_centroids: int = 16,
    n_sample: int = 2048,
    kmeans_iters: int = 3,
    seed: int = 42,
):
    """Shared IVF-PQ candidate stage over identical-vector REPRESENTATIVES:
    returns (mem, reps, scanned) where ``scanned`` holds each rep query's
    per-qid ADC top-k cross rows plus its self-code row, or None on an
    empty corpus. ivf_pq_topk expands it directly; ivf_pq_rerank_topk
    exact-scores the rep pairs first (round-8 split)."""
    from cbde_mapreduce_spark.operators.iterative import kmeans_fit
    from cbde_mapreduce_spark.operators.similarity import embedding_dup_tables

    spark = emb.sparkSession
    grp, reps = embedding_dup_tables(emb)
    mem = grp.select("vec_id", "gid")
    emb = reps  # one row per distinct vector, no join in its lineage
    src = emb.select("vec_id", "embedding")

    centroids, assigned = kmeans_fit(emb, k=n_clusters, iters=kmeans_iters)
    books = pq_train_codebooks(emb, m=m, k=n_centroids, n_sample=n_sample, seed=seed)
    if books is None:  # empty corpus
        return None
    sub = books.shape[2]

    # Inverted file: (cluster, nid, codes) — cluster id IS the partition key.
    codes = pq_encode(emb, books).join(
        assigned.select(F.col("vec_id"), "cluster"), "vec_id"
    ).select("cluster", F.col("vec_id").alias("nid"), "codes")

    # Route each query to its n_probe nearest coarse centroids.
    bc_cent = spark.sparkContext.broadcast(centroids)

    def probes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc_cent.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            d2 = (
                (x * x).sum(axis=1, keepdims=True)
                - 2.0 * (x @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            p = min(n_probe, cents.shape[0])  # see iterative.py::probes
            near = np.argsort(d2, axis=1, kind="stable")[:, :p]
            idx = np.repeat(np.arange(len(x)), p)
            yield pd.DataFrame(
                {
                    "cluster": near.ravel().astype(np.int32),
                    "qid": pdf["vec_id"].to_numpy(dtype=np.int64)[idx],
                    "embedding": pdf["embedding"].to_numpy()[idx],
                }
            )

    routed = src.mapInPandas(
        probes, "cluster int, qid bigint, embedding array<float>"
    )

    bc_books = spark.sparkContext.broadcast(books)

    def adc_cluster(queries: pd.DataFrame, cl_codes: pd.DataFrame) -> pd.DataFrame:
        """Per-cluster ADC: every routed query × this cluster's codes."""
        if not len(queries) or not len(cl_codes):
            return pd.DataFrame(
                {"qid": pd.Series(dtype="int64"), "nid": pd.Series(dtype="int64"),
                 "adc_dist": pd.Series(dtype="float64")}
            )
        bks = bc_books.value
        mm = bks.shape[0]
        t_ids = cl_codes["nid"].to_numpy(dtype=np.int64)
        t_codes = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in cl_codes["codes"]]
        )
        out = []
        q = np.stack(queries["embedding"].to_numpy()).astype(np.float64)
        q_ids = queries["qid"].to_numpy(dtype=np.int64)
        for qi in range(len(q)):
            tables = np.stack(
                [
                    ((bks[j] - q[qi, j * sub : (j + 1) * sub]) ** 2).sum(axis=1)
                    for j in range(mm)
                ]
            )
            dists = tables[np.arange(mm)[None, :], t_codes].sum(axis=1)
            mask = t_ids != q_ids[qi]  # cross candidates
            order = np.lexsort((t_ids[mask], dists[mask]))[:k]
            keep_ids, keep_d = t_ids[mask][order], dists[mask][order]
            out.append(
                pd.DataFrame(
                    {"qid": q_ids[qi], "nid": keep_ids,
                     "adc_dist": np.round(keep_d, 6)}
                )
            )
            # the query's own code lives in exactly one (assigned, always-
            # probed) cluster: emit the self row for twin expansion
            self_ix = np.nonzero(~mask)[0]
            if self_ix.size:
                out.append(
                    pd.DataFrame(
                        {"qid": q_ids[qi], "nid": q_ids[qi],
                         "adc_dist": np.round(dists[self_ix[:1]], 6)}
                    )
                )
        return pd.concat(out, ignore_index=True)

    scanned = (
        routed.groupBy("cluster")
        .cogroup(codes.groupBy("cluster"))
        .applyInPandas(adc_cluster, "qid bigint, nid bigint, adc_dist double")
    )
    return mem, emb, scanned


def pq_adc_topk(
    emb: DataFrame,
    k: int = 10,
    m: int = 8,
    n_centroids: int = 16,
    n_sample: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """Approximate per-vector top-k neighbors by PQ asymmetric distance.

    Output (qid, nid, adc_dist, rn): for each query vector, the k nearest
    codes by ADC (query stays full-precision; neighbors are 8-byte codes).
    Deterministic given the seed. Approximate ⇒ rows-only in the driver;
    recall vs exact neighbors is asserted in tests/test_pq.py.

    Identical-vector collapse (round-6): codes, the broadcast code table,
    and the query scan all run over representatives; each query emits its
    self-code ADC row and the per-qid top-k expands to twins through the
    membership map (expand_rep_qtopk_by_dist). Also shrinks the documented
    driver-side code materialization to the DISTINCT-vector count.
    """
    from cbde_mapreduce_spark.operators.similarity import (
        embedding_dup_tables,
        expand_rep_qtopk_by_dist,
    )

    spark = emb.sparkSession
    grp, reps = embedding_dup_tables(emb)
    mem = grp.select("vec_id", "gid")
    emb = reps  # one row per distinct vector, no join in its lineage
    books = pq_train_codebooks(emb, m=m, k=n_centroids, n_sample=n_sample, seed=seed)
    if books is None:  # empty corpus
        return spark.createDataFrame(
            [], "qid bigint, nid bigint, adc_dist double, rn bigint"
        )
    codes_pdf = pq_encode(emb, books).toPandas()  # n × (8 B + id) — the PQ win
    code_ids = codes_pdf["vec_id"].to_numpy(dtype=np.int64)
    code_mat = np.stack([np.frombuffer(b, dtype=np.uint8) for b in codes_pdf["codes"]])
    bc = spark.sparkContext.broadcast((books, code_ids, code_mat))
    sub = books.shape[2]

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bks, t_ids, t_codes = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            q_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            # per-query lookup tables: (m, k) squared dists query-sub vs centroid
            for qi in range(len(q)):
                tables = np.stack(
                    [
                        ((bks[j] - q[qi, j * sub : (j + 1) * sub]) ** 2).sum(axis=1)
                        for j in range(bks.shape[0])
                    ]
                )  # (m, k)
                dists = tables[np.arange(bks.shape[0])[None, :], t_codes].sum(axis=1)
                self_mask = t_ids == q_ids[qi]
                self_d = dists[self_mask][:1]  # own code: twin-expansion row
                nz_ids, nz_d = t_ids[~self_mask], dists[~self_mask]
                order = np.lexsort((nz_ids, nz_d))[:k]
                yield pd.DataFrame(
                    {
                        "qid": q_ids[qi],
                        "nid": np.concatenate([nz_ids[order], [q_ids[qi]] * len(self_d)]),
                        "adc_dist": np.round(
                            np.concatenate([nz_d[order], self_d]), 6
                        ),
                    }
                )

    scanned = emb.select("vec_id", "embedding").mapInPandas(
        adc, "qid bigint, nid bigint, adc_dist double"
    )
    rep_cross = scanned.filter(F.col("qid") != F.col("nid"))
    rep_self = scanned.filter(F.col("qid") == F.col("nid")).select(
        F.col("qid").alias("gid"), "adc_dist"
    )
    return expand_rep_qtopk_by_dist(mem, rep_cross, rep_self, k)


def ivf_pq_rerank_topk(
    emb: DataFrame,
    k: int = 10,
    rerank: int = 30,
    **ivf_kwargs,
) -> DataFrame:
    """IVF-PQ with an exact re-rank tail: ADC proposes ``rerank`` candidates
    per query (compressed-domain scan over probed clusters), then the TRUE
    squared-L2 distance is computed for only those candidate pairs and the
    final top-k re-sorted on it (Jégou et al. 2011 §V.C).

    This kills the PQ quantization error in the final ordering at a cost
    linear in ``rerank``, not corpus size: the exact-distance join touches
    candidate pairs only — the original vectors are never scanned
    per-query. Recall-vs-exact strictly improves over raw ADC
    (asserted in tests/test_pq.py).

    Re-rank runs at REPRESENTATIVE level (round-8): expanding first and
    exact-scoring the vec-level pairs shipped two full embedding payloads
    onto every one of the n·rerank expanded rows — ~6 GB of Arrow/shuffle
    at 100× replication, the slowest name in the sf10 gate (95-134 s).
    Identical vectors make expansion distance-preserving (a twin pair's
    exact distance is 0; a cross pair's equals its rep pair's), so the
    exact join now touches only the DISTINCT-vector candidate pairs and
    the per-qid top-k expands through the membership map afterwards,
    exactly like every other operator in this family. Identity on
    all-distinct data (rep == vec level there).
    """
    from cbde_mapreduce_spark.functions.vectors import pair_l2_pandas
    from cbde_mapreduce_spark.operators.similarity import expand_rep_qtopk_by_dist

    res = _ivf_pq_rep_scan(emb, rerank, **ivf_kwargs)
    if res is None:  # empty corpus
        return emb.sparkSession.createDataFrame(
            [], "qid bigint, nid bigint, l2_dist double, rn bigint"
        )
    mem, reps, scanned = res
    e = reps.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    pair_l2 = pair_l2_pandas()
    # the ADC proposal set is top-`rerank` PER QUERY (the per-cluster scan
    # emits up to n_probe·rerank rows); truncate by (adc, nid) before the
    # exact join — the same order the old expand-first path truncated with
    wadc = Window.partitionBy("qid").orderBy(F.asc("adc_dist"), F.asc("nid"))
    rep_cross = (
        scanned.filter(F.col("qid") != F.col("nid"))
        .withColumn("rr", F.row_number().over(wadc))
        .filter(F.col("rr") <= rerank)
        .select("qid", "nid")
        .join(e.select(F.col("vec_id").alias("qid"), F.col("e").alias("ea")), "qid")
        .join(e.select(F.col("vec_id").alias("nid"), F.col("e").alias("eb")), "nid")
        .select(
            "qid", "nid", F.round(pair_l2(F.col("ea"), F.col("eb")), 6).alias("l2_dist")
        )
    )
    # exact self distance of a duplicate twin is 0 (identical vectors)
    rep_self = reps.select(
        F.col("vec_id").alias("gid"), F.lit(0.0).alias("l2_dist")
    )
    return expand_rep_qtopk_by_dist(mem, rep_cross, rep_self, k, dist_col="l2_dist")


def ivf_rpq_topk(
    emb: DataFrame,
    k: int = 10,
    n_clusters: int = 8,
    n_probe: int = 3,
    m: int = 8,
    n_centroids: int = 16,
    n_sample: int = 2048,
    kmeans_iters: int = 3,
    seed: int = 42,
) -> DataFrame:
    """IVF-ADC with RESIDUAL quantization (Jégou et al. 2011 §V.A): PQ
    codebooks are trained on, and codes encode, x − centroid(cluster(x))
    instead of x. Residuals concentrate around 0 with far less variance
    than raw vectors, so the same code budget quantizes finer; at query
    time each probed cluster scores ADC against the QUERY's residual for
    that cluster (q − centroid), computed cluster-locally.

    Same distribution contract as ivf_pq_topk: codes partitioned by
    cluster, queries routed to n_probe clusters, cogrouped per-cluster ADC,
    no driver collect, no code broadcast — only the k×d centroid matrix and
    the m×k×(d/m) codebooks ride broadcasts. Identical-vector collapse +
    self-row twin expansion as in ivf_pq_topk (round-6 scale fix).
    """
    from cbde_mapreduce_spark.operators.iterative import kmeans_fit
    from cbde_mapreduce_spark.operators.similarity import (
        embedding_dup_tables,
        expand_rep_qtopk_by_dist,
    )

    spark = emb.sparkSession
    grp, reps = embedding_dup_tables(emb)
    mem = grp.select("vec_id", "gid")
    emb = reps  # one row per distinct vector, no join in its lineage
    src = emb.select("vec_id", "embedding")

    centroids, assigned = kmeans_fit(emb, k=n_clusters, iters=kmeans_iters)
    bc_cent = spark.sparkContext.broadcast(centroids)

    with_cluster = src.join(assigned.select("vec_id", "cluster"), "vec_id")

    def residualize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc_cent.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            cl = pdf["cluster"].to_numpy(dtype=np.int64)
            r = x - cents[cl]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "cluster": cl.astype(np.int32),
                    "embedding": list(r),
                }
            )

    resid = with_cluster.mapInPandas(
        residualize, "vec_id bigint, cluster int, embedding array<double>"
    )
    books = pq_train_codebooks(
        resid, m=m, k=n_centroids, n_sample=n_sample, seed=seed
    )
    if books is None:  # empty corpus
        return emb.sparkSession.createDataFrame(
            [], "qid bigint, nid bigint, adc_dist double, rn bigint"
        )
    sub = books.shape[2]
    codes = pq_encode(resid, books).join(
        assigned.select("vec_id", "cluster"), "vec_id"
    ).select("cluster", F.col("vec_id").alias("nid"), "codes")

    def probes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc_cent.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            d2 = (
                (x * x).sum(axis=1, keepdims=True)
                - 2.0 * (x @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            p = min(n_probe, cents.shape[0])  # see iterative.py::probes
            near = np.argsort(d2, axis=1, kind="stable")[:, :p]
            idx = np.repeat(np.arange(len(x)), p)
            yield pd.DataFrame(
                {
                    "cluster": near.ravel().astype(np.int32),
                    "qid": pdf["vec_id"].to_numpy(dtype=np.int64)[idx],
                    "embedding": pdf["embedding"].to_numpy()[idx],
                }
            )

    routed = src.mapInPandas(
        probes, "cluster int, qid bigint, embedding array<float>"
    )
    bc_books = spark.sparkContext.broadcast(books)

    def adc_cluster(queries: pd.DataFrame, cl_codes: pd.DataFrame) -> pd.DataFrame:
        if not len(queries) or not len(cl_codes):
            return pd.DataFrame(
                {"qid": pd.Series(dtype="int64"), "nid": pd.Series(dtype="int64"),
                 "adc_dist": pd.Series(dtype="float64")}
            )
        bks, cents = bc_books.value, bc_cent.value
        mm = bks.shape[0]
        cl = int(queries["cluster"].iloc[0])
        t_ids = cl_codes["nid"].to_numpy(dtype=np.int64)
        t_codes = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in cl_codes["codes"]]
        )
        q = np.stack(queries["embedding"].to_numpy()).astype(np.float64)
        q = q - cents[cl]  # the query residual for THIS cluster
        q_ids = queries["qid"].to_numpy(dtype=np.int64)
        out = []
        for qi in range(len(q)):
            tables = np.stack(
                [
                    ((bks[j] - q[qi, j * sub : (j + 1) * sub]) ** 2).sum(axis=1)
                    for j in range(mm)
                ]
            )
            dists = tables[np.arange(mm)[None, :], t_codes].sum(axis=1)
            mask = t_ids != q_ids[qi]
            order = np.lexsort((t_ids[mask], dists[mask]))[:k]
            out.append(
                pd.DataFrame(
                    {"qid": q_ids[qi], "nid": t_ids[mask][order],
                     "adc_dist": np.round(dists[mask][order], 6)}
                )
            )
            self_ix = np.nonzero(~mask)[0]  # own code: twin-expansion row
            if self_ix.size:
                out.append(
                    pd.DataFrame(
                        {"qid": q_ids[qi], "nid": q_ids[qi],
                         "adc_dist": np.round(dists[self_ix[:1]], 6)}
                    )
                )
        return pd.concat(out, ignore_index=True)

    scanned = (
        routed.groupBy("cluster")
        .cogroup(codes.groupBy("cluster"))
        .applyInPandas(adc_cluster, "qid bigint, nid bigint, adc_dist double")
    )
    rep_cross = scanned.filter(F.col("qid") != F.col("nid"))
    rep_self = scanned.filter(F.col("qid") == F.col("nid")).select(
        F.col("qid").alias("gid"), "adc_dist"
    )
    return expand_rep_qtopk_by_dist(mem, rep_cross, rep_self, k)
