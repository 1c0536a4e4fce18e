"""Similarity-search queries over the embeddings table (SURVEY.md §2.11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cbde_mapreduce_spark.functions.vectors import dot, l2_norm
from cbde_mapreduce_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk_pairs,
    cosine_topk_pairs_sharded,
    embedding_neardup_lsh,
)
from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table

#: Registry-wide similarity policy: ZERO-NORM VECTORS ARE EXCLUDED from
#: every cosine / norm-ratio computation, identically in plan and oracle.
#: A zero embedding has no direction — cosine against it is 0/0, which
#: ANSI Spark raises on and DuckDB NULLs, and NULL scores order
#: differently across engines; exclusion (the standard normalize-or-drop
#: practice for vector indexes) keeps both engines exact and is a no-op
#: on any corpus without degenerate vectors. Found by the zero-vector
#: robustness sweep (tests/test_skew_input.py).
_NONZERO_SQL = (
    "list_sum(list_transform(embedding, x -> x::double * x::double)) > 0"
)


def _nonzero_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the embeddings table with zero-norm vectors excluded (see the
    policy note above); the Spark twin of ``WHERE {_NONZERO_SQL}``."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(l2_norm(F.col("embedding")) > 0)


_COSINE_ORACLE = f"""
    WITH n AS (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(embedding, x -> x::double * x::double))) AS nrm
        FROM embeddings
        WHERE {_NONZERO_SQL}
    ),
    p AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
               round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                              z -> z[1]::double * z[2]::double))
                     / (a.nrm * b.nrm), 6) AS sim
        FROM n a JOIN n b ON a.vec_id < b.vec_id
    )
    SELECT qid, nid, sim FROM p ORDER BY sim DESC, qid, nid LIMIT 100
"""


@query("cosine_topk_similarity", oracle=_COSINE_ORACLE, category="similarity")
def cosine_topk_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 most-similar embedding pairs — blocked-matmul brute force.

    Arrow-batched numpy kernel with per-block top-k (the MR per-mapper-heap
    pattern); global merge of k·p candidates only.
    """
    emb = _nonzero_embeddings(spark, sf_dir)
    return cosine_topk_pairs(emb, k=100, digits=6)


@query("cosine_topk_sharded", oracle=_COSINE_ORACLE, category="similarity")
def cosine_topk_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same top-100, forced through the sharded block-matmul path — the
    beyond-broadcast scale path: no driver collect, no matrix broadcast,
    S(S+1)/2 independent applyInPandas blocks, global merge of blocks·k rows.
    Value-checked against the same O(n²) SQL oracle as the broadcast kernel.
    """
    emb = _nonzero_embeddings(spark, sf_dir)
    return cosine_topk_pairs_sharded(emb, k=100, digits=6, n_shards=4)


@query("cosine_topk_hof", oracle=_COSINE_ORACLE, category="similarity")
def cosine_topk_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same top-100, pure built-in higher-order functions (zip_with/aggregate).

    The declarative twin of cosine_topk_similarity: one non-equi self-join,
    all arithmetic JVM-side. Slower than the numpy kernel but zero Python.
    """
    emb = _nonzero_embeddings(spark, sf_dir)
    # norms are computed ONCE per vector before the pair join — the join
    # then evaluates a single dot-product fold per pair instead of three
    # (dot + 2 norms), a 3x cut on the O(n²) stage.
    n = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    a = n.select(F.col("vec_id").alias("qid"), F.col("e").alias("ea"), F.col("nrm").alias("na"))
    b = n.select(F.col("vec_id").alias("nid"), F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    return (
        a.join(b, F.col("qid") < F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("qid"), F.asc("nid"))
        .limit(100)
    )


_NEARDUP_ORACLE = f"""
    WITH n AS (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(embedding, x -> x::double * x::double))) AS nrm
        FROM embeddings
        WHERE {_NONZERO_SQL}
    )
    SELECT a.vec_id AS qid, b.vec_id AS nid,
           round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                          z -> z[1]::double * z[2]::double))
                 / (a.nrm * b.nrm), 6) AS sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                         z -> z[1]::double * z[2]::double))
                / (a.nrm * b.nrm), 6) >= 0.42
"""


@query("embedding_neardup_pairs", oracle=_NEARDUP_ORACLE, category="dedup")
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim >= 0.42), exact all-pairs
    via built-in higher-order functions — the oracle twin of the LSH path.

    O(n²): norms computed once per vector before the non-equi self-join, so
    the join evaluates a single dot-fold per pair. Kept as the value oracle;
    embedding_neardup_lsh is the corpus-scale path.
    """
    emb = _nonzero_embeddings(spark, sf_dir)
    n = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    a = n.select(F.col("vec_id").alias("qid"), F.col("e").alias("ea"), F.col("nrm").alias("na"))
    b = n.select(F.col("vec_id").alias("nid"), F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    return (
        a.join(b, F.col("qid") < F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= 0.42)
    )


@query("embedding_neardup_lsh", oracle=None, category="dedup")
def embedding_neardup_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH blocking — the scale path
    (candidates from shared sign-projection buckets, exact re-rank,
    threshold filter). Rows-only: approximate by construction; recall vs
    the exact twin is asserted in tests/test_similarity.py."""
    emb = _nonzero_embeddings(spark, sf_dir)
    return embedding_neardup_lsh(emb, threshold=0.42)


@query("ann_lsh_topk", oracle=None, category="similarity")
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-vector top-10 neighbors via sign-random-projection LSH.

    Rows-only (approximate by construction); recall vs brute force is
    asserted in tests/test_similarity.py.
    """
    emb = _nonzero_embeddings(spark, sf_dir)
    return ann_lsh_topk(emb, k=10)


@query("kmeans_clusters", oracle=None, category="similarity")
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means over embeddings (iterative chained-job parity;
    the IVF coarse quantizer). Rows-only: iterative, not SQL-expressible —
    verified against a single-process reference in tests/test_iterative.py."""
    from cbde_mapreduce_spark.operators.iterative import kmeans_assignments

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_assignments(emb, k=10, iters=3)


@query("pq_adc_topk", oracle=None, category="similarity")
def pq_adc_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: 32× vector compression (64 floats → 8 one-
    byte codes), asymmetric-distance top-10 per vector. Rows-only
    (approximate); recall vs exact neighbors asserted in tests/test_pq.py."""
    from cbde_mapreduce_spark.operators.pq import pq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(emb, k=10)


@query("ivf_ann_topk", oracle=None, category="similarity")
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate k-NN (k-means coarse quantizer, 3-probe, exact
    re-rank). Rows-only; recall vs brute force asserted in
    tests/test_iterative.py."""
    from cbde_mapreduce_spark.operators.iterative import ivf_topk

    emb = _nonzero_embeddings(spark, sf_dir)
    return ivf_topk(emb, k=10, n_clusters=10, n_probe=3)


@query("ivf_pq_rerank_topk", oracle=None, category="similarity")
def ivf_pq_rerank_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + exact re-rank tail (operators/pq.py::ivf_pq_rerank_topk):
    compressed-domain ADC proposes 3k candidates per query, true L2 re-sorts
    them — quantization error leaves the final ordering while per-query
    exact work stays O(rerank), independent of corpus size. Rows-only;
    recall-dominance over raw ADC asserted in tests/test_pq.py."""
    from cbde_mapreduce_spark.operators.pq import ivf_pq_rerank_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_rerank_topk(emb, k=10, rerank=30)


@query("ivf_rpq_topk", oracle=None, category="similarity")
def ivf_rpq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ADC with residual quantization (operators/pq.py::ivf_rpq_topk):
    PQ codes encode x − centroid(cluster) and queries score per-cluster
    residuals — finer quantization from the same 8-byte code budget.
    Rows-only; recall non-inferiority vs raw-vector IVF-PQ asserted in
    tests/test_pq.py (0.274 vs 0.270 on the near-random fixture, PQ's
    worst case)."""
    from cbde_mapreduce_spark.operators.pq import ivf_rpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_rpq_topk(emb, k=10)


_MAXSIM_ORACLE = f"""
    WITH n AS (
        SELECT vec_id, label, embedding,
               sqrt(list_sum(list_transform(embedding,
                    x -> x::double * x::double))) AS nrm
        FROM embeddings
        WHERE {_NONZERO_SQL}),
    sim AS (
        SELECT a.vec_id AS qid, a.label AS ql, b.label AS dl,
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                        z -> z[1]::double * z[2]::double))
                   / (a.nrm * b.nrm) AS s
        FROM n a JOIN n b ON a.label <> b.label),
    mx AS (SELECT qid, ql, dl, max(s) AS m FROM sim GROUP BY 1, 2, 3)
    SELECT ql AS qlabel, dl AS dlabel, round(avg(m), 6) AS maxsim
    FROM mx GROUP BY 1, 2
"""


@query("maxsim_label_topk", oracle=_MAXSIM_ORACLE, category="similarity")
def maxsim_label_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-vector (ColBERT-style) MaxSim scoring between label groups:
    score(Q, D) = avg over query vectors of (max over doc vectors of cosine).

    The late-interaction retrieval primitive: each label's vector set is a
    multi-vector document. Norms are computed once per vector before the
    pair join (single dot-fold per pair); the max and avg are two combinable
    aggregations riding one shuffle each. The declarative O(n²) form is the
    oracle twin — at corpus scale the pair stage swaps for the same
    block-matmul kernel as cosine_topk_sharded with the max/avg reduction
    unchanged.

    Rounding happens AFTER the avg so cross-engine float noise in individual
    cosines (≈1e-15) stays far below the 1e-6 cutoff.

    Duplicate-collapse (round-6 scale fix): identical (vector, label) rows
    collapse to one representative before the pair stage — the doc-side
    max is duplication-invariant and the query-side avg becomes the
    group-size-weighted mean (Σ m·gsz / Σ gsz = the row-level avg by
    definition). Identity on all-distinct data; the Ω(dup²) pair join at
    100× replication collapses to the distinct-vector cross (SCALING.md
    round 6).
    """
    from pyspark.sql import Window

    emb = _nonzero_embeddings(spark, sf_dir)
    wga = Window.partitionBy("embedding", "label")
    grp = emb.select(
        "vec_id",
        "label",
        "embedding",
        F.min("vec_id").over(wga).alias("gid"),
        F.count(F.lit(1)).over(wga).alias("gsz"),
    )
    n = grp.filter(F.col("vec_id") == F.col("gid")).select(
        "vec_id",
        "label",
        "gsz",
        F.col("embedding").cast("array<double>").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    a = n.select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("ql"),
        "gsz",
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = n.select(
        F.col("label").alias("dl"), F.col("e").alias("eb"), F.col("nrm").alias("nb")
    )
    sim = a.join(b, F.col("ql") != F.col("dl")).select(
        "qid",
        "ql",
        "dl",
        "gsz",
        (dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))).alias("s"),
    )
    mx = sim.groupBy("qid", "ql", "dl", "gsz").agg(F.max("s").alias("m"))
    return mx.groupBy(
        F.col("ql").alias("qlabel"), F.col("dl").alias("dlabel")
    ).agg(
        F.round(
            F.sum(F.col("m") * F.col("gsz")) / F.sum("gsz"), 6
        ).alias("maxsim")
    )


@query("maxsim_label_sharded", oracle=_MAXSIM_ORACLE, category="similarity")
def maxsim_label_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same label-pair MaxSim, forced through the block-matmul scale path
    (operators/similarity.py::maxsim_label_scores_sharded): hash-sharded
    S² cross blocks, per-block partial maxima, two combinable groupBy
    stages — no broadcast of either vector set, no driver collect.
    Value-checked against the same O(n²) SQL oracle as the declarative
    twin, so both paths are proven cell-identical."""
    from cbde_mapreduce_spark.operators.similarity import maxsim_label_scores_sharded

    emb = _nonzero_embeddings(spark, sf_dir)
    return maxsim_label_scores_sharded(emb, digits=6, n_shards=4)


_MIPS_Q = 0  # query vector id
_MIPS_TOP = 10

_MIPS_ORACLE = f"""
    WITH n AS (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(embedding,
                    x -> x::double * x::double))) AS nrm
        FROM embeddings
        WHERE {_NONZERO_SQL}),
    qv AS (SELECT embedding AS e, nrm AS qn FROM n WHERE vec_id = {_MIPS_Q}),
    mx AS (SELECT max(nrm) AS m FROM n WHERE vec_id <> {_MIPS_Q}),
    s AS (SELECT n.vec_id,
                 list_sum(list_transform(list_zip(n.embedding, qv.e),
                          z -> z[1]::double * z[2]::double)) AS ip,
                 n.nrm
          FROM n CROSS JOIN qv WHERE n.vec_id <> {_MIPS_Q})
    SELECT vec_id,
           round(s.ip / (qv.qn * mx.m), 6) AS aug_cos,
           round(s.ip, 6) AS ip
    FROM s CROSS JOIN qv CROSS JOIN mx
    ORDER BY aug_cos DESC, vec_id
    LIMIT {_MIPS_TOP}
"""


@query("mips_topk_augmented", oracle=_MIPS_ORACLE, category="similarity")
def mips_topk_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search by the norm-augmentation reduction
    (Bachrach et al. 2014): append sqrt(M² − ‖v‖²) to every candidate and
    0 to the query, and cosine order on the augmented vectors equals
    inner-product order on the originals — so the repo's entire cosine-ANN
    stack (LSH buckets, IVF, PQ) serves MIPS queries unchanged.

    The augmented cosine simplifies to ip/(‖q‖·M), which is what both
    engines compute and rank on (rounded to 6 dp, vec_id tiebreak); the
    oracle IS the reduction identity, so a hash-match certifies the
    transform preserves the top-k. M is a one-row broadcast aggregate;
    the scoring pass is one broadcast join of the query vector — the
    same scale shape as the cosine brute-force baseline.
    """
    emb = _nonzero_embeddings(spark, sf_dir)
    n = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    qv = F.broadcast(
        n.filter(F.col("vec_id") == _MIPS_Q).select(
            F.col("e").alias("qe"), F.col("nrm").alias("qn")
        )
    )
    cand = n.filter(F.col("vec_id") != _MIPS_Q)
    mx = F.broadcast(cand.agg(F.max("nrm").alias("m")))
    return (
        cand.crossJoin(qv)
        .crossJoin(mx)
        .select(
            "vec_id",
            F.round(
                dot(F.col("e"), F.col("qe")) / (F.col("qn") * F.col("m")), 6
            ).alias("aug_cos"),
            F.round(dot(F.col("e"), F.col("qe")), 6).alias("ip"),
        )
        .orderBy(F.desc("aug_cos"), F.asc("vec_id"))
        .limit(_MIPS_TOP)
    )


_Q8_ORACLE = """
    WITH dims AS (
        SELECT i, e.embedding[i]::double AS v
        FROM embeddings e, generate_series(1, 64) s(i)),
    st AS (SELECT i, min(v) AS lo, max(v) AS hi FROM dims GROUP BY i),
    sc AS (SELECT i, lo, hi, (hi - lo) / 255.0 AS scale FROM st),
    q AS (SELECT d.i, d.v, sc.lo, sc.scale,
                 least(255, greatest(0, floor((d.v - sc.lo) / sc.scale + 0.5)))
                   AS code
          FROM dims d JOIN sc ON d.i = sc.i),
    err AS (SELECT i,
                   CASE WHEN count(code) = 0 THEN NULL
                        ELSE sum(round(pow(v - (lo + code * scale), 2) * 1e16)
                                   ::bigint::decimal(38,0))::double
                             / 1e16 / count(code) END AS mse
            FROM q GROUP BY i)
    SELECT sc.i AS dim, round(sc.lo, 6) AS lo, round(sc.hi, 6) AS hi,
           round(sc.scale, 8) AS scale,
           round(err.mse, 10) AS mse
    FROM sc JOIN err ON sc.i = err.i
"""


@query("int8_quantization_stats", oracle=_Q8_ORACLE, category="similarity")
def int8_quantization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension uint8 quantization calibration for the embedding
    column: asymmetric min/max range per dimension, the resulting scale,
    and the round-trip MSE — the numbers that decide whether a 4× smaller
    quantized index is acceptable before building it (the PQ family's
    codebook-free little sibling).

    One posexplode turns vectors into (dim, value) pairs; calibration is a
    combinable per-dim min/max; the error pass re-joins the broadcast
    64-row scale table and aggregates MSE per dim — two scans total,
    shuffling only (dim, value) pairs and never materializing quantized
    vectors. Round-half-up is spelled floor(x + 0.5) on both engines
    (never round(), whose half-to-even tiebreak differs at exact halves).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i0", "v")
    ).select((F.col("i0") + 1).alias("i"), "v")
    st = dims.groupBy("i").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    sc = st.select("i", "lo", "hi", ((F.col("hi") - F.col("lo")) / 255.0).alias("scale"))
    q = dims.join(F.broadcast(sc), "i").select(
        "i",
        "v",
        "lo",
        "scale",
        # try_divide: a constant dimension (hi = lo, scale 0) has no
        # defined code — NULL, not an ANSI error
        F.least(
            F.lit(255.0),
            F.greatest(
                F.lit(0.0),
                F.floor(
                    F.try_divide(F.col("v") - F.col("lo"), F.col("scale"))
                    + 0.5
                ),
            ),
        ).alias("code"),
    )
    # per-row squared residuals are pure IEEE arithmetic over identical
    # operands (no transcendentals) — engine-identical — so they quantize
    # at 1e-16 into an exact integer mean (money.py round-11); the count
    # guard mirrors avg's all-NULL behavior without an ANSI NULL/0 raise
    sq = F.round(
        F.pow(F.col("v") - (F.col("lo") + F.col("code") * F.col("scale")), 2)
        * 1e16
    ).cast("bigint").cast("decimal(38,0)")
    err = q.groupBy("i").agg(
        F.when(F.count("code") == 0, F.lit(None))
        .otherwise(
            F.sum(sq).cast("double") / F.lit(1e16) / F.count("code")
        )
        .alias("mse")
    )
    return (
        sc.join(err, "i")
        .select(
            F.col("i").alias("dim"),
            F.round("lo", 6).alias("lo"),
            F.round("hi", 6).alias("hi"),
            F.round("scale", 8).alias("scale"),
            F.round("mse", 10).alias("mse"),
        )
    )


@query("pca_top_component", oracle=None, category="similarity")
def pca_top_component_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud via the tall-skinny PCA shape
    (operators/iterative.py::pca_top_component): per-partition numpy Gram
    partials merged by positionwise array sum, 64×64 eigensolve on the
    driver — the driver sees d² floats, never data.

    Output: one row per dimension (dim, loading) plus the shared
    eigenvalue. Rows-only by design (an eigensolve is not DuckDB-SQL);
    tests/test_pca.py pins it against numpy's exact eigendecomposition
    (|cos| > 0.9999 to the true top eigenvector, eigenvalue within 0.1%)
    and checks partitioning-invariance.
    """
    from cbde_mapreduce_spark.operators.iterative import pca_top_component

    emb = load_table(spark, sf_dir, "embeddings")
    schema = "dim int, loading double, eigenvalue double, n bigint"
    v, lam, n = pca_top_component(emb)
    if v is None:  # empty corpus
        return spark.createDataFrame([], schema)
    rows = [(i + 1, float(v[i]), float(lam), int(n)) for i in range(len(v))]
    return spark.createDataFrame(rows, schema)


@query("embedding_isotropy", oracle=None, category="similarity")
def embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotropy profile of the embedding space: the full covariance
    eigenvalue spectrum plus the standard isotropy measures — λ_min/λ_max,
    top-component explained-variance share, and participation ratio
    ((Σλ)²/Σλ² — the effective dimensionality). Anisotropic (cone-shaped)
    embedding spaces degrade cosine retrieval; this is the health check
    run before trusting the similarity stack.

    Built on the same one-scan distributed covariance as PCA
    (operators/iterative.py::covariance_matrix — per-partition Gram
    partials, driver-side eigensolve of d² bytes). Rows-only by design;
    tests/test_pca.py pins the covariance path against numpy and the
    spectrum is deterministic given the data up to float summation order.
    """
    import numpy as np

    from cbde_mapreduce_spark.operators.iterative import covariance_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    cov, n = covariance_matrix(emb)
    if cov is None:  # empty corpus
        return spark.createDataFrame(
            [],
            "rank int, eigenvalue double, var_share double, isotropy double, "
            "participation_ratio double, n bigint",
        )
    w = np.linalg.eigvalsh(cov)[::-1]  # descending
    total = float(w.sum())
    # a single vector has a zero covariance matrix: no defined spectrum
    # shares — emit NaN measures rather than dividing by zero
    sq = float((w * w).sum())
    pr = total * total / sq if sq > 0 else float("nan")
    iso = float(w[-1] / w[0]) if w[0] != 0 else float("nan")
    rows = [
        (i + 1, float(w[i]),
         round(float(w[i] / total), 6) if total != 0 else float("nan"),
         round(iso, 6), round(pr, 4), int(n))
        for i in range(len(w))
    ]
    return spark.createDataFrame(
        rows,
        "rank int, eigenvalue double, var_share double, isotropy double, "
        "participation_ratio double, n bigint",
    )
