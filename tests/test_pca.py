"""Distributed power-iteration PCA vs numpy's exact eigendecomposition."""

from __future__ import annotations

import numpy as np
import pytest

from cbde_mapreduce_spark.operators.iterative import pca_top_component
from cbde_mapreduce_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_oracle):
    return load_table(spark, sf_oracle, "embeddings")


def _numpy_top(emb_df):
    x = np.array([r["embedding"] for r in emb_df.collect()], dtype=np.float64)
    c = np.cov(x, rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(c)
    return vecs[:, -1], w[-1]


def test_matches_numpy_eig(spark, emb):
    v, lam, n = pca_top_component(emb)
    ref_v, ref_lam = _numpy_top(emb)
    assert abs(float(np.dot(v, ref_v))) > 0.9999
    assert lam == pytest.approx(ref_lam, rel=1e-3)
    assert n == emb.count()


def test_partitioning_invariant(spark, emb):
    v1, lam1, _ = pca_top_component(emb.repartition(3))
    v13, lam13, _ = pca_top_component(emb.repartition(13))
    # float sums differ in order across partitionings; direction must agree
    assert abs(float(np.dot(v1, v13))) > 0.999999
    assert lam1 == pytest.approx(lam13, rel=1e-9)


def test_covariance_matches_numpy(spark, emb):
    import numpy as np

    from cbde_mapreduce_spark.operators.iterative import covariance_matrix

    cov, n = covariance_matrix(emb)
    x = np.array([r["embedding"] for r in emb.collect()], dtype=np.float64)
    ref = np.cov(x, rowvar=False, bias=True)
    assert n == len(x)
    assert np.allclose(cov, ref, atol=1e-10)
