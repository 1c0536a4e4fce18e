"""Pinning tests for the round-8 ADVICE items (operators/similarity.py).

1. **medium** — zero-norm rows reached the matmul kernels as NaN rows and a
   NaN sim cell poisons the top-k threshold: np.partition ranks NaN largest,
   so with >=k NaN cells in a block `flat >= thresh` selected NOTHING and
   the block returned EMPTY, dropping every valid pair. The r6 pinning test
   missed it because its 3-rep/k=50 corpus stayed in the flat.size<=k
   branch; these corpora have distinct reps > k so the threshold branch
   fires (the ADVICE repro: 30 reps, one zero row, k=5 -> 0 rows).
2. **low** — embedding_dup_tables' equi-join-back silently dropped rows
   with NULL embeddings (NULL keys never match `=`); the join is now
   null-safe so they keep their own duplicate group, and reps exclude the
   NULL group (no defined cosine).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from cbde_mapreduce_spark.operators import similarity as S
from cbde_mapreduce_spark.operators.similarity import (
    cosine_topk_pairs,
    cosine_topk_pairs_sharded,
    embedding_dup_groups,
    embedding_dup_tables,
    maxsim_label_scores_sharded,
)

D = 64  # lsh_buckets / fixture embedding width


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _brute_topk(rows, k, digits=6):
    """Reference exact top-k pairs (qid < nid) over the nonzero-norm rows."""
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.array([r[1] for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(m, axis=1)
    ids, m = ids[nrm > 0], m[nrm > 0] / nrm[nrm > 0, None]
    sims = np.round(m @ m.T, digits)
    iu, ju = np.triu_indices(len(ids), k=1)
    df = pd.DataFrame({"qid": ids[iu], "nid": ids[ju], "sim": sims[iu, ju]})
    df["lo"] = np.minimum(df.qid, df.nid)
    df["hi"] = np.maximum(df.qid, df.nid)
    df = df.sort_values(["sim", "lo", "hi"], ascending=[False, True, True])
    return [(int(r.lo), int(r.hi), float(r.sim)) for r in df.head(k).itertuples()]


def _corpus(n_reps=30, seed=7):
    """n_reps distinct unit-ish vectors + one DUPLICATED zero vector.

    distinct reps (incl. the zero group) > k, so every rep pair block takes
    the threshold branch; the zero rows previously contributed >=k NaN
    cells there, collapsing the block to empty."""
    rng = np.random.RandomState(seed)
    rows = [(i, rng.randn(D).tolist()) for i in range(1, n_reps + 1)]
    rows += [(1000, [0.0] * D), (1001, [0.0] * D)]
    return rows


def test_threshold_branch_survives_zero_norm_rows(spark):
    rows = _corpus()
    emb = _emb(spark, rows)
    k = 5
    want = _brute_topk(rows, k)
    for df in (
        cosine_topk_pairs(emb, k=k),
        cosine_topk_pairs_sharded(emb, k=k, n_shards=2),
    ):
        got = [(int(r.qid), int(r.nid), float(r.sim)) for r in df.collect()]
        assert len(got) == k, "block collapsed to empty under NaN threshold"
        assert got == want
        assert all(np.isfinite(s) for _, _, s in got)
        assert not any(q >= 1000 or n >= 1000 for q, n, _ in got)


def test_partial_nan_cells_lose_no_valid_pairs():
    """<k NaN cells: the old kernel silently displaced up to #NaN valid
    pairs from the local top-k. Feed the kernel a matrix with one NaN row
    directly (bypassing _norm_rows) to pin the sanitize."""
    rng = np.random.RandomState(3)
    n, k = 12, 8
    ids = np.arange(n, dtype=np.int64)
    m = rng.randn(n, D)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    bad = m.copy()
    bad[n - 1] = np.nan  # one NaN row -> n-1 NaN cells in the ordered block
    ref = S._block_pairs_topk(ids[:-1], m[:-1], ids[:-1], m[:-1], k, 6, True)
    got = S._block_pairs_topk(ids, bad, ids, bad, k, 6, True)
    assert got[["qid", "nid"]].values.tolist() == ref[["qid", "nid"]].values.tolist()
    assert np.isfinite(got.sim.to_numpy()).all()


def test_norm_helpers_drop_zero_rows(spark):
    pdf = pd.DataFrame(
        {"vec_id": [1, 2, 3], "embedding": [[1.0, 0.0], [0.0, 0.0], [0.0, 2.0]]}
    )
    ids, m = S._norm_rows(pdf)
    assert ids.tolist() == [1, 3]
    assert np.isfinite(m).all()
    emb = _emb(spark, [(1, [1.0] * D), (2, [0.0] * D)])
    ids2, m2 = S._normalized_matrix(emb)
    assert ids2.tolist() == [1] and np.isfinite(m2).all()


def test_null_embeddings_keep_their_group(spark):
    rows = [
        (1, [1.0] * D),
        (2, [1.0] * D),
        (3, None),
        (4, None),
        (5, [0.0, 1.0] + [0.0] * (D - 2)),
    ]
    emb = _emb(spark, rows)
    mem = {
        (r.vec_id, r.gid, r.gsz) for r in embedding_dup_groups(emb).collect()
    }
    # NULL rows are no longer dropped: they form their own duplicate group
    assert mem == {(1, 1, 2), (2, 1, 2), (3, 3, 2), (4, 3, 2), (5, 5, 1)}
    _, reps = embedding_dup_tables(emb)
    rep_rows = reps.collect()
    assert {r.vec_id for r in rep_rows} == {1, 5}  # NULL group not a kernel rep
    assert all(r.embedding is not None for r in rep_rows)
    # end-to-end: kernels run clean on a corpus containing NULL embeddings,
    # and the NULL group synthesizes no self pair (nz is NULL -> excluded)
    top = cosine_topk_pairs(emb, k=10).toPandas()
    ids = set(zip(top.qid, top.nid))
    assert (3, 4) not in ids and (1, 2) in ids
    assert np.isfinite(top.sim).all()


def test_maxsim_labels_stay_aligned_after_zero_drop(spark):
    """block_max extracts labels from the frame separately from _norm_rows'
    matrices — the zero-drop must happen on the FRAME first or labels
    misalign. Value check vs the same corpus with zero rows pre-filtered."""
    rng = np.random.RandomState(11)
    rows, rid = [], 1
    for lab in (0, 1, 2):
        for _ in range(4):
            rows.append((rid, lab, rng.randn(8).tolist()))
            rid += 1
    rows.append((rid, 0, [0.0] * 8))  # zero-norm row inside label 0
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    clean = spark.createDataFrame(
        rows[:-1], "vec_id long, label int, embedding array<float>"
    )
    got = {
        (r.qlabel, r.dlabel): r.maxsim
        for r in maxsim_label_scores_sharded(df, n_shards=2).collect()
    }
    want = {
        (r.qlabel, r.dlabel): r.maxsim
        for r in maxsim_label_scores_sharded(clean, n_shards=2).collect()
    }
    assert got == want
    assert all(np.isfinite(v) for v in got.values())
