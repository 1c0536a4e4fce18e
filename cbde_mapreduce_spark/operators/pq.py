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
    d = x.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    sub = d // m
    books = np.empty((m, k, sub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cent = xs[:k].copy()
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
    """
    spark = emb.sparkSession
    books = pq_train_codebooks(emb, m=m, k=n_centroids, n_sample=n_sample, seed=seed)
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
                dists[t_ids == q_ids[qi]] = np.inf  # exclude self
                order = np.lexsort((t_ids, dists))[:k]
                yield pd.DataFrame(
                    {
                        "qid": q_ids[qi],
                        "nid": t_ids[order],
                        "adc_dist": np.round(dists[order], 6),
                    }
                )

    pairs = emb.select("vec_id", "embedding").mapInPandas(
        adc, "qid bigint, nid bigint, adc_dist double"
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adc_dist"), F.asc("nid"))
    return pairs.withColumn("rn", F.row_number().over(w).cast("bigint")).filter(
        F.col("rn") <= k
    )
