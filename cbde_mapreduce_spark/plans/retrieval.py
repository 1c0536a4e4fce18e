"""Hybrid retrieval: reciprocal-rank fusion of lexical (BM25) and dense
(embedding-cosine) rankings — the standard RAG retrieval stack expressed as
one declarative plan (SURVEY.md §2.11 widened).

RRF (Cormack et al. 2009): score(d) = Σ_lists 1/(K + rank_list(d)), summed
over the lists that contain d. It needs only rank positions, never score
calibration across systems — which is exactly why it fuses a BM25 list and a
cosine list without normalization.

Scale shape: each ranking list is produced by its own corpus-scale plan
(BM25 = broadcast-pruned postings join, dense = broadcast of ONE query
vector), truncated to the top-L spine via TakeOrdered. Rank assignment and
the fusion join then run over ≤2·L rows — driver-independent, bounded by the
list depth, not the corpus. The fusion itself is a full outer join on doc_id
over those bounded lists.

Determinism discipline: ranks are assigned over ROUNDED scores (6 dp) with a
doc_id tiebreak on both engines, so cross-engine float noise below the
rounding grain cannot flip a rank; the fused score is then exact rational
arithmetic over integer ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cbde_mapreduce_spark.functions.vectors import dot, l2_norm
from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table
from cbde_mapreduce_spark.plans.similarity_q import (
    _NONZERO_SQL,
    _nonzero_embeddings,
)

RRF_K = 60  # the canonical constant from the RRF paper
RRF_DEPTH = 50  # per-system list depth L
RRF_QUERY_DOC = 0  # fixture doc/vector serving as the query
RRF_TOP = 10

_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 scores of every document against doc 0's terms (same kernel and
    constants as plans/text.py::bm25_topk_docs, without the final top-k)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t"))
    tf = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).cast("double").alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("len"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.avg("len").alias("avglen")
    )
    df = tf.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("df"))
    q = tf.filter(F.col("doc_id") == RRF_QUERY_DOC).select("t").distinct()
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    norm = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("len") / F.col("avglen")
    )
    return (
        tf.join(F.broadcast(q), "t")
        .filter(F.col("doc_id") != RRF_QUERY_DOC)
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(df, "t")
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * (_BM25_K1 + 1) / norm).alias("score"))
    )


_RRF_ORACLE = f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
                 FROM documents),
    tf AS (SELECT doc_id, t, count(*)::double AS tf FROM tok GROUP BY doc_id, t),
    dl AS (SELECT doc_id, count(*)::double AS len FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*)::double AS n, avg(len) AS avglen FROM dl),
    idf AS (SELECT t, count(*)::double AS df FROM tf GROUP BY t),
    q AS (SELECT DISTINCT t FROM tf WHERE doc_id = {RRF_QUERY_DOC}),
    bm AS (SELECT tf.doc_id,
                  sum(ln((stats.n - idf.df + 0.5) / (idf.df + 0.5) + 1)
                      * (tf.tf * ({_BM25_K1} + 1))
                      / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                         + {_BM25_B} * dl.len / stats.avglen))) AS score
           FROM tf JOIN q USING (t)
                   JOIN dl USING (doc_id)
                   CROSS JOIN stats
                   JOIN idf USING (t)
           WHERE tf.doc_id <> {RRF_QUERY_DOC}
           GROUP BY tf.doc_id),
    lexr AS (SELECT doc_id,
                    row_number() OVER (ORDER BY round(score, 6) DESC, doc_id)
                      AS lex_rank
             FROM bm),
    lex AS (SELECT doc_id, lex_rank FROM lexr WHERE lex_rank <= {RRF_DEPTH}),
    nrm AS (SELECT vec_id, embedding,
                   sqrt(list_sum(list_transform(embedding,
                        x -> x::double * x::double))) AS nrm
            FROM embeddings
            WHERE {_NONZERO_SQL}),
    qv AS (SELECT embedding AS e, nrm AS qn FROM nrm
           WHERE vec_id = {RRF_QUERY_DOC}),
    ds AS (SELECT n.vec_id AS doc_id,
                  round(list_sum(list_transform(list_zip(n.embedding, qv.e),
                        z -> z[1]::double * z[2]::double)) / (n.nrm * qv.qn), 6)
                    AS sim
           FROM nrm n CROSS JOIN qv
           WHERE n.vec_id <> {RRF_QUERY_DOC}),
    dsr AS (SELECT doc_id,
                   row_number() OVER (ORDER BY sim DESC, doc_id) AS dense_rank
            FROM ds),
    dense AS (SELECT doc_id, dense_rank FROM dsr
              WHERE dense_rank <= {RRF_DEPTH}),
    fused AS (SELECT coalesce(lex.doc_id, dense.doc_id) AS doc_id,
                     lex.lex_rank, dense.dense_rank,
                     round(coalesce(1.0 / ({RRF_K} + lex.lex_rank), 0)
                           + coalesce(1.0 / ({RRF_K} + dense.dense_rank), 0), 6)
                       AS rrf
              FROM lex FULL JOIN dense USING (doc_id))
    SELECT doc_id, lex_rank, dense_rank, rrf
    FROM fused
    ORDER BY rrf DESC, doc_id
    LIMIT {RRF_TOP}
"""


@query("hybrid_rrf_retrieval", oracle=_RRF_ORACLE, category="similarity")
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 list and the embedding-cosine list
    for the doc-0 query: top-10 fused results with each system's rank.

    The two candidate lists are truncated to L=50 by TakeOrdered BEFORE any
    global window runs, so the row_number windows operate on ≤L rows — the
    rank stage is bounded by the list depth regardless of corpus size. The
    fusion is a full outer join over those two bounded lists.
    """
    # lexical list: BM25 scores -> rounded -> top-L -> ranks over <=L rows
    lex = (
        _bm25_scores(spark, sf_dir)
        .select("doc_id", F.round("score", 6).alias("s"))
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(RRF_DEPTH)
        .withColumn(
            "lex_rank",
            F.row_number()
            .over(Window.orderBy(F.desc("s"), F.asc("doc_id")))
            .cast("bigint"),
        )
        .select("doc_id", "lex_rank")
    )
    # dense list: cosine vs the broadcast query vector -> top-L -> ranks
    emb = _nonzero_embeddings(spark, sf_dir)
    n = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    qv = F.broadcast(
        n.filter(F.col("vec_id") == RRF_QUERY_DOC).select(
            F.col("e").alias("qe"), F.col("nrm").alias("qn")
        )
    )
    dense = (
        n.filter(F.col("vec_id") != RRF_QUERY_DOC)
        .crossJoin(qv)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                dot(F.col("e"), F.col("qe")) / (F.col("nrm") * F.col("qn")), 6
            ).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(RRF_DEPTH)
        .withColumn(
            "dense_rank",
            F.row_number()
            .over(Window.orderBy(F.desc("sim"), F.asc("doc_id")))
            .cast("bigint"),
        )
        .select("doc_id", "dense_rank")
    )
    fused = lex.join(dense, "doc_id", "full").select(
        "doc_id",
        "lex_rank",
        "dense_rank",
        F.round(
            F.coalesce(1.0 / (RRF_K + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("dense_rank")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(RRF_TOP)
