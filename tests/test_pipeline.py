"""End-to-end corpus-cleaning pipeline + operator edge cases (empty inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cbde_mapreduce_spark.operators.asof import asof_join
from cbde_mapreduce_spark.operators.dedup import jaccard_pairs, minhash_lsh_neardup
from cbde_mapreduce_spark.operators.pipeline import clean_corpus
from cbde_mapreduce_spark.operators.similarity import cosine_topk_pairs
from cbde_mapreduce_spark.sources import load_table


def test_clean_corpus_drops_neardups_and_nothing_else_unexpected(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    cleaned = clean_corpus(docs, neardup_threshold=0.5, min_tokens=10)
    n_in, n_out = docs.count(), cleaned.count()
    assert n_out < n_in
    # drop-higher-id policy: a doc survives iff it never appears as the
    # higher id of a near-dup pair (chains may drop a doc that is also a
    # lower id elsewhere)
    pairs = minhash_lsh_neardup(docs, threshold=0.5).toPandas()
    kept = set(cleaned.select("doc_id").toPandas().doc_id)
    dropped = set(pairs.doc_b)
    for b in dropped:
        assert b not in kept, f"higher id {b} of near-dup pair survived"
    for a in set(pairs.doc_a) - dropped:
        assert a in kept, f"keeper {a} was dropped"
    # cleaned corpus has no remaining near-dup pairs at the threshold
    assert jaccard_pairs(cleaned, threshold=0.5).count() == 0
    # idempotence: cleaning a clean corpus is a no-op
    assert clean_corpus(cleaned).count() == n_out


def test_operators_on_empty_inputs(spark):
    empty_docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert jaccard_pairs(empty_docs).count() == 0
    assert minhash_lsh_neardup(empty_docs).count() == 0
    assert clean_corpus(empty_docs).count() == 0

    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    assert cosine_topk_pairs(empty_emb, k=10, parallelism=1).count() == 0

    left = spark.createDataFrame(
        [(1, 5, "2024-01-01T00:00:00")], "event_id long, user_id long, s string"
    ).select("event_id", "user_id", F.to_timestamp("s").cast("timestamp_ntz").alias("ts"))
    empty_right = spark.createDataFrame([], "user_id long, ts timestamp_ntz, v double")
    out = asof_join(left, empty_right, by="user_id", ts="ts", value_cols=["v"]).collect()
    assert len(out) == 1 and out[0].v is None
