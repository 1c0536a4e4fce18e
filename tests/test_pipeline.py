"""End-to-end corpus-cleaning pipeline + operator edge cases (empty inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cbde_mapreduce_spark.operators.asof import asof_join
from cbde_mapreduce_spark.operators.dedup import jaccard_pairs, minhash_lsh_neardup
from cbde_mapreduce_spark.operators.pipeline import canonical_drop_ids, clean_corpus
from cbde_mapreduce_spark.operators.similarity import cosine_topk_pairs
from cbde_mapreduce_spark.sources import load_table


def test_clean_corpus_keeps_component_canonical_min(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    cleaned = clean_corpus(docs, neardup_threshold=0.5, min_tokens=10)
    n_in, n_out = docs.count(), cleaned.count()
    assert n_out < n_in
    # component policy: of every near-dup connected component exactly the
    # min doc_id survives; docs outside the pair graph are untouched
    pairs = minhash_lsh_neardup(docs, threshold=0.5).toPandas()
    kept = set(cleaned.select("doc_id").toPandas().doc_id)
    # every doc_b has a smaller neighbour (pairs are emitted doc_a < doc_b),
    # so no doc_b can be its component's min => must be dropped
    for b in set(pairs.doc_b):
        assert b not in kept, f"non-min member {b} survived"
    # cleaned corpus has no remaining near-dup pairs at the threshold
    assert jaccard_pairs(cleaned, threshold=0.5).count() == 0
    # idempotence: cleaning a clean corpus is a no-op
    assert clean_corpus(cleaned).count() == n_out


def test_canonical_drop_ids_component_not_pairwise(spark):
    """Pairs (1,3) and (2,3): greedy drop-higher keeps {1,2}; the component
    policy keeps exactly the min member 1 and drops {2,3}."""
    pairs = spark.createDataFrame([(1, 3), (2, 3)], "doc_a long, doc_b long")
    drops = sorted(r["__drop_id"] for r in canonical_drop_ids(pairs).collect())
    assert drops == [2, 3]


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
