"""LLM-pipeline part-2 operators: distributed prefix sum, packing,
decontamination, domain mixing. (Value parity vs DuckDB is covered for all
oracled queries by tests/test_parity.py; these assert the operator-level
contracts the oracle can't see.)"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cbde_mapreduce_spark.operators.prefix import exclusive_prefix_sum
from cbde_mapreduce_spark.plans import REGISTRY
from cbde_mapreduce_spark.sources import load_table


def _doc_tokens(spark, sf):
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )


def test_prefix_sum_matches_naive_global_window(spark, sf_oracle):
    """Two-phase distributed prefix sum == single-partition window twin."""
    t = _doc_tokens(spark, sf_oracle)
    dist = exclusive_prefix_sum(t, "doc_id", "n_tok", num_partitions=7)
    naive_w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = t.withColumn(
        "start_off", F.coalesce(F.sum("n_tok").over(naive_w), F.lit(0)).cast("bigint")
    )
    a = {r.doc_id: r.start_off for r in dist.collect()}
    b = {r.doc_id: r.start_off for r in naive.collect()}
    assert a == b


def test_prefix_sum_no_single_partition_exchange(spark, sf_oracle):
    """The scale contract: no Exchange SinglePartition on the distributed path."""
    t = _doc_tokens(spark, sf_oracle)
    plan = exclusive_prefix_sum(t, "doc_id", "n_tok")._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_pack_sequences_conservation(spark, sf_oracle):
    """Packing moves every doc exactly once and conserves token mass."""
    out = REGISTRY["pack_sequences_chunked"].fn(spark, sf_oracle).toPandas()
    t = _doc_tokens(spark, sf_oracle).toPandas()
    assert out.n_docs.sum() == len(t)
    assert out.seq_tokens.sum() == t.n_tok.sum()
    # chunk semantics: sequences are contiguous doc_id ranges
    srt = out.sort_values("seq_id").reset_index(drop=True)
    assert (srt.first_doc.iloc[1:].to_numpy() == srt.last_doc.iloc[:-1].to_numpy() + 1).all()


def test_decontaminate_excludes_benchmark_docs(spark, sf_oracle):
    out = REGISTRY["decontaminate_docs"].fn(spark, sf_oracle).toPandas()
    assert len(out) > 0, "vacuous: no contaminated docs at sf0.01"
    assert (out.doc_id % 50 != 0).all()
    assert (out.n_shared >= 1).all()


def test_domain_mix_rates_respected(spark, sf_oracle):
    from cbde_mapreduce_spark.plans.llm_pipeline import MIX_RATES

    out = REGISTRY["domain_mix_sample"].fn(spark, sf_oracle).toPandas()
    rates = dict(MIX_RATES)
    assert set(out.source) == set(rates)
    assert ((out.n_kept >= 0) & (out.n_kept <= out.n_total)).all()
    # determinism: a second run keeps the identical sample
    again = REGISTRY["domain_mix_sample"].fn(spark, sf_oracle).toPandas()
    merged = out.merge(again, on="source")
    assert (merged.n_kept_x == merged.n_kept_y).all()
