"""Multimodal-column queries (SURVEY.md §2.11): binary payload plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cbde_mapreduce_spark.operators.multimodal import (
    attach_binary_payload,
    extract_binary_features,
)
from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table


@query(
    "multimodal_binary_features",
    oracle="""
        SELECT doc_id, 'text/plain' AS kind,
               strlen(text)::bigint       AS n_bytes,
               md5(text)                  AS content_md5
        FROM documents
    """,
    category="multimodal",
)
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: attach payload → Arrow-batched feature extract.

    The payload is utf-8 text standing in for media bytes (codecs are
    stubbed, see operators/multimodal.py) — which makes the whole pipeline,
    including the mapInPandas batch path, oracle-checkable byte-for-byte.
    """
    docs = load_table(spark, sf_dir, "documents")
    return extract_binary_features(attach_binary_payload(docs))
