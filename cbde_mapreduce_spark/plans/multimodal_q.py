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


@query(
    "frame_sample_stats",
    oracle="""
        SELECT doc_id,
               ((strlen(text) + 255) // 256 + 1) // 2                  AS n_frames,
               list_sum(list_transform(
                   range(0, (strlen(text) + 255) // 256, 2),
                   i -> least(256, strlen(text) - i * 256)))::bigint   AS sampled_bytes
        FROM documents
        WHERE strlen(text) > 0
    """,
    category="multimodal",
)
def frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing, oracle-checked via its stats: every 2nd
    256-byte frame of each payload; per-doc emitted-frame count and sampled
    byte total must match DuckDB's arithmetic over the text length.
    Exercises the 1→N binary mapInPandas path end-to-end.
    """
    from pyspark.sql import functions as F

    from cbde_mapreduce_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_binary_payload(docs), frame_bytes=256, every_k=2)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum(F.octet_length("frame")).cast("bigint").alias("sampled_bytes"),
    )


@query("phash_neardup_media", oracle=None, category="multimodal")
def phash_neardup_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-fingerprint near-duplicate pairs over the binary payload
    column: byte-grid 'resize' → 2-D DCT → 63-bit sign hash → 16×4-bit band
    blocking → exact popcount verify (hamming <= 14; non-vacuous at this
    fixture, where the closest payload pairs sit at distance 14).

    Rows-only by design: the DCT kernel is not SQL-expressible. Exactness
    is covered in pytest instead (tests/test_phash.py): the banded pair set
    is asserted equal to the brute-force all-pairs hamming set (the
    pigeonhole guarantee), the distributed hashes equal the single-process
    reference kernel, and a byte-edited planted near-dup is recovered.
    """
    docs = load_table(spark, sf_dir, "documents")
    from cbde_mapreduce_spark.operators.multimodal import phash_neardup_pairs

    return phash_neardup_pairs(attach_binary_payload(docs), max_hamming=14)
