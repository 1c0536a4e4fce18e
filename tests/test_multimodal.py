"""Multimodal binary plumbing: frame sampling, fake resize, codec stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cbde_mapreduce_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media,
    resize_media,
    sample_frames,
)
from cbde_mapreduce_spark.sources import load_table


def test_sample_frames_every_1_reassembles_payload(spark):
    """With every_k=1 the concatenated frames must equal the payload exactly
    (lossless chunking), in frame_idx order."""
    docs = spark.createDataFrame(
        [(1, "a" * 700), (2, "xyz"), (3, "b" * 256)], "doc_id long, text string"
    )
    mm = attach_binary_payload(docs)
    frames = sample_frames(mm, frame_bytes=256, every_k=1).toPandas()
    for doc_id, text in [(1, "a" * 700), (2, "xyz"), (3, "b" * 256)]:
        mine = frames[frames.doc_id == doc_id].sort_values("frame_idx")
        assert b"".join(bytes(x) for x in mine.frame) == text.encode()
    # 700 bytes -> 3 frames; 3 -> 1; 256 -> 1
    assert frames.groupby("doc_id").size().to_dict() == {1: 3, 2: 1, 3: 1}


def test_sample_frames_every_k_selects_even_indices(spark):
    docs = spark.createDataFrame([(1, "a" * 1300)], "doc_id long, text string")
    frames = sample_frames(
        attach_binary_payload(docs), frame_bytes=256, every_k=2
    ).toPandas()
    # 1300 bytes -> 6 frames (0..5) -> sampled 0, 2, 4
    assert sorted(frames.frame_idx) == [0, 2, 4]
    assert [len(bytes(x)) for x in frames.sort_values("frame_idx").frame] == [
        256,
        256,
        256,
    ]


def test_resize_media_fixed_output_contract(spark, sf_smoke):
    """Every output payload is exactly width*height bytes, stable across
    partitionings (deterministic fake — see operator docstring)."""
    docs = load_table(spark, sf_smoke, "documents").limit(20)
    mm = attach_binary_payload(docs)
    a = resize_media(mm, 16, 16).toPandas().set_index("doc_id")
    assert (a.pixels.map(lambda b: len(bytes(b))) == 256).all()
    assert (a.width == 16).all() and (a.height == 16).all()
    b = (
        resize_media(mm.repartition(7), 16, 16)
        .toPandas()
        .set_index("doc_id")
    )
    for i in a.index:
        assert bytes(a.loc[i, "pixels"]) == bytes(b.loc[i, "pixels"])


def test_decode_media_stub_raises_loudly():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(b"\x89PNG", "image/png")


def test_frame_sample_stats_matches_manual(spark, sf_smoke):
    from cbde_mapreduce_spark.plans import REGISTRY

    got = REGISTRY["frame_sample_stats"].fn(spark, sf_smoke).toPandas()
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", F.octet_length("text").alias("L")
    ).toPandas()
    for _, row in docs.iterrows():
        n_total = (row.L + 255) // 256
        want = (n_total + 1) // 2
        mine = got[got.doc_id == row.doc_id]
        assert int(mine.n_frames.iloc[0]) == want
