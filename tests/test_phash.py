"""Perceptual-hash near-dup: distributed path vs single-process reference.

The pHash family has no SQL oracle (DCT); exactness is pinned here instead:

1. distributed hashes == the reference kernel run per-doc in-process;
2. banded candidate pairs == brute-force all-pairs hamming (pigeonhole
   guarantee: 8 bands of 8 bits has exact recall for hamming <= 7);
3. a planted byte-edited near-duplicate payload is recovered.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cbde_mapreduce_spark.operators.multimodal import (
    _phash_kernel,
    attach_binary_payload,
    perceptual_hash,
    phash_neardup_pairs,
)
from cbde_mapreduce_spark.sources import load_table

MAX_HAM = 14  # closest fixture pairs sit at hamming 14 (6 pairs at sf0.01)


@pytest.fixture(scope="module")
def payloads(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    return attach_binary_payload(docs).cache()


def test_distributed_hashes_match_reference(spark, payloads):
    got = {
        r["doc_id"]: r["phash"]
        for r in perceptual_hash(payloads).collect()
    }
    ref = {
        r["doc_id"]: _phash_kernel(bytes(r["payload"]))
        for r in payloads.collect()
    }
    assert got == ref


def test_banded_pairs_equal_bruteforce(spark, payloads):
    hashes = {
        r["doc_id"]: r["phash"] for r in perceptual_hash(payloads).collect()
    }
    ids = sorted(hashes)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(hashes[a] ^ hashes[b]).count("1") <= MAX_HAM
    }
    got = {
        (r["a"], r["b"])
        for r in phash_neardup_pairs(payloads, max_hamming=MAX_HAM).collect()
    }
    assert got == brute
    assert brute, "fixture produced no near-dup pairs — test is vacuous"


def test_planted_byte_edit_is_recovered(spark, payloads):
    # clone doc 0's payload with a tiny byte edit; the byte-grid resize
    # subsamples, so a localized edit moves few grid cells -> small hamming
    base = bytes(
        payloads.filter(F.col("doc_id") == 0).collect()[0]["payload"]
    )
    edited = base[:10] + b"x" + base[11:]
    clone = spark.createDataFrame(
        [(100000, edited, "text/plain", len(edited))],
        "doc_id bigint, payload binary, kind string, declared_bytes bigint",
    )
    both = payloads.filter(F.col("doc_id") == 0).unionByName(clone)
    pairs = phash_neardup_pairs(both, max_hamming=MAX_HAM).collect()
    assert any(r["a"] == 0 and r["b"] == 100000 for r in pairs)
