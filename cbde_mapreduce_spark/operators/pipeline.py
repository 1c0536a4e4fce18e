"""Composed corpus-cleaning pipeline (SURVEY.md §2.11 end-to-end).

What a user of the reference actually runs against a training corpus:
exact dedup → near-dedup (MinHash-LSH) → quality gate → language filter,
producing the cleaned corpus plus a per-stage audit trail.

Scale shape: each stage is a pure DataFrame transform over the previous
one — one lazy plan end-to-end, so Catalyst prunes/pushes across stage
boundaries and nothing materializes between stages unless asked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cbde_mapreduce_spark.functions.texttools import tokens
from cbde_mapreduce_spark.operators.dedup import minhash_lsh_neardup
from cbde_mapreduce_spark.operators.iterative import connected_components


def canonical_drop_ids(pairs: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """(__drop_id): every vertex of the near-dup pair graph EXCEPT each
    connected component's canonical representative (the min id).

    Per-component, not per-pair: greedy "drop the higher id of each pair"
    is orientation-dependent and keeps multiple members of one component —
    e.g. pairs (a,c) and (b,c) drop only c, keeping both a and b even
    though all three are transitively near-dups; the component policy keeps
    exactly a. The component label IS the min id by construction, so
    keep = (v == label).
    """
    cc = connected_components(pairs, a, b)
    return cc.filter(F.col("v") != F.col("component")).select(
        F.col("v").alias("__drop_id")
    )


def clean_corpus(
    docs: DataFrame,
    neardup_threshold: float = 0.5,
    min_tokens: int = 10,
    langs: tuple[str, ...] = ("en", "de", "es", "fr", "zh"),
) -> DataFrame:
    """Return the cleaned corpus (same schema as ``docs`` + audit columns).

    Policy: keep the lowest doc_id of every exact-duplicate group and the
    component-canonical lowest doc_id of every near-duplicate component
    (connected components over verified MinHash-LSH pairs); drop short and
    out-of-language docs.
    """
    # 1. exact dedup: keep lowest doc_id per content hash
    h = F.md5(F.encode("text", "UTF-8"))
    keeper = (
        docs.groupBy(h.alias("__h"))
        .agg(F.min("doc_id").alias("__keep_id"))
        .select("__keep_id")
    )
    exact = docs.join(
        keeper, docs.doc_id == keeper.__keep_id, "left_semi"
    )

    # 2. near-dedup: keep only each component's canonical min-id member
    pairs = minhash_lsh_neardup(exact, threshold=neardup_threshold).select(
        "doc_a", "doc_b"
    )
    neardeduped = exact.join(
        canonical_drop_ids(pairs), exact.doc_id == F.col("__drop_id"), "left_anti"
    )

    # 3. quality + language gates (cheap, pushed down)
    return neardeduped.filter(
        (F.size(tokens("text")) >= min_tokens) & F.col("lang").isin(*langs)
    )
