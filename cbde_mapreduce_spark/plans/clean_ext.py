"""Corpus-cleaning surface extensions (LLM-pipeline family, round-2 batch 3):
chunk-level exact dedup, edit-distance near-dup under blocking, and
stopword/array set-operations profiling.

These complement operators/dedup.py (doc-level exact/MinHash/SimHash) with
the sub-document granularity real cleaning pipelines use: repeated
boilerplate chunks dedup at chunk level even when whole documents differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table

CHUNK = 4  # tokens per chunk; sized so the sf0.01 fixture has real dups


@query(
    "chunk_dedup_docs",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ),
        idx AS (
            SELECT doc_id, ts,
                   unnest(generate_series(0, len(ts)//{CHUNK} - 1)) AS i
            FROM toks
        ),
        chunks AS (
            SELECT doc_id,
                   array_to_string(ts[(i*{CHUNK}+1):((i+1)*{CHUNK})], ' ') AS chunk
            FROM idx
        )
        SELECT chunk, count(*) AS n_occ, min(doc_id) AS keep_doc
        FROM chunks
        GROUP BY chunk
        HAVING count(*) > 1
    """,
    category="llm-pipeline",
)
def chunk_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup: fixed-size token windows that occur in more
    than one place, with the keep-first (min doc_id) policy.

    Sub-document dedup is how boilerplate (headers, license blocks, nav
    text) is stripped when whole-document hashes differ. The plan is a
    single explode → groupBy(chunk-text): at 100 TB you'd group on
    xxhash64(chunk) so the shuffle moves 8-byte keys (the exact trick
    dedup_exact_docs uses); here the chunk text IS the output so it stays
    the key. Chunks are non-overlapping (stride = width), so the explode
    is a 1→(len/4) fan-out, not the 1→len shingle fan-out of MinHash.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("ts")).withColumn(
        "nc", F.floor(F.size("ts") / CHUNK).cast("int")
    )
    chunks = (
        toks.filter(F.col("nc") >= 1)
        .select(
            "doc_id",
            "ts",
            F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("i"),
        )
        .select(
            "doc_id",
            F.array_join(
                F.slice("ts", F.col("i") * CHUNK + 1, CHUNK), " "
            ).alias("chunk"),
        )
    )
    return (
        chunks.groupBy("chunk")
        .agg(F.count("*").alias("n_occ"), F.min("doc_id").alias("keep_doc"))
        .filter(F.col("n_occ") > 1)
    )


@query(
    "edit_distance_neardup",
    oracle="""
        WITH d AS (
            SELECT doc_id, lang, n_chars // 50 AS len_bucket,
                   substr(text, 1, 40) AS prefix
            FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               levenshtein(a.prefix, b.prefix) AS dist
        FROM d a JOIN d b
          ON a.lang = b.lang AND a.len_bucket = b.len_bucket
         AND a.doc_id < b.doc_id
        WHERE levenshtein(a.prefix, b.prefix) <= 18
    """,
    category="llm-pipeline",
)
def edit_distance_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by Levenshtein distance on a 40-char prefix,
    under (lang, length-bucket) blocking.

    Edit distance is the classic fuzzy-match for short fields (titles,
    URLs, names). All-pairs levenshtein is O(n²·L²) and never survives
    scale; the standard fix is blocking — the equi-join on
    (lang, len_bucket) bounds candidates to same-block pairs, and the
    length bucket is sound because |len(a)−len(b)| is a levenshtein lower
    bound. At corpus scale the block key would be an LSH bucket
    (operators/dedup.py) instead of a length bucket; the join shape is
    identical. levenshtein() is a JVM built-in on both engines.

    Duplicate-collapse (round-6 scale fix): blocking bounds CANDIDATES but
    not duplication — k docs sharing one (lang, bucket, prefix) key are a
    k-clique, so the in-block join is Ω(dup²) levenshtein calls (the 100×
    replicated study timed the row-level join out; SCALING.md round 6).
    The compared field IS the group key, so the plan computes levenshtein
    once per DISTINCT-prefix pair within a block and expands: cross-group
    rep pairs that pass the cutoff fan out to member id pairs (symmetric
    metric, so orientation is free), and same-prefix groups expand to
    dist-0 cliques directly — that part of the output is inherently
    quadratic, but the remaining work is output-proportional, never
    levenshtein-quadratic. NULL lang/bucket/prefix groups never self-pair
    (the oracle's equi-join and levenshtein both reject NULLs).
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 50).cast("long").alias("len_bucket"),
        F.substring("text", 1, 40).alias("prefix"),
    )
    wga = Window.partitionBy("lang", "len_bucket", "prefix")
    mem = d.withColumn("gid", F.min("doc_id").over(wga))
    reps = mem.filter(F.col("doc_id") == F.col("gid")).select(
        "gid", "lang", "len_bucket", "prefix"
    )
    a = reps.alias("a")
    b = reps.alias("b")
    rep_pairs = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.gid") < F.col("b.gid")),
        )
        .select(
            F.col("a.gid").alias("ga"),
            F.col("b.gid").alias("gb"),
            F.levenshtein(F.col("a.prefix"), F.col("b.prefix")).alias("dist"),
        )
        .filter(F.col("dist") <= 18)
    )
    ids = mem.select("gid", "doc_id")
    ex_cross = (
        rep_pairs.join(ids.select(F.col("gid").alias("ga"), F.col("doc_id").alias("ia")), "ga")
        .join(ids.select(F.col("gid").alias("gb"), F.col("doc_id").alias("ib")), "gb")
        .select(
            F.least("ia", "ib").alias("doc_a"),
            F.greatest("ia", "ib").alias("doc_b"),
            "dist",
        )
    )
    nn = mem.filter(
        F.col("lang").isNotNull()
        & F.col("len_bucket").isNotNull()
        & F.col("prefix").isNotNull()
    ).select("gid", "doc_id")
    m1 = nn.select("gid", F.col("doc_id").alias("doc_a"))
    m2 = nn.select("gid", F.col("doc_id").alias("doc_b"))
    ex_self = (
        m1.join(m2, "gid")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(0).cast("int").alias("dist"))
    )
    return ex_cross.unionByName(ex_self)


_STOPWORDS = ["a", "the", "value", "table"]


@query(
    "stopword_array_ops_docs",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ),
        d AS (
            SELECT doc_id, ts, list_distinct(ts) AS dts FROM t
        )
        SELECT doc_id,
               len(ts)  AS n_tokens,
               len(dts) AS n_distinct,
               len(list_filter(dts,
                   t -> list_contains({_STOPWORDS!r}, t)))   AS n_stop,
               array_to_string(list_sort(list_filter(dts,
                   t -> NOT list_contains({_STOPWORDS!r}, t))), ' ')
                                                             AS content_terms
        FROM d
    """,
    category="scalar",
)
def stopword_array_ops_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations per document: distinct vocabulary, stopword
    overlap (array_intersect) and the sorted residue (array_except).

    Everything is JVM array built-ins against a 4-element literal array —
    no shuffle at all: this is a pure map-side projection, the cheapest
    possible 100 TB shape. The array-valued intermediate never reaches the
    output; content_terms is serialized to a sorted space-joined string so
    the driver's canonicalizer hashes scalars (the collect_set_priorities
    round-1 lesson).
    """
    stop = F.array(*[F.lit(w) for w in _STOPWORDS])
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.split("text", " ").alias("ts")
    ).withColumn("dts", F.array_distinct("ts"))
    return d.select(
        "doc_id",
        F.size("ts").alias("n_tokens"),
        F.size("dts").alias("n_distinct"),
        F.size(F.array_intersect("dts", stop)).alias("n_stop"),
        F.array_join(F.array_sort(F.array_except("dts", stop)), " ").alias(
            "content_terms"
        ),
    )


SNM_WINDOW = 2  # neighbors compared per doc in sorted order
SNM_MAX_DIST = 80


@query(
    "sorted_neighborhood_neardup",
    oracle=f"""
        WITH s AS (SELECT doc_id, text,
                          lead(doc_id, 1) OVER w AS nd1,
                          lead(text, 1)   OVER w AS nt1,
                          lead(doc_id, 2) OVER w AS nd2,
                          lead(text, 2)   OVER w AS nt2
                   FROM documents
                   WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)),
        p AS (SELECT doc_id AS doc_a, nd1 AS doc_b,
                     levenshtein(text, nt1)::bigint AS dist
              FROM s WHERE nd1 IS NOT NULL
              UNION ALL
              SELECT doc_id, nd2, levenshtein(text, nt2)::bigint
              FROM s WHERE nd2 IS NOT NULL)
        SELECT doc_a, doc_b, dist
        FROM p WHERE dist <= {SNM_MAX_DIST}
    """,
    category="cleaning",
)
def sorted_neighborhood_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-duplicate candidates: sort docs by
    (lang, n_chars), compare each doc to its next 2 neighbors in sorted
    order, keep pairs with edit distance ≤ 80.

    Sorted-neighborhood blocking (Hernández & Stolfo's merge/purge) is the
    third blocking family beside hashing (MinHash-LSH) and sign-projection
    (SimHash): ONE partitioned sort, w−1 lead columns, and only w·n
    comparisons total — no candidate blow-up on skewed buckets, at the cost
    of missing near-dups whose sort keys diverge. The sort partitions by
    lang (sort cost is per-language, never global). Cross-engine
    caveat (found by the round-4 Unicode sweep): the distances agree
    exactly on ASCII text, but Spark's levenshtein counts CODEPOINTS
    while DuckDB's counts BYTES — on multibyte text (é=2, 東=3, 🚀=4
    bytes) the two disagree and threshold membership can differ. The
    engine keeps the codepoint semantics (the linguistically meaningful
    edit distance); the oracle check is exact on the ASCII fixtures and
    the divergence is allowlisted in tests/test_unicode_input.py.

    Duplicate-collapse of the verify step (round-8, VERDICT r7 ask #5 —
    this operator predated the r6 campaign pattern in this one spot): on a
    dup-heavy corpus the sorted sequence repeats the SAME text pairs over
    and over (100× replication: each replica's per-bucket neighbor chain
    is the same text sequence), so the O(L²) edit-distance DP ran once per
    DOC pair where once per distinct TEXT pair suffices. The neighbor
    window itself must see every doc (the output is doc-level adjacency;
    the oracle is unchanged), but it now rides on (doc_id, n_chars, gid)
    with NO text payload — the per-lang sort moves ~24 bytes/row instead
    of the document body — and the DP runs once per distinct (ga, gb) pair
    joined back to the representative texts; doc pairs recover their
    distance by an equi-join on the gid pair. Exactness: gid = min doc_id
    per (lang, text) is an equality WITNESS, so two doc pairs share
    (ga, gb) iff their text pairs are identical — no hashing, no collision
    risk. Equal-gid pairs (identical texts) are distance 0 by definition:
    no DP, no rep join (the round-6 equal-text shortcut, now group-level).
    The DP itself is BANDED (levenshtein's threshold arg, O(L·81) not
    O(L²)): a distance above the cutoff returns -1, which the ≤ 80 filter
    rejects exactly like the true value, and kept distances are exact
    below the band — so the 100-TB mostly-distinct regime is also covered,
    where collapse alone wins nothing.
    """
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "text").agg(F.min("doc_id").alias("gid"))
    d2 = docs.join(
        g.select(
            F.col("lang").alias("__gl"), F.col("text").alias("__gt"), "gid"
        ),
        F.col("lang").eqNullSafe(F.col("__gl"))
        & F.col("text").eqNullSafe(F.col("__gt")),
    ).select(
        "doc_id",
        "lang",
        "n_chars",
        "gid",
        # NULL texts ride the window like any doc (they shift everyone
        # else's neighbors), but levenshtein(NULL, ·) is NULL on both
        # engines and the ≤ 80 filter drops it — so the equal-gid
        # distance-0 shortcut below must NOT fire for the NULL-text group
        F.col("__gt").isNotNull().alias("tnn"),
    )
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    s = d2.select(
        "doc_id",
        "gid",
        "tnn",
        F.lead("doc_id", 1).over(w).alias("nd1"),
        F.lead("gid", 1).over(w).alias("ng1"),
        F.lead("doc_id", 2).over(w).alias("nd2"),
        F.lead("gid", 2).over(w).alias("ng2"),
    )
    p1 = s.filter(F.col("nd1").isNotNull()).select(
        F.col("doc_id").alias("doc_a"),
        F.col("nd1").alias("doc_b"),
        F.col("gid").alias("ga"),
        F.col("ng1").alias("gb"),
        "tnn",
    )
    p2 = s.filter(F.col("nd2").isNotNull()).select(
        F.col("doc_id").alias("doc_a"),
        F.col("nd2").alias("doc_b"),
        F.col("gid").alias("ga"),
        F.col("ng2").alias("gb"),
        "tnn",
    )
    pairs = p1.unionByName(p2)
    reps = g.select("gid", "text")
    dp = (
        pairs.filter(F.col("ga") != F.col("gb"))
        .select("ga", "gb")
        .distinct()
        .join(reps.select(F.col("gid").alias("ga"), F.col("text").alias("ta")), "ga")
        .join(reps.select(F.col("gid").alias("gb"), F.col("text").alias("tb")), "gb")
        .select(
            "ga",
            "gb",
            F.levenshtein("ta", "tb", SNM_MAX_DIST + 1).cast("bigint").alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= SNM_MAX_DIST))
    )
    same = pairs.filter((F.col("ga") == F.col("gb")) & F.col("tnn")).select(
        "doc_a", "doc_b", F.lit(0).cast("bigint").alias("dist")
    )
    diff = pairs.join(dp, ["ga", "gb"]).select("doc_a", "doc_b", "dist")
    return same.unionByName(diff)


PREFIX_TOKENS = 8


@query(
    "boilerplate_prefixes_docs",
    oracle=f"""
        WITH p AS (SELECT doc_id,
                          array_to_string(string_split(text, ' ')[1:{PREFIX_TOKENS}],
                                          ' ') AS prefix
                   FROM documents)
        SELECT prefix,
               count(*)::bigint AS n_docs,
               min(doc_id)      AS first_doc
        FROM p
        GROUP BY prefix
        HAVING count(*) >= 2
    """,
    category="cleaning",
)
def boilerplate_prefixes_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-prefix boilerplate detector: documents opening with the same
    first 8 tokens (headers, licence banners, templated intros — the
    highest-yield target of boilerplate stripping, which near-dup passes
    miss because the BODIES differ).

    One projection (slice + join of the token array) and one map-side-
    combinable groupBy on the prefix string; emitting only groups ≥ 2 keeps
    the output the action list (what to strip), not the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    p = docs.select(
        "doc_id",
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, PREFIX_TOKENS), " "
        ).alias("prefix"),
    )
    return (
        p.groupBy("prefix")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )
