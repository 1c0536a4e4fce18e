"""Recommender primitives over implicit feedback (SURVEY.md §2 widened):
item-item collaborative filtering on the customer→part purchase incidence.

The MR lineage is the classic "people who bought X also bought Y"
co-occurrence job: shuffle the (user, item) incidence on the user key,
emit item pairs per basket, reduce to co-occurrence counts, normalize to
cosine. Spark-first, that is one distinct + one self-join on the basket key
+ one combinable groupBy — no matrix library, no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cbde_mapreduce_spark.operators.gates import maybe_broadcast
from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table

_CF_MIN_CO = 5  # pair support floor (sf0.01-tuned: keeps ~1k candidate pairs)
_CF_TOP = 20

_CF_ORACLE = f"""
    WITH b AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               WHERE o_custkey IS NOT NULL AND l_partkey IS NOT NULL),
    pop AS (SELECT p, count(*)::double AS n FROM b GROUP BY p),
    co AS (SELECT x.p AS p1, y.p AS p2, count(*)::double AS co
           FROM b x JOIN b y ON x.c = y.c AND x.p < y.p
           GROUP BY x.p, y.p
           HAVING count(*) >= {_CF_MIN_CO}),
    sc AS (SELECT p1, p2, co,
                  round(co / sqrt(n1.n * n2.n), 6) AS cosine
           FROM co JOIN pop n1 ON co.p1 = n1.p
                   JOIN pop n2 ON co.p2 = n2.p)
    SELECT p1, p2, co::bigint AS co, cosine
    FROM sc
    ORDER BY cosine DESC, p1, p2
    LIMIT {_CF_TOP}
"""


@query("item_item_cf_topk", oracle=_CF_ORACLE, category="recsys")
def item_item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: top-20 part pairs by cosine
    similarity over binary customer-purchase vectors, with a pair-support
    floor (co-occurrence >= 5).

    cosine(i,j) = |U_i ∩ U_j| / sqrt(|U_i|·|U_j|) — computed basket-major:
    one customer-keyed exchange builds each customer's sorted distinct
    item array, ordered pairs stream out of a codegen explode (round 10;
    previously a basket self-join — same pairs, three fewer
    incidence-sized exchanges), so the big shuffle carries packed pair
    keys, never an items×items matrix. The support floor is applied
    DURING the co-occurrence reduce (HAVING on the combinable count), so
    sub-threshold pairs die in the aggregation, not in a later filter.

    At 100 TB two standard guards bound the self-join fan-out: cap basket
    size (a user with B items emits B² pairs — truncate or sample whale
    baskets, exactly the triangle-count orientation concern), and prune
    items below minimum support BEFORE pairing (an item appearing once
    cannot reach any co-occurrence floor). Item popularity has one row per
    DISTINCT ITEM — catalog-sized, not bounded — so its join is SIZE-GATED
    (round-7 audit, same class as the sparse-cosine norm table): it
    broadcasts only while the part dimension's measured count (a provable
    upper bound on |pop|) stays under operators/gates.py::BCAST_MAX_ROWS;
    past the gate the join shuffles on the p1/p2 keys the co-occurrence
    reduce already produced.

    Pair-reduce memory shape (round-8, the sf10 aged-session fix): the
    incidence is ~97% UNIQUE at the pair level (sf0.1: 12.7M distinct of
    13.1M generated pairs), so map-side partial aggregation compresses
    nothing while building a per-task hash map as large as the task's
    whole pair stream — at 100× replication that was 32 tasks × ~40M-entry
    maps, the GC-thrash regime behind the one aged-JVM ERROR in SCALING.md
    round 7. The explicit repartition on the pair key between pair
    generation and the count removes the useless partial stage entirely:
    pair-emitting tasks STREAM the explode output into the shuffle with
    O(basket) memory (the largest live object is one customer's sorted
    item array), and the reduce side's
    task count scales with the measured incidence volume (one scalar
    count, ~100k incidence rows per reduce task) so each final hash map
    stays ~1-2M entries at any replication factor. Shuffle volume is
    unchanged (the partial agg was shuffling ~the same row count).
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # NULL keys carry NO basket semantics and must be dropped HERE: the
    # oracle's self-join on c discards a NULL customer (equi-join), but
    # groupBy(c) would happily build one giant NULL-customer basket and
    # mint pairs that never co-occurred (caught by the NULL-FK regime of
    # tests/test_skew_input.py on this round's basket-major rewrite);
    # likewise a NULL part key can never satisfy p1 < p2. The oracle's b
    # CTE carries the SAME explicit NULL filter (ADVICE r10 high): the
    # equi-join only hides NULLs from the PAIR side — a (NULL, p)
    # incidence row would still inflate pop's per-item denominator there
    # while this filtered incidence excludes it, skewing every cosine
    # that involves an item bought by a NULL customer (reproduced: 1.0 vs
    # 0.92582 on a crafted corpus). Popularity and pairs must count the
    # same universe on both engines; tests/test_advice_r11.py pins it
    # with a corpus where pairs SURVIVE the support floor next to NULL
    # customers, so the check can never pass vacuously again.
    inc = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_partkey").isNotNull() & F.col("o_custkey").isNotNull())
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
    )
    # Basket-major build (round 10): ONE customer-keyed exchange of the raw
    # incidence, deduped + sorted inside the aggregation
    # (array_distinct∘sort_array∘collect_list ≡ the old distinct + basket
    # self-join's per-customer item set, order made deterministic by the
    # sort). This replaces THREE incidence-sized exchanges — the (c, p)
    # distinct, then the x and y sides of the self-join — plus the
    # sort-merge-join machinery, with one exchange and a codegen explode.
    # Measured at sf1 (10×): end-to-end 19.9 s → 14.6 s; the saved time is
    # all exchange/SMJ constant factor, the inherent Σ B² pair stream is
    # untouched (see the infeasibility note below).
    bk = inc.groupBy("c").agg(
        F.array_distinct(F.sort_array(F.collect_list("p"))).alias("ps")
    )
    pop = (
        bk.select(F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    sh = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # |inc| <= |lineitem| (a projection of the join), so the lineitem row
    # count — parquet-metadata cheap — bounds the scaling
    pair_tasks = int(min(2048, max(sh, li.count() // 100_000)))
    # the pair exchange moves ~Σ B² rows — the dominant cost at replication
    # scale. While part keys fit 31 bits, pack the ordered pair into ONE
    # bigint inside the pair-emitting lambda: p1·2³² + p2 < 2⁶³, a third
    # less row width through the exchange and a single-long hash-aggregate
    # key; unpack is two bit ops. Past the gate the two-column join-based
    # pair generation is used unchanged (value-identical, pinned with the
    # gate forced in tests/test_gates.py).
    #
    # The gate measures min/max of the VALUES BEING PACKED's source column
    # (ADVICE r8): p1/p2 come from lineitem.l_partkey, and the part
    # dimension's max would not catch an orphan or negative FK — shiftright
    # is arithmetic, so an out-of-range key would silently corrupt the
    # pack/unpack. The join building ``inc`` can only drop values from
    # lineitem, never add, so lineitem's single-column min/max bounds
    # inc.p exactly; it is one cheap scalar agg on an already-loaded column.
    #
    # LOSSLESS-PRUNING INFEASIBILITY (VERDICT r9 ask #4, measured sf1): the
    # only bound available BEFORE counting a pair is popularity-based —
    # cosine(i,j) <= min(n_i,n_j)/sqrt(n_i·n_j) = sqrt(min/max) — and on
    # this corpus it has zero traction BY CONSTRUCTION: part choice is
    # TPC-H-uniform, so popularity spans only 11..53 at sf1 (median 30) and
    # the bound's floor over ALL pairs is sqrt(11/53) = 0.455, while the
    # 20th-best cosine (the cutoff a lossless prune must clear) is 0.154.
    # Every pair's bound exceeds the cutoff ⇒ no pair is excludable; the
    # same uniformity kills the min-popularity >= _CF_MIN_CO prune (min
    # popularity 11 > 5). Per-basket top-m truncation is NOT lossless (a
    # dropped co-occurrence changes co for a surviving pair). The Σ B²
    # exchange is therefore inherent to the exact top-k-by-cosine
    # semantics on uniform-popularity data; what this plan optimizes is
    # every constant factor around it. Skew-heavy real corpora are the
    # regime where the bound DOES prune — the sparse-cosine guard
    # (text.py) shows the pattern when popularity is Zipfian.
    n_parts = load_table(spark, sf_dir, "part").count()
    li_stats = li.agg(
        F.min("l_partkey").alias("mn"), F.max("l_partkey").alias("mx")
    ).collect()[0]
    min_part = li_stats["mn"] if li_stats["mn"] is not None else 0
    max_part = li_stats["mx"] if li_stats["mx"] is not None else 0
    if 0 <= min_part and max_part < 2**31:
        # successors of position i (0-based) in the sorted distinct item
        # array are exactly the j > i pairs; slice is 1-based and clips at
        # the array end, so (i+2, size) yields ps[i+1:].
        pks = bk.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ps",
                        lambda x, i: F.transform(
                            F.slice("ps", i + F.lit(2), F.size("ps")),
                            lambda y: x * F.lit(2**32) + y,
                        ),
                    )
                )
            ).alias("pk")
        )
        co = (
            pks.repartition(pair_tasks, "pk")
            .groupBy("pk")
            .agg(F.count(F.lit(1)).cast("double").alias("co"))
            .filter(F.col("co") >= _CF_MIN_CO)
            .select(
                F.shiftright("pk", 32).alias("p1"),
                F.col("pk").bitwiseAND(F.lit(2**32 - 1)).alias("p2"),
                "co",
            )
        )
    else:
        b = inc.distinct()
        x = b.select(F.col("c"), F.col("p").alias("p1"))
        y = b.select(F.col("c"), F.col("p").alias("p2"))
        pairs = x.join(y, "c").filter(F.col("p1") < F.col("p2"))
        co = (
            pairs.repartition(pair_tasks, "p1", "p2")
            .groupBy("p1", "p2")
            .agg(F.count(F.lit(1)).cast("double").alias("co"))
            .filter(F.col("co") >= _CF_MIN_CO)
        )
    n1 = maybe_broadcast(
        pop.select(F.col("p").alias("p1"), F.col("n").alias("n1")), n_parts
    )
    n2 = maybe_broadcast(
        pop.select(F.col("p").alias("p2"), F.col("n").alias("n2")), n_parts
    )
    sc = (
        co.join(n1, "p1")
        .join(n2, "p2")
        .select(
            "p1",
            "p2",
            F.col("co").cast("bigint").alias("co"),
            F.round(
                F.col("co") / F.sqrt(F.col("n1") * F.col("n2")), 6
            ).alias("cosine"),
        )
    )
    return sc.orderBy(F.desc("cosine"), F.asc("p1"), F.asc("p2")).limit(_CF_TOP)


_RFM_ORACLE = """
    WITH mx AS (SELECT max(o_orderdate)::date AS mend FROM orders),
    rfm AS (SELECT o_custkey,
                   date_diff('day', max(o_orderdate)::date,
                             (SELECT mend FROM mx)) AS r,
                   count(*)::double AS f,
                   sum(round(o_totalprice * 100)::bigint) AS mc,
                   sum(round(o_totalprice * 100)::bigint) / 100.0 AS m
            FROM orders GROUP BY o_custkey),
    e AS (SELECT quantile_cont(r, [0.2, 0.4, 0.6, 0.8]) AS re,
                 quantile_cont(f, [0.2, 0.4, 0.6, 0.8]) AS fe,
                 quantile_cont(m, [0.2, 0.4, 0.6, 0.8]) AS me
          FROM rfm),
    s AS (SELECT o_custkey, m, mc,
                 6 - (1 + CASE WHEN r >= re[1] THEN 1 ELSE 0 END
                        + CASE WHEN r >= re[2] THEN 1 ELSE 0 END
                        + CASE WHEN r >= re[3] THEN 1 ELSE 0 END
                        + CASE WHEN r >= re[4] THEN 1 ELSE 0 END) AS rs,
                 1 + CASE WHEN f >= fe[1] THEN 1 ELSE 0 END
                   + CASE WHEN f >= fe[2] THEN 1 ELSE 0 END
                   + CASE WHEN f >= fe[3] THEN 1 ELSE 0 END
                   + CASE WHEN f >= fe[4] THEN 1 ELSE 0 END AS fs,
                 1 + CASE WHEN m >= me[1] THEN 1 ELSE 0 END
                   + CASE WHEN m >= me[2] THEN 1 ELSE 0 END
                   + CASE WHEN m >= me[3] THEN 1 ELSE 0 END
                   + CASE WHEN m >= me[4] THEN 1 ELSE 0 END AS ms
          FROM rfm, e),
    lab AS (SELECT o_custkey, m, mc,
                   CASE WHEN rs >= 4 AND fs >= 4 AND ms >= 4 THEN 'champions'
                        WHEN rs >= 3 AND fs >= 4 THEN 'loyal'
                        WHEN rs >= 4 AND fs <= 2 THEN 'new'
                        WHEN rs <= 2 AND fs >= 3 THEN 'at_risk'
                        WHEN rs <= 2 AND fs <= 2 THEN 'hibernating'
                        ELSE 'other' END AS segment
            FROM s)
    SELECT segment,
           count(*)::bigint AS n_customers,
           round(sum(mc) / 100.0, 2) AS revenue,
           round((sum(mc) / 100.0) / count(*), 2) AS avg_monetary
    FROM lab GROUP BY segment
"""


@query("rfm_segmentation", oracle=_RFM_ORACLE, category="recsys")
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency / frequency / monetary quintile
    scores (5 = best) from broadcast quantile edges, combined into the
    classic marketing segments (champions, loyal, new, at-risk,
    hibernating) with customer counts and revenue per segment.

    Same no-global-window discipline as decile_histogram_orders: ONE
    groupBy reduces orders to per-customer RFM, one combinable aggregate
    produces all twelve quintile edges, and scoring is edge-counting
    against the broadcast 1-row edge table — ntile would need three
    single-partition sorts of the customer table. Recency inverts the
    edge count (low recency = high score) with the same >= comparisons on
    both engines, so edge ties cannot diverge.
    """
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max(F.to_date("o_orderdate")).alias("mend"))
    # Monetary totals ride EXACT integer cents (round-10 dup-sweep finding:
    # at 19× replication the double sum-of-sums crossed a cent-rounding
    # boundary in a different direction per engine — avg_monetary differed
    # by 0.01). Per-order cents are engine-identical (one IEEE multiply +
    # round of a value nowhere near a half-cent tie); bigint sums are exact
    # and order-independent; the ONLY float ops left are single deterministic
    # divisions of identical operands. Same discipline as
    # decimal_exact_revenue.
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    rfm = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last"),
            F.count(F.lit(1)).cast("double").alias("f"),
            F.sum(cents).alias("mc"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff("mend", "last").alias("r"),
            "f",
            "mc",
            (F.col("mc") / F.lit(100.0)).alias("m"),
        )
    )
    edges = rfm.agg(
        *[
            F.expr(f"percentile({c}, {q})").alias(f"{c}e{i}")
            for c in ("r", "f", "m")
            for i, q in enumerate((0.2, 0.4, 0.6, 0.8), 1)
        ]
    )
    s = rfm.crossJoin(F.broadcast(edges))
    def score(c):
        return sum(
            F.when(F.col(c) >= F.col(f"{c}e{i}"), 1).otherwise(0)
            for i in range(1, 5)
        ) + 1
    rs, fs, ms = (6 - score("r")), score("f"), score("m")
    segment = (
        F.when((rs >= 4) & (fs >= 4) & (ms >= 4), "champions")
        .when((rs >= 3) & (fs >= 4), "loyal")
        .when((rs >= 4) & (fs <= 2), "new")
        .when((rs <= 2) & (fs >= 3), "at_risk")
        .when((rs <= 2) & (fs <= 2), "hibernating")
        .otherwise("other")
    )
    return (
        s.select(segment.alias("segment"), "mc")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(F.sum("mc") / F.lit(100.0), 2).alias("revenue"),
            F.round(
                (F.sum("mc") / F.lit(100.0)) / F.count(F.lit(1)), 2
            ).alias("avg_monetary"),
        )
    )
