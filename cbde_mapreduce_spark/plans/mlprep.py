"""ML data-prep / evaluation metrics (SURVEY.md §2 widened: the measurement
queries a training-data pipeline runs beside its transforms — model-free
eval, exact-budget allocation, robust feature treatment, dependence
screens, corpus law fits).

Scale notes:

- ``knn_label_accuracy`` is the eval-set shape: the scored join is exact and
  declarative because eval sets are frozen and small; the corpus-scale
  neighbor path is the sharded block-matmul / IVF / LSH family in
  operators/similarity.py & operators/iterative.py (same contract,
  accuracy-tested against this exact twin).
- ``largest_remainder_quota`` runs entirely on per-source aggregates (20
  rows) — the only pass over documents is one map-side-combinable groupBy.
- ``winsorize_order_value`` uses partition-frame window percentiles: one
  shuffle on the group key, no second scan, no join-back of edge tables.
- ``mutual_information_events`` reduces the fact table to the |X|·|Y|
  contingency table FIRST; every later step is over ≤35 rows.
- ``zipf_tail_index`` global-sorts only the top-100 rank spine
  (TakeOrdered), never the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cbde_mapreduce_spark.operators.prefix import exclusive_prefix_sum
from cbde_mapreduce_spark.plans.registry import query
from cbde_mapreduce_spark.sources import load_table
from cbde_mapreduce_spark.plans.similarity_q import (
    _NONZERO_SQL,
    _nonzero_embeddings,
)

_KNN_K = 5


@query(
    "knn_label_accuracy",
    oracle=f"""
        WITH n AS (
            SELECT vec_id, label, embedding,
                   sqrt(list_sum(list_transform(embedding,
                        x -> x::double * x::double))) AS nrm
            FROM embeddings
            WHERE {_NONZERO_SQL}
        ),
        p AS (
            SELECT a.vec_id AS qid, a.label AS qlabel,
                   b.vec_id AS nid, b.label AS nlabel,
                   round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                                  z -> z[1]::double * z[2]::double))
                         / (a.nrm * b.nrm), 6) AS sim
            FROM n a JOIN n b ON a.vec_id <> b.vec_id
        ),
        nn AS (
            SELECT qid, qlabel, nlabel,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY sim DESC, nid) AS rn
            FROM p QUALIFY rn <= {_KNN_K}
        ),
        votes AS (
            SELECT qid, qlabel, nlabel, count(*) AS c,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY count(*) DESC, nlabel) AS vr
            FROM nn GROUP BY qid, qlabel, nlabel
        )
        SELECT qlabel AS label,
               count(*)::bigint AS n_vecs,
               sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)::bigint
                 AS n_correct,
               round(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
                     / count(*)::double, 4) AS accuracy
        FROM votes WHERE vr = 1
        GROUP BY qlabel
    """,
    category="ml-prep",
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 5-NN cosine classifier accuracy per label — the
    standard embedding-quality probe (does neighborhood structure predict
    the label?).

    Deterministic end to end: similarity rounded to 6 digits BEFORE
    ranking, neighbor ties broken by vec_id, vote ties by smaller label.
    The exact scored self-join is the eval-set shape (eval sets are frozen
    and small); at corpus scale the same per-query top-k comes from the
    sharded matmul / IVF / LSH operators, which are accuracy-tested against
    this exact twin.
    """
    emb = _nonzero_embeddings(spark, sf_dir)
    n = emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
        F.sqrt(
            F.aggregate(
                F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("nrm"),
    )
    a = n.select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = n.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("nlabel"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    pairs = a.join(b, F.col("qid") != F.col("nid")).select(
        "qid",
        "qlabel",
        "nid",
        "nlabel",
        F.round(
            F.aggregate(
                F.zip_with(F.col("ea"), F.col("eb"), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (F.col("na") * F.col("nb")),
            6,
        ).alias("sim"),
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    nn = pairs.withColumn("rn", F.row_number().over(wq)).filter(
        F.col("rn") <= _KNN_K
    )
    wv = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("nlabel"))
    votes = (
        nn.groupBy("qid", "qlabel", "nlabel")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
    )
    return votes.groupBy(F.col("qlabel").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum((F.col("nlabel") == F.col("qlabel")).cast("int"))
        .cast("bigint")
        .alias("n_correct"),
        F.round(
            F.sum((F.col("nlabel") == F.col("qlabel")).cast("int"))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("accuracy"),
    )


_QUOTA_BUDGET = 1000


@query(
    "largest_remainder_quota",
    oracle=f"""
        WITH w AS (SELECT source, sum(n_chars)::bigint AS chars
                   FROM documents GROUP BY source),
        t AS (SELECT sum(chars)::bigint AS total FROM w),
        base AS (SELECT source, chars,
                        ({_QUOTA_BUDGET} * chars) // total  AS floor_q,
                        ({_QUOTA_BUDGET} * chars) %  total  AS rem
                 FROM w, t),
        s AS (SELECT sum(floor_q)::bigint AS allotted FROM base),
        r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk
              FROM base)
        SELECT source, chars,
               (floor_q + CASE WHEN rk <= {_QUOTA_BUDGET} - allotted
                               THEN 1 ELSE 0 END)::bigint AS quota
        FROM r, s
    """,
    category="ml-prep",
)
def largest_remainder_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-budget proportional allocation (Hamilton / largest-remainder
    method): split a 1000-sequence sampling budget across document sources
    proportional to their total characters, with Σquota == budget exactly.

    Naive rounding of shares drifts off-budget; largest-remainder assigns
    ⌊B·wᵢ/W⌋ then tops up the B−Σ⌊·⌋ largest remainders (ties → source
    name). Everything after the one groupBy over documents is integer
    arithmetic on a 20-row table — cross-engine exact by construction, and
    the two scalar totals ride in as broadcast 1-row joins.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = docs.groupBy("source").agg(F.sum("n_chars").cast("bigint").alias("chars"))
    t = w.agg(F.sum("chars").cast("bigint").alias("total"))
    base = w.crossJoin(F.broadcast(t)).select(
        "source",
        "chars",
        F.expr(f"({_QUOTA_BUDGET} * chars) div total").alias("floor_q"),
        F.expr(f"({_QUOTA_BUDGET} * chars) % total").alias("rem"),
    )
    s = base.agg(F.sum("floor_q").cast("bigint").alias("allotted"))
    r = base.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("source")))
    )
    return r.crossJoin(F.broadcast(s)).select(
        "source",
        "chars",
        (
            F.col("floor_q")
            + F.when(F.col("rk") <= _QUOTA_BUDGET - F.col("allotted"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("quota"),
    )


@query(
    "winsorize_order_value",
    oracle="""
        WITH c AS (
            SELECT o_orderpriority, o_totalprice,
                   round(quantile_cont(o_totalprice, 0.05)
                     OVER (PARTITION BY o_orderpriority), 4) AS lo,
                   round(quantile_cont(o_totalprice, 0.95)
                     OVER (PARTITION BY o_orderpriority), 4) AS hi
            FROM orders
        ),
        w AS (SELECT o_orderpriority, o_totalprice, lo, hi,
                     least(greatest(o_totalprice, lo), hi)::decimal(18,4) AS clip
              FROM c)
        SELECT o_orderpriority,
               count(*)::bigint AS n,
               sum(CASE WHEN o_totalprice < lo THEN 1 ELSE 0 END)::bigint
                 AS n_clipped_low,
               sum(CASE WHEN o_totalprice > hi THEN 1 ELSE 0 END)::bigint
                 AS n_clipped_high,
               round(sum(clip)::double / count(*), 4) AS mean_winsorized,
               round(sum(clip)::double, 2) AS sum_winsorized
        FROM w
        GROUP BY o_orderpriority
    """,
    category="ml-prep",
)
def winsorize_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (clip to the per-group [p5, p95]) — the robust feature
    treatment applied before scaling/training so heavy tails can't dominate.

    The percentile edges come from whole-partition window frames on the
    SAME key the final groupBy uses: one shuffle on o_orderpriority carries
    both steps, with no separate edge table and no join-back (the classic
    two-scan formulation). Both engines compute exact linearly-interpolated
    (type-7) percentiles.

    Round-10 hardening (the conformal/RFM rolled-corpus class, fixed here
    before a corpus hits it): the edges are quantized to 4 decimals —
    collapsing any cross-engine interpolation-order ulp — and the clipped
    values (2-decimal prices clamped to 4-decimal edges: exactly 4-decimal
    numbers) are summed as lossless decimal(18,4), so the sum is exact and
    order-independent; the only remaining float op is one deterministic
    division for the mean.
    """
    orders = load_table(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_orderpriority")
    c = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.round(F.expr("percentile(o_totalprice, 0.05)").over(wp), 4).alias("lo"),
        F.round(F.expr("percentile(o_totalprice, 0.95)").over(wp), 4).alias("hi"),
    )
    clip = F.least(
        F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi")
    ).cast("decimal(18,4)")
    return c.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("o_totalprice") < F.col("lo")).cast("int"))
        .cast("bigint")
        .alias("n_clipped_low"),
        F.sum((F.col("o_totalprice") > F.col("hi")).cast("int"))
        .cast("bigint")
        .alias("n_clipped_high"),
        F.round(
            F.sum(clip).cast("double") / F.count(F.lit(1)), 4
        ).alias("mean_winsorized"),
        F.round(F.sum(clip).cast("double"), 2).alias("sum_winsorized"),
    )


@query(
    "mutual_information_events",
    oracle="""
        WITH xy AS (SELECT event_type AS x, isodow(ts) - 1 AS y,
                           count(*)::bigint AS n_xy
                    FROM events GROUP BY 1, 2),
        e AS (SELECT x, y, n_xy,
                     sum(n_xy) OVER (PARTITION BY x) AS n_x,
                     sum(n_xy) OVER (PARTITION BY y) AS n_y,
                     sum(n_xy) OVER ()               AS n
              FROM xy)
        SELECT x AS event_type, y::int AS weekday, n_xy,
               round(n_xy / n::double, 6) AS p_xy,
               round(ln((n_xy * n)::double / (n_x * n_y)), 6) AS pmi,
               round((n_xy / n::double)
                     * ln((n_xy * n)::double / (n_x * n_y)), 6) AS mi_term
        FROM e
    """,
    category="ml-prep",
)
def mutual_information_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-information screen between event_type and weekday: per-cell
    PMI and MI contribution (Σ mi_term = MI in nats) — the dependence test
    run before treating a pair of columns as independent features.

    The fact table collapses to the |X|·|Y| ≤ 35-row contingency table in
    one map-side-combinable groupBy; marginals are window sums over that
    tiny table (no second scan of events, no joins). Probabilities are
    ratios of exact integers, so only the final ln/round touches floats.
    Weekday is Monday=0 in both engines (Spark ``weekday``, DuckDB
    ``isodow - 1``).
    """
    ev = load_table(spark, sf_dir, "events")
    xy = (
        ev.select(
            F.col("event_type").alias("x"), F.expr("weekday(ts)").alias("y")
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
    )
    e = xy.select(
        "x",
        "y",
        "n_xy",
        F.sum("n_xy").over(Window.partitionBy("x")).alias("n_x"),
        F.sum("n_xy").over(Window.partitionBy("y")).alias("n_y"),
        F.sum("n_xy").over(Window.partitionBy()).alias("n"),
    )
    p_xy = F.col("n_xy") / F.col("n").cast("double")
    lift = (F.col("n_xy") * F.col("n")).cast("double") / (
        F.col("n_x") * F.col("n_y")
    )
    return e.select(
        F.col("x").alias("event_type"),
        F.col("y").cast("int").alias("weekday"),
        "n_xy",
        F.round(p_xy, 6).alias("p_xy"),
        F.round(F.log(lift), 6).alias("pmi"),
        F.round(p_xy * F.log(lift), 6).alias("mi_term"),
    )


_ZIPF_HEAD = 100


@query(
    "zipf_tail_index",
    oracle=f"""
        WITH f AS (SELECT w, count(*)::bigint AS freq
                   FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
                         FROM documents)
                   GROUP BY w),
        top AS (SELECT w, freq FROM f
                ORDER BY freq DESC, w LIMIT {_ZIPF_HEAD}),
        r AS (SELECT freq,
                     row_number() OVER (ORDER BY freq DESC, w) AS rank
              FROM top),
        q AS (SELECT round(ln(freq::double) * 1e9)::bigint AS qy,
                     round(ln(rank::double) * 1e9)::bigint AS qx
              FROM r),
        m AS (SELECT count(*)::double AS n,
                     sum(qx)::double AS sx, sum(qy)::double AS sy,
                     sum(qx::decimal(19,0) * qx)::double AS sxx,
                     sum(qx::decimal(19,0) * qy)::double AS sxy,
                     sum(qy::decimal(19,0) * qy)::double AS syy
              FROM q),
        fit AS (SELECT n,
                       n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy,
                       n * sxy - sx * sy AS cov, sx, sy
                FROM m),
        o AS (SELECT CASE WHEN dx = 0 THEN NULL ELSE cov / dx END AS slope,
                     (sy - CASE WHEN dx = 0 THEN NULL ELSE cov / dx END * sx)
                       / n / 1e9 AS intercept,
                     CASE WHEN dx <= 0 OR dy <= 0 THEN NULL
                          ELSE cov * cov / (dx * dy) END AS r2
              FROM fit)
        SELECT (SELECT count(*) FROM f)::bigint AS n_types,
               round(slope, 4)     AS zipf_slope,
               round(intercept, 4) AS zipf_intercept,
               round(r2, 4)        AS fit_r2
        FROM o
    """,
    category="ml-prep",
)
def zipf_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus: OLS slope of ln(freq) on ln(rank)
    for the top-100 word ranks (a natural corpus fingerprints — synthetic
    or heavily-duplicated corpora drift off slope ≈ −1).

    The global sort touches only the 100-row rank spine (TakeOrdered with a
    (freq, word) tiebreak), never the vocabulary; the regression runs on
    those 100 rows via the closed-form regr_* aggregates in both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    f = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    top = f.orderBy(F.desc("freq"), F.asc("w")).limit(_ZIPF_HEAD)
    # ln values quantized at 1e-9, fit from EXACT integer moments
    # (money.py round-11): regr_* built-ins merge double co-moments in
    # scheduler order. The slope/r2 are scale-invariant in the quantized
    # unit system; the intercept converts back once.
    r = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("w")))
    ).selectExpr(
        "cast(round(ln(cast(freq as double)) * 1e9) as bigint) AS qy",
        "cast(round(ln(cast(rank as double)) * 1e9) as bigint) AS qx",
    )
    m = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("qx").cast("double").alias("sx"),
        F.sum("qy").cast("double").alias("sy"),
        F.sum(F.col("qx").cast("decimal(19,0)") * F.col("qx"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("qx").cast("decimal(19,0)") * F.col("qy"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("qy").cast("decimal(19,0)") * F.col("qy"))
        .cast("double")
        .alias("syy"),
    )
    c = m.select(
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("dx"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("dy"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("cov"),
    )
    slope = F.when(F.col("dx") == 0, F.lit(None)).otherwise(
        F.col("cov") / F.col("dx")
    )
    fit = c.select(
        F.round(slope, 4).alias("zipf_slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n") / F.lit(1e9), 4
        ).alias("zipf_intercept"),
        F.round(
            F.when((F.col("dx") <= 0) | (F.col("dy") <= 0), F.lit(None))
            .otherwise(
                F.col("cov") * F.col("cov") / (F.col("dx") * F.col("dy"))
            ),
            4,
        ).alias("fit_r2"),
    )
    n_types = f.agg(F.count(F.lit(1)).cast("bigint").alias("n_types"))
    return n_types.crossJoin(F.broadcast(fit)).select(
        "n_types", "zipf_slope", "zipf_intercept", "fit_r2"
    )


@query(
    "gini_customer_revenue",
    oracle="""
        WITH rev AS (SELECT o_custkey,
                            sum(round(o_totalprice * 100)::bigint) AS rc
                     FROM orders GROUP BY o_custkey),
        ranked AS (SELECT rc, row_number() OVER (ORDER BY rc, o_custkey) AS i,
                          count(*) OVER () AS n
                   FROM rev)
        SELECT max(n)::bigint AS n_customers,
               round(sum(rc) / 100.0, 2) AS total_revenue,
               round(2.0 * sum((i * rc)::decimal(38,0))::double
                     / (max(n) * sum(rc)::double)
                     - (max(n) + 1.0) / max(n), 6) AS gini
        FROM ranked
    """,
    category="ml-prep",
)
def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the one-number
    inequality screen (0 = uniform spend, →1 = one whale) run before
    deciding whether a per-customer key needs skew treatment.

    Gini needs a global rank of the revenue vector. Rounds 1-3 ran that
    rank as a single-partition window over the customer aggregate
    (defensible as dimension-sized, but customers are ~1e9 at the 100 TB
    design point); round 4 moves it onto the distributed prefix-sum
    machinery (operators/prefix.py): range-partition + per-partition
    window + broadcast offsets, P-way parallel all the way. Rank ties
    are impossible by construction ((revenue, custkey) is a total
    order), so ranks — and the closed-form 2·Σi·xᵢ/(n·Σx) − (n+1)/n —
    are cross-engine identical; n rides along as a driver scalar
    (count() moves O(partitions) partials).
    """
    orders = load_table(spark, sf_dir, "orders")
    # per-customer revenue in exact integer cents; the gini ratio cancels
    # the scale and both of its sums are exact integers (money.py)
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("rc")
    )
    n = rev.count()
    ranked = exclusive_prefix_sum(
        rev.withColumn("__one", F.lit(1)), ["rc", "o_custkey"], "__one",
        out_col="__r0",
    ).withColumn("i", F.col("__r0") + 1)
    # max(n, 1): sums are NULL on empty input so gini is NULL either way;
    # the guard only avoids literal-zero denominators under ANSI
    nn = max(n, 1)
    return ranked.agg(
        F.lit(n).cast("bigint").alias("n_customers"),
        F.round(F.sum("rc") / F.lit(100.0), 2).alias("total_revenue"),
        # try_divide: zero total revenue (all totalprices 0) is 0/0 —
        # DuckDB yields NULL, ANSI Spark raises (numeric-extremes sweep).
        F.round(
            F.try_divide(
                2.0
                * F.sum((F.col("i") * F.col("rc")).cast("decimal(38,0)")).cast(
                    "double"
                ),
                F.lit(nn) * F.sum("rc").cast("double"),
            )
            - (F.lit(nn) + 1.0) / F.lit(nn),
            6,
        ).alias("gini"),
    )


@query(
    "chi2_event_weekday",
    oracle="""
        WITH xy AS (SELECT event_type AS x, isodow(ts) - 1 AS y,
                           count(*)::bigint AS o
                    FROM events GROUP BY 1, 2),
        spine AS (SELECT x, y FROM (SELECT DISTINCT x FROM xy),
                                   (SELECT DISTINCT y FROM xy)),
        f AS (SELECT spine.x, spine.y, coalesce(o, 0) AS o
              FROM spine LEFT JOIN xy ON spine.x = xy.x AND spine.y = xy.y),
        m AS (SELECT x, y, o,
                     sum(o) OVER (PARTITION BY x) AS nx,
                     sum(o) OVER (PARTITION BY y) AS ny,
                     sum(o) OVER ()               AS n
              FROM f),
        d AS (SELECT count(DISTINCT x) AS cx, count(DISTINCT y) AS cy FROM f)
        SELECT max(n)::bigint AS n,
               ((max(cx) - 1) * (max(cy) - 1))::bigint AS dof,
               round(sum(round(pow(o - nx * ny / n::double, 2)
                               / (nx * ny / n::double) * 1e9)
                           ::bigint::decimal(38,0))::double / 1e9, 4) AS chi2,
               round(sqrt(sum(round(pow(o - nx * ny / n::double, 2)
                                    / (nx * ny / n::double) * 1e9)
                                ::bigint::decimal(38,0))::double / 1e9
                          / (max(n) * least(max(cx) - 1, max(cy) - 1))), 6)
                 AS cramers_v
        FROM m, d
    """,
    category="ml-prep",
)
def chi2_event_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence test (+ Cramér's V effect size) between
    event_type and weekday — the frequentist companion to
    mutual_information_events: MI measures dependence in nats, χ²/V gives
    the test statistic and a normalized [0,1] effect size.

    Same scale shape as the MI query: the fact table collapses to the
    contingency table first, a |X|×|Y| spine pins zero cells (χ² needs
    expected-vs-observed on EVERY cell, not just observed ones), and
    marginals are window sums over ≤35 rows. Expected counts are ratios of
    exact integers; only the final χ² sum and sqrt touch floats.
    """
    ev = load_table(spark, sf_dir, "events")
    xy = (
        ev.select(
            F.col("event_type").alias("x"), F.expr("weekday(ts)").alias("y")
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    spine = xy.select("x").distinct().crossJoin(xy.select("y").distinct())
    f = spine.join(xy, ["x", "y"], "left").select(
        "x", "y", F.coalesce("o", F.lit(0)).alias("o")
    )
    m = f.select(
        "x",
        "y",
        "o",
        F.sum("o").over(Window.partitionBy("x")).alias("nx"),
        F.sum("o").over(Window.partitionBy("y")).alias("ny"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    d = f.agg(
        F.countDistinct("x").alias("cx"), F.countDistinct("y").alias("cy")
    )
    e = F.col("nx") * F.col("ny") / F.col("n").cast("double")
    # per-cell chi2 contributions (deterministic doubles from exact
    # integer marginals) quantize at 1e-9 before the exact sum (money.py)
    cell = (
        F.round((F.pow(F.col("o") - e, 2) / e) * 1e9)
        .cast("bigint")
        .cast("decimal(38,0)")
    )
    qsum = F.sum(cell).cast("double") / F.lit(1e9)
    return m.crossJoin(F.broadcast(d)).agg(
        F.max("n").cast("bigint").alias("n"),
        ((F.max("cx") - 1) * (F.max("cy") - 1)).cast("bigint").alias("dof"),
        F.round(qsum, 4).alias("chi2"),
        # try_divide: a 1x1 contingency table has min(cx,cy)-1 = 0 and no
        # defined V — NULL like DuckDB, not an ANSI error
        F.round(
            F.sqrt(
                F.try_divide(
                    qsum,
                    (
                        F.max("n") * F.least(F.max("cx") - 1, F.max("cy") - 1)
                    ).cast("double"),
                )
            ),
            6,
        ).alias("cramers_v"),
    )


_AB_SPLIT = "2024-01-16"  # events span 2024-01-01 .. 2024-01-30


@query(
    "ab_test_conversion",
    oracle=f"""
        WITH u AS (
            SELECT CASE WHEN ts < TIMESTAMP '{_AB_SPLIT}' THEN 'A' ELSE 'B'
                   END AS grp,
                   user_id, ts::date AS day,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     AS converted
            FROM events GROUP BY 1, 2, 3),
        s AS (SELECT
                sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END)::bigint AS n_a,
                sum(CASE WHEN grp = 'A' THEN converted ELSE 0 END)::bigint
                  AS conv_a,
                sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END)::bigint AS n_b,
                sum(CASE WHEN grp = 'B' THEN converted ELSE 0 END)::bigint
                  AS conv_b
              FROM u)
        SELECT n_a, conv_a, n_b, conv_b,
               round(conv_a / n_a::double, 6) AS p_a,
               round(conv_b / n_b::double, 6) AS p_b,
               round((conv_a / n_a::double - conv_b / n_b::double)
                     / sqrt(((conv_a + conv_b) / (n_a + n_b)::double)
                            * (1 - (conv_a + conv_b) / (n_a + n_b)::double)
                            * (1.0 / n_a + 1.0 / n_b)), 4) AS z_stat,
               (abs((conv_a / n_a::double - conv_b / n_b::double)
                    / sqrt(((conv_a + conv_b) / (n_a + n_b)::double)
                           * (1 - (conv_a + conv_b) / (n_a + n_b)::double)
                           * (1.0 / n_a + 1.0 / n_b))) > 1.96)::int
                 AS significant_95
        FROM s
    """,
    category="ml-prep",
)
def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on daily conversion, first half of the month vs
    second — the A/B-test readout (χ² screens categorical independence;
    this is the two-sample hypothesis test with a decision threshold).

    The unit is a USER-DAY (did this user purchase today?), the standard
    daily-conversion unit — per-user-over-15-days conversion saturates at
    ~100% on this fixture and degenerates the pooled variance to zero.
    Unit flags collapse in one combinable groupBy; the four counts that
    remain are exact integers, so the pooled-variance z statistic is pure
    scalar arithmetic regardless of scale.
    """
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.select(
            F.when(
                F.col("ts") < F.lit(_AB_SPLIT).cast("timestamp_ntz"), "A"
            )
            .otherwise("B")
            .alias("grp"),
            "user_id",
            F.col("ts").cast("date").alias("day"),
            (F.col("event_type") == "purchase").cast("int").alias("pur"),
        )
        .groupBy("grp", "user_id", "day")
        .agg(F.max("pur").alias("converted"))
    )
    s = u.agg(
        F.sum(F.when(F.col("grp") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("grp") == "A", F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("grp") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("grp") == "B", F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    # try_divide throughout: a one-sided split (n_a or n_b = 0) yields
    # NULL rates/statistic like DuckDB, not an ANSI DIVIDE_BY_ZERO
    pa = F.try_divide(F.col("conv_a"), F.col("n_a").cast("double"))
    pb = F.try_divide(F.col("conv_b"), F.col("n_b").cast("double"))
    pp = F.try_divide(
        F.col("conv_a") + F.col("conv_b"),
        (F.col("n_a") + F.col("n_b")).cast("double"),
    )
    z = F.try_divide(
        pa - pb,
        F.sqrt(
            pp
            * (1 - pp)
            * (
                F.try_divide(F.lit(1.0), F.col("n_a"))
                + F.try_divide(F.lit(1.0), F.col("n_b"))
            )
        ),
    )
    return s.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).cast("int").alias("significant_95"),
    )


_NEG_K = 4

_NEG_ORACLE = f"""
    WITH ring AS (
        SELECT vec_id, label,
               ascii(substr(md5(vec_id::varchar), 1, 1))::bigint * 65536
                + ascii(substr(md5(vec_id::varchar), 2, 1))::bigint * 256
                + ascii(substr(md5(vec_id::varchar), 3, 1))::bigint AS hpos
        FROM embeddings),
    ordered AS (SELECT vec_id, label,
                       row_number() OVER (ORDER BY hpos, vec_id) AS rn,
                       count(*) OVER () AS n
                FROM ring),
    cand AS (
        SELECT a.vec_id AS anchor, a.label AS anchor_label,
               b.vec_id AS negative, k.k AS slot
        FROM ordered a
        JOIN generate_series(1, {_NEG_K + 4}) k(k) ON true
        JOIN ordered b
          ON b.rn = ((a.rn - 1 + k.k) % a.n) + 1),
    filt AS (
        SELECT anchor, negative,
               row_number() OVER (PARTITION BY anchor ORDER BY slot) AS nk
        FROM cand WHERE negative <> anchor),
    top AS (SELECT anchor, negative, nk FROM filt WHERE nk <= {_NEG_K})
    SELECT anchor, nk AS slot, negative FROM top
"""


@query("contrastive_negatives_ring", oracle=_NEG_ORACLE, category="ml-prep")
def contrastive_negatives_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic in-batch negative sampling for contrastive training:
    every vector gets K=4 negatives — the next K distinct ids clockwise on
    a hash ring (md5-derived position, vec_id tiebreak), the consistent-
    hashing construction. Hash-ring adjacency is independent of id
    locality, so neighbors on the ring are uniform draws from the corpus,
    yet fully reproducible across runs, partitionings, and engines — the
    property rand() sampling lacks.

    Scale shape: one total order by ring position, then K successor taps
    per row — no self-join against the full corpus. Round 4: the global
    rank comes from the two-phase range-partitioned prefix machinery
    (operators/prefix.py::exclusive_prefix_sum over per-row 1s — P-way
    parallel, plan-asserted SinglePartition-free), not a global window;
    the ring size n is a driver scalar (count() moves O(partitions)
    partials) inlined into the modular-rank successor join, which the
    planner runs as a plain hash equi-join on the computed rank key.

    Round 9 (found by the dup-heavy cell-exact sweep): the ring order is
    the COMPOSITE key (hpos, vec_id), not the packed hpos·1024 + vec_id —
    the pack is injective only while vec_id < 1024, and a 20×-replicated
    corpus (vec_ids offset past 1024) produced position TIES whose
    row_number resolution is engine-arbitrary: 32 anchors drew different
    negatives on Spark vs DuckDB. The md5 trio ranges over 16³ hex-ascii
    values, so collisions need only |Δhpos| = Δvec_id/1024 — routine at
    corpus scale. The composite order is total for ANY id range (both
    exclusive_prefix_sum and the oracle's ORDER BY take the two-column
    lexicographic key directly; no packing bound to gate).
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    h = F.md5(F.encode(F.col("vec_id").cast("string"), "UTF-8"))
    hpos = (
        F.ascii(F.substring(h, 1, 1)).cast("bigint") * 65536
        + F.ascii(F.substring(h, 2, 1)).cast("bigint") * 256
        + F.ascii(F.substring(h, 3, 1)).cast("bigint")
    )
    ring = emb.select("vec_id", "label", hpos.alias("hpos"))
    n = ring.count()
    ordered = exclusive_prefix_sum(
        ring.withColumn("__one", F.lit(1)),
        ["hpos", "vec_id"],
        "__one",
        out_col="__r0",
    ).withColumn("rn", F.col("__r0") + 1)
    a = ordered.select(
        F.col("vec_id").alias("anchor"),
        F.col("rn").alias("arn"),
    ).crossJoin(
        F.broadcast(
            load_table(spark, sf_dir, "embeddings")
            .sparkSession.range(1, _NEG_K + 5)
            .select(F.col("id").cast("int").alias("slot"))
        )
    )
    b = ordered.select(F.col("vec_id").alias("negative"), F.col("rn").alias("brn"))
    cand = a.join(
        b,
        # max(n, 1): no rows exist when n = 0, the guard only avoids a
        # literal-zero modulus the optimizer rejects under ANSI
        ((F.col("arn") - 1 + F.col("slot")) % F.lit(max(n, 1))) + 1
        == F.col("brn"),
    ).filter(F.col("negative") != F.col("anchor"))
    wk = Window.partitionBy("anchor").orderBy("slot")
    return (
        cand.select(
            "anchor", "negative", F.row_number().over(wk).alias("nk")
        )
        .filter(F.col("nk") <= _NEG_K)
        .select("anchor", F.col("nk").alias("slot"), "negative")
    )


_HNEG_LABEL = 0  # anchor class
_HNEG_K = 2

_HNEG_ORACLE = f"""
    WITH n AS (
        SELECT vec_id, label, embedding,
               sqrt(list_sum(list_transform(embedding,
                    x -> x::double * x::double))) AS nrm
        FROM embeddings
        WHERE {_NONZERO_SQL}),
    p AS (
        SELECT a.vec_id AS anchor, b.vec_id AS negative, b.label AS neg_label,
               round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                     z -> z[1]::double * z[2]::double)) / (a.nrm * b.nrm), 6)
                 AS sim
        FROM n a JOIN n b ON b.label <> {_HNEG_LABEL}
        WHERE a.label = {_HNEG_LABEL}),
    r AS (SELECT anchor, negative, neg_label, sim,
                 row_number() OVER (PARTITION BY anchor
                                    ORDER BY sim DESC, negative) AS rk
          FROM p)
    SELECT anchor, rk, negative, neg_label, sim
    FROM r WHERE rk <= {_HNEG_K}
"""


@query("hard_negative_mining", oracle=_HNEG_ORACLE, category="ml-prep")
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for every anchor
    vector of class 0, the K=2 most cosine-similar vectors of ANY OTHER
    class — the examples a contrastive loss learns most from, and the
    complement of contrastive_negatives_ring's uniform draws.

    Exact form: the anchor side (one class) broadcasts against the corpus;
    per-pair cosine via built-in higher-order functions (norms precomputed
    once per side), then a per-anchor top-K window. Similarities round to
    6 dp BEFORE ranking (negative-id tiebreak) so cross-engine float noise
    cannot flip a rank. At corpus scale the candidate set comes from the
    ANN family instead (IVF / LSH buckets in operators/similarity.py,
    operators/iterative.py) and this exact pass runs only per-bucket —
    mining stays a top-K window over candidates either way.
    """
    from cbde_mapreduce_spark.functions.vectors import dot, l2_norm

    emb = _nonzero_embeddings(spark, sf_dir)
    n = emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    anchors = n.filter(F.col("label") == _HNEG_LABEL).select(
        F.col("vec_id").alias("anchor"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    cands = n.filter(F.col("label") != _HNEG_LABEL).select(
        F.col("vec_id").alias("negative"),
        F.col("label").alias("neg_label"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    p = F.broadcast(anchors).crossJoin(cands).select(
        "anchor",
        "negative",
        "neg_label",
        F.round(
            dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
        ).alias("sim"),
    )
    wk = Window.partitionBy("anchor").orderBy(F.desc("sim"), F.asc("negative"))
    return (
        p.select("anchor", "negative", "neg_label", "sim", F.row_number().over(wk).alias("rk"))
        .filter(F.col("rk") <= _HNEG_K)
        .select("anchor", "rk", "negative", "neg_label", "sim")
    )


_CM_ORACLE = f"""
    WITH n AS (
        SELECT vec_id, label, embedding,
               sqrt(list_sum(list_transform(embedding,
                    x -> x::double * x::double))) AS nrm
        FROM embeddings
        WHERE {_NONZERO_SQL}),
    p AS (
        SELECT a.vec_id AS qid, a.label AS qlabel,
               b.vec_id AS nid, b.label AS nlabel,
               round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                              z -> z[1]::double * z[2]::double))
                     / (a.nrm * b.nrm), 6) AS sim
        FROM n a JOIN n b ON a.vec_id <> b.vec_id),
    nn AS (SELECT qid, qlabel, nlabel,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY sim DESC, nid) AS rn
           FROM p QUALIFY rn <= {_KNN_K}),
    votes AS (SELECT qid, qlabel, nlabel, count(*) AS c,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY count(*) DESC, nlabel) AS vr
              FROM nn GROUP BY qid, qlabel, nlabel),
    pred AS (SELECT qid, qlabel AS true_label, nlabel AS pred_label
             FROM votes WHERE vr = 1),
    cm AS (SELECT true_label, pred_label, count(*)::bigint AS n
           FROM pred GROUP BY true_label, pred_label),
    tp AS (SELECT true_label AS label, n AS tp FROM cm
           WHERE true_label = pred_label),
    col AS (SELECT pred_label AS label, sum(n)::bigint AS pred_n
            FROM cm GROUP BY pred_label),
    row_ AS (SELECT true_label AS label, sum(n)::bigint AS true_n
             FROM cm GROUP BY true_label)
    SELECT row_.label,
           row_.true_n,
           coalesce(col.pred_n, 0) AS pred_n,
           coalesce(tp.tp, 0) AS tp,
           round(coalesce(tp.tp, 0) / nullif(col.pred_n, 0)::double, 6)
             AS precision,
           round(coalesce(tp.tp, 0) / row_.true_n::double, 6) AS recall
    FROM row_ LEFT JOIN col USING (label) LEFT JOIN tp USING (label)
"""


@query("knn_confusion_matrix", oracle=_CM_ORACLE, category="ml-prep")
def knn_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall of the leave-one-out 5-NN classifier —
    the class-level diagnosis knn_label_accuracy's single number hides
    (a 90% accuracy can still have one unusable class).

    Same deterministic kNN vote as knn_label_accuracy (rounded sims,
    vec_id/label tiebreaks); the confusion matrix is one groupBy over
    predictions, and P/R come from its row/column marginals — all
    |classes|²-bounded relations after the scored join. NULL precision
    (a never-predicted class) is surfaced, not hidden.
    """
    from cbde_mapreduce_spark.functions.vectors import dot, l2_norm

    emb = _nonzero_embeddings(spark, sf_dir)
    n = emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    a = n.select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = n.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("nlabel"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    pairs = a.join(b, F.col("qid") != F.col("nid")).select(
        "qid",
        "qlabel",
        "nid",
        "nlabel",
        F.round(
            dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
        ).alias("sim"),
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    nn = pairs.withColumn("rn", F.row_number().over(wq)).filter(
        F.col("rn") <= _KNN_K
    )
    wv = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("nlabel"))
    pred = (
        nn.groupBy("qid", "qlabel", "nlabel")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            F.col("qlabel").alias("true_label"),
            F.col("nlabel").alias("pred_label"),
        )
    )
    cm = pred.groupBy("true_label", "pred_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tp = cm.filter(F.col("true_label") == F.col("pred_label")).select(
        F.col("true_label").alias("label"), F.col("n").alias("tp")
    )
    col = cm.groupBy(F.col("pred_label").alias("label")).agg(
        F.sum("n").cast("bigint").alias("pred_n")
    )
    row_ = cm.groupBy(F.col("true_label").alias("label")).agg(
        F.sum("n").cast("bigint").alias("true_n")
    )
    out = (
        row_.join(col, "label", "left")
        .join(tp, "label", "left")
        .select(
            "label",
            "true_n",
            F.coalesce("pred_n", F.lit(0)).alias("pred_n"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.round(
                F.coalesce("tp", F.lit(0))
                / F.nullif(F.col("pred_n"), F.lit(0)).cast("double"),
                6,
            ).alias("precision"),
            F.round(
                F.coalesce("tp", F.lit(0)) / F.col("true_n").cast("double"), 6
            ).alias("recall"),
        )
    )
    return out


_JL_OUT = 16  # target dimensionality
_JL_PAIRS = 100  # audited pairs: (p, p+100) for p in 0..99

_JL_ORACLE = f"""
    WITH signs AS (
        SELECT j.j, i.i,
               CASE WHEN (ascii(substr(md5(j.j::varchar || ':' || i.i::varchar), 1, 1)) * 256
                          + ascii(substr(md5(j.j::varchar || ':' || i.i::varchar), 2, 1))) % 2 = 0
                    THEN 1.0 ELSE -1.0 END AS s
        FROM generate_series(1, {_JL_OUT}) j(j), generate_series(1, 64) i(i)),
    dims AS (
        SELECT vec_id, i.i, embedding[i.i]::double AS x
        FROM embeddings, generate_series(1, 64) i(i)
        WHERE vec_id < {2 * _JL_PAIRS}),
    proj AS (
        SELECT d.vec_id, s.j,
               sum(s.s * d.x) / sqrt({_JL_OUT}::double) AS y
        FROM dims d JOIN signs s ON d.i = s.i
        GROUP BY d.vec_id, s.j),
    dorig AS (
        SELECT a.vec_id AS pa, b.vec_id AS pb,
               sqrt(sum(pow(a.x - b.x, 2))) AS d_orig
        FROM dims a JOIN dims b
          ON b.vec_id = a.vec_id + {_JL_PAIRS} AND a.i = b.i
        WHERE a.vec_id < {_JL_PAIRS}
        GROUP BY a.vec_id, b.vec_id),
    dproj AS (
        SELECT a.vec_id AS pa, b.vec_id AS pb,
               sqrt(sum(pow(a.y - b.y, 2))) AS d_proj
        FROM proj a JOIN proj b
          ON b.vec_id = a.vec_id + {_JL_PAIRS} AND a.j = b.j
        WHERE a.vec_id < {_JL_PAIRS}
        GROUP BY a.vec_id, b.vec_id)
    SELECT dorig.pa, dorig.pb,
           round(dorig.d_orig, 6) AS d_orig,
           round(dproj.d_proj, 6) AS d_proj,
           round(dproj.d_proj / dorig.d_orig, 6) AS ratio
    FROM dorig JOIN dproj ON dorig.pa = dproj.pa
"""


@query("jl_projection_distortion", oracle=_JL_ORACLE, category="similarity")
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss audit: project 64-dim embeddings to 16 dims
    with a DETERMINISTIC ±1 sign matrix (md5-parity entries, 1/√k scale)
    and report per-pair distance distortion for 100 fixed pairs — the
    measurement that decides whether the cheap projected index is safe to
    search instead of the full vectors.

    The projection is the (vec, dim)-exploded incidence joined against the
    broadcast 1024-row sign matrix and re-aggregated — a matmul as a
    groupBy, never a per-row Python kernel — and the same deterministic-
    seed discipline as the samplers makes the whole audit oracle-exact.
    Sign matrices satisfy JL with the same concentration as Gaussians
    (Achlioptas 2003), which is why ±1-only entries suffice.
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 2 * _JL_PAIRS
    )
    dims = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i0", "x"),
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "x")
    spark_ = emb.sparkSession
    signs = (
        spark_.range(1, _JL_OUT + 1)
        .select(F.col("id").cast("int").alias("j"))
        .crossJoin(spark_.range(1, 65).select(F.col("id").cast("int").alias("i")))
    )
    h = F.md5(
        F.encode(
            F.concat(F.col("j").cast("string"), F.lit(":"), F.col("i").cast("string")),
            "UTF-8",
        )
    )
    u = F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    signs = signs.select(
        "j", "i", F.when(u % 2 == 0, 1.0).otherwise(-1.0).alias("s")
    )
    proj = (
        dims.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg((F.sum(F.col("s") * F.col("x")) / float(_JL_OUT) ** 0.5).alias("y"))
    )
    da = dims.filter(F.col("vec_id") < _JL_PAIRS).select(
        F.col("vec_id").alias("pa"), "i", F.col("x").alias("xa")
    )
    db = dims.select(F.col("vec_id").alias("pb"), "i", F.col("x").alias("xb"))
    dorig = (
        da.join(db, (F.col("pb") == F.col("pa") + _JL_PAIRS) & (da.i == db.i))
        .groupBy("pa", "pb")
        .agg(F.sqrt(F.sum(F.pow(F.col("xa") - F.col("xb"), 2))).alias("d_orig"))
    )
    pa_ = proj.filter(F.col("vec_id") < _JL_PAIRS).select(
        F.col("vec_id").alias("pa"), "j", F.col("y").alias("ya")
    )
    pb_ = proj.select(F.col("vec_id").alias("pb"), "j", F.col("y").alias("yb"))
    dproj = (
        pa_.join(pb_, (F.col("pb") == F.col("pa") + _JL_PAIRS) & (pa_.j == pb_.j))
        .groupBy("pa", "pb")
        .agg(F.sqrt(F.sum(F.pow(F.col("ya") - F.col("yb"), 2))).alias("d_proj"))
    )
    return dorig.join(dproj, ["pa", "pb"]).select(
        "pa",
        "pb",
        F.round("d_orig", 6).alias("d_orig"),
        F.round("d_proj", 6).alias("d_proj"),
        # try_divide: a coincident pair (d_orig 0) has undefined distortion —
        # DuckDB 0/0 yields NULL, ANSI Spark raises (zero-vector sweep).
        F.round(F.try_divide(F.col("d_proj"), F.col("d_orig")), 6).alias("ratio"),
    )
