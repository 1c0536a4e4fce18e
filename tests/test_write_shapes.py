"""Write-path scale shapes: file sizing, compaction, stratified sampling,
cross-sf loader memo safety, streaming state store presence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cbde_mapreduce_spark.sources import load_table


def _parquet_files(path):
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def test_max_records_per_file_controls_file_count(spark, sf_smoke, tmp_path):
    """The small-files problem is managed at write time: maxRecordsPerFile
    bounds file size; coalesce(1) compacts."""
    li = load_table(spark, sf_smoke, "lineitem")  # 6000 rows
    sized = str(tmp_path / "sized")
    li.coalesce(1).write.option("maxRecordsPerFile", 1000).mode("overwrite").parquet(sized)
    assert len(_parquet_files(sized)) >= 6
    compact = str(tmp_path / "compact")
    li.coalesce(1).write.mode("overwrite").parquet(compact)
    assert len(_parquet_files(compact)) == 1
    assert spark.read.parquet(sized).count() == spark.read.parquet(compact).count() == li.count()


def test_stratified_sample_proportions(spark, sf_oracle):
    """sampleBy: per-stratum sampling fractions (MR reservoir-per-key parity)."""
    events = load_table(spark, sf_oracle, "events")
    fractions = {"click": 0.5, "view": 0.1, "purchase": 1.0, "signup": 0.0, "error": 0.0}
    sample = events.sampleBy("event_type", fractions, seed=42)
    got = {r.event_type: r.n for r in sample.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r.event_type: r.n for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got.get("signup", 0) == 0 and got.get("error", 0) == 0
    assert got["purchase"] == full["purchase"]
    assert 0.35 * full["click"] < got["click"] < 0.65 * full["click"]
    assert got["view"] < 0.25 * full["view"]


def test_loader_memo_is_per_sf_dir(spark):
    a = load_table(spark, "/root/testdata/sf0.001", "orders")
    b = load_table(spark, "/root/testdata/sf0.01", "orders")
    assert a.count() == 1500 and b.count() == 15000
    # memo returns the same DataFrame object for repeated loads
    assert load_table(spark, "/root/testdata/sf0.001", "orders") is a


def test_streaming_agg_uses_state_store(spark, sf_smoke):
    from cbde_mapreduce_spark.streaming import run_streaming_tumbling

    df = run_streaming_tumbling(spark, sf_smoke)
    assert df.count() > 0
    progress = [q for q in spark.streams.active]
    # bounded AvailableNow query already terminated; presence of results from
    # the memory sink implies the stateful aggregation ran to completion
    assert progress == []


def test_zorder_write_tightens_multi_column_stats(spark, sf_oracle, tmp_path):
    """Z-ordered layout must (a) preserve the data exactly and (b) let a
    two-column point predicate prune strictly more row groups than the
    unordered layout — measured from real parquet min/max stats."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from cbde_mapreduce_spark.sources import load_table
    from cbde_mapreduce_spark.sources.zorder import write_zordered

    li = load_table(spark, sf_oracle, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    li.repartition(8).write.parquet(plain)
    write_zordered(li, zed, ["l_partkey", "l_suppkey"], n_files=8)

    back = spark.read.parquet(zed)
    assert back.count() == li.count()
    assert back.agg(F.sum("l_quantity")).collect()[0][0] == li.agg(
        F.sum("l_quantity")
    ).collect()[0][0]

    # a mid-range 2-d point probe
    probe = li.select("l_partkey", "l_suppkey").collect()[len(li.collect()) // 2]

    def candidate_row_groups(directory):
        n_total = n_hit = 0
        for f in glob.glob(f"{directory}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                n_total += 1
                g = md.row_group(rg)
                pk = g.column(cols["l_partkey"]).statistics
                sk = g.column(cols["l_suppkey"]).statistics
                if (
                    pk.min <= probe.l_partkey <= pk.max
                    and sk.min <= probe.l_suppkey <= sk.max
                ):
                    n_hit += 1
        return n_hit, n_total

    hit_p, tot_p = candidate_row_groups(plain)
    hit_z, tot_z = candidate_row_groups(zed)
    assert tot_p > 0 and tot_z > 0
    # unordered files see nearly every row group as a candidate; z-order
    # must prune strictly better
    assert hit_z < hit_p, f"z-order did not prune: {hit_z}/{tot_z} vs {hit_p}/{tot_p}"


def test_compaction_bounds_files_and_preserves_rows(spark, sf_oracle, tmp_path):
    """Small-files compaction: a 64-file shattered copy of orders compacts to
    the planned bounded file count, preserves every row, and leaves each
    file covering a disjoint sort-key range (tight min/max for pruning)."""
    import glob

    import pyarrow.parquet as pq

    from cbde_mapreduce_spark.sources.compact import compact_files, plan_target_files

    orders = load_table(spark, sf_oracle, "orders")
    shattered = str(tmp_path / "shattered")
    orders.repartition(64).write.parquet(shattered)
    assert len(glob.glob(f"{shattered}/part-*.parquet")) == 64

    n = orders.count()
    dest = str(tmp_path / "compacted")
    target = compact_files(spark, shattered, dest, "o_orderkey", rows_per_file=4000)
    assert target == plan_target_files(n, 4000)

    files = sorted(glob.glob(f"{dest}/part-*.parquet"))
    assert len(files) == target < 64
    back = spark.read.parquet(dest)
    assert back.count() == n
    assert back.select(F.sum("o_orderkey")).first()[0] == orders.select(F.sum("o_orderkey")).first()[0]

    # disjoint key ranges across files => post-compaction point/range scans
    # prune at file granularity
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "o_orderkey"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"
