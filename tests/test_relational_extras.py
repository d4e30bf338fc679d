"""Tests for the temporal joins, approximate aggregates, and sinks."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from parallel_map_reduce_spark import sinks
from parallel_map_reduce_spark.operators.temporal import asof_join, interval_self_join
from parallel_map_reduce_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", qt=_ts("2024-01-01 10:00:00"), px=1.0),
            Row(sym="A", qt=_ts("2024-01-01 10:00:05"), px=2.0),
            Row(sym="A", qt=_ts("2024-01-01 10:00:05"), px=3.0),  # dup ts
            Row(sym="B", qt=_ts("2024-01-01 10:00:01"), px=9.0),
        ]
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", tt=_ts("2024-01-01 10:00:03"), qty=10),  # after px=1
            Row(sym="A", tt=_ts("2024-01-01 10:00:05"), qty=20),  # ties: as-of <=
            Row(sym="B", tt=_ts("2024-01-01 10:00:00"), qty=30),  # before any quote
            Row(sym="C", tt=_ts("2024-01-01 10:00:00"), qty=40),  # no quotes at all
        ]
    )


def test_asof_join_semantics(quotes, trades):
    out = asof_join(
        trades,
        quotes.select("sym", "qt", F.col("px")),
        on="sym",
        left_ts="tt",
        right_ts="qt",
        value_cols=["px"],
    )
    rows = {(r.sym, r.qty): r.px for r in out.collect()}
    # inner semantics: B's trade precedes every quote, C has none — dropped
    assert rows == {("A", 10): 1.0, ("A", 20): 3.0}  # dup-ts tie → max tie_break


def test_asof_join_matches_oracle_shape(spark):
    from parallel_map_reduce_spark.registry import queries

    df = queries()["asof_join_purchase_to_view"](spark, SF)
    assert df.columns == ["event_id", "user_id", "ts", "view_event_id", "view_ts"]
    rows = df.collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert r.view_ts <= r.ts


def test_interval_self_join_band(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, t=_ts("2024-01-01 00:00:00"), i=1),
            Row(k=1, t=_ts("2024-01-01 00:00:30"), i=2),
            Row(k=1, t=_ts("2024-01-01 00:02:00"), i=3),
            Row(k=2, t=_ts("2024-01-01 00:00:10"), i=4),
        ]
    )
    pairs = interval_self_join(
        df, on="k", ts="t", band_seconds=60, left_cols=["i"], right_cols=["i"]
    )
    got = {(r.l_i, r.r_i) for r in pairs.collect()}
    # (1,2) within 60s; (2,3) is 90s apart; cross-key never pairs
    assert got == {(1, 2)}


def test_approx_aggregates_bounded_error(spark):
    """The query now carries its error-bound checks as output columns
    (oracle pattern); assert they hold AND the exact twin columns match
    an independently computed exact answer."""
    from parallel_map_reduce_spark.registry import queries

    row = queries()["approx_aggregates"](spark, SF).collect()[0]
    assert row.parts_within_3pct and row.orders_within_3pct
    assert row.median_within_1pct and row.p95_within_1pct
    li = load_table(spark, SF, "lineitem")
    exact = li.agg(
        F.countDistinct("l_partkey").alias("parts"),
        F.countDistinct("l_orderkey").alias("orders"),
    ).collect()[0]
    assert row.exact_parts == exact.parts
    assert row.exact_orders == exact.orders


def test_wordcount_text_sink_roundtrip(spark, tmp_path):
    from parallel_map_reduce_spark.operators.wordcount import wordcount

    docs = load_table(spark, SF, "documents")
    wc = wordcount(docs, "text")
    # O9: partitioned (16 reducers, like the reference); O10: combined
    part_dir = str(tmp_path / "parts")
    comb_dir = str(tmp_path / "combined")
    sinks.write_wordcount_text(wc, part_dir, num_partitions=16)
    sinks.write_wordcount_text(wc, comb_dir, combined=True)

    expected = {(r.word, r["count"]) for r in wc.collect()}
    for d in (part_dir, comb_dir):
        back = sinks.read_wordcount_text(spark, d)
        assert {(r.word, r["count"]) for r in back.collect()} == expected

    import glob

    assert len(glob.glob(f"{comb_dir}/part-*")) == 1
    assert 1 < len(glob.glob(f"{part_dir}/part-*")) <= 16


def test_wordcount_text_sink_colon_words(spark, tmp_path):
    """The reference's word:count format is ambiguous for words containing
    ':' (1,330 such lines in its own output) — we must round-trip them."""
    df = spark.createDataFrame([("of:", 3), ("a:b:c", 7)], ["word", "count"])
    d = str(tmp_path / "colons")
    sinks.write_wordcount_text(df, d, combined=True)
    back = sinks.read_wordcount_text(spark, d)
    assert {(r.word, r["count"]) for r in back.collect()} == {("of:", 3), ("a:b:c", 7)}


def test_parquet_sink_partition_pruning(spark, tmp_path):
    """Directory-partitioned parquet must allow partition pruning: a
    filter on the partition column reads only that directory."""
    orders = load_table(spark, SF, "orders")
    d = str(tmp_path / "orders_by_status")
    sinks.write_parquet(orders, d, partition_by=["o_orderstatus"])
    back = spark.read.parquet(d).filter(F.col("o_orderstatus") == "F")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    n_f = orders.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == n_f


def test_salted_join_equals_plain_join(spark):
    from parallel_map_reduce_spark.operators.skew import salted_join

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    dim = orders.withColumnRenamed("o_orderkey", "l_orderkey").limit(200)
    plain = (
        li.join(dim, "l_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("q"))
    )
    salted = (
        salted_join(li, dim, "l_orderkey", num_salts=8)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("q"))
    )
    want = {tuple(r) for r in plain.collect()}
    got = {tuple(r) for r in salted.collect()}
    assert got == want


def test_salted_join_takes_sort_merge_path(spark):
    """The recipe must exercise the shuffle path it exists for — if the
    small side silently broadcasts, the salt is dead code."""
    import io
    from contextlib import redirect_stdout

    from parallel_map_reduce_spark.operators.skew import salted_join

    li = load_table(spark, SF, "lineitem").select("l_orderkey")
    dim = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    out = salted_join(li, dim, "l_orderkey", num_salts=8)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("simple")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_salted_count_distinct_equals_exact(spark):
    from parallel_map_reduce_spark.operators.skew import salted_count_distinct

    li = load_table(spark, SF, "lineitem")
    got = {
        (r["l_returnflag"], r["n_distinct"])
        for r in salted_count_distinct(li, "l_returnflag", "l_partkey").collect()
    }
    want = {
        (r["l_returnflag"], r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert got == want


@pytest.mark.parametrize("fmt", ["csv", "json", "orc", "xml"])
def test_format_connectors_roundtrip(spark, tmp_path, fmt):
    from pyspark.sql import types as T

    from parallel_map_reduce_spark.sources import formats

    src = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .limit(500)
    )
    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
        ]
    )
    d = str(tmp_path / fmt)
    if fmt == "csv":
        formats.write_csv(src, d)
        back = formats.read_csv(spark, d, schema)
    elif fmt == "json":
        formats.write_json(src, d)
        back = formats.read_json(spark, d, schema)
    elif fmt == "xml":
        formats.write_xml(src, d)
        back = formats.read_xml(spark, d, schema)
    else:
        formats.write_orc(src, d)
        back = formats.read_orc(spark, d)
    assert back.schema == schema
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Bucketed tables co-partition on the join key at WRITE time — the
    join then needs no Exchange on either side. This is the 100 TB recipe
    for a fact-fact join that repeats across many queries: pay the
    shuffle once when landing the data."""
    import io
    from contextlib import redirect_stdout

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    sinks.write_parquet(
        li, str(tmp_path / "li"), buckets=(8, "l_orderkey", "t_li_b")
    )
    sinks.write_parquet(
        orders, str(tmp_path / "ord"), buckets=(8, "o_orderkey", "t_ord_b")
    )
    try:
        t1 = spark.table("t_li_b")
        t2 = spark.table("t_ord_b")
        joined = t1.join(t2.hint("merge"), t1["l_orderkey"] == t2["o_orderkey"])
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("simple")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
        # and it is still correct
        n = joined.count()
        want = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).count()
        assert n == want
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_ord_b")


def test_csv_failfast_on_corrupt_rows(spark, tmp_path):
    """FAILFAST must surface corrupt rows as job errors, never silent
    nulls — a 100 TB ingest that silently nulls a column is data loss."""
    from pyspark.sql import types as T
    from pyspark.sql.utils import CapturedException

    from parallel_map_reduce_spark.sources import formats

    d = tmp_path / "bad"
    d.mkdir()
    (d / "part.csv").write_text("a,b\n1,2\nnot_a_number,3\n")
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.LongType())]
    )
    back = formats.read_csv(spark, str(d), schema)
    import pytest as _pytest

    with _pytest.raises(Exception) as exc:
        back.collect()
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)


def test_json_permissive_quarantine_split(spark, tmp_path):
    """PERMISSIVE mode must route malformed rows to quarantine and keep
    clean rows flowing — with counts adding up to the input lines."""
    from pyspark.sql import types as T

    from parallel_map_reduce_spark.sources.formats import read_json_with_quarantine

    p = tmp_path / "in.json"
    p.write_text(
        '{"id": 1, "v": "a"}\n'
        '{"id": "NOT_A_NUMBER", "v": "b"}\n'
        '{"id": 3, "v": "c"}\n'
        "this is not json at all\n"
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    clean, quarantined = read_json_with_quarantine(spark, str(p), schema)
    assert {r["id"] for r in clean.collect()} == {1, 3}
    assert quarantined.count() == 2


def test_sorted_parquet_layout_prunes_row_groups(spark, tmp_path):
    """write_parquet_sorted must produce files with disjoint key ranges
    and tight row-group min/max stats — verified directly against the
    parquet footers, which is exactly what a scan's pruning reads."""
    import glob

    import pyarrow.parquet as pq

    from parallel_map_reduce_spark.sinks import write_parquet_sorted
    from parallel_map_reduce_spark.sources.tables import load_table

    out = str(tmp_path / "orders_sorted")
    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    write_parquet_sorted(orders, out, "o_orderkey", n_files=8)

    ranges = []
    for f in sorted(glob.glob(out + "/part-*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = [
            i
            for i in range(meta.num_columns)
            if meta.row_group(0).column(i).path_in_schema == "o_orderkey"
        ][0]
        lo = min(meta.row_group(g).column(idx).statistics.min for g in range(meta.num_row_groups))
        hi = max(meta.row_group(g).column(idx).statistics.max for g in range(meta.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) == 8
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"file key ranges overlap: {(lo1, hi1)} vs {(lo2, hi2)}"


def test_hll_union_estimate_within_bound(spark):
    """The merged-sketch estimate must be within the datasketches 2%
    guarantee of the exact distinct count (and exactly equal while the
    sketch is in sparse mode, i.e. at testdata cardinalities)."""
    ev = load_table(spark, SF, "events")
    merged = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    exact = ev.select("user_id").distinct().count()
    assert abs(merged - exact) <= max(1, 0.02 * exact)


def test_observation_metrics_without_extra_pass(spark):
    """df.observe must deliver pipeline telemetry (row counts, sums)
    from the SAME single execution that produces the result — the
    production pattern for data-quality counters at 100 TB, where a
    second counting pass over the input is unaffordable."""
    from pyspark.sql import Observation

    obs = Observation("lineitem_scan")
    li = load_table(spark, SF, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum("l_quantity").alias("qty_seen"),
    )
    out = li.filter(F.col("l_quantity") > 25).groupBy("l_returnflag").count()
    result_rows = out.collect()
    assert len(result_rows) > 0
    # metrics reflect the pre-filter scan, proving they rode the same job
    exact = load_table(spark, SF, "lineitem")
    assert obs.get["rows_seen"] == exact.count()
    assert abs(obs.get["qty_seen"] - exact.agg(F.sum("l_quantity")).collect()[0][0]) < 1e-6


def test_publish_dataset_shards_and_manifest(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    total = orders.count()
    out = str(tmp_path / "published")
    manifest = sinks.publish_dataset(
        spark, orders, out, rows_per_shard=300, n_writers=4
    ).collect()
    # every shard respects the cap; row accounting is exact
    assert all(r["rows"] <= 300 for r in manifest)
    assert sum(r["rows"] for r in manifest) == total
    assert all(r["bytes"] > 0 for r in manifest)
    assert len(manifest) >= total // 300
    # the published data reads back whole
    back = spark.read.parquet(out)
    assert back.count() == total
    assert back.agg(F.sum("o_orderkey")).collect()[0][0] == orders.agg(
        F.sum("o_orderkey")
    ).collect()[0][0]
    # the manifest file is itself readable and matches
    mf = spark.read.json(out + "/_manifest")
    assert {
        (r["shard"], r["rows"], r["bytes"]) for r in mf.collect()
    } == {(r["shard"], r["rows"], r["bytes"]) for r in manifest}
