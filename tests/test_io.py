"""IO layer: partitioned layout round-trip + partition pruning, and
schema-explicit corrupt-row capture for JSON/CSV ingest."""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from trend_o_meter_spark import io as tio
from trend_o_meter_spark.catalog import table


def test_compact_table_shrinks_file_count_preserves_rows(spark, tmp_path):
    """200 tiny appended files compact into a handful; rows identical;
    the partitioned variant keeps the directory layout."""
    ev = table(spark, "events", "/root/testdata/sf0.001").select(
        "event_id", "ts", "event_type", "value"
    )
    flat = str(tmp_path / "flat")
    ev.repartition(200).write.parquet(flat)
    import pathlib

    n_before = len(list(pathlib.Path(flat).rglob("*.parquet")))
    assert n_before >= 200
    want = sorted(tuple(r) for r in ev.collect())
    n = tio.compact_table(spark, flat, target_file_bytes=64 * 1024 * 1024)
    files = list(pathlib.Path(flat).rglob("*.parquet"))
    assert len(files) <= n < n_before
    got = sorted(tuple(r) for r in spark.read.parquet(flat).collect())
    assert got == want

    part = str(tmp_path / "part")
    tio.write_daily_partitioned(ev.repartition(40), part)
    tio.compact_table(
        spark, part, target_file_bytes=64 * 1024 * 1024, partition_col="ds"
    )
    back = spark.read.parquet(part)
    assert sorted(back.columns) == sorted([*ev.columns, "ds"])
    assert back.count() == len(want)
    assert any(p.name.startswith("ds=") for p in pathlib.Path(part).iterdir())


def test_daily_partition_roundtrip_and_pruning(spark, tmp_path):
    ev = table(spark, "events", "/root/testdata/sf0.001").select(
        "event_id", "ts", "event_type", "value"
    )
    path = str(tmp_path / "events_daily")
    tio.write_daily_partitioned(ev, path)

    back = tio.read_daily_partitioned(spark, path)
    assert back.count() == ev.count()
    # payload survives the round trip (ds is additive)
    assert set(back.columns) == {"event_id", "ts", "event_type", "value", "ds"}

    one_day = back.select("ds").distinct().limit(1).collect()[0]["ds"]
    q = back.filter(F.col("ds") == one_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the day predicate must prune at file-listing level, not post-scan
    assert "PartitionFilters: [" in plan and "ds" in plan.split("PartitionFilters")[1][:120]
    expected = ev.filter(F.date_format("ts", "yyyy-MM-dd") == one_day).count()
    assert q.count() == expected


SENSOR_ROW = StructType(
    [
        StructField("id", LongType(), True),
        StructField("name", StringType(), True),
        StructField("val", DoubleType(), True),
    ]
)


def test_read_json_corrupt_capture(spark, tmp_path):
    p = tmp_path / "rows.jsonl"
    p.write_text('{"id": 1, "name": "a", "val": 2.5}\n{oops\n{"id": 2, "name": "b", "val": 3.0}\n')
    df = tio.read_json(spark, str(p), SENSOR_ROW)
    rows = df.collect()
    good = [r for r in rows if r[tio.CORRUPT_COL] is None]
    bad = [r for r in rows if r[tio.CORRUPT_COL] is not None]
    assert {r["id"] for r in good} == {1, 2}
    assert len(bad) == 1 and bad[0][tio.CORRUPT_COL] == "{oops"


def test_read_csv_corrupt_capture(spark, tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("id,name,val\n1,a,2.5\n2,b,not_a_number\n3,c,4.0\n")
    df = tio.read_csv(spark, str(p), SENSOR_ROW)
    rows = df.collect()
    bad = [r for r in rows if r[tio.CORRUPT_COL] is not None]
    assert len(bad) == 1 and "not_a_number" in bad[0][tio.CORRUPT_COL]
    good_ids = {r["id"] for r in rows if r[tio.CORRUPT_COL] is None}
    assert good_ids == {1, 3}


def test_orc_roundtrip(spark, tmp_path):
    # second columnar format: ORC write/read preserves rows and types
    ev = table(spark, "events", "/root/testdata/sf0.001").select(
        "event_id", "ts", "event_type", "value"
    )
    path = str(tmp_path / "events_orc")
    ev.write.format("orc").mode("overwrite").save(path)
    back = spark.read.format("orc").load(path)
    assert dict(back.dtypes) == dict(ev.dtypes)
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0 and ev.exceptAll(back).count() == 0


def test_sql_interface_views(spark):
    from trend_o_meter_spark.catalog import TABLES, register_views

    register_views(spark, "/root/testdata/sf0.001")
    for t in TABLES:
        assert spark.catalog.tableExists(t)
    n = spark.sql("SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey").collect()[0]["n"]
    assert n > 0


def test_register_source_seam(spark):
    """The source-adapter seam: a registered reader replaces the parquet
    path for one logical name (the Redis/Kafka deployment hook), without
    touching any operator; deregistering restores the default."""
    from trend_o_meter_spark.catalog import register_source

    fake = spark.createDataFrame([(1, "x")], "event_id long, event_type string")
    register_source("events", lambda sp, name, sf_dir: fake)
    try:
        out = table(spark, "events", "/root/testdata/sf0.001")
        assert out.collect() == fake.collect()
    finally:
        register_source("events", None)
    # default path restored: the real parquet table with its full schema
    restored = table(spark, "events", "/root/testdata/sf0.001")
    assert "ts" in restored.columns and restored.count() > 1


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located bucketed tables join with zero shuffle — the layout
    contract that makes repeated fact-fact joins survive 100 TB."""
    orders = table(spark, "orders", "/root/testdata/sf0.001").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = table(spark, "lineitem", "/root/testdata/sf0.001").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    try:
        tio.write_bucketed(orders, "b_orders", bucket_col="o_orderkey",
                           n_buckets=8, sort_col="o_orderkey")
        tio.write_bucketed(li, "b_lineitem", bucket_col="l_orderkey",
                           n_buckets=8, sort_col="l_orderkey")
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        for k, v in (
            ("spark.sql.autoBroadcastJoinThreshold", "-1"),
            ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
        ):
            spark.conf.set(k, v)
        try:
            j = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert j.count() == li.count()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_streaming_parquet_sink_exactly_once(spark, tmp_path):
    """File sink + checkpoint: replaying input after a restart must not
    duplicate rows in the output directory (the sink's commit log makes
    re-processed batches idempotent)."""
    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    schema = "event_id LONG, value DOUBLE"
    spark.createDataFrame([(1, 1.0), (2, 2.0)], schema).coalesce(1).write.mode(
        "append"
    ).json(str(src))

    def run_once():
        stream = spark.readStream.schema(schema).json(str(src))
        q = stream.writeStream.format("parquet").option(
            "checkpointLocation", str(ckpt)
        ).option("path", str(out)).trigger(availableNow=True).start()
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(str(out)).count()
    assert first == 2
    # restart with the same checkpoint: old files must not re-emit,
    # new file must arrive exactly once
    spark.createDataFrame([(3, 3.0)], schema).coalesce(1).write.mode("append").json(str(src))
    run_once()
    rows = sorted(r["event_id"] for r in spark.read.parquet(str(out)).collect())
    assert rows == [1, 2, 3]


def test_write_training_shards_reconstructs_epoch_order(spark, tmp_path):
    from trend_o_meter_spark.io import write_training_shards
    from trend_o_meter_spark.llm.text import epoch_shuffle

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    n = write_training_shards(df, str(tmp_path / "ep0"), n_shards=4, salt="epoch-0")
    assert n == 100

    back = spark.read.parquet(str(tmp_path / "ep0"))
    rows = back.select("shard", "position", "doc_id").collect()
    assert len(rows) == 100
    # shards hold contiguous, balanced position ranges covering 0..N-1
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["position"])
    assert set(by_shard) == {0, 1, 2, 3}
    bounds = sorted((min(v), max(v), len(v)) for v in by_shard.values())
    assert [b[2] for b in bounds] == [25, 25, 25, 25]
    assert bounds[0][0] == 0 and bounds[-1][1] == 99
    for (lo, hi, cnt) in bounds:
        assert hi - lo + 1 == cnt  # contiguous
    # (shard, position) order == the epoch_shuffle global order, reproducibly
    order = [r["doc_id"] for r in sorted(rows, key=lambda r: (r["shard"], r["position"]))]
    expect = [
        r["doc_id"]
        for r in sorted(epoch_shuffle(df, salt="epoch-0").collect(), key=lambda r: r["position"])
    ]
    assert order == expect
    # a different salt yields a different permutation
    write_training_shards(df, str(tmp_path / "ep1"), n_shards=4, salt="epoch-1")
    other = [
        r["doc_id"]
        for r in sorted(
            spark.read.parquet(str(tmp_path / "ep1")).select("shard", "position", "doc_id").collect(),
            key=lambda r: (r["shard"], r["position"]),
        )
    ]
    assert other != order and sorted(other) == sorted(order)


def test_compact_table_recovers_mid_swap_crash(spark, tmp_path):
    """compact_table's two-rename swap healed from both crash states."""
    import shutil

    from trend_o_meter_spark.io import compact_table, recover_table

    p = str(tmp_path / "t")
    spark.range(100).write.parquet(p)
    compact_table(spark, p)
    # crash state A: displaced, rewrite incomplete
    shutil.move(p, p + ".__old__")
    recover_table(p)
    assert spark.read.parquet(p).count() == 100
    # crash state B: displaced, rewrite complete (_SUCCESS present)
    shutil.move(p, p + ".__compact__")
    recover_table(p)
    assert spark.read.parquet(p).count() == 100
    # next compaction runs clean after recovery
    compact_table(spark, p)
    assert spark.read.parquet(p).count() == 100


def test_zorder_layout_narrows_per_file_ranges_on_both_dims(spark, tmp_path):
    """The Z-order claim, measured: against a linear sort on x, the
    Z layout must give y a dramatically narrower average per-row-group
    range (parquet footer min/max — exactly what scan pruning uses)
    while keeping x's range far below full-table."""
    import glob

    import pyarrow.parquet as pq

    from trend_o_meter_spark import io as tio

    rows = [(i % 141, (i * 7919) % 149) for i in range(20000)]
    df = spark.createDataFrame(rows, "x long, y long").repartition(8)
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    tio.write_zordered(df, zpath, cols=("x", "y"), n_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def avg_span(path, col):
        spans, full = [], (None, None)
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                spans.append(st.max - st.min)
                full = (
                    st.min if full[0] is None else min(full[0], st.min),
                    st.max if full[1] is None else max(full[1], st.max),
                )
        return (sum(spans) / len(spans)) / (full[1] - full[0])

    z_x, z_y = avg_span(zpath, "x"), avg_span(zpath, "y")
    lin_x, lin_y = avg_span(lpath, "x"), avg_span(lpath, "y")
    assert lin_y > 0.8, lin_y          # linear layout: y is full-range per file
    assert z_y < 0.5 * lin_y, (z_y, lin_y)  # z layout: y clusters too
    assert z_x < 0.6, z_x              # ...without giving x away entirely


def test_zorder_accepts_timestamp_columns(spark, tmp_path):
    """Timestamp dimensions order by epoch micros in the Z code (a raw
    timestamp difference would be an interval and break the scaling)."""
    from trend_o_meter_spark import io as tio
    from trend_o_meter_spark.catalog import table

    ev = table(spark, "events", "/root/testdata/sf0.001").select("ts", "value")
    path = str(tmp_path / "zt")
    tio.write_zordered(ev, path, cols=("ts", "value"), n_files=4)
    assert spark.read.parquet(path).count() == ev.count()
