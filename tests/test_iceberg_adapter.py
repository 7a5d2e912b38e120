"""sources/iceberg.py — the catalog-or-parquet table adapter the routing
write path goes through (operators/route.py). No Iceberg jars in this
sandbox, so these tests pin the parquet-fallback semantics the adapter
must preserve: partition layout, dynamic partition overwrite, and
catalog detection returning None."""

from __future__ import annotations

from pyspark.sql import functions as F

from super_speedy_syslog_searcher_spark.sources.iceberg import (
    iceberg_catalog,
    read_table,
    write_table,
)


def test_no_catalog_in_sandbox(spark):
    assert iceberg_catalog(spark) is None


def test_roundtrip_with_partition_layout(spark, tmp_path):
    out = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, sink_key string"
    )
    write_table(df, out, partition_by=["sink_key"], mode="overwrite")
    # Iceberg-compatible hive layout: one directory per partition value
    dirs = sorted(p.name for p in (tmp_path / "t").iterdir() if p.is_dir())
    assert dirs == ["sink_key=a", "sink_key=b"]
    back = read_table(spark, out)
    assert {(r["doc_id"], r["sink_key"]) for r in back.collect()} == {
        (1, "a"),
        (2, "a"),
        (3, "b"),
    }


def test_dynamic_partition_overwrite(spark, tmp_path):
    """Overwrite must replace ONLY the partitions present in the new
    frame (Iceberg's overwrite-by-filter equivalence) — untouched sink
    partitions survive, the resume/idempotence property route_write's
    re-runs rely on."""
    out = str(tmp_path / "t")
    df1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, sink_key string"
    )
    write_table(df1, out, partition_by=["sink_key"], mode="overwrite")
    df2 = spark.createDataFrame([(9, "b")], "doc_id long, sink_key string")
    write_table(df2, out, partition_by=["sink_key"], mode="overwrite")
    got = {(r["doc_id"], r["sink_key"]) for r in read_table(spark, out).collect()}
    assert got == {(1, "a"), (9, "b")}  # 'a' survived, 'b' replaced


def test_unpartitioned_write(spark, tmp_path):
    out = str(tmp_path / "flat")
    df = spark.createDataFrame([(1,), (2,)], "x long")
    write_table(df, out, mode="overwrite")
    assert read_table(spark, out).count() == 2


def test_route_write_goes_through_adapter(spark, tmp_path):
    """route_write's committed layout equals the adapter's: sink_key
    hive dirs readable back through read_table."""
    from super_speedy_syslog_searcher_spark.operators.route import (
        route_write,
        sink_counts_from_path,
    )

    out = str(tmp_path / "routed")
    df = spark.createDataFrame(
        [("d1", "auth.info", 1, 10), ("d2", "auth.info", 2, 20), ("d3", "cron.err", 1, 5)],
        "doc_id string, sink_key string, n_lines long, n_chars long",
    ).withColumn("ts", F.lit("2023-06-01 12:00:00").cast("timestamp"))
    route_write(df, out)
    counts = {r["sink_key"]: r["messages"] for r in sink_counts_from_path(spark, out).collect()}
    assert counts == {"auth.info": 2, "cron.err": 1}
