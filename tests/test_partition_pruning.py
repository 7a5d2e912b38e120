"""Scan-level evidence for the F4/F5 "seek" analogue: the -a/-b window
must reach the parquet scan as (a) pushed row-group filters on ts and
(b) PartitionFilters on a date partition column when one exists — the
two pruning layers a 100-TB day-partitioned log table lives on."""
from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from super_speedy_syslog_searcher_spark.operators.filters import dt_between


@pytest.fixture(scope="module")
def day_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("daytab") / "msgs")
    df = (
        spark.range(0, 10 * 24)
        .select(
            F.col("id").alias("msg_no"),
            (F.to_timestamp(F.lit("2023-06-01 00:00:00")) + F.make_interval(hours=F.col("id"))).alias("ts"),
        )
        .withColumn("dt_date", F.to_date("ts"))
    )
    df.write.partitionBy("dt_date").mode("overwrite").parquet(path)
    return path


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ts_predicate_is_pushed_to_scan(spark, day_table):
    df = spark.read.parquet(day_table)
    out = dt_between(df, a=datetime(2023, 6, 3), b=datetime(2023, 6, 4, 23, 0))
    plan = _plan(out)
    assert "PushedFilters" in plan and "GreaterThanOrEqual(ts" in plan, plan


def test_date_partition_pruning(spark, day_table):
    df = spark.read.parquet(day_table)
    a, b = datetime(2023, 6, 3), datetime(2023, 6, 4, 23, 0)
    out = dt_between(df, a=a, b=b, date_partition_col="dt_date")
    plan = _plan(out)
    # the derived DATE bounds become PartitionFilters at the scan
    assert "PartitionFilters" in plan and "dt_date" in plan.split("PartitionFilters", 1)[1][:300], plan
    # and the scan actually opens only the 2 matching day directories
    # (inputFiles() reports the unpruned relation; input_file_name() over
    # the executed rows is the execution-truth file set)
    files = [r[0] for r in out.select(F.input_file_name()).distinct().collect()]
    days = {f.split("dt_date=")[1].split("/")[0] for f in files}
    assert days == {"2023-06-03", "2023-06-04"}, days
    # row-level window still exact (inclusive both ends)
    rows = out.agg(F.min("ts"), F.max("ts"), F.count("*")).collect()[0]
    assert rows[0] == a and rows[1] == b and rows[2] == 48


def test_date_bounds_are_superset_not_substitute(spark, day_table):
    # same result with and without the partition predicate
    df = spark.read.parquet(day_table)
    a, b = datetime(2023, 6, 3, 12), datetime(2023, 6, 5, 6)
    plain = dt_between(df, a=a, b=b).orderBy("msg_no").collect()
    pruned = dt_between(df, a=a, b=b, date_partition_col="dt_date").orderBy("msg_no").collect()
    assert plain == pruned and len(plain) > 0
