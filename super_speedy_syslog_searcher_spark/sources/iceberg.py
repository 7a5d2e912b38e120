"""Iceberg-or-parquet table IO.

The north_rule targets Iceberg tables (10^12-sequence corpus: min/max
stats + partition pruning on (day(ts), source), snapshot isolation for
the checkpoint/resume manifest, compaction for the fan-out sinks). This
sandbox has no Iceberg jars, so every write goes through this adapter:
when an Iceberg catalog is configured on the session the DataFrameV2
``writeTo`` path is used; otherwise plain parquet paths with the SAME
partition layout — the layout is Iceberg-compatible, a catalog import
away from a real deployment.

Production configuration (cluster side, not sandbox):

    --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.lake.type=hive  (or glue/rest/hadoop)
    --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of a configured Iceberg catalog, or None."""
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:
        return None
    for k, v in confs:
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3 and "iceberg" in v.lower():
            return k.rsplit(".", 1)[-1]
    return None


def write_table(
    df: DataFrame,
    ident: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write to ``catalog.db.table`` (Iceberg) or a path (parquet).

    ``ident`` containing '/' is treated as a path. BOTH branches have
    dynamic-partition-overwrite semantics — ``mode="overwrite"``
    replaces only the partitions present in ``df`` and leaves the rest
    untouched (the property the resumable pipeline's re-do idempotence
    depends on): ``overwritePartitions()`` on Iceberg, the
    ``partitionOverwriteMode=dynamic`` option on parquet. A
    whole-table replace (``createOrReplace``) would destroy previously
    committed sources whose manifest rows say they are done."""
    spark = df.sparkSession
    cat = iceberg_catalog(spark)
    if cat and "/" not in ident:
        writer = df.writeTo(f"{cat}.{ident}")
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            if spark.catalog.tableExists(f"{cat}.{ident}"):
                writer.overwritePartitions()
            else:
                writer.createOrReplace()  # first write creates the table
        else:
            writer.append()
        return
    w = df.write.mode(mode).option("partitionOverwriteMode", "dynamic")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ident)


def read_table(spark: SparkSession, ident: str) -> DataFrame:
    cat = iceberg_catalog(spark)
    if cat and "/" not in ident:
        return spark.table(f"{cat}.{ident}")
    return spark.read.parquet(ident)
