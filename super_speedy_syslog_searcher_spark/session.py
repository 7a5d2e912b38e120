"""SparkSession factory with the pipeline's required configuration.

Session timezone is pinned to UTC: every timestamp in the engine is
UTC-normalized at parse time (the reference resolves every message
timestamp to a fixed offset — ``DateTimeL = chrono::DateTime<FixedOffset>``,
/root/reference/src/data/datetime.rs:132 — we normalize one step further
to UTC and keep the original offset out-of-band).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "s4spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cores`` accepts an int (→ ``local[n]``) or a full master string.
    In local mode the driver holds all executor threads, so
    ``spark.driver.memory`` is the only memory knob that matters.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = cores if isinstance(cores, str) and cores.startswith(("local", "spark://")) else f"local[{cores}]"
    n_shuffle = shuffle_partitions or int(os.environ.get("S4SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # commit output files in the tasks (v2), not one-by-one on the
        # driver (v1): the fan-out write produces tasks × sinks files and
        # the serial driver rename was measured as a non-scaling tail
        # that capped eff(4→16) at 16 cores
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.driver.memory", os.environ.get("S4SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def warm_python_workers(spark: SparkSession, tasks: int | None = None) -> None:
    """Spin up the executor Python-worker pool and pre-import the heavy
    modules (pandas/numpy + the parse kernel) so the first real UDF stage
    doesn't pay 32 concurrent cold imports. Call from benchmarks/jobs
    before the timed region; workers are reused afterwards
    (spark.python.worker.reuse)."""
    import pandas

    from pyspark.sql import functions as F

    n = tasks or spark.sparkContext.defaultParallelism * 4

    def _warm(s: pandas.Series) -> pandas.Series:
        from .functions import parse  # noqa: F401  (pre-import kernel deps)

        return s.astype("int32")

    _warm.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    warm_udf = F.pandas_udf(_warm, "int")
    spark.range(0, n, 1, n).select(warm_udf(F.col("id").cast("int"))).count()
