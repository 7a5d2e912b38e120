"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship end-to-end pipeline (render → tokenize →
parse → sessionize → enrich → merge-sort) on sf0.001; ``queries`` /
``oracle_sql`` expose each implemented operator from SURVEY.md §2 with a
DuckDB-checkable oracle. Implementation lives in
``super_speedy_syslog_searcher_spark.entry_queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from super_speedy_syslog_searcher_spark import entry_queries as EQ
from super_speedy_syslog_searcher_spark import entry_queries_binary as EQB
from super_speedy_syslog_searcher_spark import entry_queries_curation as EQC
from super_speedy_syslog_searcher_spark import entry_queries_data as EQD
from super_speedy_syslog_searcher_spark import entry_queries_tokens as EQT


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full parse→enrich→merge."""
    from pyspark.sql import functions as F

    from super_speedy_syslog_searcher_spark.operators.enrich import enrich
    from super_speedy_syslog_searcher_spark.operators.merge import global_sort, with_source_order

    sf_dir = "/root/testdata/sf0.001"
    msgs = EQ.parsed_messages(spark, sf_dir)
    enriched = enrich(msgs, EQ.enrichment_df(spark))
    merged = global_sort(with_source_order(enriched))
    return merged.select(
        "ts", "ts_ns", "source", "doc_id", "msg_no", "facility", "severity", "sink_key",
        "pattern_id", "n_lines", "text",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {**EQ.QUERIES, **EQD.QUERIES, **EQB.QUERIES, **EQC.QUERIES, **EQT.QUERIES}


def oracle_sql() -> dict[str, str]:
    return {**EQ.ORACLES, **EQD.ORACLES, **EQB.ORACLES, **EQC.ORACLES, **EQT.ORACLES}
