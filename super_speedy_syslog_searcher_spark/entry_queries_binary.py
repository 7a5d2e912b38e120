"""Driver-contract queries for the binary-format analogues (SURVEY §2
P11-P13): utmpx-style fixed structs, journald export entries, evtx-style
record streams. Corpora are rendered deterministically from ``events`` so
each DuckDB oracle states expectations straight from ``events`` columns.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators.evtx import evtx_ordered
from .operators.fixedstruct import UTMPX, decode_fixedstruct, pack_records, time_ordered
from .operators.journal import parse_journal_export


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# P11 — fixedstruct
# ---------------------------------------------------------------------------
@F.pandas_udf(T.BinaryType())
def _pack_utmpx_udf(pid: pd.Series, user: pd.Series, tv_sec: pd.Series, tv_usec: pd.Series) -> pd.Series:
    out = [
        pack_records(UTMPX, int(p) % 8, int(p), u, int(s), int(us))
        for p, u, s, us in zip(pid, user, tv_sec, tv_usec)
    ]
    return pd.Series(out)


def fixedstruct_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → binary utmpx records, one doc per user, plus one null
    (all-0x00) record per doc that must be skipped."""
    ev = _events(spark, sf_dir)
    recs = ev.select(
        F.concat(F.lit("u"), F.lpad(F.col("user_id").cast("string"), 8, "0")).alias("doc_id"),
        F.concat(F.lit("utmpx.h"), (F.col("user_id") % 4).cast("string")).alias("source"),
        F.col("event_id").cast("int").alias("record_no"),
        _pack_utmpx_udf(
            F.col("event_id").cast("int"),
            F.concat(F.lit("u"), F.col("event_id")),
            F.unix_timestamp(F.col("ts").cast("timestamp")),
            F.date_format(F.col("ts"), "SSSSSS").cast("long"),
        ).alias("record"),
    )
    nulls = ev.groupBy("user_id").agg(F.count("*").alias("n")).select(
        F.concat(F.lit("u"), F.lpad(F.col("user_id").cast("string"), 8, "0")).alias("doc_id"),
        F.concat(F.lit("utmpx.h"), (F.col("user_id") % 4).cast("string")).alias("source"),
        F.lit(-1).alias("record_no"),
        F.lit(bytes(UTMPX.size)).alias("record"),
    )
    return recs.unionByName(nulls)


def q_fixedstruct_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack→score→decode→time-order roundtrip; null records dropped."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    corpus = fixedstruct_corpus(spark, sf_dir)
    decoded = decode_fixedstruct(corpus)
    ranked = time_ordered(decoded)
    return ranked.select(
        F.col("ut_pid").cast("bigint").alias("event_id"),
        "ts",
        F.col("rec_rank").cast("bigint").alias("rec_rank"),
        F.col("ut_user").alias("ut_user"),
    )


SQL_FIXEDSTRUCT_DECODE = """
SELECT event_id, ts,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rec_rank,
       'u' || event_id AS ut_user
FROM events
"""


# ---------------------------------------------------------------------------
# P13 — journal export
# ---------------------------------------------------------------------------
def journal_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → export-format docs (one per user); even event_ids carry a
    _SOURCE_REALTIME_TIMESTAMP 500 µs later, which must win."""
    ev = _events(spark, sf_dir)
    usec = F.unix_micros(F.col("ts").cast("timestamp"))
    entry = F.concat_ws(
        "\n",
        F.concat(F.lit("__REALTIME_TIMESTAMP="), usec.cast("string")),
        F.when(
            F.col("event_id") % 2 == 0,
            F.concat(F.lit("_SOURCE_REALTIME_TIMESTAMP="), (usec + 500).cast("string")),
        ),
        F.concat(F.lit("_PID="), F.col("event_id")),
        F.concat(F.lit("MESSAGE=evt "), F.col("event_type")),
    )
    return (
        ev.select("user_id", "event_id", entry.alias("entry"))
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("event_id", "entry"))).alias("ls"))
        .select(
            F.concat(F.lit("j"), F.lpad(F.col("user_id").cast("string"), 8, "0")).alias("doc_id"),
            F.concat(F.lit("journal.h"), (F.col("user_id") % 4).cast("string")).alias("source"),
            F.concat_ws("\n\n", F.transform("ls", lambda s: s["entry"])).alias("text"),
        )
    )


def q_journal_export_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = journal_corpus(spark, sf_dir)
    parsed = parse_journal_export(docs)
    return parsed.select(
        F.element_at("fields", "_PID").cast("bigint").alias("event_id"),
        "ts",
        F.col("n_fields").cast("int").alias("n_fields"),
    )


SQL_JOURNAL_EXPORT_PARSE = """
SELECT event_id,
       CASE WHEN event_id % 2 = 0 THEN make_timestamp(epoch_us(ts) + 500)
            ELSE make_timestamp(epoch_us(ts)) END AS ts,
       CAST(CASE WHEN event_id % 2 = 0 THEN 4 ELSE 3 END AS INT) AS n_fields
FROM events
"""


# ---------------------------------------------------------------------------
# P13b — native .journal binary container
# ---------------------------------------------------------------------------
def journal_native_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → real ``.journal`` container bytes, one file per user.

    Layout mix is deterministic by user_id: even users write COMPACT
    files; users ≡ 1/2/3 (mod 4) compress payloads ≥ 24 bytes with
    XZ/LZ4/zstd respectively (LZ4 and zstd decode through the
    pure-Python fallback in this container) — so one corpus exercises
    every reader path.  Entries are written in
    (ts, event_id) order with seqnum = file position + 1, matching how
    journald appends; even event_ids carry a _SOURCE_REALTIME_TIMESTAMP
    500 µs later (which must NOT win under the reference's compiled-in
    realtime precedence, journal.rs:123-173)."""
    from .operators.journal_native import JournalWriter

    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        uid = int(pdf["user_id"].iloc[0])
        # per-user codec mix: every supported data-object compression
        # (none/xz/lz4/zstd — the latter two through the pure-Python
        # fallback, functions/lz4_pure) is exercised by the driver gate
        w = JournalWriter(
            compact=(uid % 2 == 0),
            xz_min_payload=(24 if uid % 4 == 1 else None),
            lz4_min_payload=(24 if uid % 4 == 2 else None),
            zstd_min_payload=(24 if uid % 4 == 3 else None),
            first_array_capacity=4,
        )
        for ts, eid, etype in zip(pdf["ts"], pdf["event_id"], pdf["event_type"]):
            usec = pd.Timestamp(ts).value // 1000
            eid = int(eid)
            fields = [
                b"MESSAGE=evt " + str(etype).encode(),
                b"_PID=%d" % eid,
            ]
            if eid % 2 == 0:
                fields.append(b"_SOURCE_REALTIME_TIMESTAMP=%d" % (usec + 500))
            w.add_entry(usec, eid * 1000, fields)
        return pd.DataFrame([{
            "doc_id": f"jn{uid:08d}",
            "source": f"journal.n{uid % 4}",
            "payload": w.build(),
        }])

    return ev.groupBy("user_id").applyInPandas(
        _build, schema="doc_id string, source string, payload binary"
    )


_SEEK_CUTOFF_US = 1705363200000000  # 2024-01-16 00:00:00 UTC


def q_journal_native_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native journal container → entries, full parse AND seek pushdown in
    ONE query (r3 registry consolidation — absorbs the former
    ``journal_native_seek``).  The ``probe='full'`` rows check both
    timestamp precedences at once: ``ts`` is the reference's compiled-in
    realtime choice (journal.rs:123), ``ts_src`` re-derives journalctl's
    source-fallback from the parsed fields map.  The ``probe='seek'``
    rows re-walk the corpus with ``after_us`` — the analogue of the
    reference's sd_journal_seek_realtime_usec analyze step
    (journalreader.rs:1172-1196): pre-cutoff entries are skipped BEFORE
    their data objects are fetched."""
    from .operators.journal_native import parse_journal_native

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = journal_native_corpus(spark, sf_dir)

    def proj(parsed: DataFrame, probe: str) -> DataFrame:
        src_us = F.element_at("fields", "_SOURCE_REALTIME_TIMESTAMP").cast("long")
        return parsed.filter(F.col("entry_no") >= 0).select(
            F.element_at("fields", "_PID").cast("bigint").alias("event_id"),
            "ts",
            F.timestamp_micros(F.coalesce(src_us, F.col("realtime_us"))).alias("ts_src"),
            F.col("seqnum").cast("bigint").alias("seqnum"),
            F.col("n_fields").cast("int").alias("n_fields"),
            F.lit(probe).alias("probe"),
        )

    return proj(parse_journal_native(docs), "full").unionByName(
        proj(parse_journal_native(docs, after_us=_SEEK_CUTOFF_US), "seek")
    )


SQL_JOURNAL_NATIVE_PARSE = f"""
WITH allrows AS (
  SELECT event_id,
         ts,
         CASE WHEN event_id % 2 = 0 THEN make_timestamp(epoch_us(ts) + 500)
              ELSE ts END AS ts_src,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seqnum,
         CAST(CASE WHEN event_id % 2 = 0 THEN 3 ELSE 2 END AS INT) AS n_fields
  FROM events
)
SELECT *, 'full' AS probe FROM allrows
UNION ALL
SELECT *, 'seek' AS probe FROM allrows WHERE epoch_us(ts) >= {_SEEK_CUTOFF_US}
"""


# ---------------------------------------------------------------------------
# P12 — evtx record stream
# ---------------------------------------------------------------------------
_SCRAMBLE = "(event_id * 2654435761) % 4294967296"


def evtx_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → evtx-like struct rows arriving in scrambled order, plus
    duplicate records (every 97th) that must be deduped by (ts, id)."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        F.concat(F.lit("w"), (F.col("user_id") % 4).cast("string")).alias("source"),
        F.col("event_id").alias("record_id"),
        F.col("ts"),
        F.expr(_SCRAMBLE).alias("arrival_no"),
        F.concat(F.lit("<Event><ID>"), F.col("event_id"), F.lit("</ID></Event>")).alias("xml"),
    )
    dups = base.filter(F.col("record_id") % 97 == 0).withColumn(
        "arrival_no", F.col("arrival_no") + F.lit(1 << 33)
    )
    return base.unionByName(dups)


def q_evtx_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ordered = evtx_ordered(evtx_corpus(spark, sf_dir))
    return ordered.select(
        "source", "record_id",
        F.col("emit_rank").cast("bigint").alias("emit_rank"),
        F.col("is_out_of_order").cast("int").alias("is_out_of_order"),
    )


SQL_EVTX_ORDER = f"""
WITH base AS (
  SELECT 'w' || (user_id % 4) AS source, event_id AS record_id, ts,
         ({_SCRAMBLE}) AS arrival_no
  FROM events
  UNION ALL
  SELECT 'w' || (user_id % 4) AS source, event_id AS record_id, ts,
         ({_SCRAMBLE}) + 8589934592 AS arrival_no
  FROM events WHERE event_id % 97 = 0
),
dedup AS (
  SELECT * FROM (
    SELECT source, record_id, ts, arrival_no,
           row_number() OVER (PARTITION BY source, ts, record_id ORDER BY arrival_no) AS dup_rn
    FROM base
  ) WHERE dup_rn = 1
)
SELECT source, record_id,
       row_number() OVER (PARTITION BY source ORDER BY ts, record_id) AS emit_rank,
       CAST(coalesce((ts < lag(ts) OVER (PARTITION BY source ORDER BY arrival_no))::INT, 0) AS INT) AS is_out_of_order
FROM dedup
"""


# ---------------------------------------------------------------------------
# P12b — native .evtx binary container
# ---------------------------------------------------------------------------
def evtx_native_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → real ``.evtx`` container bytes, one file per source, with
    records written in scrambled arrival order plus duplicate records
    (every 97th) — the same stream shape as ``evtx_corpus`` but packed
    into the on-disk chunked format (ElfFile/ElfChnk headers, CRC32
    checksums, binary-XML payloads)."""
    from .operators.evtx_native import EvtxWriter

    ev = _events(spark, sf_dir)
    base = ev.select(
        F.concat(F.lit("wn"), (F.col("user_id") % 4).cast("string")).alias("source"),
        F.col("event_id").alias("record_id"),
        "ts",
        F.expr(_SCRAMBLE).alias("arrival_no"),
        F.col("event_type").alias("etype"),
    )
    dups = base.filter(F.col("record_id") % 97 == 0).withColumn(
        "arrival_no", F.col("arrival_no") + F.lit(1 << 33)
    )
    rows = base.unionByName(dups)

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        from .operators.evtx_native import Sub

        pdf = pdf.sort_values("arrival_no")
        src = pdf["source"].iloc[0]
        w = EvtxWriter()
        # even record ids go through a binxml TEMPLATE (id/type/level as
        # typed substitutions, level on an attribute) — the oracle's
        # record_id then comes out of template expansion, not literal
        # text; odd ids stay literal, so one file exercises both paths
        tpl = {
            "Event": {
                "@attrs": {"Level": Sub(2, 0x08)},
                "ID": Sub(0, 0x0A),
                "Type": Sub(1, 0x01),
            }
        }
        for rid, ts, et in zip(pdf["record_id"], pdf["ts"], pdf["etype"]):
            us = pd.Timestamp(ts).value // 1000
            if rid % 2 == 0:
                w.add_template_record(
                    int(rid), us, 7, tpl,
                    [(0x0A, int(rid)), (0x01, str(et)), (0x08, int(rid) % 100)],
                )
            else:
                w.add_record(int(rid), us, {"Event": {"ID": str(int(rid)), "Type": str(et)}})
        return pd.DataFrame([{"doc_id": src, "source": src, "payload": w.build()}])

    return rows.groupBy("source").applyInPandas(
        _build, schema="doc_id string, source string, payload binary"
    )


def q_evtx_native_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native container → records → the ordering operator.  The binxml
    decode is load-bearing: ``record_id`` is re-derived from the RENDERED
    XML (<ID> element), not the record header — a wrong binxml walk
    breaks the oracle, not just a cosmetic column."""
    from .operators.evtx_native import parse_evtx_native

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = evtx_native_corpus(spark, sf_dir)
    parsed = parse_evtx_native(docs)
    recs = parsed.filter(F.col("record_id") >= 0).select(
        "source",
        F.regexp_extract("xml", r"<ID>(\d+)</ID>", 1).cast("bigint").alias("record_id"),
        "ts",
        "arrival_no",  # file order == the scrambled write order
    )
    ordered = evtx_ordered(recs)
    return ordered.select(
        "source", "record_id",
        F.col("emit_rank").cast("bigint").alias("emit_rank"),
        F.col("is_out_of_order").cast("int").alias("is_out_of_order"),
    )


SQL_EVTX_NATIVE_ORDER = f"""
WITH base AS (
  SELECT 'wn' || (user_id % 4) AS source, event_id AS record_id, ts,
         ({_SCRAMBLE}) AS arrival_no
  FROM events
  UNION ALL
  SELECT 'wn' || (user_id % 4) AS source, event_id AS record_id, ts,
         ({_SCRAMBLE}) + 8589934592 AS arrival_no
  FROM events WHERE event_id % 97 = 0
),
dedup AS (
  SELECT * FROM (
    SELECT source, record_id, ts, arrival_no,
           row_number() OVER (PARTITION BY source, ts, record_id ORDER BY arrival_no) AS dup_rn
    FROM base
  ) WHERE dup_rn = 1
)
SELECT source, record_id,
       row_number() OVER (PARTITION BY source ORDER BY ts, record_id) AS emit_rank,
       CAST(coalesce((ts < lag(ts) OVER (PARTITION BY source ORDER BY arrival_no))::INT, 0) AS INT) AS is_out_of_order
FROM dedup
"""


QUERIES = {
    "fixedstruct_decode": q_fixedstruct_decode,
    "journal_export_parse": q_journal_export_parse,
    "journal_native_parse": q_journal_native_parse,
    "evtx_order": q_evtx_order,
    "evtx_native_order": q_evtx_native_order,
}

ORACLES = {
    "fixedstruct_decode": SQL_FIXEDSTRUCT_DECODE,
    "journal_export_parse": SQL_JOURNAL_EXPORT_PARSE,
    "journal_native_parse": SQL_JOURNAL_NATIVE_PARSE,
    "evtx_order": SQL_EVTX_ORDER,
    "evtx_native_order": SQL_EVTX_NATIVE_ORDER,
}
