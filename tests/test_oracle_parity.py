"""In-suite miniature of the driver correctness gate (tools/check_oracle.py).

Every ``__spark_entry__.queries()`` entry runs on Spark at sf0.001 and is
compared to its ``oracle_sql()`` twin on DuckDB: row count, column names,
and the same order-insensitive value hash the driver uses. Queries without
an oracle assert rows-only (>0 rows, stable schema).

Why this exists: round 4 shipped a red driver row because a SHARED oracle
SQL was widened for one consumer (``pipe_enrich_sinks`` grew a static∪asof
union) while a second consumer (``stream_enrich_sinks``) still emitted the
old shape — and 584 unit tests never noticed, because none of them ran a
registry entry against its registered oracle. This test makes that class
of regression impossible to ship silently (VERDICT r4 #1 done-criterion).
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None or v != v:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6g}"
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _frame_hash(df) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        "|".join(_norm_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _registry():
    import __spark_entry__ as entry

    return entry.queries(), entry.oracle_sql()


_QUERIES, _ORACLES = _registry()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = _QUERIES[name](spark, SF_DIR).toPandas()
    if name not in _ORACLES:
        # documented rows-only entries (iterative/non-SQL-expressible):
        # the driver gate records row count only — assert that much here
        assert len(sdf) > 0, f"{name}: rows-only query returned 0 rows"
        return
    odf = duck.sql(_ORACLES[name]).df()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} != oracle {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: cols {sorted(sdf.columns)} != oracle {sorted(odf.columns)}"
    )
    assert _frame_hash(sdf) == _frame_hash(odf), f"{name}: value-hash mismatch"
