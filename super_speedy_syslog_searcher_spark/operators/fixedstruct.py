"""Fixed-width binary record decoding (utmp/utmpx family) — P11.

Reference: ``FixedStructReader`` scores a file's bytes against all struct
layout variants and the best-scoring layout wins
(/root/reference/src/readers/fixedstructreader.rs:174-232, score result
:153-165); per-variant layouts live in
/root/reference/src/data/fixedstruct.rs:453-527 (utmpx field sizes
UT_LINESIZE=16, UT_USERSIZE=32, UT_HOSTSIZE=128); records are indexed by
their embedded ``timeval`` so emission is time-ordered even when the file
is not (fixedstructreader.rs:116); null records (all 0x00/0xFF) are
skipped (fixedstruct.rs:189-190).

Spark realization: records ride a ``binary`` column; a vectorized pandas
UDF decodes whole Arrow batches with numpy strided views (no per-record
Python structs); layout election is a per-source aggregation over sampled
scores (the analogue of per-file scoring); per-doc time order is restored
with a window rank, not a global sort.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class Layout:
    """One fixed-struct layout variant (≙ FixedStructType)."""

    name: str
    size: int
    off_type: int
    off_pid: int
    off_user: int
    user_len: int
    off_tv_sec: int
    off_tv_usec: int
    tv_width: int  # 8 (int64) or 4 (int32)


# utmpx-like (linux_x86 shape, fixedstruct.rs:511-527): type@0(+pad2),
# pid@4, line@8[16], id@24[8], user@32[32], host@64[128], tv@192/200
UTMPX = Layout("utmpx", 208, 0, 4, 32, 32, 192, 200, 8)
# compact utmp32-like variant
UTMP32 = Layout("utmp32", 48, 0, 4, 16, 8, 40, 44, 4)

LAYOUTS = [UTMPX, UTMP32]
LAYOUT_BY_NAME = {l.name: l for l in LAYOUTS}


def pack_records(layout: Layout, ut_type: int, pid: int, user: str, tv_sec: int, tv_usec: int) -> bytes:
    """Build one record (corpus/test construction only)."""
    buf = bytearray(layout.size)
    buf[layout.off_type : layout.off_type + 2] = int(ut_type).to_bytes(2, "little", signed=True)
    buf[layout.off_pid : layout.off_pid + 4] = int(pid).to_bytes(4, "little", signed=True)
    ub = user.encode()[: layout.user_len]
    buf[layout.off_user : layout.off_user + len(ub)] = ub
    w = layout.tv_width
    buf[layout.off_tv_sec : layout.off_tv_sec + w] = int(tv_sec).to_bytes(w, "little", signed=True)
    buf[layout.off_tv_usec : layout.off_tv_usec + w] = int(tv_usec).to_bytes(w, "little", signed=True)
    return bytes(buf)


def _batch_view(payloads: list[bytes], layout: Layout) -> np.ndarray | None:
    """Stack equal-sized records into an (n, size) uint8 matrix."""
    ok = [p for p in payloads if p is not None and len(p) == layout.size]
    if len(ok) != len(payloads) or not ok:
        return None
    return np.frombuffer(b"".join(ok), dtype=np.uint8).reshape(len(ok), layout.size)


def _masked_view(payloads: list[bytes | None], layout: Layout) -> tuple[np.ndarray, np.ndarray]:
    """(ok_mask, matrix-of-ok-records). Wrong-size / None records are
    excluded from the matrix but keep their position in the mask, so a
    single truncated record never corrupts its siblings (the reference
    skips only the bad record — fixedstructreader.rs:174-232)."""
    ok = np.array([p is not None and len(p) == layout.size for p in payloads], dtype=bool)
    good = [p for p, o in zip(payloads, ok) if o]
    if not good:
        return ok, np.empty((0, layout.size), dtype=np.uint8)
    return ok, np.frombuffer(b"".join(good), dtype=np.uint8).reshape(len(good), layout.size)


def _decode_matrix(m: np.ndarray, layout: Layout) -> dict[str, np.ndarray]:
    w = layout.tv_width
    tv_dtype = "<i8" if w == 8 else "<i4"
    return {
        "ut_type": m[:, layout.off_type : layout.off_type + 2].copy().view("<i2")[:, 0],
        "ut_pid": m[:, layout.off_pid : layout.off_pid + 4].copy().view("<i4")[:, 0],
        "user_bytes": m[:, layout.off_user : layout.off_user + layout.user_len],
        "tv_sec": m[:, layout.off_tv_sec : layout.off_tv_sec + w].copy().view(tv_dtype)[:, 0].astype(np.int64),
        "tv_usec": m[:, layout.off_tv_usec : layout.off_tv_usec + w].copy().view(tv_dtype)[:, 0].astype(np.int64),
    }


def score_layout(m: np.ndarray, layout: Layout) -> int:
    """Plausibility score (≙ score_fixedstruct, fixedstructreader.rs:964):
    +1 per record for sane ut_type, sane epoch, printable user field."""
    d = _decode_matrix(m, layout)
    s = 0
    s += int(((d["ut_type"] >= 0) & (d["ut_type"] <= 10)).sum())
    s += int(((d["tv_sec"] > 0) & (d["tv_sec"] < 4102444800)).sum())  # < 2100
    ub = d["user_bytes"]
    printable = ((ub == 0) | ((ub >= 0x20) & (ub < 0x7F))).all(axis=1)
    s += int(printable.sum())
    return s


def elect_layouts(
    records: DataFrame,
    payload_col: str = "record",
    sample_per_source: int = 64,
    doc_sample_mod: int = 20,
) -> dict[str, str]:
    """Per-source layout election from a bounded sample (≙ per-file
    preprocessing, fixedstructreader.rs:174-232). The hash filter cuts
    ~1/doc_sample_mod of docs BEFORE the group collect so the election job
    reads a bounded fraction at any corpus size; sources that lose every
    doc to the sample fall back to the default layout (decode still tags
    wrong-size records invalid). Returns {source: layout_name}."""
    sampled = records.filter(F.pmod(F.xxhash64("doc_id"), F.lit(doc_sample_mod)) == 0)
    if sampled.isEmpty():
        sampled = records
    sample = (
        sampled.groupBy("source")
        .agg(F.slice(F.collect_list(payload_col), 1, sample_per_source).alias("recs"))
        .collect()
    )
    out: dict[str, str] = {}
    for row in sample:
        best_name, best_score = None, -1
        for layout in LAYOUTS:
            m = _batch_view([bytes(r) for r in row["recs"]], layout)
            if m is None:
                continue
            sc = score_layout(m, layout)
            if sc > best_score:
                best_name, best_score = layout.name, sc
        if best_name:
            out[row["source"]] = best_name
    return out


DECODED_SCHEMA = (
    "doc_id string, source string, record_no int, ut_type int, ut_pid int, "
    "ut_user string, ts timestamp, valid boolean"
)


def decode_fixedstruct(
    records: DataFrame,
    layout_by_source: dict[str, str] | None = None,
    payload_col: str = "record",
) -> DataFrame:
    """(doc_id, source, record_no, record binary) → decoded rows.

    Null records (all 0x00 / all 0xFF) are emitted with valid=false
    (rejects-channel doctrine) — the reference skips them
    (fixedstruct.rs:189-190).
    """
    layout_by_source = layout_by_source or elect_layouts(records, payload_col)

    def _gen(batches):
        for pdf in batches:
            frames = []
            for src, g in pdf.groupby("source", sort=False):
                layout = LAYOUT_BY_NAME.get(layout_by_source.get(src, "utmpx"), UTMPX)
                payloads = [bytes(p) if p is not None else None for p in g[payload_col]]
                n = len(payloads)
                ok, m = _masked_view(payloads, layout)
                # defaults for wrong-size / None records (valid=false)
                ut_type = np.zeros(n, dtype="int32")
                ut_pid = np.zeros(n, dtype="int32")
                users = [""] * n
                ts = pd.Series([pd.NaT] * n, dtype="datetime64[ns, UTC]")
                valid = ok.copy()
                if len(m):
                    d = _decode_matrix(m, layout)
                    null_rec = (m == 0).all(axis=1) | (m == 0xFF).all(axis=1)
                    ut_type[ok] = d["ut_type"].astype("int32")
                    ut_pid[ok] = d["ut_pid"].astype("int32")
                    decoded_users = [
                        row.tobytes().split(b"\x00", 1)[0].decode("ascii", "replace")
                        for row in d["user_bytes"]
                    ]
                    for pos, u in zip(np.flatnonzero(ok), decoded_users):
                        users[pos] = u
                    ok_ts = pd.to_datetime(d["tv_sec"] * 1_000_000 + d["tv_usec"], unit="us", utc=True)
                    ts.iloc[np.flatnonzero(ok)] = ok_ts
                    valid[ok] = ~null_rec
                frames.append(
                    pd.DataFrame(
                        {
                            "doc_id": g["doc_id"].to_numpy(),
                            "source": g["source"].to_numpy(),
                            "record_no": g["record_no"].to_numpy(),
                            "ut_type": ut_type,
                            "ut_pid": ut_pid,
                            "ut_user": users,
                            "ts": ts,
                            "valid": valid,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
                columns=["doc_id", "source", "record_no", "ut_type", "ut_pid", "ut_user", "ts", "valid"]
            )

    return records.select("doc_id", "source", "record_no", payload_col).mapInPandas(_gen, schema=DECODED_SCHEMA)


def time_ordered(decoded: DataFrame) -> DataFrame:
    """Valid records ranked by embedded timeval within each doc — the
    reference's BTreeMap<(tv_pair)> emission order
    (fixedstructreader.rs:116,174-232). Window per doc (bounded), not a
    global sort."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("ts", "record_no")
    return decoded.filter(F.col("valid")).withColumn("rec_rank", F.row_number().over(w))
