"""Multimodal (image/audio/video) column handling.

Media rides as an opaque ``binary`` column plus typed metadata; the
Spark-side plumbing — schema, Arrow batching, ``mapInPandas`` signature,
partition sizing — is real and tested. The actual codec work (JPEG
decode, resampling, frame extraction) needs libraries absent from this
container, so each extractor dispatches to a decoder registry where the
real decoders raise ``NotImplementedError`` and a deterministic fake
decoder (header-derived pseudo-metadata) stands in for tests; swapping in
a real decoder is a one-function change, the plan shape is identical.

Scale notes: media batches are bounded by bytes not rows
(``media_repartition`` targets ~64 MB of payload per task), and metadata
extraction never shuffles — it is a narrow mapInPandas over the storage
partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "media_id string, kind string, n_bytes long, header_byte int, "
    "width int, height int, duration_ms long, ok boolean, error string"
)


def real_decode(kind: str, payload: bytes) -> dict:
    """Placeholder for the real codec path (PIL/libav/etc.)."""
    raise NotImplementedError(f"no {kind} decoder in this environment")


def fake_decode(kind: str, payload: bytes) -> dict:
    """Deterministic stand-in: metadata derived from the payload header.

    width  = header_byte * 4 + 32       (image-ish)
    height = second_byte * 2 + 16
    duration_ms = n_bytes * 10          (audio/video-ish)
    """
    if not payload:
        return {"ok": False, "error": "empty payload"}
    h0 = payload[0]
    h1 = payload[1] if len(payload) > 1 else 0
    return {
        "ok": True,
        "error": None,
        "header_byte": int(h0),
        "width": int(h0) * 4 + 32 if kind == "image" else None,
        "height": int(h1) * 2 + 16 if kind == "image" else None,
        "duration_ms": len(payload) * 10 if kind in ("audio", "video") else None,
    }


DECODERS = {"real": real_decode, "fake": fake_decode}


def extract_media_meta(
    media: DataFrame,
    id_col: str = "media_id",
    kind_col: str = "kind",
    payload_col: str = "payload",
    decoder: str = "fake",
) -> DataFrame:
    """(id, kind, payload binary) → typed metadata rows (META_SCHEMA).

    Narrow mapInPandas; per-row failures become (ok=false, error) rows —
    the pipeline's rejects-channel doctrine (SURVEY §2.7), never a thrown
    task."""
    decode = DECODERS[decoder]

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf[id_col], pdf[kind_col], pdf[payload_col]):
                base = {
                    "media_id": mid, "kind": kind,
                    "n_bytes": len(payload) if payload is not None else 0,
                    "header_byte": None, "width": None, "height": None,
                    "duration_ms": None, "ok": False, "error": None,
                }
                try:
                    base.update(decode(kind, bytes(payload) if payload is not None else b""))
                except NotImplementedError as e:
                    base["error"] = str(e)
                rows.append(base)
            out = pd.DataFrame(rows)
            for c, dt in (("n_bytes", "int64"), ("header_byte", "Int32"), ("width", "Int32"),
                          ("height", "Int32"), ("duration_ms", "Int64")):
                out[c] = out[c].astype(dt)
            yield out

    return media.select(
        F.col(id_col), F.col(kind_col), F.col(payload_col)
    ).mapInPandas(_gen, schema=META_SCHEMA)


def media_repartition(media: DataFrame, payload_col: str = "payload", target_bytes: int = 64 << 20) -> DataFrame:
    """Repartition so each task sees ~target_bytes of payload (media rows
    are huge — row-count partitioning starves or OOMs tasks)."""
    total = media.select(F.sum(F.length(payload_col))).first()[0] or 0
    n = max(1, int(total / target_bytes))
    return media.repartition(n)


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → frame rows (media_id, frame_no, frame_ts_ms, frame binary).
    Frame extraction itself is a registry decoder (fake: slices the
    payload deterministically) — the explode/plumbing is the real part."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, tss, frames = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                dur = len(p) * 10
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    lo = (ts // 10) % max(len(p), 1)
                    ids.append(mid)
                    nos.append(i)
                    tss.append(ts)
                    frames.append(p[lo : lo + 16])
            yield pd.DataFrame({"media_id": ids, "frame_no": pd.array(nos, dtype="int32"),
                                "frame_ts_ms": pd.array(tss, dtype="int64"), "frame": frames})

    return media.select("media_id", "payload").mapInPandas(
        _gen, schema="media_id string, frame_no int, frame_ts_ms long, frame binary"
    )
