"""Token ↔ text codec for the pre-tokenized corpus (BASELINE.json input_hint).

Input rows are ``(doc_id string, tokens array<int32>, n_tok int32,
source string)`` where each token is a Unicode codepoint, so decode is
``''.join(chr(t))`` and encode is ``[ord(c) for c in text]`` — deterministic
and invertible. Lines inside a document are separated by token 10 (``\\n``).

The per-row invariant demanded by BASELINE.json is that routed output rows
carry the ORIGINAL token slice of their message untouched; therefore the
line-splitting UDF splits the token array itself (not the decoded text) so
each line's token slice is carried alongside its decoded text and message
token arrays are rebuilt by re-joining line slices with token 10 — never by
re-encoding text.

Reference parity: the reference reads bytes into Blocks and materializes
Lines as zero-copy slices over them (/root/reference/src/data/line.rs:37,
/root/reference/src/readers/linereader.rs:1510). Here the "block" is the
Arrow batch and the "line" is a row carrying (line_no, line_tokens, text).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NEWLINE_TOKEN = 10

LINES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("line_no", T.IntegerType()),
        T.StructField("line_tokens", T.ArrayType(T.IntegerType())),
        T.StructField("text", T.StringType()),
    ]
)


def decode_tokens_array(tokens: np.ndarray) -> str:
    """Decode one token array to text (driver/test helper)."""
    return "".join(map(chr, tokens))


def encode_text(text: str) -> list[int]:
    """Encode text to tokens (generator-side only — never in the pipeline)."""
    return [ord(c) for c in text]


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def encode_text_udf(text: pd.Series) -> pd.Series:
    """string → array<int32> codepoints (corpus construction only — the
    pipeline itself NEVER re-encodes; see module docstring)."""
    return text.map(
        lambda t: np.frombuffer(t.encode("utf-32-le"), dtype=np.int32) if t is not None else None
    )


@F.pandas_udf(T.StringType())
def decode_tokens_udf(tokens: pd.Series) -> pd.Series:
    """array<int32> codepoints → string, Arrow-batched.

    Decodes the whole batch with one numpy pass: concatenate all token
    arrays, vectorize chr via np.char on a uint32 view, then split by the
    per-row lengths. Avoids per-token Python round-trips.
    """
    if len(tokens) == 0:
        return pd.Series([], dtype=object)
    lengths = tokens.map(len).to_numpy()
    if lengths.sum() == 0:
        return pd.Series([""] * len(tokens), index=tokens.index)
    flat = np.concatenate([np.asarray(t, dtype=np.uint32) for t in tokens])
    # one bulk decode: uint32 codepoints viewed as UTF-32LE text
    all_text = flat.tobytes().decode("utf-32-le")
    # np.cumsum gives the split offsets in characters == tokens
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    out = [all_text[offsets[i] : offsets[i + 1]] for i in range(len(lengths))]
    return pd.Series(out, index=tokens.index)


def _split_doc(tokens: np.ndarray) -> tuple[list[np.ndarray], list[str]]:
    """Split one doc's token array on NEWLINE_TOKEN into per-line slices."""
    arr = np.asarray(tokens, dtype=np.int32)
    cuts = np.flatnonzero(arr == NEWLINE_TOKEN)
    parts = np.split(arr, cuts + 1)
    # each part except possibly the last ends with the newline token; strip it
    lines = []
    for p in parts:
        if len(p) and p[-1] == NEWLINE_TOKEN:
            p = p[:-1]
        lines.append(p)
    # trailing newline produces one empty trailing part — drop it (a final
    # '\n' terminates the last line, it does not open a new empty line)
    if len(lines) > 1 and len(lines[-1]) == 0 and len(arr) and arr[-1] == NEWLINE_TOKEN:
        lines.pop()
    texts = [p.astype(np.uint32).tobytes().decode("utf-32-le") for p in lines]
    return lines, texts


def explode_lines(docs: DataFrame) -> DataFrame:
    """(doc_id, tokens, source) → one row per line with its token slice.

    mapInPandas keeps this a narrow (no-shuffle) stage; the per-line token
    slice preserves the token-array invariant end-to-end.
    """

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_src, out_no, out_tok, out_txt = [], [], [], [], []
            for doc_id, source, toks in zip(pdf["doc_id"], pdf["source"], pdf["tokens"]):
                lines, texts = _split_doc(toks)
                n = len(lines)
                out_doc.extend([doc_id] * n)
                out_src.extend([source] * n)
                out_no.extend(range(n))
                out_tok.extend(lines)
                out_txt.extend(texts)
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "source": out_src,
                    "line_no": pd.array(out_no, dtype="int32"),
                    "line_tokens": out_tok,
                    "text": out_txt,
                }
            )

    return docs.select("doc_id", "source", "tokens").mapInPandas(_gen, schema=LINES_SCHEMA)


def rejoin_message_tokens(line_tokens_col):
    """Column expr: array<array<int>> (ordered line slices) → one message
    token array with NEWLINE_TOKEN re-inserted between lines.

    JVM-side (flatten/transform), no UDF: message tokens must equal the
    original doc slice byte-for-byte (token-for-token).
    """
    with_nl = F.transform(line_tokens_col, lambda x: F.concat(x, F.array(F.lit(NEWLINE_TOKEN))))
    flat = F.flatten(with_nl)
    return F.slice(flat, 1, F.size(flat) - 1)
