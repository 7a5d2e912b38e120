"""File-type catalog rules — the name-based typing of the reference.

Reference: ``pathbuf_to_filetype``
(/root/reference/src/readers/filepreprocessor.rs:190-742): strips numeric
rotation suffixes and compression suffixes, recognizes special names
(``utmp``, ``wtmp``, ``btmp``, ``lastlog``, ``*.journal``, ``*.evtx``), has
a skiplist of known non-log extensions, and falls back to UTF-8 text
(README.md:381-385, 544-564).

At 10^12-row scale there is no directory walk — the catalog IS the input
table — but the same rules classify the ``source`` column so each record
type dispatches to its decoder (text / fixedstruct / evtx / journal), as a
pure ``F.when`` chain (JVM-side, codegen'd; no UDF).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

TEXT = "text"
FIXEDSTRUCT = "fixedstruct"
EVTX = "evtx"
JOURNAL = "journal"
UNPARSABLE = "unparsable"

# reference set (filepreprocessor.rs) + ".zst": the reference links zstd
# only for journal objects, but this engine's codec sniff decodes .zst
# inputs, so the name rules strip it too
COMPRESSION_SUFFIXES = (".gz", ".bz2", ".lz4", ".xz", ".tar", ".zst")
ROTATION_RE = re.compile(r"(\.\d+|\.old|\.bak|~)$")
FIXEDSTRUCT_NAMES = ("utmp", "utmpx", "wtmp", "wtmpx", "btmp", "btmpx", "lastlog", "lastlogx", "acct", "pacct")
# the reference's full skiplist of known non-log extensions
# (filepreprocessor.rs:481-546) + a couple of obvious additions (db, pdf)
UNPARSABLE_EXTS = (
    ".7z",
    ".a",
    ".aac",
    ".aux",
    ".avi",
    ".bat",
    ".bin",
    ".bmp",
    ".bz",
    ".c",
    ".cat",
    ".class",
    ".cmd",
    ".cpp",
    ".db",
    ".diagpkg",
    ".dll",
    ".ear",
    ".exe",
    ".flac",
    ".flv",
    ".gif",
    ".h",
    ".hpp",
    ".htm",
    ".html",
    ".ico",
    ".jar",
    ".java",
    ".jpeg",
    ".jpg",
    ".lib",
    ".m4b",
    ".m4p",
    ".m4r",
    ".m4v",
    ".mkv",
    ".mov",
    ".mp3",
    ".mp4",
    ".msi",
    ".mui",
    ".o",
    ".ogg",
    ".opus",
    ".pdf",
    ".pl",
    ".png",
    ".ps1",
    ".psd1",
    ".py",
    ".rb",
    ".sh",
    ".so",
    ".svg",
    ".sys",
    ".tgz",
    ".tif",
    ".tiff",
    ".ttf",
    ".war",
    ".wav",
    ".webm",
    ".webp",
    ".wma",
    ".wmv",
    ".zip",
)


def guess_filetype(name: str, unparseable_are_text: bool = False) -> str:
    """Pure-Python rule (mirrors the Column version; used at job-arg time)."""
    base = name.rsplit("/", 1)[-1].lower()
    changed = True
    while changed:
        changed = False
        for suf in COMPRESSION_SUFFIXES:
            if base.endswith(suf):
                base = base[: -len(suf)]
                changed = True
        m = ROTATION_RE.search(base)
        if m:
            base = base[: m.start()]
            changed = True
    if base.endswith(".evtx"):
        return EVTX
    if base.endswith(".journal") or base == "journal":
        return JOURNAL
    stem = base.rsplit(".", 1)[0] if "." in base else base
    ext = base.rsplit(".", 1)[-1] if "." in base else ""
    if stem in FIXEDSTRUCT_NAMES or base in FIXEDSTRUCT_NAMES or ext in FIXEDSTRUCT_NAMES:
        return FIXEDSTRUCT
    for suf in UNPARSABLE_EXTS:
        if base.endswith(suf):
            return TEXT if unparseable_are_text else UNPARSABLE
    # punctuation-only names ('-', '..', '~', '?') are not files the
    # engine can type (filepreprocessor_tests.rs sweep)
    if not base or all(c in "-~.?" for c in base):
        return TEXT if unparseable_are_text else UNPARSABLE
    return TEXT


def filetype_col(source_col: Column, unparseable_are_text: bool = False) -> Column:
    """The same rules as a codegen'd Column expression over ``source``."""
    base = F.lower(F.element_at(F.split(source_col, "/"), -1))
    # strip (repeatedly enough for practical cases: 2 passes) rotation+compression
    for _ in range(2):
        base = F.regexp_replace(base, r"(\.gz|\.bz2|\.lz4|\.xz|\.tar|\.zst)$", "")
        base = F.regexp_replace(base, r"(\.\d+|\.old|\.bak|~)$", "")
    stem = F.regexp_replace(base, r"\.[^.]*$", "")
    fixed_names = list(FIXEDSTRUCT_NAMES)
    fixed_ext = "|".join(FIXEDSTRUCT_NAMES)
    return (
        F.when(base.rlike(r"\.evtx$"), EVTX)
        .when(base.rlike(r"\.journal$") | (base == "journal"), JOURNAL)
        .when(
            base.isin(fixed_names) | stem.isin(fixed_names) | base.rlike(rf"\.({fixed_ext})$"),
            FIXEDSTRUCT,
        )
        .when(
            base.rlike(r"\.(7z|a|aac|aux|avi|bat|bin|bmp|bz|c|cat|class|cmd|cpp|db|diagpkg|dll|ear|exe|flac|flv|gif|h|hpp|htm|html|ico|jar|java|jpeg|jpg|lib|m4b|m4p|m4r|m4v|mkv|mov|mp3|mp4|msi|mui|o|ogg|opus|pdf|pl|png|ps1|psd1|py|rb|sh|so|svg|sys|tgz|tif|tiff|ttf|war|wav|webm|webp|wma|wmv|zip)$"),
            TEXT if unparseable_are_text else UNPARSABLE,
        )
        .when(base.rlike(r"^[-~.?]*$"), TEXT if unparseable_are_text else UNPARSABLE)
        .otherwise(TEXT)
    )
