"""C4-style keep-first span dedup (curation.span_dedup_keep_first) vs a
sequential python reference."""

from __future__ import annotations

import random

from super_speedy_syslog_searcher_spark.operators.curation import span_dedup_keep_first

SEP = "\n"


def _ref(docs: dict, span: int = 3):
    us = {d: t.split(SEP) for d, t in docs.items()}
    occs: dict = {}
    for d in sorted(us):
        arr = us[d]
        for i in range(len(arr) - span + 1):
            occs.setdefault(SEP.join(arr[i : i + span]), []).append((d, i))
    rem = {d: set() for d in us}
    ndup = {d: 0 for d in us}
    for occ in occs.values():
        if len(occ) < 2:
            continue
        keeper = min(occ)
        for d, i in occ:
            if (d, i) == keeper:
                continue
            ndup[d] += 1
            rem[d].update(range(i, i + span))
    return {
        d: (
            len(arr),
            ndup[d],
            len(rem[d]),
            SEP.join(u for j, u in enumerate(arr) if j not in rem[d]),
        )
        for d, arr in us.items()
    }


def _run(spark, docs: dict, span: int = 3):
    sdf = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    rows = span_dedup_keep_first(sdf, span=span).collect()
    return {
        r["doc_id"]: (r["n_units"], r["n_dup_spans"], r["n_removed_units"], r["clean_text"])
        for r in rows
    }


class TestSpanDedupKeepFirst:
    def test_randomized_vs_reference(self, spark):
        rng = random.Random(77)
        pool = [f"line {i} payload" for i in range(40)]
        block = ["blk one", "blk two", "blk three", "blk four"]
        docs = {}
        for d in range(60):
            lines = [rng.choice(pool) for _ in range(rng.randint(4, 20))]
            if d % 4 == 1:  # splice the shared block at a random offset
                at = rng.randint(0, len(lines))
                lines[at:at] = block
            docs[d] = SEP.join(lines)
        docs[60] = docs[7]  # whole-doc duplicate
        docs[61] = SEP.join(block + ["solo"] + block)  # within-doc duplicate
        assert _run(spark, docs) == _ref(docs)

    def test_short_and_degenerate_docs(self, spark):
        docs = {
            1: "only two\nlines",  # shorter than span → untouched
            2: "",  # one empty unit
            3: "a\nb\nc",
            4: "a\nb\nc",  # 3 gets kept (smaller doc_id), 4 removed
        }
        got = _run(spark, docs)
        assert got == _ref(docs)
        assert got[1][3] == docs[1] and got[2][3] == ""
        assert got[3] == (3, 0, 0, "a\nb\nc")
        assert got[4] == (3, 1, 3, "")

    def test_layout_invariant(self, spark):
        docs = {d: SEP.join([f"x{d % 3}", "y", "z", f"w{d % 2}"]) for d in range(30)}
        sdf = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
        a = sorted(map(tuple, span_dedup_keep_first(sdf, span=3).collect()))
        b = sorted(map(tuple, span_dedup_keep_first(sdf.repartition(11), span=3).collect()))
        assert a == b
