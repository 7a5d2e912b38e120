"""Exact-substring duplicate spans (Lee et al. 2021 ExactSubstr at the
word k-gram grain): operator vs an independent pure-Python reference,
plus the span-merge edge cases and the plan shape."""
from __future__ import annotations

import pytest

from super_speedy_syslog_searcher_spark.operators.dedup import duplicate_substring_spans


def _py_spans(docs: dict[str, str], k: int, min_df: int = 2) -> set[tuple]:
    """Independent reference: positioned k-grams, df over distinct docs,
    merge intervals [p, p+k-1] that overlap or touch."""
    grams: dict[str, list[tuple[str, int]]] = {}
    for did, text in docs.items():
        ws = text.split(" ")
        for p in range(len(ws) - k + 1):
            grams.setdefault(" ".join(ws[p : p + k]), []).append((did, p))
    dup = {g for g, occ in grams.items() if len({d for d, _ in occ}) >= min_df}
    pos: dict[str, list[int]] = {}
    for g in dup:
        for did, p in grams[g]:
            pos.setdefault(did, []).append(p)
    out = set()
    for did, ps in pos.items():
        ps = sorted(set(ps))
        start, end = ps[0], ps[0] + k - 1
        for p in ps[1:]:
            if p <= end + 1:
                end = p + k - 1
            else:
                out.add((did, start, end, end - start + 1))
                start, end = p, p + k - 1
        out.add((did, start, end, end - start + 1))
    return out


def _run(spark, docs: dict[str, str], k: int, **kw) -> set[tuple]:
    df = spark.createDataFrame([(d, t) for d, t in docs.items()], "doc_id string, text string")
    rows = duplicate_substring_spans(df, k=k, **kw).collect()
    return {(r.doc_id, r.span_start, r.span_end, r.dup_words) for r in rows}


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _sent(idx: list[int]) -> str:
    return " ".join(WORDS[i % len(WORDS)] + str(i) for i in idx)


class TestSubstringSpans:
    def test_matches_python_reference(self, spark):
        shared = _sent(list(range(100, 108)))  # 8 words shared verbatim
        docs = {
            "a": _sent(list(range(0, 10))) + " " + shared + " " + _sent(list(range(20, 30))),
            "b": _sent(list(range(40, 50))) + " " + shared,
            "c": _sent(list(range(60, 75))),
            "d": _sent(list(range(60, 75))),  # full copy of c
        }
        for k in (3, 5, 8):
            assert _run(spark, docs, k) == _py_spans(docs, k)

    def test_two_islands_split_and_merge_boundary(self, spark):
        k = 3
        # doc y copies two chunks of doc x, separated inside y by one
        # unique word → two islands in y; x's gap between the chunks is
        # also unique words.
        chunk1 = _sent([0, 1, 2, 3])
        chunk2 = _sent([10, 11, 12, 13])
        docs = {
            "x": chunk1 + " " + _sent([50, 51, 52, 53]) + " " + chunk2,
            "y": chunk1 + " only999 " + chunk2,
        }
        got = _run(spark, docs, k)
        assert got == _py_spans(docs, k)
        assert len([r for r in got if r[0] == "y"]) == 2  # separator splits
        assert len([r for r in got if r[0] == "x"]) == 2

    def test_adjacent_grams_merge_into_one_span(self, spark):
        # whole-doc copy → every position duplicated → ONE maximal span
        docs = {"p": _sent(list(range(0, 12))), "q": _sent(list(range(0, 12)))}
        got = _run(spark, docs, k=4)
        assert got == {("p", 0, 11, 12), ("q", 0, 11, 12)}

    def test_within_doc_repeat_does_not_count(self, spark):
        # the same gram twice in ONE doc has df=1 → no spans
        rep = _sent([1, 2, 3])
        docs = {
            "solo": rep + " " + _sent([70, 71]) + " " + rep,
            "other": _sent(list(range(80, 95))),
        }
        assert _run(spark, docs, k=3) == set()
        # min_df=1 flips it: every position is a span candidate
        assert len(_run(spark, docs, k=3, min_df=1)) > 0

    def test_short_docs_contained(self, spark):
        docs = {"s1": "one two", "s2": "one two", "long": _sent(list(range(0, 9)))}
        # k=5 > doc length → no grams → no spans, no error
        assert _run(spark, docs, k=5) == set()

    def test_plan_shape(self, spark):
        df = spark.createDataFrame(
            [(str(i), _sent(list(range(i, i + 12)))) for i in range(20)],
            "doc_id string, text string",
        )
        plan = duplicate_substring_spans(df, k=4)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        # df-filter side aggregates map-side before its exchange
        assert "partial_count" in plan
