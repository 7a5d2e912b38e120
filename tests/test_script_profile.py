"""Unicode script histogram (textstats.script_profile): per-block share
math, argmax/tie rule, empty-doc NULLs, mixed-script sums, and the
map-only no-shuffle plan."""

from __future__ import annotations

import pytest


def _run(spark, rows):
    from super_speedy_syslog_searcher_spark.operators.textstats import script_profile

    df = spark.createDataFrame(rows, "doc_id string, text string")
    return {r["doc_id"]: r.asDict() for r in script_profile(df).collect()}


class TestScriptProfile:
    def test_pure_scripts_detected(self, spark):
        rows = [
            ("lat", "hello world"),
            ("cyr", "привет мир"),
            ("cjk", "你好世界"),
            ("kana", "こんにちは"),
            ("hang", "안녕하세요"),
            ("arab", "مرحبا"),
            ("heb", "שלום"),
            ("dev", "नमस्ते"),
            ("grk", "γεια σου"),
        ]
        got = _run(spark, rows)
        want = {
            "lat": "latin", "cyr": "cyrillic", "cjk": "cjk", "kana": "kana",
            "hang": "hangul", "arab": "arabic", "heb": "hebrew",
            "dev": "devanagari", "grk": "greek",
        }
        for doc, script in want.items():
            assert got[doc]["main_script"] == script, (doc, got[doc])
            assert got[doc][f"{script}_share"] >= 0.8, (doc, got[doc])

    def test_mixed_doc_shares_sum_to_one(self, spark):
        got = _run(spark, [("m", "abc где 你好 123")])["m"]
        total = sum(
            got[k] for k in got if k.endswith("_share") and got[k] is not None
        )
        assert abs(total - 1.0) < 0.01
        assert got["latin_share"] == pytest.approx(3 / 11, abs=1e-3)
        assert got["cyrillic_share"] == pytest.approx(3 / 11, abs=1e-3)
        assert got["cjk_share"] == pytest.approx(2 / 11, abs=1e-3)
        assert got["digit_share"] == pytest.approx(3 / 11, abs=1e-3)

    def test_empty_and_space_docs_null(self, spark):
        got = _run(spark, [("e", ""), ("s", "   ")])
        for d in ("e", "s"):
            assert got[d]["main_script"] is None
            assert got[d]["latin_share"] is None

    def test_punctuation_only_is_other(self, spark):
        got = _run(spark, [("p", "!!! ???")])["p"]
        assert got["other_share"] == pytest.approx(1.0)
        assert got["main_script"] is None

    def test_tie_breaks_to_earlier_table_entry(self, spark):
        # latin and cyrillic exactly tied -> latin (earlier entry)
        got = _run(spark, [("t", "ab гд")])["t"]
        assert got["latin_share"] == got["cyrillic_share"] == pytest.approx(0.5)
        assert got["main_script"] == "latin"

    def test_mojibake_shows_as_mixed(self, spark):
        """The motivating signal: a mojibake doc (UTF-8 read as latin-1)
        leaks non-latin shares even though the source was pure latin."""
        clean = "naive cafe resume"
        mojibake = "naÃ¯ve cafÃ© rÃ©sumÃ©"
        got = _run(spark, [("c", clean), ("m", mojibake)])
        assert got["c"]["latin_share"] == pytest.approx(1.0)
        assert got["m"]["other_share"] is not None and got["m"]["latin_share"] < 1.0

    def test_plan_is_map_only(self, spark):
        from super_speedy_syslog_searcher_spark.operators.textstats import script_profile

        df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
        plan = script_profile(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan  # pure codegen, no UDF


class TestCompressionStats:
    def _run(self, spark, rows, **kw):
        from super_speedy_syslog_searcher_spark.operators.textstats import compression_stats

        df = spark.createDataFrame(rows, "doc_id string, text string")
        return {r["doc_id"]: r.asDict() for r in compression_stats(df, **kw).collect()}

    def test_matches_local_zlib_exactly(self, spark):
        import zlib

        rows = [("a", "the quick brown fox jumps over the lazy dog " * 5),
                ("b", "spam " * 200)]
        got = self._run(spark, rows)
        for doc, text in rows:
            raw = text.encode()
            comp = zlib.compress(raw, 6)
            assert got[doc]["n_raw"] == len(raw)
            assert got[doc]["n_compressed"] == len(comp)
            assert got[doc]["compression_ratio"] == round(len(comp) / len(raw), 4)

    def test_repetitive_spam_flagged_prose_kept(self, spark):
        import random

        rng = random.Random(3)
        alphabet = "abcdefghijklmnopqrstuvwxyz"
        # high-entropy stand-in for diverse prose: fresh word forms
        prose = " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(3, 10)))
            for _ in range(300)
        )
        spam = "buy now click here " * 100
        got = self._run(spark, [("p", prose), ("s", spam)])
        assert got["p"]["cr_keep"] == 1 and got["p"]["compression_ratio"] >= 0.45
        assert got["s"]["cr_keep"] == 0 and got["s"]["compression_ratio"] < 0.2

    def test_empty_doc_kept_with_null_ratio(self, spark):
        got = self._run(spark, [("e", ""), ("n", None)])
        for d in ("e", "n"):
            assert got[d]["compression_ratio"] is None and got[d]["cr_keep"] == 1

    def test_threshold_dial(self, spark):
        rows = [("x", "abcd " * 50)]
        strict = self._run(spark, rows, max_ratio=0.99)
        lax = self._run(spark, rows, max_ratio=0.01)
        assert strict["x"]["cr_keep"] == 0 and lax["x"]["cr_keep"] == 1
