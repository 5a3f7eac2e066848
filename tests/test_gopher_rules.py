"""Gopher rule-filter semantics (functions/text.py:gopher_quality_rules):
planted per-rule failures, vacuous-pass conventions, precedence, plan shape."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_old_spark.functions.text import gopher_quality_rules  # noqa: E402

# 60 words, mean length in range, stopword-rich, no symbols: passes all
GOOD = (
    "the quick brown fox and the lazy dog have gone to the wide field of "
    "green grass that lies beside the old river with many tall trees and "
    "the birds that sing in the morning light while the farmer walks to "
    "the barn with his dog and thinks of the long day that waits ahead "
    "for everyone here today now"
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = gopher_quality_rules(df, **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_planted_rule_failures(spark):
    rows = [
        (1, GOOD),
        (2, "too few words here"),  # words (min)
        # symbol ratio: 48 hashes / 72 words >> 0.1 ('####' keeps the mean
        # word length in range, single '#' tokens would drag it under 3)
        (3, GOOD + " " + "#### " * 12),
        (4, ("- bullet item\n" * 19) + GOOD),  # 19/20 bullet lines
        # 9/10 ellipsis lines; unicode '…' so the '...' symbol rule (which
        # also counts ASCII ellipses) cannot outrank the line rule
        (5, ("trailing off…\n" * 9) + GOOD),
        # alpha: 300 seven-digit numeric words dominate the 60 good ones
        # (0.17 < 0.8) while keeping the mean word length in [3, 10]
        (6, GOOD + " " + " ".join(str(1_000_000 + i) for i in range(300))),
        (7, None),  # NULL: zero words
    ]
    got = _run(spark, rows, min_words=10)
    assert got[1]["verdict"] == "keep", got[1]
    assert got[2]["verdict"] == "words" and not got[2]["words_ok"]
    assert got[3]["verdict"] == "symbol_ratio" and not got[3]["symbol_ok"]
    assert got[4]["verdict"] == "bullet_lines" and not got[4]["bullet_ok"]
    assert got[5]["verdict"] == "ellipsis_lines" and not got[5]["ellipsis_ok"]
    assert got[6]["verdict"] == "alpha_words" and not got[6]["alpha_ok"]
    # NULL text: fails words; every ratio rule passes vacuously
    assert got[7]["verdict"] == "words" and got[7]["n_words"] == 0
    for flag in ("mean_len_ok", "symbol_ok", "bullet_ok", "ellipsis_ok", "alpha_ok"):
        assert got[7][flag] is True, flag
    assert got[7]["stopword_ok"] is False  # 0 distinct stopwords < 2


def test_mean_word_length_and_stopword_rules(spark):
    rows = [
        # 12 one-char words: mean 1 < 3
        (1, "a b c d e f g h i j k l"),
        # 12 long words: mean > 10
        (2, " ".join(["supercalifragilistic"] * 12)),
        # enough words, mean fine, but only ONE distinct stopword ('the')
        (3, "the table row value " * 5),
    ]
    got = _run(spark, rows, min_words=5)
    assert got[1]["verdict"] == "mean_word_length"
    assert got[2]["verdict"] == "mean_word_length"
    assert got[3]["verdict"] == "stopwords" and not got[3]["stopword_ok"]


def test_stopword_hits_are_distinct_not_total(spark):
    # 'the' twenty times is ONE distinct hit; 'the'+'and' once each is two
    rows = [
        (1, ("the " * 20) + "table row value data line word item thing"),
        (2, "the and table row value data line word item thing"),
    ]
    got = _run(spark, rows, min_words=5)
    assert not got[1]["stopword_ok"]
    assert got[2]["stopword_ok"]


def test_max_words_and_boundary_inclusivity(spark):
    ten = "the and of to be that have with word item"
    got = _run(spark, [(1, ten)], min_words=10, max_words=10)
    # exactly min==max==10 words: inclusive on both ends
    assert got[1]["words_ok"]
    got = _run(spark, [(1, ten + " extra")], min_words=10, max_words=10)
    assert got[1]["verdict"] == "words"


def test_bullet_marks_and_unicode_ellipsis(spark):
    rows = [
        (1, "• dotted\n* starred\n- dashed\n" + GOOD),  # 3/4 bullets = 0.75 ok
        (2, "line ends with unicode…\n" + GOOD),  # 1/2 = 0.5 > 0.3
    ]
    got = _run(spark, rows, min_words=10)
    assert got[1]["bullet_ok"]
    assert got[2]["verdict"] == "ellipsis_lines"


def test_gopher_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id int, text string")
    plan = (
        gopher_quality_rules(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_crlf_ellipsis_lines_counted(spark):
    # \r\n line endings must not hide the trailing ellipsis from the
    # line rule (the \r would otherwise survive trim and defeat endswith)
    page = ("trailing off…\r\n" * 9) + GOOD
    got = _run(spark, [(1, page)], min_words=10)
    assert got[1]["verdict"] == "ellipsis_lines", got[1]
