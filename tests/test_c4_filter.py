"""C4 line/document filter semantics (functions/text.py:c4_line_filter):
per-rule line retention, page-level blocks, sentence heuristic, plan shape."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_old_spark.functions.text import c4_line_filter  # noqa: E402

GOOD_PAGE = (
    "The quick brown fox jumps over the fence today.\n"
    "A second full sentence sits in this line nicely.\n"
    "The third sentence closes the page quite cleanly."
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return {r["doc_id"]: r.asDict() for r in c4_line_filter(df, **kw).collect()}


def test_line_retention_rules(spark):
    page = (
        "The quick brown fox jumps over the fence today.\n"  # kept
        "no terminal punctuation on this line here\n"  # dropped: no terminal
        "Too short.\n"  # dropped: < 5 words
        "Please enable Javascript to view this page properly.\n"  # blocklist
        'He said the plan "would work out fine."\n'  # kept: end quote
        "A second full sentence sits in this line nicely.\n"
        "The third sentence closes the page quite cleanly."
    )
    got = _run(spark, [(1, page)])[1]
    assert got["n_lines"] == 7
    assert got["n_kept_lines"] == 4
    kept = got["kept_text"].split("\n")
    # original order preserved, only the retained lines
    assert kept == [
        "The quick brown fox jumps over the fence today.",
        'He said the plan "would work out fine."',
        "A second full sentence sits in this line nicely.",
        "The third sentence closes the page quite cleanly.",
    ]
    assert got["n_sentences"] == 4 and got["keep"]


def test_page_level_blocks(spark):
    rows = [
        (1, GOOD_PAGE),
        (2, GOOD_PAGE + "\nAlso some Lorem Ipsum placeholder text sits here."),
        (3, GOOD_PAGE + "\nfunction f() { return 1; }"),
        # only two sentences survive -> below min_sentences
        (4, "One full sentence stands alone right here.\n"
            "The second one follows it closely behind."),
    ]
    got = _run(spark, rows)
    assert got[1]["keep"]
    assert got[2]["has_lorem_ipsum"] and not got[2]["keep"]
    assert got[3]["has_brace"] and not got[3]["keep"]
    assert got[4]["n_sentences"] == 2 and not got[4]["keep"]


def test_null_and_empty_text(spark):
    got = _run(spark, [(1, None), (2, "")])
    for i in (1, 2):
        assert got[i]["n_kept_lines"] == 0
        assert got[i]["kept_text"] == ""
        assert got[i]["n_sentences"] == 0
        assert not got[i]["keep"]


def test_sentence_heuristic_counts_all_terminal_marks(spark):
    page = (
        "Is this the first full sentence of the page?\n"
        "What an exciting second sentence this line is!\n"
        "The third sentence closes the page quite cleanly."
    )
    got = _run(spark, [(1, page)])[1]
    assert got["n_sentences"] == 3 and got["keep"]


def test_thresholds_are_parameters(spark):
    got = _run(spark, [(1, GOOD_PAGE)], min_sentences=4)
    assert not got[1]["keep"]
    got = _run(spark, [(1, "Short line ends well.")], min_line_words=4)
    assert got[1]["n_kept_lines"] == 1


def test_c4_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, GOOD_PAGE)], "doc_id int, text string")
    plan = c4_line_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_crlf_lines_are_retained(spark):
    # \r\n documents: the \r must not defeat the terminal-punctuation
    # check (F.trim strips only ASCII spaces)
    crlf = GOOD_PAGE.replace("\n", "\r\n")
    got = _run(spark, [(1, crlf)])[1]
    assert got["n_kept_lines"] == 3 and got["keep"], got


def test_line_word_count_uses_canonical_whitespace_class(spark):
    # a line-internal vertical tab separates words exactly like a space
    # (the package's single-tokenizer invariant): 5 words here, retained
    got = _run(spark, [(1, "one\x0btwo three four five.")], min_sentences=1)[1]
    assert got["n_kept_lines"] == 1 and got["keep"], got
