"""remove_boilerplate_lines (x36): CCNet-style cross-corpus line dedup."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_old_spark.functions.text import remove_boilerplate_lines  # noqa: E402

HEADER = "NAVIGATION MENU HOME ABOUT"
FOOTER = "all rights reserved contact us"


def _docs(spark):
    rows = [
        (1, f"{HEADER}\nunique first body line\nsecond body one\n{FOOTER}"),
        (2, f"{HEADER}\nanother body entirely\n\n{FOOTER}"),
        (3, f"{HEADER}\nthird doc content here\n{FOOTER}"),
        (4, "no shared lines at all\njust content"),
        (5, None),
        (6, f"{HEADER}\n{FOOTER}"),  # all countable lines are boilerplate
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def _run(spark, min_docs=3):
    out = remove_boilerplate_lines(_docs(spark), min_docs=min_docs)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_shared_lines_removed_order_preserved(spark):
    rows = _run(spark)
    assert rows[1]["text"] == "unique first body line\nsecond body one"
    assert rows[1]["n_lines"] == 4 and rows[1]["n_removed"] == 2
    # blank line is preserved verbatim, in place
    assert rows[2]["text"] == "another body entirely\n"
    assert rows[2]["n_removed"] == 2
    assert rows[3]["text"] == "third doc content here"


def test_untouched_null_and_emptied_docs(spark):
    rows = _run(spark)
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    # no shared lines: fully intact
    assert rows[4]["text"] == "no shared lines at all\njust content"
    assert rows[4]["n_removed"] == 0
    # NULL text passes through as NULL, not '' (the doc had no lines)
    assert rows[5]["text"] is None
    assert rows[5]["n_lines"] == 0 and rows[5]["n_removed"] == 0
    # every countable line boilerplate -> '' (doc still exists), not NULL
    assert rows[6]["text"] == ""
    assert rows[6]["n_lines"] == 2 and rows[6]["n_removed"] == 2


def test_within_doc_repetition_does_not_mark(spark):
    # the same line 3x in ONE doc counts as one distinct document —
    # within-doc repetition is the Gopher rule's job, not this pass's
    df = spark.createDataFrame(
        [(1, "echo line\necho line\necho line"), (2, "other text")],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in remove_boilerplate_lines(df, min_docs=2).collect()
    }
    assert rows[1]["text"] == "echo line\necho line\necho line"
    assert rows[1]["n_removed"] == 0


def test_normalized_matching(spark):
    # lines match on normalize_text form: case + whitespace-collapsed
    df = spark.createDataFrame(
        [(1, "Cookie  Policy\nbody a"), (2, "cookie policy\nbody b")],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in remove_boilerplate_lines(df, min_docs=2).collect()
    }
    assert rows[1]["text"] == "body a" and rows[2]["text"] == "body b"


def test_min_docs_validation(spark):
    with pytest.raises(ValueError, match="min_docs"):
        remove_boilerplate_lines(_docs(spark), min_docs=0)


def test_plan_shape(spark):
    out = remove_boilerplate_lines(_docs(spark), min_docs=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan
    # the frequency stage must be partial-aggregable, never an Expand
    assert "Expand" not in plan, plan
