"""Structural invariants of the corpus-curation funnel (functions/curation.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbsir_old_spark.functions.curation import curate_corpus  # noqa: E402

EN = "the cat and the dog walked to the house of the tailor and back again"
ES = "el perro y el gato de la casa que no se fue por los caminos"
BENCH = "benchmark secret holdout passage nobody should train on ever"


def _run(spark):
    docs = spark.createDataFrame(
        [
            (10, EN),
            (11, EN),  # exact copy -> duplicate
            (12, ES),  # spanish -> lang
            (13, EN + " " + BENCH),  # shares the benchmark 5-grams
            (14, ""),  # empty -> fails lang (zh tie-break) and quality
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(1, BENCH)], ["doc_id", "text"])
    out = curate_corpus(docs, bench, quality_threshold=-1.1)  # everything passes quality
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_planted_verdicts(spark):
    rows = _run(spark)
    assert set(rows) == {10, 11, 12, 13, 14}

    assert rows[10]["lang_ok"] and rows[10]["is_canonical"]
    assert rows[10]["verdict"] == "keep"

    assert not rows[11]["is_canonical"]
    assert rows[11]["verdict"] == "duplicate"

    assert not rows[12]["lang_ok"]
    assert rows[12]["verdict"] == "lang"

    assert rows[13]["contaminated"]
    assert rows[13]["verdict"] == "contaminated"

    # empty text: zero tokens -> quality_pass False regardless of threshold
    assert not rows[14]["quality_pass"]


def test_verdict_matches_flag_precedence(spark):
    for row in _run(spark).values():
        expected = (
            "lang"
            if not row["lang_ok"]
            else "quality"
            if not row["quality_pass"]
            else "duplicate"
            if not row["is_canonical"]
            else "contaminated"
            if row["contaminated"]
            else "keep"
        )
        assert row["verdict"] == expected, row


def test_null_ids_are_dropped_not_kept(spark):
    # A NULL id can't anchor the canonical window nor match the
    # contamination join-back, so keeping such rows would silently
    # verdict exact duplicates / benchmark hits as 'keep'.
    docs = spark.createDataFrame(
        [(1, EN), (None, EN), (None, EN), (None, EN + " " + BENCH)],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame([(9, BENCH)], ["doc_id", "text"])
    rows = curate_corpus(docs, bench, quality_threshold=-1.1).collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["verdict"] == "keep"


def test_blank_benchmark_text_never_contaminates(spark):
    # a blank/whitespace-only benchmark line normalizes to the '' sentinel
    # gram; it must not mark empty/NULL-text corpus docs as contaminated
    docs = spark.createDataFrame(
        [(1, EN), (2, ""), (3, None)], "doc_id int, text string"
    )
    bench = spark.createDataFrame([(9, "   "), (10, BENCH)], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in curate_corpus(docs, bench, quality_threshold=-1.1).collect()}
    assert not rows[1]["contaminated"]
    assert not rows[2]["contaminated"]
    assert not rows[3]["contaminated"]


def test_benchmark_frame_needs_only_text_col(spark):
    # contract: benchmark is 'any frame with text_col' — no corpus id col
    docs = spark.createDataFrame([(1, EN), (2, EN + " " + BENCH)], ["doc_id", "text"])
    bench = spark.createDataFrame([(BENCH,)], ["text"])
    rows = {r["doc_id"]: r for r in curate_corpus(docs, bench, quality_threshold=-1.1).collect()}
    assert rows[2]["contaminated"] and not rows[1]["contaminated"]


def test_curation_plan_stays_jvm_side(spark):
    docs = spark.createDataFrame([(1, EN)], ["doc_id", "text"])
    bench = spark.createDataFrame([(2, BENCH)], ["doc_id", "text"])
    plan = curate_corpus(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_curation_canonical_stage_has_no_window(spark):
    # the canonical-copy stage must be partial-aggregable groupBy + join
    # back, never min().over(partitionBy(fingerprint)): WindowExec sorts a
    # whole mega-duplicate fingerprint class inside one partition — the
    # exact skew regime a curation funnel exists to survive. Pin the shape:
    # no window operator anywhere in the funnel, and the canonical
    # aggregate shows a partial_min (map-side combine) in the plan.
    docs = spark.createDataFrame([(1, EN), (2, EN)], ["doc_id", "text"])
    bench = spark.createDataFrame([(9, BENCH)], ["doc_id", "text"])
    plan = curate_corpus(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan
