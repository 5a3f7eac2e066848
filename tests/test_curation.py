"""Structural invariants of the corpus-curation funnel (functions/curation.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import pytest  # noqa: E402

from hbsir_old_spark.functions.curation import (  # noqa: E402
    curate_corpus,
    curate_corpus_fuzzy,
)

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


# ---------------------------------------------------------------------------
# curate_corpus_fuzzy: the composed near-dedup funnel
# ---------------------------------------------------------------------------

LONG_EN = (
    "the quick brown fox jumped over the lazy dog and then ran across the "
    "wide green field toward the old wooden barn near the river bank"
)


def _fuzzy(spark, pair_mode):
    docs = spark.createDataFrame(
        [
            (10, LONG_EN),
            (11, LONG_EN),  # exact copy -> duplicate (stage 3)
            (12, LONG_EN + " perturbed suffix token"),  # near copy -> near_duplicate
            (13, ES),  # spanish -> lang
            (14, EN),  # unrelated keeper
            # contamination plant: base text DISTINCT from 14's (sharing EN
            # would make 15 a genuine near-dup of 14, and near_duplicate
            # outranks contaminated in the verdict order)
            (15, "the ship sailed into the harbor and the captain of the crew "
                 "waited for the tide with all of the sailors " + BENCH),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(1, BENCH)], ["doc_id", "text"])
    out = curate_corpus_fuzzy(
        docs,
        bench,
        quality_threshold=-1.1,
        near_n=2,
        near_threshold=0.5,
        pair_mode=pair_mode,
    )
    return {r["doc_id"]: r.asDict() for r in out.collect()}


@pytest.mark.parametrize("pair_mode", ["exact", "lsh"])
def test_fuzzy_planted_verdicts(spark, pair_mode):
    rows = _fuzzy(spark, pair_mode)
    assert set(rows) == {10, 11, 12, 13, 14, 15}
    # the original survives all five stages
    assert rows[10]["verdict"] == "keep" and rows[10]["is_near_canonical"]
    # exact copy dies at stage 3, NOT stage 4 (precedence), and is vacuously
    # near-canonical (it never entered the pair universe)
    assert rows[11]["verdict"] == "duplicate" and rows[11]["is_near_canonical"]
    # perturbed copy: distinct fingerprint (canonical), but near-dup of 10;
    # min-id representative is 10, so 12 verdicts near_duplicate
    assert rows[12]["is_canonical"] and not rows[12]["is_near_canonical"]
    assert rows[12]["verdict"] == "near_duplicate"
    assert rows[13]["verdict"] == "lang"
    assert rows[14]["verdict"] == "keep"
    assert rows[15]["verdict"] == "contaminated"


def test_fuzzy_universe_excludes_failed_docs(spark):
    # a near-twin whose partner failed an EARLIER stage must not be
    # penalized: the pair universe is survivors-only, so the surviving twin
    # has no partner and keeps. Plant: 20 fails lang (spanish), 21 is an
    # edited copy of 20 with enough english appended to pass lang — 21 must
    # NOT verdict near_duplicate.
    es_long = ES + " " + ES + " " + ES
    docs = spark.createDataFrame(
        [
            (20, es_long),
            (21, es_long + " " + LONG_EN + " " + LONG_EN + " " + LONG_EN),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(1, BENCH)], ["doc_id", "text"])
    rows = {
        r["doc_id"]: r.asDict()
        for r in curate_corpus_fuzzy(
            docs, bench, quality_threshold=-1.1, near_n=2, near_threshold=0.2,
            pair_mode="exact",
        ).collect()
    }
    assert rows[20]["verdict"] == "lang"
    if rows[21]["lang_ok"]:  # guard: plant construction worked
        assert rows[21]["is_near_canonical"]
        assert rows[21]["verdict"] in ("keep", "contaminated")


def test_fuzzy_near_dup_chain_collapses_to_one_rep(spark):
    # A ~ B, B ~ C transitivity: a chain of perturbed copies forms ONE
    # component; only the min id keeps
    docs = spark.createDataFrame(
        [
            (30, LONG_EN),
            (31, LONG_EN + " alpha beta"),
            (32, LONG_EN + " alpha beta gamma delta"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(1, BENCH)], ["doc_id", "text"])
    rows = {
        r["doc_id"]: r.asDict()
        for r in curate_corpus_fuzzy(
            docs, bench, quality_threshold=-1.1, near_n=2, near_threshold=0.5,
            pair_mode="exact",
        ).collect()
    }
    assert rows[30]["verdict"] == "keep"
    assert rows[31]["verdict"] == "near_duplicate"
    assert rows[32]["verdict"] == "near_duplicate"


def test_fuzzy_lsh_planted_twin_recall_floor(spark):
    # LSH-mode recall floor on planted twins (the x3 pattern, composed
    # through the full funnel): every original doc's lightly-perturbed twin
    # must verdict near_duplicate — at 16 perms / 4 bands the collision
    # probability for jaccard ~0.9 twins is ~1-(1-0.9^4)^4 ~ 0.996 per
    # pair, and with these fixed seeded hashes the outcome is
    # deterministic; pin 100% on this plant.
    # each original is MOSTLY per-doc-unique tokens (cross-doc jaccard
    # ~0.1, far under threshold) on an english marker scaffold (lang_id
    # must pass for the doc to enter the pair universe)
    texts = [
        (
            i,
            f"the unique subject {i} and the topic {i} of chapter {i} "
            + " ".join(f"item{i}word{k}" for k in range(30)),
        )
        for i in range(40, 60)
    ]
    twins = [(i + 1000, t + " perturbed suffix token") for i, t in texts]
    docs = spark.createDataFrame(texts + twins, ["doc_id", "text"])
    bench = spark.createDataFrame([(1, BENCH)], ["doc_id", "text"])
    rows = {
        r["doc_id"]: r.asDict()
        for r in curate_corpus_fuzzy(
            docs, bench, quality_threshold=-1.1, near_n=2, near_threshold=0.5,
            pair_mode="lsh", num_perm=16, bands=4,
        ).collect()
    }
    originals = [i for i, _ in texts]
    caught = sum(1 for i in originals if rows[i + 1000]["verdict"] == "near_duplicate")
    # jaccard(orig, twin) ~ 0.93 at n=2 => per-pair collision prob ~0.996 at
    # (4 bands x 4 rows); with the fixed seeded hashes the outcome is
    # deterministic — floor at 90% so the pin survives plant tweaks, and
    # no original may be falsely removed (precision side)
    assert caught >= 0.9 * len(originals), (
        f"LSH funnel recall {caught}/{len(originals)} on planted twins"
    )
    kept = [i for i in originals if rows[i]["verdict"] == "keep"]
    assert len(kept) == len(originals), (
        f"originals falsely removed: {sorted(set(originals) - set(kept))}"
    )


def test_fuzzy_rejects_unknown_pair_mode(spark):
    docs = spark.createDataFrame([(1, EN)], ["doc_id", "text"])
    bench = spark.createDataFrame([(2, BENCH)], ["doc_id", "text"])
    with pytest.raises(ValueError, match="pair_mode"):
        curate_corpus_fuzzy(docs, bench, pair_mode="bogus")


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
