"""Gopher repetition rules (duplicate-line / duplicate-n-gram fractions,
composite keep flag): hand-computed pins plus the degenerate inputs (empty
text, single token) that would divide by zero or build descending
sequences if unguarded."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbsir_old_spark.functions.text import (  # noqa: E402
    REPETITION_THRESHOLDS,
    duplicate_line_fraction,
    duplicate_ngram_fraction,
    repetition_filter,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], schema="text string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_duplicate_line_fraction_hand_computed(spark):
    # 4 non-blank lines, "a b" twice -> 1 - 3/4
    text = "a b\nc d\n\n  \na b\ne"
    assert _one(spark, text, duplicate_line_fraction("text")) == pytest.approx(0.25)


def test_duplicate_line_fraction_blank_only(spark):
    assert _one(spark, " \n \n", duplicate_line_fraction("text")) == 0.0


def test_duplicate_bigram_fraction_hand_computed(spark):
    # tokens: a b a b a -> bigrams [a b, b a, a b, b a] -> 1 - 2/4
    assert _one(
        spark, "a b a b a", duplicate_ngram_fraction("text", 2)
    ) == pytest.approx(0.5)


def test_duplicate_trigram_all_unique(spark):
    assert _one(spark, "a b c d e", duplicate_ngram_fraction("text", 3)) == 0.0


def test_duplicate_ngram_short_and_empty_inputs(spark):
    # fewer tokens than n (and empty text) -> 0, not an error/negative
    assert _one(spark, "solo", duplicate_ngram_fraction("text", 2)) == 0.0
    assert _one(spark, "", duplicate_ngram_fraction("text", 2)) == 0.0
    assert _one(spark, "x y", duplicate_ngram_fraction("text", 3)) == 0.0


def test_duplicate_ngram_rejects_bad_n():
    with pytest.raises(ValueError):
        duplicate_ngram_fraction("text", 0)


def test_bigram_lm_scores_hand_computed(spark):
    from hbsir_old_spark.functions.text import bigram_lm_scores

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, ""), (4, "solo")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    # corpus bigrams: (a,b)x2, (b,a)x1; C(a,*)=2, C(b,*)=1; V=|{a,b}|=2
    # p(b|a) = 3/4, p(a|b) = 2/3
    # doc1: avg(-log2(3/4), -log2(2/3)) = avg(0.415037, 0.584963) = 0.5
    assert rows[1]["n_bigrams"] == 2 and rows[1]["cross_entropy"] == pytest.approx(0.5)
    assert rows[2]["n_bigrams"] == 1 and rows[2]["cross_entropy"] == pytest.approx(0.415)
    assert 3 not in rows and 4 not in rows  # no bigram -> no row


def test_repetition_filter_keep_flag(spark):
    clean = "the quick brown fox jumps over one lazy dog near a river bank"
    spam = " ".join(["buy now"] * 40)
    df = spark.createDataFrame([(1, clean), (2, spam)], schema="i int, text string")
    feats = repetition_filter("text")
    rows = {
        r["i"]: r
        for r in df.select("i", *[c.alias(n) for n, c in feats.items()]).collect()
    }
    assert rows[1]["keep"] is True
    assert rows[2]["keep"] is False
    assert rows[2]["dup_bigram_frac"] > REPETITION_THRESHOLDS["dup_bigram_frac"]


def test_cross_doc_dup_windows_planted_misaligned(spark):
    """Two docs share a passage at DIFFERENT offsets (misaligned mod any
    stride); a third is unique. Content-defined sampling must still see
    the duplicate — positional striding demonstrably cannot (the sampled
    substrings differ when alignments diverge), which is why the sampler
    keys on the window hash itself."""
    from hbsir_old_spark.functions.text import cross_doc_dup_windows

    shared = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the band plays on and the caravan rolls through the night "
        "past the old mill by the river crossing where nobody waits"
    )
    rows = [
        (1, "PREFIX one " + shared + " SUFFIX alpha"),
        (2, "different start " + shared + " other ending text"),
        (3, "entirely unrelated content with no overlap whatsoever here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cross_doc_dup_windows(df).collect()}
    assert out[1]["n_dup"] > 0 and out[2]["n_dup"] > 0
    assert 3 not in out or out[3]["n_dup"] == 0


def test_cross_doc_dup_windows_null_text_yields_no_row(spark):
    """Round-7 review regression: NULL-text docs must yield no row (the
    old md5(NULL) hash was join-rejected); the codegen rewrite's
    concat_ws would otherwise fold the NULL slice to md5('') and make two
    NULL-text docs mutual duplicates."""
    from hbsir_old_spark.functions.text import cross_doc_dup_windows

    rows = [(1, None), (2, None), (3, "some unique words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           cross_doc_dup_windows(df, sample_hex_digits=0).collect()}
    assert 1 not in out and 2 not in out
    assert out[3]["n_dup"] == 0


def test_cross_doc_dup_windows_unsampled_exact(spark):
    """sample_hex_digits=0 keeps every window: exact duplicate fractions,
    hand-checkable. Identical short texts (single truncated window) are
    cross-doc duplicates of each other; a unique text scores 0."""
    from hbsir_old_spark.functions.text import cross_doc_dup_windows

    df = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny"), (3, "x")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in cross_doc_dup_windows(df, sample_hex_digits=0).collect()
    }
    assert out[1]["n_windows"] == 1 and out[1]["n_dup"] == 1
    assert out[2]["n_dup"] == 1 and out[3]["n_dup"] == 0


class TestHashedQualityScore:
    """x33: hashed-feature linear quality classifier — hand-checkable
    invariants (exact integer fold, empty/NULL text, threshold boolean)
    plus the map-only plan pin (no Exchange: one output row per input
    row with zero shuffles)."""

    def _score(self, spark, rows, **kwargs):
        from hbsir_old_spark.functions.text import hashed_quality_score

        df = spark.createDataFrame(rows, schema="doc_id long, text string")
        return {
            r["doc_id"]: r
            for r in hashed_quality_score(df, **kwargs).collect()
        }

    def test_exact_fold_matches_per_token_weights(self, spark):
        import hashlib

        text = "alpha beta beta gamma"
        out = self._score(spark, [(1, text)])[1]
        expected = 0
        for tok in text.split():
            b = int(hashlib.md5(f"qw|{tok}".encode()).hexdigest()[:3], 16)
            expected += (b * 2654435761) % 4097 - 2048
        assert out["n_tokens"] == 4
        assert out["score_sum"] == expected
        assert out["quality_score"] == expected / (4 * 2048.0)

    def test_empty_and_null_text(self, spark):
        out = self._score(spark, [(1, ""), (2, "   "), (3, None)])
        for doc in (1, 2, 3):
            assert out[doc]["n_tokens"] == 0
            assert out[doc]["score_sum"] == 0
            assert out[doc]["quality_score"] is None
            assert out[doc]["quality_pass"] is False

    def test_threshold_splits(self, spark):
        # same doc, two thresholds bracketing its score -> flips the flag
        rows = [(1, "alpha beta gamma delta epsilon")]
        lo = self._score(spark, rows, pass_threshold=-1.0)[1]
        hi = self._score(spark, rows, pass_threshold=1.0)[1]
        assert lo["quality_pass"] is True
        assert hi["quality_pass"] is False

    def test_map_only_plan(self, spark):
        from hbsir_old_spark.functions.text import hashed_quality_score

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = (
            hashed_quality_score(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan

    def test_trained_weights_variant_matches_closed_form(self, spark):
        # the docstring's "trained weights = one expression swap" claim,
        # proven: feed the closed-form weight table in as an explicit
        # vector -> identical scores (integer-valued doubles sum exactly)
        from hbsir_old_spark.functions.text import (
            hashed_quality_score,
            hashed_quality_score_weighted,
        )

        rows = [(1, "alpha beta beta gamma"), (2, ""), (3, None), (4, "x y z")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        v = 16**2
        table = [float((b * 2654435761) % (v + 1) - v // 2) for b in range(v)]
        closed = {
            r["doc_id"]: r
            for r in hashed_quality_score(df, hex_chars=2).collect()
        }
        trained = {
            r["doc_id"]: r
            for r in hashed_quality_score_weighted(df, table, hex_chars=2).collect()
        }
        for doc in (1, 2, 3, 4):
            c, t = closed[doc], trained[doc]
            assert t["n_tokens"] == c["n_tokens"]
            if c["quality_score"] is None:
                assert t["quality_score"] is None
            else:
                # closed form normalizes by half=V/2; undo for comparison
                assert t["quality_score"] == c["quality_score"] * (v // 2)
            assert t["quality_pass"] == c["quality_pass"]

    def test_trained_weights_plan_is_map_only(self, spark):
        from hbsir_old_spark.functions.text import hashed_quality_score_weighted

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        out = hashed_quality_score_weighted(df, [0.5] * (16**2), hex_chars=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan

    def test_trained_weights_length_validation(self):
        from hbsir_old_spark.functions.text import hashed_quality_score_weighted

        with pytest.raises(ValueError):
            hashed_quality_score_weighted(None, [0.5] * 10, hex_chars=2)
