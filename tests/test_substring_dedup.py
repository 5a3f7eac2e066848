"""remove_duplicate_passages (x41): Lee et al. exact-substring dedup removal."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_old_spark.functions.dedup import remove_duplicate_passages  # noqa: E402

# a shared 5-token passage, planted mid-document in docs 1 and 2
PASSAGE = "the quick brown fox jumps"


def _docs(spark):
    rows = [
        (1, f"alpha beta {PASSAGE} gamma delta"),
        (2, f"one two three {PASSAGE} four"),
        (3, "totally unrelated content with no shared windows here"),
        (4, None),
        (5, ""),
        (6, "   \t\n  "),
        # within-doc repetition only: the window repeats inside ONE doc
        (7, f"{PASSAGE} filler filler filler {PASSAGE}"),
        # short doc (< width tokens) duplicated verbatim in another short doc
        (8, "tiny dup doc"),
        (9, "tiny dup doc"),
        # case/spacing variant of doc 8's text: matches via normalization
        (10, "TINY  DUP   DOC extra trailing words here"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def _run(spark, width=5, keep="first", min_docs=2):
    out = remove_duplicate_passages(
        _docs(spark), width=width, keep=keep, min_docs=min_docs
    )
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_keep_first_retains_canonical_copy(spark):
    rows = _run(spark)
    # doc 1 is the lexicographically-first occurrence: untouched
    assert rows[1]["text"] == f"alpha beta {PASSAGE} gamma delta"
    assert rows[1]["n_removed"] == 0 and rows[1]["n_tokens"] == 9
    # doc 2 loses exactly the 5 passage tokens
    assert rows[2]["text"] == "one two three four"
    assert rows[2]["n_removed"] == 5 and rows[2]["n_tokens"] == 9


def test_keep_none_cuts_every_occurrence(spark):
    rows = _run(spark, keep="none")
    assert rows[1]["text"] == "alpha beta gamma delta"
    assert rows[1]["n_removed"] == 5
    assert rows[2]["text"] == "one two three four"


def test_within_doc_repetition_never_cuts_alone(spark):
    # doc 7 contains the passage twice, but the passage also lives in docs
    # 1 and 2 — under keep='first' doc 7 loses BOTH copies (doc 1 is
    # canonical). The within-doc-only guarantee needs a window unique to
    # doc 7: its repeated "filler filler filler" interior windows occur in
    # no other document, so they survive.
    rows = _run(spark)
    assert "filler filler filler" in rows[7]["text"]
    # both passage copies cut (canonical is doc 1)
    assert PASSAGE not in rows[7]["text"]


def test_short_doc_whole_text_window_and_normalization(spark):
    rows = _run(spark)
    # docs 8/9: 3-token docs share their whole-text window; 8 is canonical
    assert rows[8]["text"] == "tiny dup doc"
    assert rows[8]["n_removed"] == 0
    assert rows[9]["text"] == ""
    assert rows[9]["n_removed"] == 3
    # doc 10 starts with the same normalized window "tiny dup doc …" only
    # as part of longer windows (7 tokens, width 5) — its windows are
    # 5-grams, none of which equal the short docs' whole-text 3-gram, so
    # it is untouched; but its ORIGINAL case is preserved in the output
    assert rows[10]["text"].startswith("TINY DUP DOC")
    assert rows[10]["n_removed"] == 0


def test_null_empty_blank_pass_through(spark):
    rows = _run(spark)
    assert rows[4]["text"] is None
    assert rows[4]["n_tokens"] == 0 and rows[4]["n_removed"] == 0
    assert rows[5]["text"] == "" and rows[5]["n_removed"] == 0
    assert rows[6]["text"] == "" and rows[6]["n_tokens"] == 0
    # untouched doc: token stream preserved, single-space rejoined
    assert rows[3]["text"] == "totally unrelated content with no shared windows here"


def test_overlapping_windows_coverage_union(spark):
    # two docs share a 7-token passage; with width 5 the passage yields 3
    # overlapping duplicated windows whose coverage must union to exactly
    # the 7 passage tokens, not 15
    p = "a b c d e f g"
    df = spark.createDataFrame(
        [(1, f"x {p} y"), (2, f"z {p}")], "doc_id int, text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicate_passages(df, width=5).collect()
    }
    assert out[1]["n_removed"] == 0  # canonical
    assert out[2]["text"] == "z"
    assert out[2]["n_removed"] == 7


def test_null_id_rows_dropped_not_wiped(spark):
    # a NULL id cannot anchor the reassembly join; without the up-front
    # filter the row would come back as text='' with every token counted
    # removed — the contract (exact_dedup's) is to drop it instead
    df = spark.createDataFrame(
        [(None, "perfectly unique text nobody shares"), (1, "other words")],
        "doc_id int, text string",
    )
    rows = remove_duplicate_passages(df, width=5).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_validation(spark):
    df = _docs(spark)
    with pytest.raises(ValueError, match="keep"):
        remove_duplicate_passages(df, keep="canonical")
    with pytest.raises(ValueError, match="min_docs"):
        remove_duplicate_passages(df, min_docs=1)
    with pytest.raises(ValueError, match="width"):
        remove_duplicate_passages(df, width=0)


def test_plan_has_no_udfs_or_cartesian(spark):
    plan = remove_duplicate_passages(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


class TestRandomizedVsPythonReference:
    """remove_duplicate_passages vs an independent pure-Python reference on
    random small-vocab corpora (shared windows arise naturally) — pins the
    window enumeration, distinct-doc ownership, canonical pick, coverage
    union, and reassembly against a sequential implementation, across
    widths, both keep modes, and NULL/empty docs."""

    @staticmethod
    def _reference(docs, width, min_docs, keep):
        import re
        from collections import defaultdict

        def toks_of(t):
            return [x for x in re.split(r"[ \t\n\x0b\f\r]+", t) if x]

        occ = []
        for d, t in docs.items():
            if t is None:
                continue
            toks = toks_of(t)
            n = len(toks)
            if n == 0:
                continue
            ntoks = [x.lower() for x in toks]
            for p in range(1, max(n - (width - 1), 1) + 1):
                occ.append((d, p, n, " ".join(ntoks[p - 1 : p - 1 + width])))
        owners, first = defaultdict(set), {}
        for d, p, n, g in occ:
            owners[g].add(d)
            if g not in first or (d, p) < first[g]:
                first[g] = (d, p)
        dup = {g for g, s in owners.items() if len(s) >= min_docs}
        covered = defaultdict(set)
        for d, p, n, g in occ:
            if g in dup and (keep == "none" or (d, p) != first[g]):
                for tp in range(p, min(p + width - 1, n) + 1):
                    covered[d].add(tp)
        out = {}
        for d, t in docs.items():
            if t is None:
                out[d] = (None, 0, 0)
                continue
            toks = toks_of(t)
            kept = [tok for i, tok in enumerate(toks, 1) if i not in covered[d]]
            out[d] = (" ".join(kept), len(toks), len(toks) - len(kept))
        return out

    def test_random_corpora_match_reference(self, spark):
        import random

        rng = random.Random(20260815)
        vocab = ["a", "b", "c", "Dd", "e"]
        for trial in range(4):
            width = rng.choice([1, 2, 3])
            keep = rng.choice(["first", "none"])
            docs = {}
            for d in range(rng.randint(4, 14)):
                roll = rng.random()
                if roll < 0.08:
                    docs[d] = None
                elif roll < 0.16:
                    docs[d] = rng.choice(["", "   "])
                else:
                    docs[d] = " ".join(
                        rng.choice(vocab) for _ in range(rng.randint(1, 12))
                    )
            expected = self._reference(docs, width, 2, keep)
            df = spark.createDataFrame(
                list(docs.items()), "doc_id int, text string"
            )
            got = {
                r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
                for r in remove_duplicate_passages(
                    df, width=width, keep=keep
                ).collect()
            }
            assert got == expected, (
                f"trial {trial}: width={width} keep={keep} docs={docs}"
            )
