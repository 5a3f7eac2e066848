"""chunk_documents (x37): context-window splitting of long documents."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_old_spark.functions.sampling import chunk_documents  # noqa: E402


def _doc(n):
    return " ".join(f"t{i}" for i in range(n))


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = chunk_documents(df, chunk_tokens=kw.pop("chunk_tokens", 4), **kw)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_index"], r["chunk_text"], r["n_tokens"])
        )
    return {k: sorted(v) for k, v in got.items()}


def test_disjoint_chunks_cover_every_token(spark):
    got = _run(spark, [(1, _doc(10))])  # chunk 4, stride 4 -> 4+4+2
    assert got[1] == [
        (0, "t0 t1 t2 t3", 4),
        (1, "t4 t5 t6 t7", 4),
        (2, "t8 t9", 2),
    ]


def test_overlapping_stride(spark):
    got = _run(spark, [(1, _doc(8))], stride=2)  # windows at 0,2,4 -> 3 chunks
    assert got[1] == [
        (0, "t0 t1 t2 t3", 4),
        (1, "t2 t3 t4 t5", 4),
        (2, "t4 t5 t6 t7", 4),
    ]


def test_short_doc_single_chunk_and_exact_fit(spark):
    got = _run(spark, [(1, _doc(3)), (2, _doc(4)), (3, _doc(8))])
    assert got[1] == [(0, "t0 t1 t2", 3)]
    # exactly chunk_tokens -> ONE chunk, no empty tail
    assert got[2] == [(0, "t0 t1 t2 t3", 4)]
    assert got[3] == [(0, "t0 t1 t2 t3", 4), (1, "t4 t5 t6 t7", 4)]


def test_exact_fit_with_overlap_has_no_empty_tail(spark):
    # n == chunk_tokens with stride < chunk must still be one chunk
    got = _run(spark, [(1, _doc(4))], stride=2)
    assert got[1] == [(0, "t0 t1 t2 t3", 4)]


def test_zero_token_docs_yield_no_rows(spark):
    # "\t\t" and "\n" are the whitespace_tokens regression pins: F.trim
    # strips only spaces, so the old trim-then-split yielded phantom ''
    # tokens for non-space edge whitespace
    got = _run(
        spark,
        [(1, None), (2, ""), (3, "   "), (4, _doc(2)), (5, "\t\t"), (6, "\n")],
    )
    assert set(got) == {4}


def test_edge_whitespace_never_yields_phantom_tokens(spark):
    got = _run(spark, [(1, "hello\n"), (2, "\tworld again\r\n")])
    assert got[1] == [(0, "hello", 1)]
    assert got[2] == [(0, "world again", 2)]


def test_shared_tokenizer_edge_semantics(spark):
    # whitespace_tokens is THE tokenizer every token consumer derives from;
    # pin its edge table directly
    from pyspark.sql import functions as F

    from hbsir_old_spark.functions.text import token_count, whitespace_tokens

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "\t\t"), (4, " a\tb\n"), (5, "x")],
        "i int, t string",
    )
    rows = {
        r["i"]: (r["toks"], r["n"])
        for r in df.select(
            "i",
            whitespace_tokens("t").alias("toks"),
            token_count("t").alias("n"),
        ).collect()
    }
    assert rows[1] == ([], 0)
    assert rows[2] == ([], 0)
    assert rows[3] == ([], 0)
    assert rows[4] == (["a", "b"], 2)
    assert rows[5] == (["x"], 1)


def test_whitespace_runs_collapse(spark):
    got = _run(spark, [(1, "  a \t b\n\nc  ")])
    assert got[1] == [(0, "a b c", 3)]


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_tokens=4, stride=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_tokens=4, stride=5)


def test_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, _doc(20))], "doc_id int, text string")
    out = chunk_documents(df, chunk_tokens=4, stride=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestChunkingVsPythonReference:
    """chunk_documents vs a pure-Python sliding-window reference on random
    corpora — pins the chunk count formula, stride/overlap coverage, tail
    sizing, and empty-doc handling against an independent sequential
    implementation (the x41-style randomized cross-check)."""

    @staticmethod
    def _reference(docs, chunk_tokens, stride):
        import re

        out = {}
        for d, t in docs.items():
            toks = (
                [x for x in re.split(r"[ \t\n\x0b\f\r]+", t) if x]
                if t is not None
                else []
            )
            n = len(toks)
            chunks = []
            if n > 0:
                start = 0
                while True:
                    window = toks[start : start + chunk_tokens]
                    chunks.append((" ".join(window), len(window)))
                    if start + chunk_tokens >= n:
                        break
                    start += stride
            out[d] = chunks
        return out

    def test_random_corpora_match_reference(self, spark):
        import random

        from hbsir_old_spark.functions.sampling import chunk_documents

        rng = random.Random(314)
        for trial in range(3):
            ct = rng.choice([2, 3, 5])
            stride = rng.randint(1, ct)
            docs = {}
            for d in range(rng.randint(5, 12)):
                roll = rng.random()
                if roll < 0.1:
                    docs[d] = None
                elif roll < 0.2:
                    docs[d] = "  "
                else:
                    docs[d] = " ".join(
                        f"w{rng.randint(0, 9)}" for _ in range(rng.randint(1, 17))
                    )
            expected = self._reference(docs, ct, stride)
            df = spark.createDataFrame(
                list(docs.items()), "doc_id int, text string"
            )
            rows = chunk_documents(
                df, chunk_tokens=ct, stride=stride
            ).collect()
            got = {}
            for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_index"])):
                got.setdefault(r["doc_id"], []).append(
                    (r["chunk_text"], r["n_tokens"])
                )
            expected_nonempty = {d: c for d, c in expected.items() if c}
            assert got == expected_nonempty, (
                f"trial {trial}: ct={ct} stride={stride} docs={docs}"
            )
