"""Learned BPE (functions/bpe.py): Sennrich-style merge training and
vocab-join encoding, cross-checked EXACTLY against a pure-Python
reference (same tokenizer regex, same (count desc, pair asc) tiebreak,
same greedy leftmost merge) — the x45 gate is rows-only for the driver
(iterative training is not SQL-expressible), so this file carries the
exactness proof; the x45b fixed-vocab twin carries the full SQL oracle
for the encode join/reassembly/OOV semantics.
"""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from hbsir_old_spark.functions.bpe import (
    END_OF_WORD,
    bpe_encode_by_vocab,
    bpe_train,
)


def _tok(text):
    if text is None:
        return []
    # Java \s (no UNICODE_CHARACTER_CLASS) == [ \t\n\x0b\f\r]
    return [t for t in re.split(r"[ \t\n\x0b\f\r]+", text) if t]


def _py_train(texts, n_merges, min_freq):
    wf = Counter(w for t in texts for w in _tok(t))
    syms = {w: list(w) + [END_OF_WORD] for w in wf}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, f in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        pair, cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_freq:
            break
        merges.append(pair)
        a, b = pair
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def _py_encode(text, syms):
    out = []
    for w in _tok(text):
        out.extend(syms.get(w, list(w) + [END_OF_WORD]))
    return out


class TestTrainSemantics:
    def test_classic_low_lower_corpus(self, spark):
        # the canonical Sennrich example shape: 'lo' dominates
        texts = ["low low low low low", "lower lower", "newest newest"]
        df = spark.createDataFrame([(t,) for t in texts], ["text"])
        merges, vocab = bpe_train(df, "text", n_merges=4, min_freq=1)
        want_merges, want_syms = _py_train(texts, 4, 1)
        assert merges == want_merges
        assert merges[0] == ("l", "o")  # freq 7 beats everything
        got_syms = {
            r["__word__"]: list(r["__syms__"]) for r in vocab.collect()
        }
        assert got_syms == want_syms

    def test_tiebreak_is_lexicographic(self, spark):
        # every pair ties at freq 2: (a,b), (b,</w>), (b,a), (a,</w>) —
        # and '<' sorts before 'b', so ('a','</w>') is the pinned winner
        # (the python reference picks the same, by the same total order)
        df = spark.createDataFrame([("ab ab ba ba",)], ["text"])
        merges, _ = bpe_train(df, "text", n_merges=1, min_freq=1)
        assert merges == _py_train(["ab ab ba ba"], 1, 1)[0]
        assert merges == [("a", END_OF_WORD)]

    def test_min_freq_stops_training(self, spark):
        df = spark.createDataFrame([("xy xy zq",)], ["text"])
        merges, _ = bpe_train(df, "text", n_merges=10, min_freq=2)
        # only pairs with weighted freq >= 2 merge: x+y, xy+</w>; the
        # zq word's pairs are all freq 1
        assert merges == [("x", "y"), ("xy", END_OF_WORD)]

    def test_repeated_symbol_merges_greedy_leftmost(self, spark):
        df = spark.createDataFrame([("aaa aaaa",)], ["text"])
        merges, vocab = bpe_train(df, "text", n_merges=1, min_freq=1)
        assert merges == [("a", "a")]
        got = {r["__word__"]: list(r["__syms__"]) for r in vocab.collect()}
        assert got["aaa"] == ["aa", "a", END_OF_WORD]
        assert got["aaaa"] == ["aa", "aa", END_OF_WORD]

    def test_fully_merged_words_survive_into_vocab(self, spark):
        # 'aa' collapses to one symbol after 2 merges; it must still be
        # in the returned vocab (encode joins against it)
        df = spark.createDataFrame([("aa aa aa",)], ["text"])
        merges, vocab = bpe_train(df, "text", n_merges=5, min_freq=1)
        got = {r["__word__"]: list(r["__syms__"]) for r in vocab.collect()}
        assert got["aa"] == ["aa" + END_OF_WORD]

    def test_validation(self, spark):
        df = spark.createDataFrame([("x",)], ["text"])
        with pytest.raises(ValueError, match="n_merges"):
            bpe_train(df, "text", n_merges=0)
        with pytest.raises(ValueError, match="min_freq"):
            bpe_train(df, "text", min_freq=0)

    def test_astral_plane_words_split_per_codepoint(self, spark):
        # U+1D11E (musical symbol G clef) and U+1F600 (emoji) live outside
        # the BMP: split(word, '') yields unpaired UTF-16 surrogate halves,
        # the code-point regex keeps them whole — matching the pure-Python
        # reference, whose str iteration is per code point (ADVICE r10)
        texts = ["\U0001d11ex \U0001d11ex \U0001f600 ab"]
        df = spark.createDataFrame([(t,) for t in texts], ["text"])
        merges, vocab = bpe_train(df, "text", n_merges=3, min_freq=1)
        want_merges, want_syms = _py_train(texts, 3, 1)
        assert merges == want_merges
        got = {r["__word__"]: list(r["__syms__"]) for r in vocab.collect()}
        assert got == want_syms
        assert "\U0001d11e" in {s for ss in got.values() for s in ss} or any(
            "\U0001d11e" in s for ss in got.values() for s in ss
        )


class TestEncode:
    def test_encode_with_oov_fallback_and_empty_docs(self, spark):
        train = spark.createDataFrame([("low low lower",)], ["text"])
        merges, vocab = bpe_train(train, "text", n_merges=2, min_freq=1)
        docs = spark.createDataFrame(
            [(1, "low unseen low"), (2, ""), (3, None), (4, "   ")],
            ["doc_id", "text"],
        )
        out = {
            r["doc_id"]: list(r["bpe_tokens"])
            for r in bpe_encode_by_vocab(docs, vocab).collect()
        }
        _, syms = _py_train(["low low lower"], 2, 1)
        assert out[1] == (
            syms["low"] + list("unseen") + [END_OF_WORD] + syms["low"]
        )
        assert out[2] == [] and out[3] == [] and out[4] == []

    def test_duplicate_vocab_rows_do_not_fan_out(self, spark):
        # a caller-supplied vocab with a duplicated __word__ must not fan
        # out the join (which would silently duplicate that word's tokens
        # in every document); the guard dedups deterministically via the
        # min of the comparable symbol arrays (ADVICE r10)
        docs = spark.createDataFrame([(1, "low low")], ["doc_id", "text"])
        vocab = spark.createDataFrame(
            [("low", ["lo", "w</w>"]), ("low", ["l", "ow</w>"])],
            "__word__ string, __syms__ array<string>",
        )
        out = bpe_encode_by_vocab(docs, vocab).collect()
        toks = list(out[0]["bpe_tokens"])
        assert toks == ["l", "ow</w>", "l", "ow</w>"]

    def test_encode_plan_no_udf_no_cartesian(self, spark, sf_dir):
        import contextlib
        import io

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        merges, vocab = bpe_train(
            docs.limit(50), "text", n_merges=3, min_freq=1
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bpe_encode_by_vocab(docs, vocab).explain("formatted")
        plan = buf.getvalue()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan

    def test_broadcast_hint_kills_the_word_shuffle(self, spark, sf_dir):
        # checkpointed/literal vocabs scan as ExistingRDD with unknown
        # stats, so neither the planner nor AQE broadcasts them; the
        # explicit hint must turn the word-keyed sort-merge join into a
        # broadcast join (no Exchange on the exploded word stream)
        import contextlib
        import io

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        _, vocab = bpe_train(docs.limit(50), "text", n_merges=2, min_freq=1)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bpe_encode_by_vocab(
                docs, vocab, broadcast_vocab=True
            ).explain("formatted")
        plan = buf.getvalue()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestRealCorpusCrossCheck:
    def test_train_and_encode_match_python_reference(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        merges, vocab = bpe_train(docs, "text", n_merges=20, min_freq=2)
        texts = [r["text"] for r in docs.select("text").collect()]
        want_merges, want_syms = _py_train(texts, 20, 2)
        assert merges == want_merges and len(merges) > 0

        got_syms = {
            r["__word__"]: list(r["__syms__"]) for r in vocab.collect()
        }
        assert got_syms == want_syms

        enc = {
            r["doc_id"]: list(r["bpe_tokens"])
            for r in bpe_encode_by_vocab(docs, vocab).collect()
        }
        for r in docs.select("doc_id", "text").collect():
            assert enc[r["doc_id"]] == _py_encode(r["text"], want_syms), (
                f"doc {r['doc_id']} encoding diverged"
            )
