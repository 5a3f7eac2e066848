"""Learned byte-pair-encoding (BPE) tokenization at corpus scale.

Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units") train loop re-expressed Spark-first: the corpus
collapses to a word-frequency table ONCE (one partial-agg shuffle — the
only pass whose cost scales with corpus size), and every merge round
then runs on that vocabulary-sized frame: adjacent-pair counts via a
map-only explode + partial agg, one single-row collect for the argmax
pair (model state, the kmeans/pq_train pattern), and a map-only
``aggregate`` fold that rewrites each word's symbol array greedily
left-to-right. Words fully merged to one symbol drop out of later
rounds (they can never contribute a pair again).

Batch ENCODING is the production join shape, not a per-row merge
replay: training already computed the merge closure of every corpus
word, so ``bpe_train`` returns that word -> symbols table and
``bpe_encode_by_vocab`` explodes documents into words, joins the vocab
(AQE broadcasts it when small), and reassembles per-document token
arrays in word order. Out-of-vocabulary words fall back to their
character symbols (documented; train on a superset corpus, or extend
the vocab table offline, when OOV merging matters).

Determinism: the argmax pair breaks count ties lexicographically on
(left, right), so a run is reproducible across partitionings — pinned
by the pure-Python cross-check in tests/test_bpe.py.

Scale notes (100 TB): the word-frequency shuffle is the only
corpus-sized stage; each round's pair scan is bounded by |vocab| x
avg word length, and the per-round ``localCheckpoint`` materializes a
vocabulary-sized frame (NOT corpus-sized) to keep the iterated plan
flat — the same bounded-model-state contract as clustering.py's Lloyd
rounds. Reference analogue: none (beyond-reference LLM-pipeline
operator; the x11 gate's GPT-2-style regex counter is a heuristic,
this is the learned merge table).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbsir_old_spark.functions.text import whitespace_tokens

__all__ = ["bpe_train", "bpe_encode_by_vocab", "END_OF_WORD"]

#: end-of-word marker symbol (Sennrich's </w>): lets the model
#: distinguish word-final subwords, and guarantees every word starts
#: with >= 2 symbols so the pair scan never sees a 1-symbol newcomer.
END_OF_WORD = "</w>"


def _char_symbols(word: Column) -> Column:
    """Initial symbol array: the word's code points plus END_OF_WORD.
    ``regexp_extract_all(word, '(?s).')`` matches one Unicode CODE POINT
    per element (Java regex treats a surrogate pair as one character),
    so astral-plane input (emoji, musical symbols) yields whole
    characters — matching both the pure-Python reference (str iterates
    code points) and DuckDB's per-codepoint split. ``split(word, '')``
    would instead emit unpaired UTF-16 surrogate halves; pinned by the
    astral-plane case in tests/test_bpe.py."""
    return F.concat(
        F.regexp_extract_all(word, F.lit(r"(?s)."), 0),
        F.array(F.lit(END_OF_WORD)),
    )


def _adjacent_pairs(syms: Column) -> Column:
    """All adjacent symbol pairs (overlapping, like Sennrich get_stats).
    Callers filter size >= 2 first — sequence(1, 0) would descend."""
    return F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(
            F.element_at(syms, i).alias("l"),
            F.element_at(syms, i + 1).alias("r"),
        ),
    )


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy leftmost non-overlapping merge of the (left, right) pair —
    one ``aggregate`` fold, no UDF: append each symbol, except that a
    ``right`` landing when the accumulator ends with an UNMERGED ``left``
    replaces that tail with the fused symbol. 'Unmerged' is why the fused
    symbol can never chain within the same round: left+right != left for
    nonempty right, so [a,a,a] -> [aa,a], [a,a,a,a] -> [aa,aa]."""
    fused = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(fused)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_freq: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges from the corpus; stop early
    when the best remaining pair's weighted frequency drops below
    ``min_freq``. Returns ``(merges, vocab)``: the ranked merge list and
    the word -> final-symbols table (columns ``__word__``, ``__freq__``,
    ``__syms__``) that :func:`bpe_encode_by_vocab` joins against.

    One corpus-sized shuffle total (the word-frequency agg); every merge
    round is vocabulary-sized with a single-row argmax collect.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if min_freq < 1:
        raise ValueError(f"min_freq must be >= 1, got {min_freq}")

    words = (
        df.select(F.explode(whitespace_tokens(text_col)).alias("__word__"))
        .groupBy("__word__")
        .agg(F.count("*").cast("long").alias("__freq__"))
        .withColumn("__syms__", _char_symbols(F.col("__word__")))
        .localCheckpoint(eager=True)
    )
    # `active` holds only words that can still merge (>= 2 symbols);
    # finished words are re-attached to the returned vocab at the end.
    active = words
    done: list[DataFrame] = []
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            active.select(
                F.explode(_adjacent_pairs(F.col("__syms__"))).alias("__p__"),
                "__freq__",
            )
            .groupBy(F.col("__p__.l").alias("l"), F.col("__p__.r").alias("r"))
            .agg(F.sum("__freq__").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_freq:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append((left, right))
        merged = active.withColumn(
            "__syms__", _merge_fold(F.col("__syms__"), left, right)
        ).localCheckpoint(eager=True)
        finished = merged.filter(F.size("__syms__") < 2)
        if finished.isEmpty():
            active = merged
        else:
            done.append(finished)
            active = merged.filter(F.size("__syms__") >= 2)
    vocab = active
    for frame in done:
        vocab = vocab.unionByName(frame)
    return merges, vocab


def bpe_encode_by_vocab(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
    broadcast_vocab: bool = False,
) -> DataFrame:
    """Encode each document against a trained vocabulary: explode words
    with their position, join the word -> symbols table, fall back to
    character symbols for out-of-vocabulary words, and reassemble
    per-document token arrays in word order via the order-preserving
    ``array_sort(collect_list(struct(pos, syms)))`` idiom (per-group
    state bounded by one document's word count).

    Pass ``broadcast_vocab=True`` when the vocabulary fits an executor:
    both :func:`bpe_train`'s localCheckpointed vocab and a
    ``createDataFrame`` literal scan as ``ExistingRDD`` with UNKNOWN size
    stats, so neither the static planner nor AQE will broadcast them on
    its own — the exploded word stream then shuffles on the word key for
    nothing (measured: the 4-row x45b vocab sort-merge-joined a corpus
    explode). Leave it False for genuinely large vocabularies, where the
    word-keyed shuffle join is the right plan.

    Documents with no tokens (NULL/empty/whitespace text) come through
    with an empty token array, not dropped.
    """
    words = df.select(
        id_col,
        F.posexplode_outer(whitespace_tokens(text_col)).alias(
            "__pos__", "__word__"
        ),
    )
    # Guard against a caller-supplied vocab with duplicate __word__ rows:
    # a duplicated word would fan out the join and silently duplicate that
    # word's tokens in every document. bpe_train's groupBy guarantees
    # uniqueness; re-impose it here deterministically (min over the
    # comparable symbol arrays, not dropDuplicates' arbitrary row).
    vocab_side = (
        vocab.select("__word__", "__syms__")
        .groupBy("__word__")
        .agg(F.min("__syms__").alias("__syms__"))
    )
    if broadcast_vocab:
        vocab_side = F.broadcast(vocab_side)
    joined = words.join(vocab_side, "__word__", "left").select(
        id_col,
        "__pos__",
        F.when(F.col("__word__").isNull(), F.array().cast("array<string>"))
        .otherwise(
            F.coalesce("__syms__", _char_symbols(F.col("__word__")))
        )
        .alias("__syms__"),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos__", "__syms__"))
                    ),
                    lambda s: s["__syms__"],
                )
            ).alias(out_col)
        )
    )
