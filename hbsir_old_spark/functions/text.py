"""Text-analysis scalar functions: token counting, language ID, quality
scoring, document fingerprinting.

All pure Column expressions (whole-stage codegen, no UDF) and all portable:
the same logic is expressible in ANSI-ish SQL (replace/length arithmetic,
md5), so every function here has an exact DuckDB oracle. At 100 TB these are
embarrassingly parallel map-side expressions — no shuffle at all.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def whitespace_tokens(col: Column | str) -> Column:
    """THE whitespace tokenizer of this package: split on whitespace runs,
    then drop the '' edge artifacts. The maximal non-whitespace runs of
    the text, in order — so leading/trailing tabs/newlines can never
    yield phantom '' tokens (``F.trim`` strips only ASCII spaces, so the
    old trim-then-split idiom did; and Java split keeps edge empties at
    limit -1). NULL, empty and whitespace-only text all tokenize to an
    EMPTY array, never ``['']``. Split-then-remove beats the equivalent
    collapse-runs-then-trim-then-split formulation by one full
    regexp_replace pass over every row (measured ~1.7× on the x25
    repetition gate). Every token consumer (counts, n-grams, hashed
    features, chunking) must derive from this one helper so the edge
    semantics cannot drift between call sites — or between engine and
    oracle (DuckDB twin: ``list_filter(string_split_regex(text,
    '[ \\t\\n\\x0b\\f\\r]+'), t -> t <> '')``, or the output-identical
    ``string_split(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+',
    ' ', 'g')), ' ')`` collapse form with an empty-string guard)."""
    return F.coalesce(
        F.array_remove(F.split(_c(col), r"\s+"), ""),
        F.array().cast("array<string>"),
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count; 0 for NULL/empty/blank strings."""
    return F.size(whitespace_tokens(col))


#: GPT-2-style pretokenizer regex (letters / digits / punctuation runs with
#: leading-space absorption, contraction suffixes) — the "BPE-ish" counter:
#: real BPE merges only ever split WITHIN these pretokens, so this counts an
#: upper bound token estimate without a vocab file. RE2/Java-regex compatible.
BPE_SPLIT_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_token_count(col: Column | str) -> Column:
    """Approximate BPE token count via the GPT-2 pretokenizer regex —
    ``regexp_count``, JVM-side, no vocab needed."""
    return F.regexp_count(_c(col), F.lit(BPE_SPLIT_PATTERN)).cast("long")


def count_occurrences(col: Column | str, term: str) -> Column:
    """Non-overlapping occurrences of a literal term, via replace/length
    arithmetic — identical semantics in any SQL engine."""
    col = _c(col)
    return (F.length(col) - F.length(F.replace(col, F.lit(term), F.lit("")))) / F.lit(len(term))


#: marker words per language for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "los", "que"),
    "de": ("der", "und", "die"),
    "fr": ("le", "la", "et"),
    "zh": ("de", "shi", "bu"),
}


def lang_score(col: Column | str, lang: str) -> Column:
    """Marker-word hit count for one language (word-boundary via padding)."""
    padded = F.concat(F.lit(" "), _c(col), F.lit(" "))
    score = None
    for word in LANG_MARKERS[lang]:
        cnt = count_occurrences(padded, f" {word} ")
        score = cnt if score is None else score + cnt
    return score.cast("long")


def lang_id(col: Column | str, langs: tuple[str, ...] = ("en", "es", "de", "fr", "zh")) -> Column:
    """Argmax language by marker score; ties break to the alphabetically
    LAST language (max over zero-padded 'score|lang' strings — portable
    deterministic tie-break)."""
    # 12-digit zero padding: lexicographic max == numeric max for any score
    # below 10^12 (a document would need ~4 TB of one marker word to exceed)
    tagged = [
        F.concat(F.format_string("%012d", lang_score(col, lang)), F.lit(lang))
        for lang in sorted(langs)
    ]
    return F.greatest(*tagged).substr(13, 2)


def quality_features(col: Column | str) -> dict[str, Column]:
    """Quality-scoring feature set: lengths, token stats, punctuation and
    stopword ratios, and a composite [0,1] quality score (rounded to 6dp so
    cross-engine float noise vanishes)."""
    col = _c(col)
    n_chars = F.length(col)
    n_tokens = token_count(col)
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    stop_hits = sum(
        count_occurrences(padded, f" {w} ") for w in ("the", "a", "and", "of", "to")
    )
    punct = F.length(col) - F.length(F.translate(col, ".,!?;:", ""))
    avg_tok_len = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "avg_token_len": F.round(avg_tok_len, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "quality_score": F.round(score, 6),
    }


#: the Gopher rule-filter stopword probe (Rae et al. 2021, §A1.1): a doc
#: must contain at least ``min_stopword_hits`` DISTINCT words of this set
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)

#: line prefixes the bullet-line rule counts
GOPHER_BULLET_MARKS: tuple[str, ...] = ("•", "-", "*")


def gopher_quality_rules(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
):
    """The Gopher quality-rule filter (Rae et al. 2021, §A1.1) — the
    heuristic RULE half of the standard curation stack (the repetition
    half is :func:`repetition_filter`/x25; the learned classifier is
    :func:`hashed_quality_score`/x33). Per document, the seven published
    document-level rules with their published default thresholds:

    1. word count within ``[min_words, max_words]``;
    2. mean word length within ``[min_mean_word_len, max_mean_word_len]``;
    3. symbol-to-word ratio (``#`` and ``...`` occurrences) at most
       ``max_symbol_word_ratio``;
    4. at most ``max_bullet_line_frac`` of lines starting with a bullet;
    5. at most ``max_ellipsis_line_frac`` of lines ending with an
       ellipsis (``...`` or ``…``);
    6. at least ``min_alpha_word_frac`` of words containing an alphabetic
       character;
    7. at least ``min_stopword_hits`` distinct :data:`GOPHER_STOPWORDS`
       present.

    Output: one diagnostic row per document — ``(id, n_words,
    words_ok, mean_len_ok, symbol_ok, bullet_ok, ellipsis_ok, alpha_ok,
    stopword_ok, verdict)`` with ``verdict`` the first failing rule name
    (in the order above) or ``'keep'`` — the same diagnostic-funnel shape
    as :func:`curation.curate_corpus`.

    Ratio rules pass VACUOUSLY when their denominator is zero (an empty
    document already fails the word-count rule, which outranks them).
    Every count is exact integer arithmetic over the shared
    :func:`whitespace_tokens`; the ratios are IEEE divisions of those
    exact counts, so the DuckDB oracle replays them bit-identically.

    Scale shape: pure per-row array/string expressions — MAP-ONLY, zero
    shuffles, zero UDFs (plan pinned in tests/test_gopher_rules.py).

    Reference analogue: none (beyond-reference LLM-pipeline operator).
    """
    text = F.coalesce(_c(text_col), F.lit(""))
    # Materialize the token and line arrays ONCE through an intermediate
    # projection: built inline, Catalyst's projection collapse would
    # re-derive the regex tokenization into every one of its five
    # consumers (measured 6.2 s -> 1.0 s warm on the sf0.1 gate — the
    # same k-fold-inline trap minhash_signature_from_shingles documents).
    prepared = df.select(
        F.col(id_col),
        whitespace_tokens(text_col).alias("__toks__"),
        # \r?\n: a CRLF document would otherwise leave \r on every line
        # (F.trim strips only ASCII spaces), defeating endswith checks
        F.split(text, "\\r?\\n").alias("__lines__"),
        # symbol occurrences derive from the raw text, not the arrays:
        # fold them here so the second select never touches text
        (count_occurrences(text, "#") + count_occurrences(text, "...")).alias(
            "__symbols__"
        ),
    )
    toks = F.col("__toks__")
    lines = F.col("__lines__")
    symbols = F.col("__symbols__")
    n_words = F.size(toks)
    total_chars = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    n_lines = F.size(lines)

    def _bullet(line: Column) -> Column:
        t = F.trim(line)
        cond = F.startswith(t, F.lit(GOPHER_BULLET_MARKS[0]))
        for mark in GOPHER_BULLET_MARKS[1:]:
            cond = cond | F.startswith(t, F.lit(mark))
        return cond

    bullet_lines = F.size(F.filter(lines, _bullet))
    ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda line: F.endswith(F.trim(line), F.lit("..."))
            | F.endswith(F.trim(line), F.lit("…")),
        )
    )
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    # distinct-membership count via array_intersect (set semantics): no
    # per-stopword scan of the token array
    stop_hits = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )

    mean_len = total_chars / n_words
    words_ok = (n_words >= F.lit(min_words)) & (n_words <= F.lit(max_words))
    mean_len_ok = F.when(
        n_words > 0,
        (mean_len >= F.lit(min_mean_word_len))
        & (mean_len <= F.lit(max_mean_word_len)),
    ).otherwise(F.lit(True))
    symbol_ok = F.when(
        n_words > 0, symbols / n_words <= F.lit(max_symbol_word_ratio)
    ).otherwise(F.lit(True))
    bullet_ok = F.when(
        n_lines > 0, bullet_lines / n_lines <= F.lit(max_bullet_line_frac)
    ).otherwise(F.lit(True))
    ellipsis_ok = F.when(
        n_lines > 0, ellipsis_lines / n_lines <= F.lit(max_ellipsis_line_frac)
    ).otherwise(F.lit(True))
    alpha_ok = F.when(
        n_words > 0, alpha_words / n_words >= F.lit(min_alpha_word_frac)
    ).otherwise(F.lit(True))
    stopword_ok = stop_hits >= F.lit(min_stopword_hits)

    return prepared.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        words_ok.alias("words_ok"),
        mean_len_ok.alias("mean_len_ok"),
        symbol_ok.alias("symbol_ok"),
        bullet_ok.alias("bullet_ok"),
        ellipsis_ok.alias("ellipsis_ok"),
        alpha_ok.alias("alpha_ok"),
        stopword_ok.alias("stopword_ok"),
        F.when(~words_ok, F.lit("words"))
        .when(~mean_len_ok, F.lit("mean_word_length"))
        .when(~symbol_ok, F.lit("symbol_ratio"))
        .when(~bullet_ok, F.lit("bullet_lines"))
        .when(~ellipsis_ok, F.lit("ellipsis_lines"))
        .when(~alpha_ok, F.lit("alpha_words"))
        .when(~stopword_ok, F.lit("stopwords"))
        .otherwise(F.lit("keep"))
        .alias("verdict"),
    )


#: characters C4 accepts as a terminal line ending (Raffel et al. 2020
#: §2.2: period, exclamation mark, question mark, end quotation mark)
C4_TERMINAL_CHARS: tuple[str, ...] = (".", "!", "?", '"')


def c4_line_filter(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_line_words: int = 5,
    min_sentences: int = 3,
    line_blocklist: tuple[str, ...] = ("javascript",),
) -> "DataFrame":
    """The C4 cleaning filter (Raffel et al. 2020, §2.2) — the line-level
    cousin of :func:`gopher_quality_rules` (which judges whole documents)
    and :func:`remove_boilerplate_lines` (which needs cross-corpus line
    frequencies; this one is purely per-document):

    * RETAIN a line only if its trimmed form ends in a terminal
      punctuation mark (:data:`C4_TERMINAL_CHARS`), it has at least
      ``min_line_words`` words, and it contains no ``line_blocklist``
      term (C4 dropped every line with the word "javascript");
    * DROP the whole page if it contains ``lorem ipsum`` (placeholder
      text), a curly brace (code), or fewer than ``min_sentences``
      sentences — sentence count approximated as the number of
      ``. ! ?`` occurrences in the RETAINED text (a documented
      heuristic; C4's own counting is unspecified).

    Output one row per input document: ``(id, n_lines, n_kept_lines,
    kept_text, has_lorem_ipsum, has_brace, n_sentences, keep)`` —
    ``kept_text`` is the retained lines re-joined with ``\\n`` in their
    original order, '' when nothing survives, and the page-level flags
    are evaluated on the RAW text (a blocked page is blocked regardless
    of which lines would have survived). NULL text behaves as ''.

    Scale shape: per-row array/string expressions only — MAP-ONLY, zero
    shuffles, zero UDFs; the line and retained arrays are derived once
    through intermediate projections (the x39 lesson: inline, Catalyst
    re-derives them into every consumer).

    Reference analogue: none (beyond-reference LLM-pipeline operator).
    """

    def _line_kept(line: Column) -> Column:
        t = F.trim(line)
        terminal = F.endswith(t, F.lit(C4_TERMINAL_CHARS[0]))
        for ch in C4_TERMINAL_CHARS[1:]:
            terminal = terminal | F.endswith(t, F.lit(ch))
        # \s+ — the SAME whitespace class as whitespace_tokens (the
        # package's single-tokenizer invariant): a line-internal \x0b/\f
        # must count words identically to every other token consumer
        words = F.size(
            F.filter(F.split(line, r"\s+"), lambda w: w != F.lit(""))
        )
        blocked = F.lit(False)
        for term in line_blocklist:
            blocked = blocked | F.contains(F.lower(line), F.lit(term))
        return terminal & (words >= F.lit(min_line_words)) & ~blocked

    p1 = df.select(
        F.col(id_col),
        F.coalesce(_c(text_col), F.lit("")).alias("__t__"),
    )
    p2 = p1.select(
        F.col(id_col),
        F.contains(F.lower(F.col("__t__")), F.lit("lorem ipsum")).alias(
            "has_lorem_ipsum"
        ),
        F.contains(F.col("__t__"), F.lit("{")).alias("has_brace"),
        # \r?\n: CRLF pages must not leave \r defeating the terminal-
        # punctuation endswith (F.trim strips only ASCII spaces)
        F.split(F.col("__t__"), "\\r?\\n").alias("__lines__"),
    )
    p3 = p2.select(
        F.col(id_col),
        "has_lorem_ipsum",
        "has_brace",
        F.size(F.col("__lines__")).cast("long").alias("n_lines"),
        F.filter(F.col("__lines__"), _line_kept).alias("__kept__"),
    )
    p4 = p3.select(
        F.col(id_col),
        "n_lines",
        F.size(F.col("__kept__")).cast("long").alias("n_kept_lines"),
        F.array_join(F.col("__kept__"), "\n").alias("kept_text"),
        "has_lorem_ipsum",
        "has_brace",
    )
    n_sentences = (
        count_occurrences(F.col("kept_text"), ".")
        + count_occurrences(F.col("kept_text"), "!")
        + count_occurrences(F.col("kept_text"), "?")
    ).cast("long")
    return p4.select(
        F.col(id_col),
        "n_lines",
        "n_kept_lines",
        "kept_text",
        "has_lorem_ipsum",
        "has_brace",
        n_sentences.alias("n_sentences"),
        (
            ~F.col("has_lorem_ipsum")
            & ~F.col("has_brace")
            & (n_sentences >= F.lit(min_sentences))
        ).alias("keep"),
    )


def strip_html(col: Column | str) -> Column:
    """Remove HTML tags and collapse the resulting whitespace — the first
    step of web-corpus cleaning. Pure regexp, codegen'd."""
    no_tags = F.regexp_replace(_c(col), r"<[^>]*>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


#: redaction patterns for PII-ish spans (conservative, RE2/Java compatible).
#: PHONE deliberately excludes whitespace inside the run: allowing it made
#: any space-separated digit sequence ("2018 2019 2020") redactable; the
#: trade-off is that space-separated phone formats stay unredacted.
REDACTION_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "URL": r"https?://[^\s]+",
    "PHONE": r"\+?[0-9][0-9()\-.]{7,}[0-9]",
}


def redact_pii(col: Column | str, patterns: dict[str, str] | None = None) -> Column:
    """Replace PII-ish spans with ``[TAG]`` placeholders. Deterministic
    regexp chain; order is the dict order (emails before phones so the
    digits inside an email aren't half-eaten)."""
    out = _c(col)
    for tag, pattern in (patterns or REDACTION_PATTERNS).items():
        out = F.regexp_replace(out, pattern, f"[{tag}]")
    return out


def repeated_token_ratio(col: Column | str) -> Column:
    """Gopher-style repetition signal: 1 - distinct_tokens / tokens.
    High values flag boilerplate/spammy documents. Rounded 6dp."""
    return repeated_token_ratio_from_tokens(whitespace_tokens(col))


def repeated_token_ratio_from_tokens(tokens: Column) -> Column:
    """:func:`repeated_token_ratio` over a pre-tokenized array column —
    the factored form for callers that materialize
    :func:`whitespace_tokens` once in a lower projection and derive
    several repetition features from it (Catalyst's projection collapse
    declines to inline a non-cheap alias referenced more than once, so
    the tokenization runs once per row instead of once per feature —
    the same k-fold-inline trap :func:`gopher_quality_rules`
    documents)."""
    n = F.size(tokens)
    distinct_n = F.size(F.array_distinct(tokens))
    return F.round(
        F.when(n > 0, 1 - distinct_n / n).otherwise(F.lit(0.0)), 6
    )


def duplicate_line_fraction(col: Column | str) -> Column:
    """Gopher repetition rule: fraction of non-blank lines that are exact
    duplicates of an earlier line (Rae et al. 2021 §A1.1, "duplicate line
    fraction"). 1 - distinct/total over newline-split lines; per-row native
    array ops, map-only at any scale. Rounded 6dp."""
    return duplicate_line_fraction_from_lines(nonblank_lines(col))


def nonblank_lines(col: Column | str) -> Column:
    """Trimmed non-blank lines of the text, as an array — the shared line
    splitter of the repetition rules (factor it into a lower projection
    when several features consume it)."""
    # NB: the one-arg lambda is load-bearing — F.trim passed directly would
    # be treated as an (element, index) two-arg lambda by transform (trim's
    # optional second param), silently binding the index as the trim-chars
    return F.filter(
        F.transform(F.split(_c(col), r"\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )


def duplicate_line_fraction_from_lines(lines: Column) -> Column:
    """:func:`duplicate_line_fraction` over a pre-split
    :func:`nonblank_lines` array column (factored form — see
    :func:`repeated_token_ratio_from_tokens`)."""
    n = F.size(lines)
    return F.round(
        F.when(n > 0, 1 - F.size(F.array_distinct(lines)) / n).otherwise(
            F.lit(0.0)
        ),
        6,
    )


def duplicate_ngram_fraction(col: Column | str, n: int = 2) -> Column:
    """Gopher repetition rule: fraction of word n-grams that are duplicates
    (1 - distinct/total). Token n-grams are built with ``slice`` over the
    whitespace token array — per-row native expressions, no explode, no
    shuffle; the same list algebra exists in DuckDB for the oracle."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    return duplicate_ngram_fraction_from_tokens(whitespace_tokens(col), n)


def duplicate_ngram_fraction_from_tokens(tokens: Column, n: int = 2) -> Column:
    """:func:`duplicate_ngram_fraction` over a pre-tokenized array column
    (factored form — see :func:`repeated_token_ratio_from_tokens`)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    m = F.size(tokens) - (n - 1)
    # clamped for the slice calls only: an empty token array makes m go to
    # -(n-1), and slice rejects negative lengths; the when(m > 0) below
    # still decides the output
    m0 = F.greatest(m, F.lit(0))
    # n-grams as a fold of zip_with over n shifted slices — O(tokens) array
    # work per row (the sequence+slice formulation re-walks the token array
    # per gram, O(tokens^2), and was the bottleneck at bench scale)
    grams = F.slice(tokens, 1, m0)
    for j in range(2, n + 1):
        grams = F.zip_with(
            grams,
            F.slice(tokens, j, m0),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.round(
        F.when(m > 0, 1 - F.size(F.array_distinct(grams)) / m).otherwise(
            F.lit(0.0)
        ),
        6,
    )


#: Gopher-style repetition thresholds (Rae et al. 2021 table A1, adapted):
#: a document failing ANY rule is flagged for removal.
REPETITION_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_bigram_frac": 0.18,
    "dup_trigram_frac": 0.16,
    "repeated_token_ratio": 0.60,
}


def repetition_filter(col: Column | str) -> dict[str, Column]:
    """The Gopher repetition-rule feature set plus the composite keep flag.
    All per-row native expressions — the ideal 100-TB prefilter: map-only,
    no shuffle, evaluated inside one WholeStageCodegen span."""
    feats = {
        "dup_line_frac": duplicate_line_fraction(col),
        "dup_bigram_frac": duplicate_ngram_fraction(col, 2),
        "dup_trigram_frac": duplicate_ngram_fraction(col, 3),
        "repeated_token_ratio": repeated_token_ratio(col),
    }
    keep = F.lit(True)
    for name, bound in REPETITION_THRESHOLDS.items():
        keep = keep & (feats[name] <= F.lit(bound))
    feats["keep"] = keep
    return feats


def bigram_lm_scores(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """Per-document cross-entropy under an add-one-smoothed word-bigram LM
    trained on the corpus itself — the CCNet/Gopher "perplexity filter"
    shape (score each document by how surprising it is to a LM of the
    corpus). Output: (id_col, n_bigrams, cross_entropy) where
    cross_entropy = avg(-log2 P(w2|w1)) over the document's bigrams,
    P(w2|w1) = (C(w1,w2) + 1) / (C(w1,*) + V), V = distinct bigram
    continuations corpus-wide. Documents with no bigram (0- or 1-token)
    yield no row.

    Scale shape: bigram training is one explode + partial-aggregable
    count; the context total C(w1,*) rolls up from the bigram table (one
    more partial agg); V is a one-row broadcast; scoring joins each
    document's bigrams to the scored bigram table — a hash join keyed on
    the bigram, the same shuffle topology as TF-IDF. No UDFs; log2 and
    the probability arithmetic are codegen'd expressions with exact
    DuckDB equivalents.
    """
    from pyspark.sql import functions as _F

    tokens = whitespace_tokens(text_col)
    m = _F.size(tokens) - 1
    # clamp for slice only (empty docs make m = -1, which slice rejects);
    # 0- and 1-token docs produce an empty gram array and explode away
    m0 = _F.greatest(m, _F.lit(0))
    grams = _F.zip_with(
        _F.slice(tokens, 1, m0),
        _F.slice(tokens, 2, m0),
        lambda a, b: _F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = (
        df.select(_F.col(id_col), _F.explode(grams).alias("__g__"))
        .select(id_col, _F.col("__g__.w1").alias("w1"), _F.col("__g__.w2").alias("w2"))
    )
    # Materialize the trained bigram table ONCE (r14, guide §2.4): its
    # three consumers below (context totals, vocabulary size, the scored
    # join) carry different attribute ids, so Spark re-executes the whole
    # explode + count pipeline per consumer (the pre-r14 x30 plan carried
    # 8 corpus scans / 20 Exchanges). The table is one row per DISTINCT
    # bigram — bounded by vocabulary, far smaller than the exploded
    # corpus it summarizes; the doc-side `pairs` explode deliberately
    # stays unmaterialized (corpus-sized; its two consumers are map-only
    # recomputes from the scan). localCheckpoint recovery caveat as usual.
    bigram_counts = (
        pairs.groupBy("w1", "w2")
        .agg(_F.count("*").alias("c2"))
        .localCheckpoint(eager=True)
    )
    context_totals = bigram_counts.groupBy("w1").agg(_F.sum("c2").alias("c1"))
    vocab = bigram_counts.select("w2").distinct().agg(
        _F.count("*").alias("v")
    )
    scored = (
        bigram_counts.join(context_totals, "w1")
        .crossJoin(_F.broadcast(vocab))
        .withColumn(
            "p", (_F.col("c2") + 1) / (_F.col("c1") + _F.col("v"))
        )
        .select("w1", "w2", "p")
    )
    return (
        pairs.join(scored, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            _F.count("*").cast("long").alias("n_bigrams"),
            _F.round(_F.avg(-_F.log2("p")), 4).alias("cross_entropy"),
        )
    )


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lower, collapse whitespace, trim.

    Engine-portability hardening (round-6 review): U+0130 (Turkish dotted
    I) is pre-mapped to plain 'i' — the JVM lowercases it to 'i' plus a
    combining dot (two codepoints) while utf8proc-based engines (the
    DuckDB oracles) produce bare 'i'; and Greek capital sigma is folded
    to the NON-final form on both sides (the JVM lowercases a trailing
    Σ context-sensitively to ς, utf8proc unconditionally to σ — and a
    literal ς input must land on σ too, so the fold runs after
    lowercasing). A cross-engine sweep over ligature/fullwidth/titlecase
    codepoints found no other divergent mapping."""
    lowered = F.lower(F.translate(_c(col), "\u0130", "i"))
    folded = F.translate(lowered, "\u03c2", "\u03c3")
    return F.trim(F.regexp_replace(folded, r"\s+", " "))


def doc_fingerprint(col: Column | str) -> Column:
    """Exact-dup fingerprint: md5 of the normalized text (portable)."""
    return F.md5(normalize_text(col))


def rolling_min_fingerprint(col: Column | str, width: int = 8) -> Column:
    """Rolling-hash document fingerprint: the minimum md5 over all
    character ``width``-grams of the normalized text — a 1-perm MinHash.
    Pure array expressions (sequence/transform/array_min), no UDF."""
    norm = normalize_text(col)
    positions = F.sequence(F.lit(1), F.greatest(F.length(norm) - (width - 1), F.lit(1)))
    hashes = F.transform(positions, lambda i: F.md5(F.substring(norm, i, width)))
    return F.array_min(hashes)


def exploded_word_shingles(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    gram_col: str = "__g__",
) -> "DataFrame":
    """One (id, gram) row per word ``n``-gram POSITION of the normalized
    text — the exploded twin of :func:`dedup.word_shingles`, minus the
    per-doc distinct (downstream semi-joins / global distincts don't need
    it, and computing it would force the array form back).

    Perf shape (same rewrite that took x32 from 4.6 s to 0.5 s for this
    stage): explode positions FIRST, then build each gram with plain
    ``slice``/``concat_ws`` — explode and project fuse into one
    whole-stage-codegen span reading the token array in place, where the
    ``transform`` lambda in the array form runs interpreted per row.
    Texts shorter than ``n`` tokens yield their whole-text gram
    (position 1's slice returns the full array — identical to the array
    form's ``greatest(…, 1)`` convention); NULL and empty texts both
    yield one ``''`` gram (``concat_ws`` folds the NULL slice to the
    empty string — the same fold the array form's lambda applies), so
    the two forms agree row-for-row as per-doc SETS; callers that want
    NULL-text docs gone filter ``text.isNotNull()`` first, as
    :func:`cross_doc_dup_windows` does."""
    tokens = F.split(normalize_text(F.col(text_col)), " ")
    m = F.size(F.col("__t__")) - (n - 1)
    return (
        df.select(F.col(id_col), tokens.alias("__t__"))
        .select(
            F.col(id_col),
            F.col("__t__"),
            F.explode(F.sequence(F.lit(1), F.greatest(m, F.lit(1)))).alias("__i__"),
        )
        .select(
            F.col(id_col),
            F.concat_ws(" ", F.slice(F.col("__t__"), F.col("__i__"), n)).alias(gram_col),
        )
    )


def token_frequencies(df, text_col: str = "text") -> "DataFrame":
    """Corpus-wide token frequency table: (token, freq), one row per
    distinct normalized token. The explode feeds a codegen'd partial-
    aggregable count — the shuffle carries (token, partial_count), not
    token instances, so vocabulary building scales to corpus size."""
    from pyspark.sql import DataFrame  # noqa: F811 (typing only)

    tokens = F.split(normalize_text(F.col(text_col)), " ")
    return (
        df.select(F.explode(tokens).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )


def tfidf_top_terms(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> "DataFrame":
    """Top-k characteristic terms per document by smoothed TF-IDF:
    ``tf * (ln((N+1)/(df+1)) + 1)``, ties broken by term ascending.
    Returns (id, term, rank, score).

    Shuffle budget at corpus scale: one partial-aggregable (doc, term)
    count, one partial-aggregable document-frequency count over it, a
    term-keyed join to attach idf (vocabulary-sized — shuffle join; at
    gate scale AQE broadcasts it), and a per-document window for the
    top-k (documents are tiny partitions). The corpus document count
    rides in as a broadcast single row, never a driver scalar."""
    from pyspark.sql import Window

    tokens = F.split(normalize_text(F.col(text_col)), " ")
    term_counts = (
        df.select(F.col(id_col), F.explode(tokens).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    doc_freq = term_counts.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("__n__"))
    scored = (
        term_counts.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * (F.log((F.col("__n__") + 1) / (F.col("df") + 1)) + 1),
        )
    )
    win = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "rank", "score")
    )


def top_k_tokens(df, text_col: str = "text", k: int = 20) -> "DataFrame":
    """The k most frequent corpus tokens (vocabulary head), deterministic
    tiebreak on the token string. A single global top-k over the (small)
    aggregated vocabulary — Spark's TakeOrderedAndProject, no full sort."""
    return token_frequencies(df, text_col).orderBy(
        F.col("freq").desc(), F.col("token")
    ).limit(k)


def cross_doc_dup_windows(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 5,
    sample_hex_digits: int = 1,
) -> "DataFrame":
    """Per-document CROSS-corpus duplicated-passage signal (the
    exact-substring-dedup statistic of Lee et al. 2022, token-window
    form): the fraction of sampled ``width``-token shingles of the
    normalized text whose hash also occurs in at least one OTHER
    document. Complements the WITHIN-document Gopher rules
    (:func:`duplicate_line_fraction` / :func:`duplicate_ngram_fraction`):
    this one needs corpus-wide state.

    Token shingles (the paper itself dedups token spans) are inherently
    alignment-free — a shared passage yields the same shingles wherever
    it sits. Sampling is additionally CONTENT-DEFINED: only shingles
    whose md5 starts with ``sample_hex_digits`` zeros survive (1/16 per
    digit), so the sampled subset of a shared passage is identical in
    every document containing it. ``sample_hex_digits=0`` keeps all.
    Texts shorter than ``width`` tokens contribute one whole-text
    shingle; documents with no surviving sampled shingle yield no row
    (the x30 no-bigram convention). Output: (id_col, n_windows, n_dup,
    dup_frac 6dp) over SAMPLED shingles.

    Scale/perf shape (round-7 measured): EXPLODE POSITIONS, then build
    each shingle with plain ``slice``/``concat_ws`` — explode + project
    fuse inside one whole-stage-codegen span, so the token array is read
    in place (never copied per output row) and no interpreted lambda
    runs anywhere. The previous zip_with-fold built the shingle array
    in-array through width-1 interpreted HOF passes — measured 2.5 s vs
    0.54 s warm for this stage at sf0.1 (~5x), identical output hashes.
    A short text (fewer than ``width`` tokens) takes position 1 whose
    ``slice`` returns the whole array — the whole-text shingle falls out
    of the same expression. One distinct + count pass builds the
    (hash -> n_docs) table, a hash join brings it back. md5/split replay
    exactly in DuckDB.
    """
    # NULL-text docs yield no row (pre-rewrite semantics: their hash was
    # md5(NULL) = NULL, which every downstream join rejected; the shared
    # shingle helper would instead fold them to one md5('') and make
    # NULL-text docs mutual duplicates)
    windows = exploded_word_shingles(
        df.where(F.col(text_col).isNotNull()), id_col, text_col, width
    ).select(F.col(id_col), F.md5(F.col("__g__")).alias("__h__"))
    if sample_hex_digits:
        windows = windows.where(
            F.col("__h__").startswith("0" * sample_hex_digits)
        )
    owners = (
        windows.select(id_col, "__h__")
        .distinct()
        .groupBy("__h__")
        .agg(F.count("*").alias("__nd__"))
    )
    return (
        windows.join(owners, "__h__")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum((F.col("__nd__") >= 2).cast("long")).alias("n_dup"),
        )
        .select(
            id_col,
            "n_windows",
            "n_dup",
            F.round(F.col("n_dup") / F.col("n_windows"), 6).alias("dup_frac"),
        )
    )


def hashed_quality_score(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 3,
    seed: str = "qw",
    multiplier: int = 2654435761,
    pass_threshold: float = 0.0,
    extra_cols: "Sequence[str]" = (),
) -> "DataFrame":
    """fastText/CCNet-style LINEAR quality classifier over hashed unigram
    features with a deterministic weight table.

    Production quality filters (CCNet's fastText model, the DCLM/Gopher
    classifier stages) score a document as ``mean_i w[h(tok_i) % V]`` and
    threshold the result; at 100 TB the cost is the per-token feature
    hashing, not the model. This operator implements that exact dataflow
    with a closed-form weight function

        ``w(b) = (b * multiplier) % (V + 1) - V // 2``    (integers)

    over ``V = 16**hex_chars`` buckets (bucket = first ``hex_chars`` hex
    digits of ``md5(seed|token)`` — exactly uniform because V divides the
    hex range), so the whole pipeline is oracle-checkable end to end.
    Swapping in TRAINED weights is a one-expression change: replace the
    closed form with a broadcast ``map_from_arrays`` lookup of the V-entry
    weight vector — the hashing, folding, and normalization stay as-is.

    Scale shape: map-only — no explode, no shuffle, one output row per
    input row. Tokens fold through a single ``aggregate`` HOF into a LONG
    sum, which is order-independent and exact, so ``quality_score`` (one
    final double division) is bit-identical across engines. The HOF lambda
    evaluates interpreted (md5+conv per token); for the trained-weights
    variant at full scale, pre-tokenized inputs amortize this.

    Output columns: ``n_tokens`` (LONG), ``score_sum`` (LONG, exact),
    ``quality_score`` (DOUBLE in ~[-1, 1], NULL for empty text),
    ``quality_pass`` (BOOLEAN, ``quality_score > pass_threshold``; the
    bit-exact score makes the literal comparison engine-stable).

    ``extra_cols`` names input columns carried through unchanged (so a
    composition like :func:`curation.curate_corpus` scores documents
    inline — still map-only — instead of joining the scores back on id).

    Reference analogue: none (beyond-reference LLM-pipeline operator).
    """
    n_buckets = 16**hex_chars
    half = n_buckets // 2
    toks = whitespace_tokens(F.col(text_col))

    def _weight(tok: Column) -> Column:
        bucket = F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + "|"), tok)), 1, hex_chars),
            16,
            10,
        ).cast("long")
        return (bucket * F.lit(multiplier)) % F.lit(n_buckets + 1) - F.lit(half)

    keep = list(extra_cols)
    return (
        df.select(id_col, *keep, toks.alias("__toks__"))
        .select(
            id_col,
            *keep,
            F.size("__toks__").cast("long").alias("n_tokens"),
            F.aggregate(
                "__toks__", F.lit(0).cast("long"), lambda acc, t: acc + _weight(t)
            ).alias("score_sum"),
        )
        .select(
            id_col,
            *keep,
            "n_tokens",
            "score_sum",
            F.when(
                F.col("n_tokens") > 0,
                F.col("score_sum") / (F.col("n_tokens") * F.lit(float(half))),
            ).alias("quality_score"),
            (
                (F.col("n_tokens") > 0)
                & (
                    F.col("score_sum")
                    / (F.col("n_tokens") * F.lit(float(half)))
                    > F.lit(pass_threshold)
                )
            ).alias("quality_pass"),
        )
    )


def hashed_quality_score_weighted(
    df,
    weights: "Sequence[float]",
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 3,
    seed: str = "qw",
    pass_threshold: float = 0.0,
) -> "DataFrame":
    """:func:`hashed_quality_score` with a TRAINED weight table — the
    production form of the classifier (a fastText/CCNet model exported as
    its V-entry weight vector after feature hashing).

    The dataflow is identical; only the per-token weight expression
    changes: the closed form becomes an ``element_at`` into a single
    ARRAY LITERAL of the ``16**hex_chars`` weights (emitted as one
    ``F.expr`` string — one JVM call, one Literal node in the plan,
    shipped once per task with the serialized plan, not per row). Still
    map-only, no explode, no shuffle, no UDF. For vectors too large to
    inline in a plan (100k+ buckets) the same shape works as a broadcast
    join on the bucket id — at V = 4096 the literal is the faster and
    simpler form.

    The fold sums DOUBLEs in token order (deterministic, but not the
    integer-exact cross-engine guarantee of the closed-form variant —
    trained weights are floats, so last-ulp neutrality is not on offer;
    that is why the ORACLE gate pins the closed form and this variant is
    pytest-pinned against it).

    Output: ``n_tokens`` (LONG), ``quality_score`` (DOUBLE mean weight,
    NULL for empty text), ``quality_pass`` (BOOLEAN).
    """
    n_buckets = 16**hex_chars
    if len(weights) != n_buckets:
        raise ValueError(
            f"weights must have exactly {n_buckets} entries "
            f"(16**{hex_chars}); got {len(weights)}"
        )
    bad = [w for w in weights if not math.isfinite(float(w))]
    if bad:
        # repr(inf) renders as 'infD', which dies much later inside the
        # SQL parser with an error nowhere near the bad input — validate
        # here instead (a trained weight vector must be finite anyway)
        raise ValueError(
            f"weights must be finite; got {len(bad)} non-finite "
            f"value(s), first: {bad[0]!r}"
        )
    table = F.expr(
        "array(" + ",".join(repr(float(w)) + "D" for w in weights) + ")"
    )
    toks = whitespace_tokens(F.col(text_col))

    def _weight(tok: Column) -> Column:
        bucket = F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + "|"), tok)), 1, hex_chars),
            16,
            10,
        ).cast("long")
        return F.element_at(F.col("__w__"), (bucket + 1).cast("int"))

    return (
        df.select(id_col, toks.alias("__toks__"), table.alias("__w__"))
        .select(
            id_col,
            F.size("__toks__").cast("long").alias("n_tokens"),
            F.aggregate(
                "__toks__",
                F.lit(0.0),
                lambda acc, t: acc + _weight(t),
            ).alias("__sum__"),
        )
        .select(
            id_col,
            "n_tokens",
            F.when(
                F.col("n_tokens") > 0, F.col("__sum__") / F.col("n_tokens")
            ).alias("quality_score"),
            (
                (F.col("n_tokens") > 0)
                & (F.col("__sum__") / F.col("n_tokens") > F.lit(pass_threshold))
            ).alias("quality_pass"),
        )
    )


def remove_boilerplate_lines(
    df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> "DataFrame":
    """Cross-corpus line-level boilerplate removal — the CCNet/RefinedWeb
    line-dedup pass (Wenzek et al. 2020 §3.1 deduplicate lines across
    shards): a line whose normalized form (:func:`normalize_text`)
    appears in at least ``min_docs`` DISTINCT documents is boilerplate
    (navigation chrome, cookie banners, shared headers/footers) and is
    stripped from EVERY document. Returns one row per input document:
    ``(id_col, text_col cleaned, n_lines, n_removed)``.

    Semantics:

    * blank / whitespace-only lines are preserved verbatim and never
      counted — they occur in every corpus and are formatting, not
      boilerplate;
    * repetition WITHIN one document never marks a line (that is the
      Gopher within-doc rule, :func:`repetition_filter`) — the count is
      distinct documents;
    * NULL text passes through as NULL with ``n_lines = n_removed = 0``;
    * a document whose every countable line is boilerplate comes back as
      the surviving blank lines, or ``''`` (empty string, never NULL —
      the document still exists) when nothing survives;
    * NULL-``id_col`` rows group into a single NULL-id output row (the
      grain is the id — a NULL id cannot anchor per-document identity;
      callers with meaningful NULL-id rows should key them first).

    Scale shape: the line explode is map-only; the document frequency
    runs as two partial-aggregable stages — distinct ``(line, id)``
    pairs, then a plain count per line — instead of ``countDistinct``'s
    expand; the boilerplate set marks lines through a LEFT join flag (AQE
    broadcasts it when small; boilerplate cardinality is bounded by
    distinct-line count, not corpus rows); reassembly, the per-doc line
    count AND the removed count all come from ONE ``groupBy(id)`` over
    the flagged line stream (``posexplode_outer`` keeps NULL-text docs as
    a single NULL-position row, so no join back to the input is ever
    needed — r14: the old anti-join + rebuild-join shape re-scanned the
    corpus a third time and shuffled a doc-grain join for columns the
    line stream already carries). Per-group state is bounded by a single
    document's own line count. No UDFs, no windows, no driver collection.

    Reference analogue: none (beyond-reference LLM-pipeline operator).
    """
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    base = df.select(id_col, text_col)
    lines = base.select(
        id_col,
        F.posexplode_outer(F.split(F.col(text_col), "\n")).alias(
            "__pos__", "__line__"
        ),
    ).withColumn("__norm__", normalize_text("__line__"))
    freq = (
        lines.filter(F.col("__norm__") != "")
        .select("__norm__", id_col)
        .distinct()
        .groupBy("__norm__")
        .agg(F.count("*").alias("__nd__"))
    )
    boiler = (
        freq.filter(F.col("__nd__") >= min_docs)
        .select("__norm__")
        .withColumn("__boiler__", F.lit(True))
    )
    # LEFT join, not LEFT ANTI: boilerplate rows stay in the stream with a
    # flag so the SAME aggregation that rebuilds the text also counts
    # total and removed lines — blank lines ('' normal form) never enter
    # `boiler`, so they keep a NULL flag and survive verbatim, and a NULL
    # norm (NULL text's outer-explode row) never equi-matches
    flagged = lines.join(boiler, "__norm__", "left")
    # order-preserving reassembly: a struct array sorts by its first field,
    # so sorting (pos, line) structs restores document order without a
    # window; collect_list skips the NULLs the `when` leaves for
    # boilerplate rows and the NULL-text sentinel row
    keep_struct = F.when(
        F.col("__boiler__").isNull() & F.col("__pos__").isNotNull(),
        F.struct("__pos__", "__line__"),
    )
    rebuilt = flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(keep_struct)),
                lambda s: s["__line__"],
            ),
            "\n",
        ).alias("__clean__"),
        # count(__pos__) skips the NULL-position sentinel: NULL text
        # reports 0 lines exactly as the old size(split(...)) guard did
        F.count("__pos__").cast("int").alias("n_lines"),
        F.coalesce(
            F.sum(F.when(F.col("__boiler__"), 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_removed"),
    )
    return rebuilt.select(
        id_col,
        F.when(F.col("n_lines") == 0, F.lit(None).cast("string"))
        .otherwise(F.col("__clean__"))
        .alias(text_col),
        "n_lines",
        "n_removed",
    )
