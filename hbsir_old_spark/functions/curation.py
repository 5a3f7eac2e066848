"""End-to-end corpus-curation composition: one declarative plan chaining
the standard training-data filter stages (CCNet / Gopher / RefinedWeb
order) over a document corpus.

Stages, in verdict-precedence order:

1. **Language** — n-gram marker ``lang_id`` must equal the target.
2. **Quality** — the hashed-feature linear classifier
   (:func:`text.hashed_quality_score`) must clear the threshold.
3. **Exact dedup** — only the canonical copy (minimum id per normalized-
   text fingerprint) survives.
4. **Benchmark contamination** — documents sharing any word ``n``-gram
   with a held-out benchmark set are dropped.

The operator is DIAGNOSTIC: every document gets a row with every stage
flag plus a single ``verdict`` (the first failing stage, else ``keep``),
so one pass yields both the curated corpus (``verdict = 'keep'``) and the
funnel accounting a 100-TB curation run reports. A production variant
that only needs survivors would filter between stages to shrink the
later (shuffling) stages' inputs — the flags are computed independently,
so the composition supports either shape.

Scale shape (the whole point of composing rather than running four
passes): language + quality are MAP-ONLY expressions evaluated inline on
the scan (no join-back — ``hashed_quality_score(extra_cols=...)``
threads the language flag and fingerprint through its selects); exact
dedup is one partial-aggregable groupBy on the fingerprint plus a
fingerprint-keyed join back (skew-safe where a window would straggle on
a mega-duplicate class); contamination is one
shingle explode + broadcast-able semi-join against the (small) benchmark
shingle set + one id-keyed left join back. Three shuffles total for four
stages, each on a different key, none avoidable at this grain.

Reference analogue: none (beyond-reference LLM-pipeline operator).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbsir_old_spark.functions.dedup import (
    connected_components,
    exploded_word_shingles,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from hbsir_old_spark.functions.text import (
    doc_fingerprint,
    hashed_quality_score,
    lang_id,
)

__all__ = ["curate_corpus", "curate_corpus_fuzzy"]


def curate_corpus(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_lang: str = "en",
    quality_threshold: float = 0.0,
    shingle_n: int = 5,
) -> DataFrame:
    """Run the four-stage curation funnel; returns one row per input
    document: ``(id, lang_ok, quality_pass, is_canonical, contaminated,
    verdict)`` with ``verdict`` the first failing stage name
    (``'lang' | 'quality' | 'duplicate' | 'contaminated'``) or ``'keep'``.

    ``benchmark`` is the held-out eval set (any frame with ``text_col``);
    its distinct word ``shingle_n``-grams form the contamination probe.

    NULL-id rows are dropped up front (same contract as
    :func:`dedup.exact_dedup`): a NULL id can neither anchor the
    canonical-copy aggregate nor match the id-keyed contamination join-back,
    so keeping them would silently verdict them ``'keep'``.
    """
    base = df.select(id_col, text_col).filter(F.col(id_col).isNotNull())

    # stages 1+2 inline on the scan: language flag and fingerprint ride
    # through the quality classifier's map-only selects
    flagged = hashed_quality_score(
        base.select(
            id_col,
            text_col,
            (lang_id(text_col) == F.lit(target_lang)).alias("lang_ok"),
            doc_fingerprint(text_col).alias("__fp__"),
        ),
        id_col=id_col,
        text_col=text_col,
        pass_threshold=quality_threshold,
        extra_cols=("lang_ok", "__fp__"),
    )

    # Materialize the flagged frame ONCE (r14, guide §2.4): it is consumed
    # by BOTH the canonical-copy aggregate and the join-back below, and
    # Spark shares no subtrees across consumers — without this the corpus
    # scan plus the funnel's most expensive map stage (the per-token md5
    # feature hashing of the quality classifier, plus lang-id and the
    # fingerprint) execute twice per run. The frame is NARROW — id, three
    # flags, the fingerprint and two counters; the text column was dropped
    # by the classifier's select — so the materialization is a sliver of
    # the corpus it summarizes at any scale. localCheckpoint trades
    # executor-loss recovery for lineage truncation (same contract as the
    # dedup/CC internals; prefer a reliable checkpoint dir on clusters
    # with expected churn).
    flagged = flagged.localCheckpoint(eager=True)

    # stage 3: canonical copy = min id per fingerprint. groupBy + join
    # back, NOT min().over(Window.partitionBy) — same rationale as
    # exact_dedup (dedup.py): partial aggregation pre-collapses duplicate
    # fingerprints map-side, so a boilerplate page with 10^8 exact copies
    # ships ~one row per map partition into the Exchange, and AQE's
    # skew-join splitting handles any residual hot key; WindowExec would
    # instead sort the entire mega-duplicate class inside one partition
    # (the canonical straggler in exactly the regime curation exists
    # for). The diagnostic needs per-row flags, so the collapsed frame
    # joins back on the fingerprint (the small side post-agg).
    # null-safe key: NULL-text docs fingerprint to NULL and form one
    # duplicate class of their own (groupBy groups NULLs; the window did
    # too) — a plain equi-join would silently drop them. <=> is still a
    # hash-join key for Spark, so the shape is unchanged.
    canon = flagged.groupBy(F.col("__fp__").alias("__cfp__")).agg(
        F.min(id_col).alias("__canon_id__")
    )
    flagged = (
        flagged.join(canon, F.col("__fp__").eqNullSafe(F.col("__cfp__")))
        .withColumn("is_canonical", F.col(id_col) == F.col("__canon_id__"))
        .drop("__cfp__")
    )

    # stage 4: benchmark shingle probe (distinct grams of the small eval
    # set; the semi-join broadcasts it at sane benchmark sizes), then one
    # id-keyed join-back of the contaminated-id set. Grams come from the
    # codegen'd exploded form — per-doc distinctness is irrelevant under
    # the semi-join + final distinct, and the array form's interpreted
    # transform was 9.8 s of x34's 10 s at sf0.1
    # synthetic id: the benchmark frame only promises text_col (it need
    # not carry the corpus's id column), and the grams drop the id anyway.
    # The '' gram is excluded: exploded_word_shingles emits one '' for
    # NULL/empty/whitespace-only text as its no-content sentinel, and a
    # blank benchmark line must not mark every empty corpus doc as
    # sharing benchmark content (filtering the small side suffices — a
    # corpus-side '' can then never match).
    bench_grams = (
        exploded_word_shingles(
            benchmark.select(F.lit(0).alias("__bid__"), F.col(text_col)),
            "__bid__",
            text_col,
            shingle_n,
        )
        .select("__g__")
        .where(F.col("__g__") != "")
        .distinct()
    )
    contaminated_ids = (
        exploded_word_shingles(base, id_col, text_col, shingle_n)
        .join(bench_grams, "__g__", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )

    out = (
        flagged.join(contaminated_ids, id_col, "left")
        .withColumn("contaminated", F.coalesce(F.col("contaminated"), F.lit(False)))
        .withColumn(
            "verdict",
            F.when(~F.col("lang_ok"), F.lit("lang"))
            .when(~F.col("quality_pass"), F.lit("quality"))
            .when(~F.col("is_canonical"), F.lit("duplicate"))
            .when(F.col("contaminated"), F.lit("contaminated"))
            .otherwise(F.lit("keep")),
        )
    )
    return out.select(
        id_col, "lang_ok", "quality_pass", "is_canonical", "contaminated", "verdict"
    )


def curate_corpus_fuzzy(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_lang: str = "en",
    quality_threshold: float = 0.0,
    shingle_n: int = 5,
    near_n: int = 3,
    near_threshold: float = 0.5,
    pair_mode: str = "lsh",
    num_perm: int = 16,
    bands: int | None = None,
) -> DataFrame:
    """The :func:`curate_corpus` funnel plus the production NEAR-duplicate
    stage — the full CCNet / RefinedWeb curation shape:

    1. language, 2. quality, 3. exact dedup, **4. near dedup**,
    5. benchmark contamination.

    Stage 4 composes the repo's four already-independently-verified
    near-dup building blocks end-to-end:

    * **candidates** — ``pair_mode='lsh'`` (the 100-TB scale path) runs
      :func:`dedup.minhash_lsh_pairs`: banded MinHash signatures, a
      candidate self-join that carries only ``(id, band-hash)``, and an
      exact-Jaccard verify over the candidate sliver alone;
      ``pair_mode='exact'`` runs :func:`dedup.ngram_jaccard_pairs`
      (all pairs sharing >= 1 shingle — deterministic, so the composed
      funnel admits a full SQL oracle; the exact twin of the LSH path).
    * **components** — verified pairs are transitively closed with
      :func:`dedup.connected_components` (O(log n)-round pointer-jumping
      min-label propagation; a chain of n near-dups converges in
      ~log2(n) rounds, not n).
    * **canonical** — the minimum-id member of each component is the
      representative; every other member verdicts ``'near_duplicate'``.

    The near-dup universe is the SURVIVORS of stages 1-3 (``lang_ok AND
    quality_pass AND is_canonical``): running the pair stage after the
    cheap map-only filters and the exact collapse is the production
    ordering — at 100 TB the exact stage alone typically removes the
    bulk duplication (mirrors, boilerplate), so the quadratic-risk stage
    sees only the filtered sliver, reached here by one semi-join against
    the survivor id set. Docs outside the universe are vacuously
    ``is_near_canonical = true`` (their verdict is already an earlier
    stage's). Only ids and band hashes shuffle in the candidate stage;
    the corpus text moves once more (the semi-joined survivor scan).

    Output: one diagnostic row per input document —
    ``(id, lang_ok, quality_pass, is_canonical, is_near_canonical,
    contaminated, verdict)`` with ``verdict`` the first failing stage
    (``'lang' | 'quality' | 'duplicate' | 'near_duplicate' |
    'contaminated'``) or ``'keep'``.

    NOTE: like every pair-based dedup here, the component stage
    materializes eagerly (``localCheckpoint`` inside
    :func:`dedup.connected_components`), so building this plan runs the
    candidate pipeline. Reference analogue: none (beyond-reference
    LLM-pipeline operator).
    """
    # fail fast BEFORE any Spark work: the eager checkpoint below runs the
    # whole four-stage funnel as a real job, which a typo'd mode must not
    if pair_mode not in ("lsh", "exact"):
        raise ValueError(f"pair_mode must be 'lsh' or 'exact', got {pair_mode!r}")
    flags = curate_corpus(
        df,
        benchmark,
        id_col=id_col,
        text_col=text_col,
        target_lang=target_lang,
        quality_threshold=quality_threshold,
        shingle_n=shingle_n,
    )
    # Materialize the stage-1..3+5 diagnostic frame ONCE: it anchors the
    # survivor universe, the pair stage's semi-join, AND the final output
    # join — without this the whole four-stage funnel plan re-executes
    # three times (measured ~2x wall on the sf0.1 gate). The frame is
    # narrow (id + five booleans), so even at corpus scale the
    # materialization is a sliver of the text it summarizes;
    # localCheckpoint trades executor-loss recovery for lineage
    # truncation, same contract as the dedup/CC internals — use a
    # reliable checkpoint dir on clusters with expected churn.
    flags = flags.localCheckpoint(eager=True)
    survivors = flags.filter(
        F.col("lang_ok") & F.col("quality_pass") & F.col("is_canonical")
    ).select(id_col)
    universe = df.select(id_col, text_col).join(survivors, id_col, "left_semi")
    if pair_mode == "exact":
        pairs = ngram_jaccard_pairs(
            universe, id_col=id_col, text_col=text_col, n=near_n,
            threshold=near_threshold,
        )
    else:
        pairs = minhash_lsh_pairs(
            universe, id_col=id_col, text_col=text_col, n=near_n,
            num_perm=num_perm, bands=bands, threshold=near_threshold,
        )
    comps = connected_components(pairs)
    non_reps = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("__nr_id__")
    )
    out = (
        flags.join(non_reps, flags[id_col] == F.col("__nr_id__"), "left")
        .withColumn("is_near_canonical", F.col("__nr_id__").isNull())
        .drop("__nr_id__")
        .withColumn(
            "verdict",
            F.when(~F.col("lang_ok"), F.lit("lang"))
            .when(~F.col("quality_pass"), F.lit("quality"))
            .when(~F.col("is_canonical"), F.lit("duplicate"))
            .when(~F.col("is_near_canonical"), F.lit("near_duplicate"))
            .when(F.col("contaminated"), F.lit("contaminated"))
            .otherwise(F.lit("keep")),
        )
    )
    return out.select(
        id_col,
        "lang_ok",
        "quality_pass",
        "is_canonical",
        "is_near_canonical",
        "contaminated",
        "verdict",
    )
