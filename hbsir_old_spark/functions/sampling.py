"""Deterministic corpus sampling for training-data pipelines.

* **hash_split** — stable train/test assignment by key hash. The split
  must be a pure function of the key (re-runs, late-arriving shards, and
  incremental appends all land the same row on the same side — Spark's
  ``randomSplit`` is seed+partition dependent and reshuffles membership
  when the input repartitions). Implemented as a comparison on the first
  hex digits of ``md5(salt|key)``: fixed-length lowercase hex compares
  lexicographically == numerically, so the same predicate runs unchanged
  in any engine (the DuckDB oracle uses the identical expression). Pure
  map-side: no shuffle, no RNG state, whole-stage codegen.
* **group_quota** — cap rows per group (per-language / per-domain document
  quotas) with a deterministic keep order. Two-level salted selection
  (:func:`salted_limit_per_group`): quota kept per (group, hash-bucket)
  sub-partition first, then re-ranked over the bounded survivors — no
  whole-domain single partition, identical output. At 100 TB this is the
  standard "balance the mixture" primitive.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hbsir_old_spark.functions.text import whitespace_tokens


def salted_limit_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    limit: int | Column,
    bucket_col: str,
    n_buckets: int = 32,
    rank_col: str | None = None,
) -> DataFrame:
    """THE two-level salted top-``limit`` selection — the scale-safe
    replacement for one ``Window.partitionBy(group)``, which funnels a
    whole group into a single partition (per-query ANN candidates,
    per-domain quotas: groups are few and huge in exactly the regimes
    these operators serve). Every top-per-group call site
    (:func:`group_quota`, :func:`temperature_sample`,
    :func:`similarity.ranked_topk_per_query`) derives from this one
    definition so the invariant below is maintained in one place.

    Stage 1 ranks within ``(group, xxhash64(bucket_col) % n_buckets)``
    sub-partitions and keeps ``limit`` per sub-partition; stage 2
    re-ranks the <= ``n_buckets * limit`` survivors per group. The
    result — ranks and tie order included — is IDENTICAL to the single
    window: under a total order (``order_by`` must be tie-free, e.g.
    end with a unique column) the per-group top-``limit`` is a subset of
    the union of its sub-partition top-``limit``s. ``limit`` may be a
    per-row Column (per-group quotas joined on beforehand).
    ``rank_col`` keeps the final 1..limit rank under that name;
    otherwise the helper columns are dropped.
    """
    salt = F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets))
    w1 = Window.partitionBy(*group_cols, "__salt__").orderBy(*order_by)
    w2 = Window.partitionBy(*group_cols).orderBy(*order_by)
    out_rank = rank_col or "__rn2__"
    out = (
        df.withColumn("__salt__", salt)
        .withColumn("__rn1__", F.row_number().over(w1))
        .filter(F.col("__rn1__") <= limit)
        .withColumn(out_rank, F.row_number().over(w2))
        .filter(F.col(out_rank) <= limit)
        .drop("__salt__", "__rn1__")
    )
    return out if rank_col else out.drop("__rn2__")

#: md5 prefix length used for bucketing: 4 hex digits = 65536 buckets,
#: giving split-fraction granularity of ~0.0015%
_HEX_DIGITS = 4
_BUCKETS = 16 ** _HEX_DIGITS


def split_threshold_hex(test_frac: float) -> str:
    """The fixed-length lowercase hex threshold ``t``: a key lands in the
    test split iff its bucket hex < ``t``. Exposed so oracle SQL can embed
    the same literal."""
    if not 0.0 <= test_frac <= 1.0:
        raise ValueError(f"test_frac must be in [0, 1], got {test_frac}")
    return format(int(test_frac * _BUCKETS), f"0{_HEX_DIGITS}x")


def hash_hex(key: Column | str, salt: str) -> Column:
    """Full lowercase md5(salt|key) hex string — THE portable hash
    convention of this module (identical expression in DuckDB oracles);
    every salted-hash consumer derives from this one helper so the
    delimiter/casing cannot drift between engine and oracle."""
    key = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat_ws("|", F.lit(salt), key.cast("string")))


def hash_bucket(
    key: Column | str, salt: str = "split", digits: int = _HEX_DIGITS
) -> Column:
    """First ``digits`` lowercase hex chars of md5(salt|key)."""
    return F.substring(hash_hex(key, salt), 1, digits)


def hash_split(
    df: DataFrame,
    key_col: str,
    test_frac: float = 0.1,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Tag every row 'test' or 'train' as a pure function of its key."""
    threshold = split_threshold_hex(test_frac)
    return df.withColumn(
        out_col,
        F.when(hash_bucket(key_col, salt) < F.lit(threshold), "test").otherwise(
            "train"
        ),
    )


def group_quota(
    df: DataFrame,
    group_col: str,
    quota: int,
    order_col: str,
    ascending: bool = True,
) -> DataFrame:
    """Keep at most ``quota`` rows per group, by deterministic order
    (e.g. best-quality-first with ``order_col='quality', ascending=False``,
    tiebreaking naturally on the unique order column).

    Scale shape: :func:`salted_limit_per_group` (two-level salted
    selection — no whole-domain single partition; identical output since
    ``order_col`` is unique by contract). The stage-2 partition is
    bounded by 32*quota, not group size."""
    if quota < 0:
        raise ValueError(f"quota must be >= 0, got {quota}")
    order = F.col(order_col) if ascending else F.col(order_col).desc()
    return salted_limit_per_group(
        df, [group_col], [order], quota, bucket_col=order_col
    )


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    budget: int,
    token_col: str,
    order_col: str,
    ascending: bool = True,
) -> DataFrame:
    """Per-group TOKEN-budget sampling — the corpus-mixing primitive: keep
    documents in deterministic order until the group's cumulative token
    count reaches ``budget``. A document is kept when the tokens BEFORE it
    are under budget, so the first crossing document is included and every
    group with any data yields at least one document (budget > 0).

    One Exchange + in-partition sort per group — a prefix scan is
    inherently sequential per group (each document's keep decision
    depends on the cumulative sum before it), so the salted two-level
    trick :func:`group_quota` uses does not apply; shard upstream (e.g.
    :func:`pack_sequences`-style hash buckets as independent budget
    streams) when a single group outgrows a partition. Bounds token
    mass where ``group_quota`` bounds document COUNT — what an LLM data
    mixture actually budgets. Pass a unique ``order_col`` (id or stable
    hash) for run-independent results.
    """
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    order = F.col(order_col) if ascending else F.col(order_col).desc()
    w = (
        Window.partitionBy(group_col)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NULL token counts are treated as 0: the document is kept (it cannot
    # overshoot the budget) and consumes nothing; callers who would rather
    # drop unmeasured documents should filter them first
    tokens = F.coalesce(F.col(token_col), F.lit(0))
    cum = F.sum(tokens).over(w)
    before = cum - tokens
    return (
        df.withColumn("__before__", before)
        .filter(F.col("__before__") < budget)
        .drop("__before__")
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    alpha: float,
    target_rows: int,
    order_col: str,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based mixture resampling: per-group quotas proportional
    to ``n_group ** alpha`` normalized to ``target_rows`` total (alpha=1
    keeps natural proportions, alpha=0 uniform across groups, 0<alpha<1
    the usual multilingual/domain rebalancing), with a deterministic
    hash-ordered keep (md5(salt|key), key tiebreak) so re-runs and
    incremental appends keep the same rows.

    Every group keeps at least 1 row (the quota floors at 1, so the actual
    total can exceed ``target_rows`` by up to the group count; it can fall
    short of it by up to one row per group from the floor). A NULL group
    is a group like any other (null-safe join), so unlabeled rows are
    budgeted, not silently dropped.

    Scale shape: one partial-aggregable count pass, a one-row total
    broadcast, then the :func:`group_quota` two-level salted selection
    (stage 1 keeps the quota per ``(group, hash(key) % 32)``
    sub-partition, stage 2 re-ranks the bounded survivors — identical
    result, no whole-domain single partition). The quota floor adds a
    1e-9 epsilon before flooring in BOTH engines:
    mathematically-integer quotas (exact proportional splits) would
    otherwise flip by one on the last ulp of the order-dependent weight
    sum.
    """
    if target_rows <= 0:
        raise ValueError(f"target_rows must be > 0, got {target_rows}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n__"))
    weighted = counts.withColumn(
        "__w__", F.pow(F.col("__n__").cast("double"), F.lit(float(alpha)))
    )
    total = weighted.agg(F.sum("__w__").alias("__tw__"))
    quotas = weighted.crossJoin(F.broadcast(total)).select(
        F.col(group_col).alias("__qg__"),
        F.greatest(
            F.lit(1).cast("long"),
            F.floor(
                F.lit(int(target_rows)) * F.col("__w__") / F.col("__tw__")
                + F.lit(1e-9)
            ).cast("long"),
        ).alias("__q__"),
    )
    joined = df.join(
        F.broadcast(quotas), F.col(group_col).eqNullSafe(F.col("__qg__"))
    )
    return salted_limit_per_group(
        joined,
        [group_col],
        [hash_hex(order_col, salt), F.col(order_col)],
        F.col("__q__"),
        bucket_col=order_col,
    ).drop("__q__", "__qg__")


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_col: str,
    order_col: str,
    salt: str = "pack",
    bucket_hex_digits: int = 2,
) -> DataFrame:
    """GPT-style sequence packing assignment: documents are concatenated in
    deterministic order and cut every ``seq_len`` tokens (documents span
    chunk boundaries — the standard pretraining packing); each document
    gets the chunk its FIRST token falls in plus its offset within it.

    Scale shape: packing is scoped to md5 hash buckets of ``order_col``
    (16^``bucket_hex_digits`` buckets, the :func:`hash_split` convention),
    so the cumulative-sum window partitions by bucket — one hash Exchange,
    no global sort, no single-partition window. Buckets are independent
    pack streams, exactly how a sharded tokenizer run behaves. Adds
    ``pack_bucket`` (hex string), ``pack_chunk`` (0-based chunk index) and
    ``pack_offset`` (token offset of the document inside its chunk).

    Deterministic and engine-portable: the same md5-prefix bucketing and
    running-sum arithmetic run unchanged in DuckDB for the oracle.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be > 0, got {seq_len}")
    out = df.withColumn(
        "pack_bucket", hash_bucket(order_col, salt, bucket_hex_digits)
    )
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tokens = F.coalesce(F.col(token_col), F.lit(0)).cast("long")
    # pure LONG arithmetic for the chunk index (`div`, not `/`): float
    # division would round the cumulative sum past 2^53 tokens and could
    # disagree with the oracle's exact integer division
    return (
        out.withColumn("__before__", F.sum(tokens).over(w) - tokens)
        .withColumn("pack_chunk", F.expr(f"__before__ div {int(seq_len)}"))
        .withColumn(
            "pack_offset", (F.col("__before__") % F.lit(seq_len)).cast("long")
        )
        .drop("__before__")
    )


def dsir_importance_select(
    df: DataFrame,
    target_col: str,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir",
    digits: int = 2,
    score_col: str = "dsir_score",
    take_ordered_limit: int = 100_000,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023),
    deterministic variant: score every document by the log importance
    weight ``log P_target(doc) - log P_source(doc)`` under add-one-smoothed
    multinomials over HASHED word features, then keep the top-``n`` scored
    documents. ``target_col`` is a boolean column marking the in-domain
    slice (the "target" distribution); the source distribution is the
    whole pool, target included — the standard DSIR setup.

    Deviation from the paper, by design: the paper resamples with Gumbel
    noise; this variant takes the deterministic top-n (ties broken by
    md5-hash then id), so reruns — and the DuckDB oracle — reproduce
    bit-identically. Zero-token documents have no features, score 0 by
    convention, and rank by the hash tiebreak.

    Scale shape: one explode over tokens, ONE combined count pass
    producing target and source counts per hashed feature (a conditional
    sum beside the plain count — no second scan), a 16^digits-row feature
    table broadcast back onto the token stream, a per-document sum, and an
    EXACT distributed top-n with no single-partition sort anywhere:

    * ``n <= take_ordered_limit`` (default 100k): ``orderBy().limit(n)``
      — Spark plans TakeOrderedAndProject, a per-partition bounded heap
      merged on the driver (n rows cross the wire, nothing shuffles);
    * larger ``n``: range-repartition doc rows on the rank key, sort
      WITHIN partitions (parallel), then per-partition offsets from a
      tiny count pass turn local row numbers into global ranks — the
      classic distributed selection, every stage parallel.

    Both paths produce the identical deterministic top-n (the rank key is
    total: score desc, md5 tiebreak, id). Hashing uses the module's
    md5-prefix convention (:func:`hash_bucket`), so the oracle replays it
    exactly.

    Output: one row per kept document — (id_col, target_col, n_tokens,
    score_col rounded to 4dp) — scores summed over token OCCURRENCES, the
    paper's bag-of-hashed-ngrams product in log space.
    """
    n_buckets = 16 ** digits
    tokens = whitespace_tokens(F.col(text_col))
    words = (
        # no emptiness guard needed: whitespace_tokens gives [] for
        # NULL/blank text and explode of [] emits no rows
        df.select(
            F.col(id_col),
            F.col(target_col).alias("__tgt__"),
            F.explode(tokens).alias("__w__"),
        )
        .select(
            id_col,
            "__tgt__",
            hash_bucket(F.col("__w__"), salt, digits).alias("__f__"),
        )
    )
    feat = words.groupBy("__f__").agg(
        F.coalesce(
            F.sum(F.when(F.col("__tgt__"), F.lit(1)).otherwise(F.lit(0))),
            F.lit(0),
        ).alias("__tc__"),
        F.count("*").alias("__sc__"),
    )
    totals = feat.agg(
        F.sum("__tc__").alias("__tt__"), F.sum("__sc__").alias("__st__")
    )
    lw = (
        F.log((F.col("__tc__") + 1) / (F.col("__tt__") + F.lit(n_buckets)))
        - F.log((F.col("__sc__") + 1) / (F.col("__st__") + F.lit(n_buckets)))
    ).alias("__lw__")
    feat_scored = feat.crossJoin(F.broadcast(totals)).select("__f__", lw)
    doc_scores = (
        words.join(F.broadcast(feat_scored), "__f__")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("__lw__").alias("__score__"),
        )
    )
    # re-attach zero-token docs with score 0 so the operator ranks the
    # whole pool (row-preserving selection semantics)
    base = df.select(id_col, target_col)
    scored = base.join(doc_scores, id_col, "left").select(
        id_col,
        target_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.col("__score__"), F.lit(0.0)).alias("__score__"),
    )
    out_cols = [
        id_col,
        target_col,
        "n_tokens",
        F.round("__score__", 4).alias(score_col),
    ]
    keyed = scored.withColumn("__hx__", hash_hex(F.col(id_col), salt))
    order = [F.col("__score__").desc(), F.col("__hx__"), F.col(id_col)]
    if n <= take_ordered_limit:
        # TakeOrderedAndProject: per-partition bounded heaps, driver merge
        # of n rows — no Exchange, no global sort
        return keyed.orderBy(*order).limit(n).select(*out_cols)
    # distributed selection for huge n: range-partition on the rank key
    # (parallel sort within partitions), then global rank = per-partition
    # offset + local row number. The eager checkpoint pins one
    # materialization so the count pass and the filter pass see the same
    # partitioning (same caveat as the dedup band table: prefer a reliable
    # checkpoint dir over localCheckpoint on real clusters).
    shuffle_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    ranked = (
        keyed.repartitionByRange(shuffle_parts, *order)
        .sortWithinPartitions(*order)
        .withColumn("__mid__", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    # monotonically_increasing_id: upper 31 bits = partition id, lower 33
    # = record number within the (sorted) partition. shiftright keeps the
    # decode in exact long arithmetic (a double division would lose bits
    # past 2^53).
    pid = F.shiftright(F.col("__mid__"), 33)
    lidx = F.col("__mid__") % F.lit(1 << 33)
    counts = (
        ranked.groupBy(pid.alias("__pid__")).count().orderBy("__pid__").collect()
    )
    offsets, running = {}, 0
    for r in counts:
        if r["count"] >= (1 << 33):
            # the 33-bit record number would bleed into the partition id
            # and silently corrupt ranks — fail loudly; raise the
            # partition count to shrink per-partition row counts
            raise ValueError(
                f"dsir range partition holds {r['count']} rows (>= 2^33); "
                "increase spark.sql.shuffle.partitions for this selection"
            )
        offsets[r["__pid__"]] = running
        running += r["count"]
    offset_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()],
            "__pid__ long, __off__ long",
        )
    )
    return (
        ranked.withColumn("__pid__", pid)
        .join(offset_df, "__pid__")
        .where(F.col("__off__") + lidx + 1 <= n)
        .select(*out_cols)
    )


def prune_by_score_quantile(
    df: DataFrame,
    score_col: str,
    q: float = 0.75,
) -> DataFrame:
    """Keep rows whose ``score_col`` is at-or-below the corpus's EXACT
    ``q``-quantile — the standard "perplexity filter" pruning pass
    (CCNet trains an LM, scores every document, keeps the least
    surprising fraction).

    Threshold semantics (deterministic under any partitioning): the
    threshold is the smallest score ``t`` whose cumulative row count
    reaches ``ceil(q * N)``; ALL rows tied at ``t`` are kept, so the
    output is a pure function of the score values — never of row order.
    A consequence for tiny ``q``: the threshold can never fall below the
    minimum score, so every row tied at the minimum survives even when
    ``q * N < 1`` — the keep fraction is a floor of ``q``, not an exact
    hit. ``q = 0.0`` is rejected (under the tie rule it would
    contradict itself: "keep ~nothing" yet retain the whole minimum-
    score class); use a plain ``limit(0)``/``where(lit(False))`` if an
    empty frame is what you want. Rows with a NULL score are dropped
    (they can't be compared to the threshold; the caller decides their
    fate upstream).

    Scale shape — the reason this is NOT ``percent_rank()`` over the
    corpus: an exact global order statistic normally means a global
    sort. Instead the quantile is computed on the **score histogram**:
    one partial-aggregable groupBy(score) shrinks N rows to one row per
    distinct score, the cumulative sum runs on that compact frame (the
    single-partition window is bounded by score CARDINALITY, not corpus
    size — callers must round/bucket unbounded-precision scores first,
    as :func:`text.bigram_lm_scores` already does with round(·, 4)),
    and the one-row threshold broadcasts back for a map-only filter.
    Total cost: one histogram shuffle + one broadcast, zero row sorts.

    Reference analogue: none (beyond-reference LLM-pipeline operator).
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    if "__thr__" in df.columns:
        # public helper: the broadcast threshold joins back as a column
        # literally named __thr__, so a caller frame already carrying one
        # would make the filter ambiguous (wrong rows, or an analysis error)
        raise ValueError(
            "input frame already has a '__thr__' column, which collides "
            "with prune_by_score_quantile's internal threshold column — "
            "rename it first"
        )
    score = F.col(score_col)
    hist = (
        df.where(score.isNotNull())
        .groupBy(score_col)
        .agg(F.count("*").alias("__c__"))
    )
    cum = Window.orderBy(score_col).rowsBetween(Window.unboundedPreceding, 0)
    total = hist.agg(F.sum("__c__").alias("__n__"))
    threshold = (
        hist.withColumn("__cum__", F.sum("__c__").over(cum))
        .crossJoin(F.broadcast(total))
        .where(F.col("__cum__") >= F.ceil(F.lit(q) * F.col("__n__")))
        .agg(F.min(score_col).alias("__thr__"))
    )
    return (
        df.crossJoin(F.broadcast(threshold))
        .where(score <= F.col("__thr__"))
        .drop("__thr__")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    stride: int | None = None,
) -> DataFrame:
    """Context-window chunking — the standard long-document splitter for
    LM training prep: each document's whitespace token stream is cut into
    windows of ``chunk_tokens`` tokens advancing by ``stride`` tokens
    (default ``chunk_tokens``, i.e. disjoint windows; ``stride <
    chunk_tokens`` gives the usual overlapping windows so no context is
    lost at boundaries). The complement of :func:`pack_sequences`: packing
    concatenates SHORT documents up to the context length, chunking splits
    LONG ones down to it.

    Output one row per chunk: ``(id_col, chunk_index, chunk_text,
    n_tokens)``. Chunk count is ``1 + ceil((n - chunk_tokens) / stride)``
    for ``n > chunk_tokens``, 1 for ``0 < n <= chunk_tokens``, and 0 for
    empty documents — every token appears in at least one chunk, and the
    tail chunk may be short (``n_tokens`` reports its true size).
    Zero-token documents (NULL / empty / whitespace-only text)
    yield no rows — there is nothing to train on; preserve them upstream
    if document accounting matters. ``chunk_text`` re-joins tokens with a
    single space (whitespace runs are not round-tripped).

    ``stride`` must satisfy ``0 < stride <= chunk_tokens``: a stride
    larger than the window would silently drop the tokens between windows,
    which is a sampling policy, not chunking.

    Scale shape: pure per-row array expressions (split / sequence /
    slice / array_join) plus one ``posexplode`` — map-only, ZERO
    shuffles; the fan-out is bounded by each document's own token count.
    All index arithmetic is integer (``div``), engine-portable to the
    DuckDB oracle.

    Reference analogue: none (beyond-reference LLM-pipeline operator).
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be > 0, got {chunk_tokens}")
    stride = chunk_tokens if stride is None else stride
    if not 0 < stride <= chunk_tokens:
        raise ValueError(
            f"stride must be in (0, chunk_tokens]; got stride={stride}, "
            f"chunk_tokens={chunk_tokens}"
        )
    toks = whitespace_tokens(F.col(text_col))
    n = F.size(toks)
    # computed over the projected __n__ alias — the raw text column is
    # already gone by the time this resolves
    nn = F.col("__n__")
    n_chunks = (
        F.when(nn <= 0, F.lit(0))
        .when(nn <= chunk_tokens, F.lit(1))
        .otherwise(
            F.lit(1)
            + F.expr(
                f"div({int(stride)} - 1 + __n__ - {int(chunk_tokens)}, {int(stride)})"
            )
        )
    )
    # guard the sequence: Spark infers step -1 when start > stop, so an
    # unguarded sequence(0, -1) would YIELD [0, -1] for empty docs instead
    # of no chunks
    indices = F.when(
        F.col("__nc__") > 0, F.sequence(F.lit(0), F.col("__nc__") - 1)
    ).otherwise(F.array().cast("array<int>"))
    exploded = (
        df.select(id_col, toks.alias("__toks__"), n.alias("__n__"))
        .withColumn("__nc__", n_chunks)
        .select(id_col, "__toks__", F.explode(indices).alias("chunk_index"))
    )
    chunk = F.slice(
        F.col("__toks__"), F.col("chunk_index") * stride + 1, chunk_tokens
    )
    return exploded.select(
        id_col,
        "chunk_index",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    )


def assign_global_order(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    order_col: str = "order_pos",
    prefix_chars: int = 2,
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    contiguous position ``0..n-1`` in the order of ``md5(seed|id)`` (id
    ascending as tiebreak) — the "shuffle the corpus before training"
    step as a reproducible column instead of a nondeterministic
    ``ORDER BY rand()``. Completes the ordering half of the sampling
    family (x16 splits, x17 quotas, x28 packs, x29 rebalances — nothing
    ordered until now).

    Scale shape — global enumeration WITHOUT a global sort or an
    unpartitioned window, and without ``zipWithIndex``/
    ``repartitionByRange`` (whose sampled boundaries differ between the
    count pass and the final pass unless the input is checkpointed):

    1. the first ``prefix_chars`` hex chars of the hash are a DETERMINISTIC
       coarse range partition of the hash order (bucket ``'00'`` sorts
       wholly before ``'01'``, ...);
    2. one partial-aggregable ``groupBy(bucket).count()`` collects at most
       ``16^prefix_chars`` longs of model state (256 at the default) to
       compute each bucket's global offset;
    3. position = bucket offset (broadcast join) + ``row_number`` within
       the bucket — a PARTITIONED window over ~n/buckets rows, skew
       bounded by md5 uniformity. Size ``prefix_chars`` so a bucket fits
       an executor (3 chars = 4096 buckets at 100 TB).

    NULL-id rows are dropped up front (the :func:`dedup.exact_dedup`
    contract: a NULL id hashes to a NULL key and cannot be ordered
    deterministically). Output: the input columns plus ``order_col``
    (long).

    DETERMINISM CONTRACT: like every two-pass count-then-enumerate
    algorithm (and unlike the single-pass-but-sampled
    ``repartitionByRange``), the input must produce the SAME rows on both
    executions — no ``F.rand()`` filters, no source appended mid-job;
    persist/localCheckpoint a nondeterministic input first. Rows in a
    bucket the count pass never saw fail loudly (``raise_error``, not a
    silent inner-join drop); new rows landing in an already-counted
    bucket are detectable only by the caller (positions would collide).
    """
    if prefix_chars < 1 or prefix_chars > 8:
        raise ValueError(f"prefix_chars must be in 1..8, got {prefix_chars}")
    df = df.filter(F.col(id_col).isNotNull())
    hash_expr = F.md5(
        F.concat(F.lit(f"shuffle{int(seed)}|"), F.col(id_col).cast("string"))
    )
    keyed = df.withColumn("__ord__", hash_expr).withColumn(
        "__bkt__", F.substring(F.col("__ord__"), 1, prefix_chars)
    )
    counts = (
        keyed.groupBy("__bkt__").count().collect()
    )  # <= 16^prefix_chars rows of model state, not data
    offsets, running = {}, 0
    for r in sorted(counts, key=lambda r: r["__bkt__"]):
        offsets[r["__bkt__"]] = running
        running += r["count"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(b, o) for b, o in offsets.items()], "__bkt__ string, __off__ long"
    )
    w = Window.partitionBy("__bkt__").orderBy("__ord__", id_col)
    # LEFT join + raise_error: a row whose bucket the count pass never saw
    # means the input violated the determinism contract — fail loudly
    # instead of silently dropping it (an inner join would)
    guarded_off = F.when(
        F.col("__off__").isNull(),
        F.raise_error(
            F.lit(
                "assign_global_order: row appeared in a bucket the count "
                "pass never saw — the input is nondeterministic between "
                "executions (see the determinism contract)"
            )
        ).cast("long"),
    ).otherwise(F.col("__off__"))
    return (
        keyed.join(F.broadcast(off_df), "__bkt__", "left")
        .withColumn(
            order_col,
            (F.row_number().over(w) - 1 + guarded_off).cast("long"),
        )
        .drop("__ord__", "__bkt__", "__off__")
    )
