"""Similarity search over embedding columns (array<float>).

* **cosine_topk** — exact brute-force top-k: broadcast the (small) query
  set against the corpus, dot products via zip_with/aggregate (JVM-side,
  no UDF), rank with the two-level salted top-k
  (:func:`ranked_topk_per_query` — per-(query, hash-bucket) prune, then a
  bounded re-rank; never one whole-corpus partition per query). At 100 TB
  the corpus side stays partitioned; only queries are broadcast.
* **lsh_bucket_topk** — the approximate scale path: sign-random-projection
  (SimHash for vectors) buckets; candidates = corpus rows whose signature
  matches the query's in any band; exact cosine re-rank on candidates.
  Hyperplanes are pseudo-random sign vectors derived from xxhash64(seed, i)
  — deterministic, no stored model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hbsir_old_spark.session import ensure_min_partitions


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector yields NULL similarity instead of an
    # ANSI DIVIDE_BY_ZERO that would fail the whole job; callers rank NULL
    # as "no similarity" (see assign_nearest_centroids' -inf guard)
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Dot product for a STATICALLY-known dimension as a flat codegen'd
    expression (element_at products summed left-associatively — float-
    identical to :func:`dot`'s fold: each product is computed in the array
    element type, then cast to double BEFORE summing, matching the fold's
    double accumulator over element-typed zip_with products). Array
    higher-order lambdas evaluate interpreted per element, which dominates
    pairwise verify stages; the unrolled tree stays inside whole-stage
    codegen (the same trick as quantile._count_lt's unrolled binary
    search)."""
    terms = [
        (F.element_at(a, i + 1) * F.element_at(b, i + 1)).cast("double")
        for i in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def ranked_topk_per_query(
    scored: DataFrame, score_col: str, k: int, n_buckets: int = 32
) -> DataFrame:
    """Two-level salted top-k per query — the scale-safe replacement for a
    single ``Window.partitionBy(__qid__)``: that shape funnels EVERY
    candidate of a query into one partition, which at corpus scale makes
    each query a straggler. The ANN-flavored front end of
    :func:`sampling.salted_limit_per_group` (one shared definition of the
    two-level invariant); ``n_buckets`` is the sub-partition count, NOT a
    hash-seed string like the ``salt`` params elsewhere. Expects
    ``__qid__`` / ``__cid__`` columns; result — ranks and the
    (score desc, candidate id asc) tie order included — is IDENTICAL to
    the single-window formulation; returns rows with ``rank`` 1..k."""
    from hbsir_old_spark.functions.sampling import salted_limit_per_group

    return salted_limit_per_group(
        scored,
        ["__qid__"],
        [F.col(score_col).desc(), F.col("__cid__")],
        k,
        bucket_col="__cid__",
        n_buckets=n_buckets,
        rank_col="rank",
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    sim_col: str = "cosine",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k neighbors per query row. Output: (query_id, vec_id,
    rank, cosine). Self-matches (same id) are excluded when the id columns
    collide. Ties break on neighbor id for determinism."""
    q = queries.select(
        F.col(query_id_col).alias("__qid__"), F.col(vec_col).alias("__qvec__")
    )
    corpus = ensure_min_partitions(corpus)
    c = corpus.select(F.col(id_col).alias("__cid__"), F.col(vec_col).alias("__cvec__"))
    sim = (
        c.join(F.broadcast(q), F.col("__cid__") != F.col("__qid__"))
        .withColumn("__sim__", cosine_similarity(F.col("__cvec__"), F.col("__qvec__")))
    )
    ranked = ranked_topk_per_query(sim, "__sim__", k)
    sim_out = F.round("__sim__", round_to) if round_to is not None else F.col("__sim__")
    return ranked.select(
        F.col("__qid__").alias(query_id_col),
        F.col("__cid__").alias(id_col),
        F.col("rank"),
        sim_out.alias(sim_col),
    )


def srp_signature(vec_col: Column | str, planes: int = 16, dim: int = 64) -> Column:
    """Sign-random-projection signature as a long: bit j = sign of
    dot(vec, h_j) where h_j[i] = ±1 from xxhash64(j, i). Deterministic,
    model-free, pure array expressions."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = []
    for j in range(planes):
        signs = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i, j=j: F.when(F.xxhash64(F.lit(j), i).bitwiseAND(1) == 1, F.lit(1.0)).otherwise(F.lit(-1.0)),
        )
        proj = F.aggregate(
            F.zip_with(vec, signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def centroid_literal_df(spark, centroids: list[list[float]]) -> DataFrame:
    """One-row DataFrame carrying an explicit centroid set (e.g. a trained
    k-means model) in the ``array<struct<__centroid__, __centvec__>>``
    layout :func:`assign_nearest_centroids` consumes; centroid ids are the
    list indexes 0..k-1. The model travels as DATA (createDataFrame +
    collect_list), not as k*d Literal expression nodes — at k=d=1024 a
    literal tree would be >1M Catalyst nodes re-analyzed on every call."""
    rows = [(i, [float(v) for v in vec]) for i, vec in enumerate(centroids)]
    df = spark.createDataFrame(
        rows, "__centroid__ int, __centvec__ array<double>"
    )
    return df.agg(
        F.collect_list(
            F.struct(
                F.col("__centroid__"),
                F.col("__centvec__"),
            )
        ).alias("__cents__")
    )


def sq_l2(a: Column, b: Column) -> Column:
    """Squared euclidean distance between two equal-length arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_nearest_centroids(
    df: DataFrame,
    idc: str,
    vecc: str,
    centroid_arr: DataFrame,
    keep: int,
    metric: str = "cosine",
) -> DataFrame:
    """Map-side nearest-centroid assignment.

    ``centroid_arr`` is a single-row DataFrame carrying the whole (tiny)
    centroid set as one ``array<struct<__centroid__, __centvec__>>`` column;
    it rides to every task via a broadcast nested-loop join against one row,
    so the corpus side never shuffles. The per-row top-``keep`` is an array
    sort over ``n_centroids`` elements: ``struct(-sim, centroid)`` sorted
    ascending gives similarity-descending with centroid-id ascending
    tiebreak — identical to the former ``Window.partitionBy(id)`` argmax
    but with zero Exchange between the scan and the assignment
    (plan-pinned by ``tests/test_plan_quality.py``).

    Degenerate similarities (NULL from null vector elements, NaN from a
    zero-norm vector) are coalesced to -inf so such centroids always LOSE:
    without the guard, ``sort_array`` ascending on ``-sim`` would rank a
    NULL similarity first (NULL sorts before everything), silently electing
    a broken centroid.

    ``metric``: ``'cosine'`` (default — the spherical family) or ``'l2'``
    (nearest by squared euclidean distance — the product-quantization
    subspace metric; similarity := -sq_l2 so the same larger-is-better
    ranking machinery applies).
    """
    if metric not in ("cosine", "l2"):
        raise ValueError(f"metric must be 'cosine' or 'l2', got {metric!r}")

    def _sim(vec: Column, cent: Column) -> Column:
        if metric == "cosine":
            return cosine_similarity(vec, cent)
        return -sq_l2(vec, cent)

    scored = df.crossJoin(F.broadcast(centroid_arr))
    neg_inf = F.lit(float("-inf"))
    ranked = F.slice(
        F.sort_array(
            F.transform(
                F.col("__cents__"),
                lambda cent: F.struct(
                    (
                        -F.coalesce(
                            F.nanvl(
                                _sim(F.col(vecc), cent["__centvec__"]),
                                neg_inf,
                            ),
                            neg_inf,
                        )
                    ).alias("__negsim__"),
                    cent["__centroid__"].alias("__centroid__"),
                ),
            )
        ),
        1,
        keep,
    )
    return scored.select(
        F.col(idc),
        F.col(vecc),
        F.explode(ranked).alias("__assign__"),
    ).select(idc, vecc, F.col("__assign__.__centroid__").alias("__centroid__"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: a deterministic coarse quantizer.

    1. centroids = an explicit ``centroids`` list when given (typically a
       trained ``clustering.kmeans_fit`` model — tighter inverted lists,
       better recall at the same ``n_probe``); otherwise the
       ``n_centroids`` corpus vectors with the smallest xxhash64(id)
       (deterministic sample — no trained model, no RNG);
    2. every corpus row is assigned to its nearest centroid (one broadcast
       of the tiny centroid set; cost O(rows x centroids) map-side);
    3. each query probes its ``n_probe`` nearest centroids and re-ranks
       exactly (cosine) within those inverted lists only.

    At 100 TB the inverted lists would be written bucketed by centroid id so
    probing prunes files; here the assignment column plays that role.
    Recall < 1 by design — :func:`cosine_topk` is the exact baseline.
    """
    corpus = ensure_min_partitions(corpus)
    c = corpus.select(F.col(id_col).alias("__cid__"), F.col(vec_col).alias("__cvec__"))
    if centroids is not None:
        centroid_arr = centroid_literal_df(corpus.sparkSession, centroids)
    else:
        # (hash, id) ordering — the same seed-pick convention as
        # clustering._hash_init, so kmeans_fit's default init and this
        # untrained path start from identical centroids
        centroid_arr = (
            c.withColumn("__h__", F.xxhash64(F.col("__cid__")))
            .orderBy("__h__", "__cid__")
            .limit(n_centroids)
            .select(F.col("__cid__").alias("__centroid__"), F.col("__cvec__").alias("__centvec__"))
            .agg(F.collect_list(F.struct("__centroid__", "__centvec__")).alias("__cents__"))
        )

    assigned = assign_nearest_centroids(c, "__cid__", "__cvec__", centroid_arr, keep=1)
    q = queries.select(F.col(query_id_col).alias("__qid__"), F.col(vec_col).alias("__qvec__"))
    probed = assign_nearest_centroids(q, "__qid__", "__qvec__", centroid_arr, keep=n_probe)

    cand = assigned.join(
        F.broadcast(probed), on="__centroid__"
    ).filter(F.col("__cid__") != F.col("__qid__"))
    sims = cand.withColumn("__sim__", cosine_similarity(F.col("__cvec__"), F.col("__qvec__")))
    return ranked_topk_per_query(sims, "__sim__", k).select(
        F.col("__qid__").alias(query_id_col),
        F.col("__cid__").alias(id_col),
        F.col("rank"),
        F.round("__sim__", 6).alias("cosine"),
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    planes: int = 16,
    bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share >= 1 signature band with the
    query, then exact cosine re-rank. Recall < 1 by design; the exact twin
    (:func:`cosine_topk`) is the correctness baseline."""
    chunk = planes // bands
    mask = (1 << chunk) - 1

    def banded(df: DataFrame, idc: str, tag: str) -> DataFrame:
        sig = srp_signature(vec_col, planes, dim)
        return df.select(
            F.col(idc).alias(f"__{tag}id__"),
            F.col(vec_col).alias(f"__{tag}vec__"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright(sig, b * chunk).bitwiseAND(mask).alias("bv"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias(f"__{tag}band__"),
        )

    c = banded(ensure_min_partitions(corpus), id_col, "c")
    q = banded(queries, query_id_col, "q")
    cand = (
        c.join(
            F.broadcast(q),
            (F.col("__cband__") == F.col("__qband__")) & (F.col("__cid__") != F.col("__qid__")),
        )
        .dropDuplicates(["__qid__", "__cid__"])
        .withColumn("__sim__", cosine_similarity(F.col("__cvec__"), F.col("__qvec__")))
    )
    return ranked_topk_per_query(cand, "__sim__", k).select(
        F.col("__qid__").alias(query_id_col),
        F.col("__cid__").alias(id_col),
        F.col("rank"),
        F.round("__sim__", 6).alias("cosine"),
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, "Product Quantization for Nearest
# Neighbor Search"): compress each vector into m subspace codes, rank with
# asymmetric distance computation (ADC) — per query, a tiny m x ks table of
# subspace dot products is precomputed once, and every corpus row scores in
# O(m) table lookups instead of O(d) multiplications. The compressed-domain
# complement of ivf_topk's coarse pruning; pq_topk composes both (IVF-PQ
# without residual encoding — documented simplification).
# ---------------------------------------------------------------------------


def pq_train(
    df: DataFrame,
    m: int = 4,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
    tol: float = 1e-4,
    dim: int | None = None,
) -> list[list[list[float]]]:
    """Train the m per-subspace codebooks (ks centroids each) with classic
    L2 Lloyd iterations over the sliced subvectors — m independent
    :func:`clustering.kmeans_fit` runs (``metric='l2'``), each collecting
    only ks x (dim/m) floats of model state per round. Deterministic in
    structure (hash-pick init, no RNG); centroid floats may differ in the
    last ulp across runs (double partial-sum merge order in the mean
    aggregation), so compare trained models approximately. Returns
    ``codebooks[j][c]`` = centroid ``c`` of subspace ``j``."""
    from hbsir_old_spark.functions.clustering import kmeans_fit

    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("cannot train PQ codebooks on an empty frame")
        dim = int(first["d"])
    if m < 1 or dim % m != 0:
        raise ValueError(f"dim {dim} must divide evenly into m={m} subspaces")
    dsub = dim // m
    books = []
    for j in range(m):
        sub = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * dsub + 1, dsub).alias(vec_col),
        )
        books.append(
            kmeans_fit(
                sub,
                k=ks,
                id_col=id_col,
                vec_col=vec_col,
                max_iter=max_iter,
                tol=tol,
                metric="l2",
            )
        )
    return books


def _codebooks_literal_df(spark, codebooks: list[list[list[float]]]) -> DataFrame:
    """One-row DataFrame carrying the whole codebook set as
    ``array<array<array<double>>>`` (subspace -> code -> centroid), the
    centroid_literal_df model-as-data convention: the model travels as one
    broadcast row, never as m x ks x d Literal expression nodes."""
    rows = [[[float(v) for v in cent] for cent in book] for book in codebooks]
    return spark.createDataFrame([(rows,)], "__books__ array<array<array<double>>>")


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
    _books: DataFrame | None = None,
) -> DataFrame:
    """Encode every vector as its m nearest-subspace-centroid codes —
    map-only (the codebook row broadcasts; zero shuffle of the corpus).
    Output: ``(id_col, vec_col, codes_col array<int>)``; at scale the codes
    column is what gets persisted (m bytes-ish per vector vs d floats).
    Ties and degenerate distances (NULL/NaN subvectors) resolve to the
    LOWEST code via the +inf guard, deterministically. ``_books`` lets
    :func:`pq_topk` reuse its already-built codebook literal frame."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    books = (
        _books
        if _books is not None
        else _codebooks_literal_df(df.sparkSession, codebooks)
    )
    inf = F.lit(float("inf"))
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.element_at(
            F.sort_array(
                F.transform(
                    F.element_at(F.col("__books__"), j + 1),
                    lambda cent, c: F.struct(
                        F.coalesce(
                            F.nanvl(
                                sq_l2(
                                    F.slice(F.col(vec_col), j * dsub + 1, dsub),
                                    cent,
                                ),
                                inf,
                            ),
                            inf,
                        ).alias("__d__"),
                        c.alias("__code__"),
                    ),
                )
            ),
            1,
        )["__code__"].cast("int"),
    )
    return (
        df.crossJoin(F.broadcast(books))
        .select(F.col(id_col), F.col(vec_col), codes.alias(codes_col))
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    m: int = 4,
    ks: int = 16,
    codebooks: list[list[list[float]]] | None = None,
    refine: int = 4,
    n_coarse: int | None = None,
    n_probe: int = 4,
    train_max_iter: int = 10,
) -> DataFrame:
    """Approximate top-k by product quantization with exact re-rank.

    1. codebooks: an explicit trained set, else :func:`pq_train` on the
       corpus (deterministic);
    2. corpus rows encode to m codes (:func:`pq_encode`, map-only);
    3. per query, the m x ks table of subspace dot products against every
       sub-centroid is computed ONCE (tiny query side); ADC score of a
       corpus row = sum of m table lookups — a flat codegen'd expression,
       no per-dimension work on the hot path;
    4. the top ``refine * k`` ADC candidates per query re-rank by exact
       cosine (the standard ADC-then-refine shape);
    5. optional IVF composition: ``n_coarse`` set => corpus rows join
       queries only within probed coarse-centroid buckets (the IVF-PQ
       layout, sans residual encoding — documented simplification) instead
       of scanning every code row per query.

    At 100 TB the encoded corpus (codes only) is the persisted artifact —
    the ADC scan reads m ints per row instead of d floats, and the coarse
    buckets prune files exactly as ivf_topk's inverted lists do. Recall <
    1 by design — :func:`cosine_topk` is the exact baseline; floors pinned
    in tests/test_approx_quality.py.
    """
    if refine < 1:
        raise ValueError(f"refine must be >= 1, got {refine}")
    corpus = ensure_min_partitions(corpus)
    if codebooks is None:
        codebooks = pq_train(
            corpus, m=m, ks=ks, id_col=id_col, vec_col=vec_col,
            max_iter=train_max_iter,
        )
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    books = _codebooks_literal_df(corpus.sparkSession, codebooks)

    enc = pq_encode(
        corpus, codebooks, id_col=id_col, vec_col=vec_col, _books=books
    ).select(F.col(id_col).alias("__cid__"), F.col("pq_codes").alias("__codes__"))
    q = queries.select(
        F.col(query_id_col).alias("__qid__"), F.col(vec_col).alias("__qvec__")
    )
    # per-query ADC table: __tab__[j][c] = dot(q_sub_j, codebooks[j][c]);
    # interpreted HOFs are fine here — the query side is tiny by contract
    qtab = q.crossJoin(F.broadcast(books)).select(
        "__qid__",
        "__qvec__",
        F.transform(
            F.col("__books__"),
            lambda book, j: F.transform(
                book,
                lambda cent: dot(
                    F.slice(F.col("__qvec__"), j * dsub + 1, dsub), cent
                ),
            ),
        ).alias("__tab__"),
    )

    if n_coarse is not None:
        # IVF-PQ: coarse quantizer prunes the candidate pairs; same
        # hash-pick seed convention as ivf_topk's untrained path
        coarse_arr = (
            corpus.select(
                F.col(id_col).alias("__sid__"), F.col(vec_col).alias("__svec__")
            )
            .withColumn("__h__", F.xxhash64(F.col("__sid__")))
            .orderBy("__h__", "__sid__")
            .limit(n_coarse)
            .select(
                F.col("__sid__").alias("__centroid__"),
                F.col("__svec__").alias("__centvec__"),
            )
            .agg(
                F.collect_list(F.struct("__centroid__", "__centvec__")).alias(
                    "__cents__"
                )
            )
        )
        assigned = assign_nearest_centroids(
            corpus.select(F.col(id_col).alias("__cid__"), F.col(vec_col)),
            "__cid__",
            vec_col,
            coarse_arr,
            keep=1,
        ).select("__cid__", "__centroid__")
        probed = assign_nearest_centroids(
            qtab.select("__qid__", F.col("__qvec__").alias(vec_col)),
            "__qid__",
            vec_col,
            coarse_arr,
            keep=n_probe,
        ).select("__qid__", "__centroid__")
        pairs = (
            enc.join(assigned, "__cid__")
            .join(F.broadcast(probed.join(qtab, "__qid__")), "__centroid__")
        )
    else:
        pairs = enc.crossJoin(F.broadcast(qtab))

    neg_inf = F.lit(float("-inf"))
    adc_terms = [
        F.element_at(
            F.element_at(F.col("__tab__"), j + 1),
            F.element_at(F.col("__codes__"), j + 1) + 1,
        )
        for j in range(m)
    ]
    adc = adc_terms[0]
    for t in adc_terms[1:]:
        adc = adc + t
    scored = pairs.filter(F.col("__cid__") != F.col("__qid__")).withColumn(
        "__adc__", F.coalesce(F.nanvl(adc, neg_inf), neg_inf)
    )
    cands = ranked_topk_per_query(scored, "__adc__", refine * k).select(
        "__qid__", "__qvec__", "__cid__"
    )
    vecs = corpus.select(F.col(id_col).alias("__cid__"), F.col(vec_col).alias("__cvec__"))
    sims = cands.join(vecs, "__cid__").withColumn(
        "__sim__", cosine_similarity(F.col("__cvec__"), F.col("__qvec__"))
    )
    # plain per-query window here is fine: the refine stage's input is
    # already bounded at refine*k rows per query by the ADC prune
    w = Window.partitionBy("__qid__").orderBy(F.col("__sim__").desc(), F.col("__cid__"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid__").alias(query_id_col),
            F.col("__cid__").alias(id_col),
            F.col("rank"),
            F.round("__sim__", 6).alias("cosine"),
        )
    )
