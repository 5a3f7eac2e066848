"""Distributed k-means over embedding columns (spherical / cosine variant).

Lloyd's algorithm in the canonical Spark shape:

* the model (k x d centroid floats) lives on the DRIVER — legitimate model
  state, like the year lists the registry collects; the DATA never leaves
  the executors;
* assignment is map-side: the centroid set rides to every task as one
  broadcast single-row array (reusing :func:`assign_nearest_centroids`),
  so the corpus never shuffles for assignment;
* mean recomputation is a ``posexplode`` + ``groupBy(cluster, dim)``
  aggregation — partial-aggregable, so the shuffle per iteration is
  ``O(k * d * partitions)`` combiner output, independent of row count;
* the input is persisted across iterations (each Lloyd round is one pass).

At 100 TB with k=1024, d=1024 the per-iteration shuffle is a few MB per
partition and the driver holds 4 MB of model — the same layout Spark
MLlib's KMeans uses, expressed here purely in DataFrame ops so the whole
pipeline stays inspectable and oracle-able.

Cosine (spherical) distance is the right metric for text embeddings and
matches the rest of ``functions/similarity.py`` (IVF probing, SRP-LSH).
Cluster means are used un-normalized: cosine argmax is scale-invariant,
so normalizing centroids would not change any assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbsir_old_spark.functions.similarity import (
    assign_nearest_centroids,
    centroid_literal_df,
    cosine_similarity,
    dot,
    dot_unrolled,
    norm,
)


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    metric: str = "cosine",
) -> DataFrame:
    """Assign every row to its nearest centroid (cosine by default; ``'l2'``
    for the product-quantization subspace metric) — map-side only,
    no shuffle. Output: (id_col, vec_col, cluster_col)."""
    cents_df = centroid_literal_df(df.sparkSession, centroids)
    assigned = assign_nearest_centroids(
        df, id_col, vec_col, cents_df, keep=1, metric=metric
    )
    return assigned.select(
        id_col, vec_col, F.col("__centroid__").cast("int").alias(cluster_col)
    )


def _hash_init(
    df: DataFrame, k: int, id_col: str, vec_col: str
) -> list[list[float]]:
    """Deterministic seed pick: the k corpus vectors with the smallest
    xxhash64(id) — same convention as ivf_topk's coarse quantizer; no RNG,
    stable under repartition."""
    rows = (
        df.select(F.col(id_col).alias("__i__"), F.col(vec_col).alias("__v__"))
        .withColumn("__h__", F.xxhash64(F.col("__i__")))
        .orderBy("__h__", "__i__")
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} but only {len(rows)} input rows")
    return [[float(x) for x in r["__v__"]] for r in rows]


def kmeans_fit(
    df: DataFrame,
    k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 20,
    tol: float = 1e-6,
    init: list[list[float]] | None = None,
    metric: str = "cosine",
) -> list[list[float]]:
    """Fit k-means; returns the k centroids (driver-side model). Spherical
    (cosine assignment) by default; ``metric='l2'`` gives classic Lloyd
    (the product-quantization subspace objective).

    ``init`` supplies explicit initial centroids (e.g. one seed per known
    stratum — also what makes the planted-blob oracle gate deterministic);
    otherwise the deterministic hash pick is used. Convergence: the max
    absolute element-wise centroid shift falls to ``tol`` or below, or
    ``max_iter`` Lloyd rounds. An empty cluster keeps its previous
    centroid (no re-seeding, keeps the run deterministic)."""
    if init is not None:
        centroids = [[float(v) for v in c] for c in init]
        if k is not None and k != len(centroids):
            raise ValueError(f"k={k} != len(init)={len(centroids)}")
    else:
        if k is None:
            raise ValueError("either k or init is required")
        centroids = _hash_init(df, k, id_col, vec_col)
    k = len(centroids)

    data = df.select(id_col, vec_col).persist()
    try:
        for _ in range(max_iter):
            assigned = kmeans_assign(data, centroids, id_col, vec_col, metric=metric)
            stats = (
                assigned.select(
                    "cluster", F.posexplode(F.col(vec_col)).alias("pos", "val")
                )
                .groupBy("cluster", "pos")
                .agg(
                    F.sum(F.col("val").cast("double")).alias("s"),
                    F.count("*").alias("n"),
                )
                .collect()  # k*d rows of model state — not data
            )
            new_centroids = [list(c) for c in centroids]
            dims: dict[int, dict[int, float]] = {}
            for r in stats:
                dims.setdefault(r["cluster"], {})[r["pos"]] = r["s"] / r["n"]
            for ci, by_pos in dims.items():
                for pos, mean in by_pos.items():
                    new_centroids[ci][pos] = mean
            shift = max(
                (
                    abs(a - b)
                    for old, new in zip(centroids, new_centroids)
                    for a, b in zip(old, new)
                ),
                default=0.0,
            )
            centroids = new_centroids
            if shift <= tol:
                break
        return centroids
    finally:
        data.unpersist()


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-level near-duplicate removal
    scoped to k-means clusters. A row is dropped when a SMALLER-id row
    whose primary cluster is among the row's ``n_probe`` nearest clusters
    has cosine similarity >= ``threshold`` (deterministic keep-earliest
    rule); the survivors of ``df`` are returned unchanged.

    Scale shape: the pairwise check is the per-cluster self-join — the
    SemDeDup premise is that near-duplicates land in the same cluster, so
    candidate pairs are bounded by cluster sizes (n_probe * n^2/k per
    cluster on balanced clusters) instead of the corpus-level n^2.
    Assignment is map-side (broadcast centroids); the loser-id set is tiny
    and feeds a left-anti join, so corpus payloads are never shuffled for
    the check.

    ``n_probe=2`` (multi-probe) closes the boundary-straddle hole of
    single-assignment SemDeDup: a pair at cosine ~1 has near-identical
    centroid similarities, so when its members' PRIMARY clusters differ,
    each member's primary is (essentially by definition) the other's
    second-nearest — probing 2 clusters recovers the pair. A straddled
    pair could only escape if a third centroid squeezed inside the pair's
    ~(1-threshold) similarity gap — with n_probe=1 you get the paper's
    original (cheaper, boundary-lossy) behavior.

    ``dim``: pass the (static) vector dimension to verify pairs with the
    unrolled codegen'd dot product and PRE-COMPUTED per-row norms —
    without it the interpreted aggregate/zip_with cosine recomputes both
    norms per PAIR, which dominates the verify stage (measured ~4x)."""
    assigned = kmeans_assign(df, centroids, id_col, vec_col, cluster_col="__kc__")
    if dim is not None:
        row_norm = F.sqrt(dot_unrolled(F.col(vec_col), F.col(vec_col), dim))
    else:
        row_norm = norm(F.col(vec_col))
    a = assigned.select(
        "__kc__",
        F.col(id_col).alias("__ida__"),
        F.col(vec_col).alias("__va__"),
        row_norm.alias("__na__"),
    )
    probed = assign_nearest_centroids(
        df,
        id_col,
        vec_col,
        centroid_literal_df(df.sparkSession, centroids),
        keep=max(1, n_probe),
    )
    b = probed.select(
        F.col("__centroid__").cast("int").alias("__kc__"),
        F.col(id_col).alias("__idb__"),
        F.col(vec_col).alias("__vb__"),
        row_norm.alias("__nb__"),
    )
    pair_dot = (
        dot_unrolled(F.col("__va__"), F.col("__vb__"), dim)
        if dim is not None
        else dot(F.col("__va__"), F.col("__vb__"))
    )
    losers = (
        a.join(b, "__kc__")
        .filter(F.col("__ida__") < F.col("__idb__"))
        .filter(
            F.try_divide(pair_dot, F.col("__na__") * F.col("__nb__"))
            >= F.lit(threshold)
        )
        .select(F.col("__idb__").alias(id_col))
        .distinct()
    )
    return df.join(losers, id_col, "left_anti")


def kmeans_inertia(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean cosine similarity of every row to its assigned centroid — the
    spherical analogue of (negative) inertia; higher is tighter. One
    map-side pass."""
    assigned = kmeans_assign(df, centroids, id_col, vec_col)
    cents_df = centroid_literal_df(df.sparkSession, centroids)
    sim = (
        assigned.crossJoin(F.broadcast(cents_df))
        .select(
            cosine_similarity(
                F.col(vec_col),
                # look the centroid up by id, not position: collect_list
                # order after the global-agg shuffle is not contractual, so
                # sort the struct array by its leading __centroid__ field
                # first (stays codegen'd; k is tiny)
                F.element_at(
                    F.array_sort(F.col("__cents__")), F.col("cluster") + 1
                )["__centvec__"],
            ).alias("__sim__")
        )
        .agg(F.avg("__sim__").alias("m"))
        .collect()[0]["m"]
    )
    return float(sim)
