"""Distributed spherical k-means: planted-blob recovery, Lloyd
monotonicity on unstructured data, empty-cluster and validation paths."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbsir_old_spark.functions.clustering import (  # noqa: E402
    kmeans_assign,
    kmeans_fit,
    kmeans_inertia,
)


def _blob_df(spark, n_per_blob=10, dim=6, k=3):
    """Well-separated one-hot blobs with deterministic hash noise."""
    rows = []
    for b in range(k):
        for j in range(n_per_blob):
            vec = [
                10.0 * (i == b) + 0.01 * ((b * 31 + j * 7 + i) % 5)
                for i in range(dim)
            ]
            rows.append((b * n_per_blob + j, vec))
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_kmeans_recovers_planted_blobs_with_seeded_init(spark):
    df = _blob_df(spark)
    init = [
        [float(v) for v in r["embedding"]]
        for r in df.filter(F.col("vec_id").isin(0, 10, 20)).orderBy("vec_id").collect()
    ]
    cents = kmeans_fit(df, init=init, max_iter=10)
    out = kmeans_assign(df, cents).collect()
    assert all(r["cluster"] == r["vec_id"] // 10 for r in out)
    # centroid c's dominant dimension is its blob's one-hot axis
    for c, vec in enumerate(cents):
        assert max(range(len(vec)), key=lambda i: vec[i]) == c


def test_kmeans_hash_init_improves_inertia(spark):
    df = _blob_df(spark, n_per_blob=12, k=4, dim=8)
    from hbsir_old_spark.functions.clustering import _hash_init

    init = _hash_init(df, 4, "vec_id", "embedding")
    fitted = kmeans_fit(df, k=4, max_iter=10)
    # Lloyd's never decreases the spherical objective
    assert kmeans_inertia(df, fitted) >= kmeans_inertia(df, init) - 1e-9


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # all data near +e0; the second centroid points the opposite way and
    # captures nothing — it must survive unchanged, deterministically
    df = _blob_df(spark, n_per_blob=8, k=1, dim=4)
    far = [-10.0, 0.0, 0.0, 0.0]
    cents = kmeans_fit(df, init=[[10.0, 0.0, 0.0, 0.0], far], max_iter=5)
    assert cents[1] == far
    assert {r["cluster"] for r in kmeans_assign(df, cents).collect()} == {0}


def test_kmeans_validation_errors(spark):
    df = _blob_df(spark, n_per_blob=2, k=1, dim=3)
    with pytest.raises(ValueError, match="only"):
        kmeans_fit(df, k=50)
    with pytest.raises(ValueError, match="len\\(init\\)"):
        kmeans_fit(df, k=3, init=[[1.0, 0.0, 0.0]])
    with pytest.raises(ValueError, match="either"):
        kmeans_fit(df)


def test_ivf_accepts_trained_centroids(spark):
    from hbsir_old_spark.functions.similarity import ivf_topk

    df = _blob_df(spark, n_per_blob=10, k=3, dim=6)
    init = [
        [float(v) for v in r["embedding"]]
        for r in df.filter(F.col("vec_id").isin(0, 10, 20)).orderBy("vec_id").collect()
    ]
    model = kmeans_fit(df, init=init, max_iter=10)
    queries = df.filter(F.col("vec_id").isin(1, 11)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = ivf_topk(df, queries, k=3, n_probe=1, centroids=model).collect()
    assert len(hits) == 6
    # probing ONE trained inverted list keeps every neighbor in-blob
    for r in hits:
        assert r["vec_id"] // 10 == r["query_id"] // 10


def test_semantic_dedup_removes_planted_near_dups(spark):
    from hbsir_old_spark.functions.clustering import semantic_dedup

    # 6 mutually-orthogonal leaders (cross cosine ~0); follower i+100 is a
    # scaled copy of leader i with a tiny off-axis nudge (cosine ~1)
    dim = 8
    rows = []
    for i in range(6):
        leader = [10.0 if j == i else 0.0 for j in range(dim)]
        follower = [v * 1.001 for v in leader]
        follower[(i + 1) % dim] += 0.001
        rows.append((i, leader))
        rows.append((i + 100, follower))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    model = kmeans_fit(df, k=2, max_iter=5)
    kept = semantic_dedup(df, model, threshold=0.9)
    kept_ids = sorted(r["vec_id"] for r in kept.select("vec_id").collect())
    # every follower drops (its smaller-id leader co-clusters at cosine
    # ~1); orthogonal leaders all survive
    assert kept_ids == list(range(6))


def test_semantic_dedup_multiprobe_catches_straddled_pair(spark):
    """The boundary-straddle hole of single-assignment SemDeDup: when BOTH
    members of a near-dup pair are centroids, each is nearest to itself, so
    the pair straddles two clusters. n_probe=2 (default) must still drop
    the follower; n_probe=1 documents the lossy original behavior."""
    from hbsir_old_spark.functions.clustering import semantic_dedup

    dim = 6
    leader = [10.0] + [0.0] * (dim - 1)
    follower = [10.0, 0.001] + [0.0] * (dim - 2)
    other = [0.0, 0.0, 10.0] + [0.0] * (dim - 3)
    df = spark.createDataFrame(
        [(0, leader), (1, follower), (2, other)],
        "vec_id int, embedding array<double>",
    )
    cents = [leader, follower]  # adversarial: the pair IS the centroid set
    kept2 = sorted(
        r["vec_id"]
        for r in semantic_dedup(df, cents, threshold=0.9).select("vec_id").collect()
    )
    assert kept2 == [0, 2]  # follower caught via its second-nearest cluster
    kept1 = sorted(
        r["vec_id"]
        for r in semantic_dedup(df, cents, threshold=0.9, n_probe=1)
        .select("vec_id")
        .collect()
    )
    assert kept1 == [0, 1, 2]  # the documented single-probe miss


def test_semantic_dedup_unrolled_dim_matches_lambda_path(spark):
    """dim= switches the verify stage to the unrolled codegen'd dot with
    precomputed norms — results must match the interpreted path exactly."""
    from hbsir_old_spark.functions.clustering import semantic_dedup

    df = _blob_df(spark, n_per_blob=8, k=3, dim=6)
    model = kmeans_fit(df, k=3, max_iter=5)
    base = sorted(
        r["vec_id"]
        for r in semantic_dedup(df, model, threshold=0.99).select("vec_id").collect()
    )
    unrolled = sorted(
        r["vec_id"]
        for r in semantic_dedup(df, model, threshold=0.99, dim=6)
        .select("vec_id")
        .collect()
    )
    assert base == unrolled


def test_semantic_dedup_high_threshold_keeps_all(spark):
    from hbsir_old_spark.functions.clustering import semantic_dedup

    df = _blob_df(spark, n_per_blob=5, k=2, dim=4)
    model = kmeans_fit(df, k=2, max_iter=5)
    assert semantic_dedup(df, model, threshold=1.0000001).count() == df.count()


def test_kmeans_converges_early_and_assignment_is_stable(spark):
    df = _blob_df(spark)
    init = [
        [float(v) for v in r["embedding"]]
        for r in df.filter(F.col("vec_id").isin(0, 10, 20)).orderBy("vec_id").collect()
    ]
    # max_iter far above need: the tol=0-shift early exit must fire, and a
    # refit from the fitted centroids must be a fixed point
    cents = kmeans_fit(df, init=init, max_iter=50)
    refit = kmeans_fit(df, init=cents, max_iter=50)
    for a, b in zip(refit, cents):
        assert a == pytest.approx(b)


def test_dot_unrolled_matches_fold_on_float_arrays(spark):
    """ADVICE r6: dot_unrolled must be float-identical to dot's fold even
    for array<float> inputs — both paths multiply in the element type and
    accumulate in double. Bit-exact comparison over awkward float values."""
    import random

    from hbsir_old_spark.functions.similarity import dot, dot_unrolled

    rng = random.Random(7)
    rows = [
        (
            i,
            [rng.uniform(-1, 1) for _ in range(16)],
            [rng.uniform(-1, 1) for _ in range(16)],
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "id int, a array<float>, b array<float>"
    )
    got = df.select(
        "id",
        dot(F.col("a"), F.col("b")).alias("fold"),
        dot_unrolled(F.col("a"), F.col("b"), 16).alias("unrolled"),
    ).collect()
    for r in got:
        assert r["fold"] == r["unrolled"], r["id"]
