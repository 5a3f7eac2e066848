"""Quality floors for the approximate (rows-only) operators — the driver's
gate only checks these run; these tests quantify that they work.

* MinHash-LSH at its operating point recovers 100% of planted near-dup
  twins (jaccard ~0.9 >> the b=4/r=4 threshold ~0.7).
* ANN (SRP-LSH and IVF) results are SOUND (every returned cosine equals
  the exact computation; ranks consistent) and recall a reasonable share
  of the exact top-k on unclustered random vectors.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402


@pytest.fixture(scope="module")
def exact_topk(spark, sf_dir):
    return {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in entry_mod.q_cosine_topk(spark, sf_dir).collect()
    }


def test_minhash_recovers_all_planted_twins(spark, sf_dir):
    pairs = entry_mod.q_minhash_lsh(spark, sf_dir).collect()
    n_docs = entry_mod._t(spark, sf_dir, "documents").count()
    twins = sum(1 for r in pairs if r["id_b"] - r["id_a"] == 1_000_000)
    assert twins == n_docs, f"only {twins}/{n_docs} planted twins recovered"
    assert all(r["jaccard"] >= 0.5 for r in pairs)


def test_ann_lsh_sound_and_recalls(spark, sf_dir, exact_topk):
    approx = entry_mod.q_ann_lsh(spark, sf_dir).collect()
    assert len(approx) > 0
    hits = sum(1 for r in approx if (r["query_id"], r["vec_id"]) in exact_topk)
    # soundness: where both agree on a neighbor, the cosine is identical
    for r in approx:
        key = (r["query_id"], r["vec_id"])
        if key in exact_topk:
            assert abs(r["cosine"] - round(exact_topk[key], 6)) < 2e-4
    recall = hits / len(exact_topk)
    assert recall >= 0.2, f"SRP-LSH recall collapsed: {recall:.2f}"


def test_ivf_sound_and_recalls(spark, sf_dir, exact_topk):
    approx = entry_mod.q_ivf_topk(spark, sf_dir).collect()
    assert len(approx) > 0
    hits = sum(1 for r in approx if (r["query_id"], r["vec_id"]) in exact_topk)
    recall = hits / len(exact_topk)
    assert recall >= 0.3, f"IVF recall collapsed: {recall:.2f}"
    # per-query rank sequences are contiguous from 1
    by_q = {}
    for r in approx:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_simhash_pairs_are_sound(spark, sf_dir):
    pairs = entry_mod.q_simhash_pairs(spark, sf_dir).collect()
    for r in pairs:
        assert 0 <= r["hamming"] <= 10
        assert r["id_a"] < r["id_b"]


def test_approx_distinct_within_rsd(spark, sf_dir):
    approx = {
        r["l_returnflag"]: r["approx_orders"]
        for r in entry_mod.q_approx_distinct(spark, sf_dir).collect()
    }
    li = entry_mod._t(spark, sf_dir, "lineitem")
    from pyspark.sql import functions as F

    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_orderkey").alias("n")).collect()
    }
    for flag, est in approx.items():
        rel_err = abs(est - exact[flag]) / exact[flag]
        assert rel_err < 0.1, f"{flag}: approx {est} vs exact {exact[flag]}"


class TestApproxDecile:
    def test_approx_bins_agree_with_exact_ecdf(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from hbsir_old_spark.operators.quantile import add_approx_bin, add_decile

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        )
        exact = add_decile(
            orders, "o_totalprice", out_col="d_exact",
            tiebreaker_cols=("o_orderkey",),
        ).select("o_orderkey", "d_exact")
        approx = add_approx_bin(
            orders, "o_totalprice", out_col="d_approx"
        ).select("o_orderkey", "d_approx")
        joined = exact.join(approx, "o_orderkey")
        total = joined.count()
        agree = joined.filter(F.col("d_exact") == F.col("d_approx")).count()
        # eps=0.001 on this scale: only rows hugging a break can differ
        assert agree / total >= 0.99, f"agreement {agree}/{total}"

    def test_approx_bin_plan_has_no_sort_or_window(self, spark, sf_dir):
        from hbsir_old_spark.operators.quantile import add_approx_bin

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_custkey", "o_totalprice"
        )
        plan = (
            add_approx_bin(orders, "o_totalprice", group_cols=())
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan
        assert "Sort" not in plan.replace("SortAggregate", "")  # sketch agg only

    def test_weighted_approx_bins_agree_with_exact(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from hbsir_old_spark.operators.quantile import (
            add_decile,
            add_weighted_approx_bin,
        )

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            # cubed weights: heavy skew, the regime where unweighted breaks
            # would be badly wrong
            F.pow("l_quantity", 3).alias("w"),
        )
        both = add_weighted_approx_bin(
            add_decile(
                li,
                "l_extendedprice",
                "w",
                out_col="d_exact",
                tiebreaker_cols=("l_orderkey", "l_linenumber"),
            ),
            "l_extendedprice",
            "w",
            out_col="d_approx",
        )
        agree = both.select(
            F.avg((F.col("d_exact") == F.col("d_approx")).cast("double"))
        ).collect()[0][0]
        assert agree >= 0.99, f"weighted agreement {agree:.4f}"

    def test_weighted_approx_bin_plan_has_no_sort_or_window(self, spark, sf_dir):
        from hbsir_old_spark.operators.quantile import add_weighted_approx_bin

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_suppkey", "l_extendedprice", "l_quantity"
        )
        plan = (
            add_weighted_approx_bin(
                li, "l_extendedprice", "l_quantity", group_cols=("l_suppkey",)
            )
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the fact side must never sort or window on the VALUE — that is
        # the O(n log n) global-order cost this operator exists to avoid.
        # The one allowed Window is the running CDF over the per-group
        # histogram (at most probes+2 rows per group, keyed on __i__).
        value_ordered = [
            line
            for line in plan.splitlines()
            if ("Sort [" in line or "Window [" in line)
            and "l_extendedprice" in line
        ]
        assert not value_ordered, value_ordered
        assert plan.count("Window [") <= 1, plan
        for line in plan.splitlines():
            if "Sort [" in line and "SortAggregate" not in line:
                assert "__i__" in line, line

    def test_weighted_null_values_and_groups(self, spark):
        # NULL values must not deflate the CDF (their weight reached no
        # probe, capping high quantiles without a crossing); NULL group keys
        # must survive the broadcast joins like they survive partitionBy
        from pyspark.sql import functions as F

        from hbsir_old_spark.operators.quantile import add_weighted_approx_bin

        rows = [(i, "g" if i % 2 else None, float(i), 100.0) for i in range(1, 101)]
        rows += [(1000 + i, "g", None, 1000.0) for i in range(10)]  # heavy NULLs
        df = spark.createDataFrame(rows, ["id", "grp", "val", "w"])
        out = add_weighted_approx_bin(
            df, "val", "w", bins=4, group_cols=("grp",), out_col="b"
        )
        assert out.count() == 110  # row-preserving, NULL groups included
        got = {r["id"]: r["b"] for r in out.collect()}
        assert all(got[1000 + i] is None for i in range(10))  # NULL val -> NULL bin
        assert {got[i] for i in range(1, 101)} == {1, 2, 3, 4}

    def test_all_null_group_rows_survive_with_null_bin(self, spark):
        from pyspark.sql import functions as F

        from hbsir_old_spark.operators.quantile import add_weighted_approx_bin

        rows = [(i, "g", float(i), 1.0) for i in range(1, 21)]
        rows += [(100 + i, "h", None, 1.0) for i in range(5)]  # all-NULL group
        df = spark.createDataFrame(rows, ["id", "grp", "val", "w"])
        out = add_weighted_approx_bin(
            df, "val", "w", bins=4, group_cols=("grp",), out_col="b"
        )
        assert out.count() == 25  # group h not dropped
        h_bins = [r["b"] for r in out.filter(F.col("grp") == "h").collect()]
        assert h_bins == [None] * 5

    def test_ungrouped_empty_input_yields_null_breaks(self, spark):
        # Regression (round-7 ADVICE): under Spark 4's ANSI default the
        # ungrouped fallback built an empty __h__ histogram for empty
        # input and element_at(__h__, -1) threw
        # INVALID_ARRAY_INDEX_IN_ELEMENT_AT. Contract: NULL-breaks row,
        # row-preserving NULL bins.
        from hbsir_old_spark.operators.quantile import (
            add_weighted_approx_bin,
            weighted_approx_quantile_breaks,
        )

        empty = spark.createDataFrame([], "id int, val double, w double")
        assert weighted_approx_quantile_breaks(empty, "val", "w", bins=4).collect()[
            0
        ]["breaks"] is None
        assert add_weighted_approx_bin(
            empty, "val", "w", bins=4, out_col="b"
        ).count() == 0

    def test_ungrouped_all_null_values_yield_null_bins(self, spark):
        # Same ANSI crash class: all-NULL value column leaves no rows after
        # the NULL filter — ungrouped rows must come back with NULL bins.
        from hbsir_old_spark.operators.quantile import add_weighted_approx_bin

        df = spark.createDataFrame(
            [(i, None, 1.0) for i in range(5)], "id int, val double, w double"
        )
        out = add_weighted_approx_bin(df, "val", "w", bins=4, out_col="b")
        assert [r["b"] for r in out.collect()] == [None] * 5

    def test_weighted_single_bin_has_no_breaks(self, spark):
        from hbsir_old_spark.operators.quantile import (
            add_weighted_approx_bin,
            weighted_approx_quantile_breaks,
        )

        df = spark.createDataFrame(
            [(i, float(i), 1.0) for i in range(50)], ["id", "val", "w"]
        )
        assert weighted_approx_quantile_breaks(df, "val", "w", bins=1).collect()[0][
            "breaks"
        ] == []
        bins = {r["b"] for r in add_weighted_approx_bin(df, "val", "w", bins=1, out_col="b").collect()}
        assert bins == {1}

    def test_weighted_percentile_cap_path_agrees(self, spark):
        # pin the sparse-probe regime explicitly: probes=512 with bins=100
        # gives ~5 probes per percentile boundary, the setting the 0.95
        # floor below was measured on. (The default grid cap moved from 512
        # to 2048 in e0bf246, so bins=100 alone no longer hits a cap —
        # without the explicit probes= this test would silently run the
        # dense 1600-probe grid and stop exercising probe starvation.)
        from pyspark.sql import functions as F

        from hbsir_old_spark.operators.quantile import (
            add_percentile,
            add_weighted_approx_bin,
        )

        df = spark.createDataFrame(
            [(i, float((i * 7919) % 104729) + i / 1000, 1.0 + (i % 13)) for i in range(4000)],
            ["id", "val", "w"],
        )
        both = add_weighted_approx_bin(
            add_percentile(df, "val", "w", out_col="p_exact", tiebreaker_cols=("id",)),
            "val",
            "w",
            bins=100,
            probes=512,
            out_col="p_approx",
        )
        agree = both.select(
            F.avg((F.col("p_exact") == F.col("p_approx")).cast("double"))
        ).collect()[0][0]
        # ~5 probes per percentile boundary: boundary-adjacent rows can
        # land one bin off, so the floor is looser than the decile tests'
        # 0.99 (measured 0.962 on this synthetic, 0.994 on sf0.01
        # lineitem); raise probes= for tighter needs
        assert agree >= 0.95, f"percentile agreement {agree:.4f}"

    def test_count_lt_matches_linear_scan(self, spark):
        # the unrolled binary search must agree with a naive strict count
        # for every (sorted array, probe) combination, including dupes,
        # values below/above the range, and exact hits
        from hypothesis import given, settings, strategies as st

        from hbsir_old_spark.operators.quantile import _count_lt
        from pyspark.sql import functions as F

        @settings(max_examples=30, deadline=None)
        @given(
            st.lists(st.integers(-50, 50), min_size=1, max_size=12).map(sorted),
            st.integers(-60, 60),
        )
        def check(arr, v):
            expr = _count_lt(
                F.array(*[F.lit(float(x)) for x in arr]), len(arr), F.lit(float(v))
            )
            got = spark.range(1).select(expr.alias("c")).collect()[0]["c"]
            assert got == sum(1 for x in arr if x < v), (arr, v)

        check()

    def test_grouped_breaks_monotone(self, spark, sf_dir):
        from hbsir_old_spark.operators.quantile import approx_quantile_breaks

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        rows = approx_quantile_breaks(
            docs, "doc_id", bins=4, group_cols=("lang",)
        ).collect()
        assert len(rows) > 1
        for r in rows:
            assert r["breaks"] == sorted(r["breaks"])


def test_weighted_breaks_null_weight_leading_bucket_grouped_matches_ungrouped(spark):
    """Round-6 review regression: a group's minimum-value bucket whose rows
    all carry NULL weight must contribute zero mass, not poison the running
    CDF into NULL breaks (which would silently bin the whole group into the
    top bin). Grouped and ungrouped paths must agree."""
    from pyspark.sql import functions as F  # noqa: F401

    from hbsir_old_spark.operators.quantile import (
        add_weighted_approx_bin,
        weighted_approx_quantile_breaks,
    )

    rows = [
        ("g", 1.0, None),
        ("g", 5.0, 1.0),
        ("g", 9.0, 1.0),
        ("g", 13.0, 1.0),
        ("g", 17.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "grp string, val double, w double")
    grouped = weighted_approx_quantile_breaks(
        df, "val", "w", bins=2, group_cols=("grp",)
    ).collect()[0]["breaks"]
    ungrouped = weighted_approx_quantile_breaks(df, "val", "w", bins=2).collect()[
        0
    ]["breaks"]
    assert grouped == ungrouped and grouped[0] is not None
    binned = add_weighted_approx_bin(
        df, "val", "w", bins=2, group_cols=("grp",), out_col="b"
    )
    bins_by_val = {r["val"]: r["b"] for r in binned.collect()}
    assert bins_by_val[1.0] == 1 and bins_by_val[17.0] == 2


def test_pq_sound_and_recalls(spark, sf_dir, exact_topk):
    approx = entry_mod.q_pq_topk(spark, sf_dir).collect()
    assert len(approx) > 0
    hits = sum(1 for r in approx if (r["query_id"], r["vec_id"]) in exact_topk)
    # soundness: the refine stage computes EXACT cosine, so any neighbor
    # shared with the exact baseline must carry the identical similarity
    for r in approx:
        key = (r["query_id"], r["vec_id"])
        if key in exact_topk:
            assert abs(r["cosine"] - round(exact_topk[key], 6)) < 2e-4
    recall = hits / len(exact_topk)
    assert recall >= 0.3, f"PQ recall collapsed: {recall:.2f}"
    by_q = {}
    for r in approx:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_pq_determinism_and_shapes(spark, sf_dir):
    from hbsir_old_spark.functions.similarity import pq_encode, pq_train

    emb = (
        entry_mod._t(spark, sf_dir, "embeddings")
        .selectExpr("vec_id", "cast(embedding as array<double>) embedding")
        .filter("vec_id < 100")
    )
    books = pq_train(emb, m=4, ks=8, max_iter=3)
    assert len(books) == 4 and all(len(b) == 8 for b in books)
    assert all(len(c) == 16 for b in books for c in b)  # 64/4 dims
    # training twice from the deterministic hash init reproduces the model
    # (approx, not bitwise: double partial-sum merge order in the centroid
    # mean aggregation can differ across runs)
    books2 = pq_train(emb, m=4, ks=8, max_iter=3)
    for b1, b2 in zip(books, books2):
        for c1, c2 in zip(b1, b2):
            assert c1 == pytest.approx(c2, abs=1e-9)
    enc = pq_encode(emb, books).select("vec_id", "pq_codes").collect()
    codes = {r["vec_id"]: r["pq_codes"] for r in enc}
    assert len(codes) == 100
    assert all(len(v) == 4 and all(0 <= c < 8 for c in v) for v in codes.values())
    # encode is deterministic too
    enc2 = pq_encode(emb, books).select("vec_id", "pq_codes").collect()
    assert codes == {r["vec_id"]: r["pq_codes"] for r in enc2}


def test_pq_validation(spark, sf_dir):
    from hbsir_old_spark.functions.similarity import pq_topk, pq_train

    emb = (
        entry_mod._t(spark, sf_dir, "embeddings")
        .selectExpr("vec_id", "cast(embedding as array<double>) embedding")
        .filter("vec_id < 20")
    )
    with pytest.raises(ValueError, match="divide evenly"):
        pq_train(emb, m=5, ks=4)  # 64 % 5 != 0
    with pytest.raises(ValueError, match="refine"):
        pq_topk(emb, emb.selectExpr("vec_id as query_id", "embedding"), refine=0)
    with pytest.raises(ValueError, match="metric"):
        from hbsir_old_spark.functions.clustering import kmeans_assign

        kmeans_assign(emb, [[0.0] * 64], metric="manhattan")


def test_ranked_topk_per_query_matches_single_window(spark):
    # the salted two-level top-k must be EXACTLY the single-window result
    # (ranks included) on adversarial data: heavy score ties across salt
    # buckets, k larger than some salt-bucket populations
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hbsir_old_spark.functions.similarity import ranked_topk_per_query

    rng = random.Random(42)
    rows = [
        (q, c, rng.choice([0.1, 0.5, 0.5, 0.9]))
        for q in range(3)
        for c in rng.sample(range(1000), 200)
    ]
    df = spark.createDataFrame(rows, "__qid__ int, __cid__ int, __s__ double")
    for k in (1, 7, 250):
        got = {
            (r["__qid__"], r["__cid__"], r["rank"])
            for r in ranked_topk_per_query(df, "__s__", k, n_buckets=8).collect()
        }
        w = Window.partitionBy("__qid__").orderBy(F.col("__s__").desc(), "__cid__")
        want = {
            (r["__qid__"], r["__cid__"], r["rank"])
            for r in df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .collect()
        }
        assert got == want, f"k={k}"


def test_pq_encode_is_map_only(spark, sf_dir):
    # the encode path is the persisted-artifact builder at scale: it must
    # stay one broadcast nested-loop against the codebook row, zero
    # corpus Exchanges, no UDFs
    from hbsir_old_spark.functions.similarity import pq_encode, pq_train

    emb = (
        entry_mod._t(spark, sf_dir, "embeddings")
        .selectExpr("vec_id", "cast(embedding as array<double>) embedding")
        .filter("vec_id < 50")
    )
    books = pq_train(emb, m=4, ks=4, max_iter=2)
    plan = pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
