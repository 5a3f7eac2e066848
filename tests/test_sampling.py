"""Deterministic sampling primitives (x16/x17): stability of the hash
split under append/repartition, quota semantics, plan shape (the split
must be pure map-side), and the url-type external fetch over file://."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbsir_old_spark.functions.sampling import (  # noqa: E402
    group_quota,
    hash_split,
    split_threshold_hex,
)


def test_split_threshold_hex():
    assert split_threshold_hex(0.1) == "1999"
    assert split_threshold_hex(0.0) == "0000"
    assert split_threshold_hex(1.0) == "10000"  # above every 4-char bucket
    with pytest.raises(ValueError):
        split_threshold_hex(1.5)


def test_hash_split_is_stable_under_repartition_and_append(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    full = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", 0.2).collect()
    }
    # repartitioning must not move any key across the split
    shuffled = hash_split(df.repartition(13), "doc_id", 0.2)
    assert {r["doc_id"]: r["split"] for r in shuffled.collect()} == full
    # a subset (late-arriving shard) gets identical assignments
    subset = hash_split(df.filter(F.col("doc_id") < 100), "doc_id", 0.2)
    for r in subset.collect():
        assert full[r["doc_id"]] == r["split"]


def test_hash_split_fraction_lands_near_target(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    n_test = hash_split(df, "doc_id", 0.1).filter(F.col("split") == "test").count()
    assert 0.07 <= n_test / 5000 <= 0.13


def test_hash_split_is_map_side_only(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = hash_split(df, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_group_quota_caps_and_orders(spark):
    rows = [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, quality double")
    out = group_quota(df, "lang", quota=3, order_col="doc_id")
    by_lang = {}
    for r in out.collect():
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert sorted(by_lang["a"]) == [0, 2, 4]
    assert sorted(by_lang["b"]) == [1, 3, 5]
    # descending: keep the best-quality rows
    best = group_quota(df, "lang", quota=2, order_col="quality", ascending=False)
    assert {r["doc_id"] for r in best.collect()} == {18, 16, 19, 17}
    assert group_quota(df, "lang", quota=0, order_col="doc_id").count() == 0
    with pytest.raises(ValueError):
        group_quota(df, "lang", quota=-1, order_col="doc_id")


def test_external_url_dataset_fetches_file_scheme(spark, tmp_path):
    # S3 upgrade: the DEFAULT fetcher now really fetches (urllib); file://
    # exercises the whole url-type path offline
    import pandas as pd

    from hbsir_old_spark.sources.external import ExternalDataRegistry

    src = tmp_path / "cpi.csv"
    src.write_text("Year,CPI\n1400,100.0\n1401,140.0\n")
    reg = ExternalDataRegistry(
        spark,
        metadata={"cpi": {"url": src.as_uri()}},
        cleaners={"cpi": lambda path: pd.read_csv(path)},
        cache_dir=str(tmp_path / "cache"),
    )
    out = reg.load("cpi").collect()
    assert {(r["Year"], r["CPI"]) for r in out} == {(1400, 100.0), (1401, 140.0)}


class TestTokenBudget:
    def test_budget_boundary_includes_crossing_doc(self, spark):
        from hbsir_old_spark.functions.sampling import token_budget_sample

        rows = [
            # lang a, hash order == id order for fixed order_col
            ("a", 1, 40),
            ("a", 2, 40),   # cumulative before = 40 < 100 -> kept (crosses 80)
            ("a", 3, 40),   # before = 80 < 100 -> kept (crosses 120)
            ("a", 4, 40),   # before = 120 >= 100 -> dropped
            ("b", 5, 500),  # single huge doc: before = 0 -> kept
            ("b", 6, 1),    # before = 500 -> dropped
        ]
        df = spark.createDataFrame(rows, "lang string, doc_id long, n_tokens long")
        kept = token_budget_sample(
            df, group_col="lang", budget=100, token_col="n_tokens",
            order_col="doc_id",
        )
        ids = sorted(r["doc_id"] for r in kept.collect())
        assert ids == [1, 2, 3, 5]

    def test_invalid_budget_raises(self, spark):
        from hbsir_old_spark.functions.sampling import token_budget_sample

        df = spark.createDataFrame([("a", 1, 1)], "lang string, doc_id long, n long")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="budget must be > 0"):
            token_budget_sample(df, "lang", 0, "n", "doc_id")

    def test_single_exchange(self, spark):
        from hbsir_old_spark.functions.sampling import token_budget_sample

        df = spark.createDataFrame(
            [("a", i, 10) for i in range(20)], "lang string, doc_id long, n long"
        )
        kept = token_budget_sample(df, "lang", 50, "n", "doc_id")
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") <= 1


class TestPackSequences:
    def _packed(self, spark, seq_len=100, digits=0):
        from hbsir_old_spark.functions.sampling import pack_sequences

        # bucket_hex_digits=0 -> substring length 0 -> one bucket: the
        # chunk math is then fully hand-checkable
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate([40, 40, 40, 90, 10, 250])],
            "doc_id long, n long",
        )
        return pack_sequences(
            df, seq_len, token_col="n", order_col="doc_id",
            bucket_hex_digits=digits,
        )

    def test_chunk_and_offset_hand_computed(self, spark):
        rows = {
            r["doc_id"]: (r["pack_chunk"], r["pack_offset"])
            for r in self._packed(spark).collect()
        }
        # cumsum-before: 0, 40, 80, 120, 210, 220
        assert rows == {
            0: (0, 0),
            1: (0, 40),
            2: (0, 80),   # spans into chunk 1 (doc-spanning by design)
            3: (1, 20),
            4: (2, 10),
            5: (2, 20),   # 250 tokens span chunks 2..4; assigned to start
        }

    def test_null_tokens_consume_nothing(self, spark):
        from hbsir_old_spark.functions.sampling import pack_sequences

        df = spark.createDataFrame(
            [(0, 60), (1, None), (2, 60)], "doc_id long, n long"
        )
        rows = {
            r["doc_id"]: r["pack_chunk"]
            for r in pack_sequences(
                df, 100, "n", "doc_id", bucket_hex_digits=0
            ).collect()
        }
        assert rows == {0: 0, 1: 0, 2: 0}  # null doc sits at offset 60

    def test_invalid_seq_len_raises(self, spark):
        import pytest as _pytest

        from hbsir_old_spark.functions.sampling import pack_sequences

        df = spark.createDataFrame([(1, 1)], "doc_id long, n long")
        with _pytest.raises(ValueError, match="seq_len"):
            pack_sequences(df, 0, "n", "doc_id")

    def test_bucketed_window_single_exchange(self, spark):
        plan = (
            self._packed(spark, digits=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") <= 1


class TestTemperatureSample:
    def _df(self, spark):
        rows = [("big", i) for i in range(90)] + [("small", 100 + i) for i in range(10)]
        return spark.createDataFrame(rows, "lang string, doc_id long")

    def test_alpha_zero_is_uniform(self, spark):
        from hbsir_old_spark.functions.sampling import temperature_sample
        from pyspark.sql import functions as F

        kept = temperature_sample(self._df(spark), "lang", 0.0, 20, "doc_id")
        by = {
            r["lang"]: r["n"]
            for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        assert by == {"big": 10, "small": 10}

    def test_alpha_one_is_proportional(self, spark):
        from hbsir_old_spark.functions.sampling import temperature_sample
        from pyspark.sql import functions as F

        kept = temperature_sample(self._df(spark), "lang", 1.0, 50, "doc_id")
        by = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert by == {"big": 45, "small": 5}

    def test_small_group_floor_keeps_one(self, spark):
        from hbsir_old_spark.functions.sampling import temperature_sample
        from pyspark.sql import functions as F

        df = self._df(spark)
        kept = temperature_sample(df, "lang", 1.0, 5, "doc_id")
        by = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert by["small"] >= 1  # quota floors at 1

    def test_stable_under_repartition(self, spark):
        from hbsir_old_spark.functions.sampling import temperature_sample

        df = self._df(spark)
        a = sorted(r["doc_id"] for r in temperature_sample(df, "lang", 0.5, 30, "doc_id").collect())
        b = sorted(
            r["doc_id"]
            for r in temperature_sample(df.repartition(7), "lang", 0.5, 30, "doc_id").collect()
        )
        assert a == b

    def test_null_group_is_budgeted_not_dropped(self, spark):
        from hbsir_old_spark.functions.sampling import temperature_sample
        from pyspark.sql import functions as F

        rows = [("en", i) for i in range(3)] + [(None, 100), (None, 101)]
        df = spark.createDataFrame(rows, "lang string, doc_id long")
        kept = temperature_sample(df, "lang", 0.0, 4, "doc_id")
        by = {
            r["lang"]: r["n"]
            for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        # uniform split: 2 per group, the NULL group included (not silently
        # dropped, not diluting en's quota)
        assert by == {"en": 2, None: 2}

    def test_validation(self, spark):
        import pytest as _pytest

        from hbsir_old_spark.functions.sampling import temperature_sample

        df = self._df(spark)
        with _pytest.raises(ValueError, match="target_rows"):
            temperature_sample(df, "lang", 0.5, 0, "doc_id")
        with _pytest.raises(ValueError, match="alpha"):
            temperature_sample(df, "lang", -1.0, 10, "doc_id")


def test_dsir_selects_target_like_documents(spark):
    """Planted vocabularies: target docs speak vocab A, the rest vocab B,
    and two 'mystery' docs (not marked target) also speak A. DSIR must
    rank every A-speaking doc above every B-speaking doc — the whole point
    of importance resampling is recovering target-LIKE data from the pool
    regardless of labels."""
    from hbsir_old_spark.functions.sampling import dsir_importance_select

    a_words = "alpha beta gamma delta epsilon"
    b_words = "zulu yankee xray whiskey victor"
    rows = []
    for i in range(10):
        rows.append((i, True, a_words))           # labeled target, vocab A
    for i in range(10, 40):
        rows.append((i, False, b_words))          # pool, vocab B
    rows.append((100, False, a_words))            # mystery A-speakers
    rows.append((101, False, a_words + " beta"))
    df = spark.createDataFrame(rows, "doc_id long, is_target boolean, text string")
    kept = dsir_importance_select(df, "is_target", n=12, id_col="doc_id")
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == set(range(10)) | {100, 101}


def test_dsir_selection_paths_agree_and_avoid_global_sort(spark):
    """Round-7 scale fix: the old unpartitioned row_number window put
    every doc-level row in ONE task. Both replacement paths must produce
    the identical top-n, and neither plan may contain a Window or a
    SinglePartition exchange."""
    from hbsir_old_spark.functions.sampling import dsir_importance_select

    rows = [
        (i, i % 7 == 0, f"w{i % 23} w{i % 11} w{(i * 3) % 23} tail{i % 5}")
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, is_target boolean, text string")
    small_n = dsir_importance_select(df, "is_target", n=37, id_col="doc_id")
    large_n = dsir_importance_select(
        df, "is_target", n=37, id_col="doc_id", take_ordered_limit=0
    )
    key = lambda r: (r["doc_id"], r["n_tokens"], r["dsir_score"])
    a = sorted(map(key, small_n.collect()))
    b = sorted(map(key, large_n.collect()))
    assert a == b and len(a) == 37

    plan_small = small_n._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan_small
    assert "Window" not in plan_small
    plan_large = large_n._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan_large
    assert "SinglePartition" not in plan_large


def test_dsir_zero_token_docs_rank_by_tiebreak_with_zero_score(spark):
    from hbsir_old_spark.functions.sampling import dsir_importance_select

    rows = [(1, True, "aa bb"), (2, False, "aa bb"), (3, False, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, is_target boolean, text string")
    out = {r["doc_id"]: r for r in dsir_importance_select(
        df, "is_target", n=3, id_col="doc_id").collect()}
    assert set(out) == {1, 2, 3}
    assert out[3]["n_tokens"] == 0 and out[3]["dsir_score"] == 0.0


# ---------------------------------------------------------------------------
# prune_by_score_quantile (x35): exact histogram-quantile threshold


def _scores(spark, values):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "doc_id int, score double"
    )


def test_quantile_prune_exact_threshold(spark):
    from hbsir_old_spark.functions.sampling import prune_by_score_quantile

    # scores 1..10, q=0.75 -> ceil(7.5)=8 -> threshold is the 8th
    # smallest (8.0); exactly scores 1..8 survive
    df = _scores(spark, [float(v) for v in range(1, 11)])
    kept = sorted(r["score"] for r in prune_by_score_quantile(df, "score", 0.75).collect())
    assert kept == [float(v) for v in range(1, 9)]


def test_quantile_prune_keeps_all_threshold_ties(spark):
    from hbsir_old_spark.functions.sampling import prune_by_score_quantile

    # four identical scores, q=0.5 -> ceil(2)=2 -> threshold 1.0, but
    # tie inclusion keeps ALL four: output is a function of score
    # values, never of row order/partitioning
    df = _scores(spark, [1.0, 1.0, 1.0, 1.0])
    assert prune_by_score_quantile(df, "score", 0.5).count() == 4


def test_quantile_prune_drops_null_scores_and_validates_q(spark):
    import pytest as _pytest

    from hbsir_old_spark.functions.sampling import prune_by_score_quantile

    df = _scores(spark, [1.0, None, 2.0, None])
    kept = sorted(r["score"] for r in prune_by_score_quantile(df, "score", 1.0).collect())
    assert kept == [1.0, 2.0]
    with _pytest.raises(ValueError):
        prune_by_score_quantile(df, "score", 1.5)
    # q=0.0 is self-contradictory under the tie rule (the threshold can
    # never fall below min(score), so "keep ~nothing" would keep the whole
    # minimum-score class) — rejected, not silently a min-class filter
    with _pytest.raises(ValueError):
        prune_by_score_quantile(df, "score", 0.0)


def test_quantile_prune_rejects_thr_column_collision(spark):
    import pytest as _pytest

    from pyspark.sql import functions as F

    from hbsir_old_spark.functions.sampling import prune_by_score_quantile

    df = _scores(spark, [1.0, 2.0]).withColumn("__thr__", F.lit(0.0))
    with _pytest.raises(ValueError, match="__thr__"):
        prune_by_score_quantile(df, "score", 0.5)


def test_quantile_prune_plan_shape(spark):
    from hbsir_old_spark.functions.sampling import prune_by_score_quantile

    df = _scores(spark, [float(v) for v in range(50)])
    out = prune_by_score_quantile(df, "score", 0.75)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # JVM-side end to end; the threshold reaches the filter via broadcast
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


class TestGlobalOrder:
    """assign_global_order (x43): deterministic training-order shuffle."""

    def test_positions_contiguous_and_hash_ordered(self, spark):
        from hbsir_old_spark.functions.sampling import assign_global_order
        import hashlib

        df = spark.createDataFrame([(i,) for i in range(97)], ["doc_id"])
        out = {
            r["doc_id"]: r["order_pos"]
            for r in assign_global_order(df, seed=3).collect()
        }
        assert sorted(out.values()) == list(range(97))
        expected = sorted(
            range(97),
            key=lambda i: (hashlib.md5(f"shuffle3|{i}".encode()).hexdigest(), i),
        )
        assert [out[i] for i in expected] == list(range(97))

    def test_prefix_width_and_seed_semantics(self, spark):
        from hbsir_old_spark.functions.sampling import assign_global_order
        import pytest as _pytest

        df = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
        base = {
            r["doc_id"]: r["order_pos"]
            for r in assign_global_order(df, seed=1, prefix_chars=2).collect()
        }
        # bucket width is an execution detail, never a semantics change
        wide = {
            r["doc_id"]: r["order_pos"]
            for r in assign_global_order(df, seed=1, prefix_chars=1).collect()
        }
        assert base == wide
        # a different seed is a different permutation
        other = {
            r["doc_id"]: r["order_pos"]
            for r in assign_global_order(df, seed=2).collect()
        }
        assert other != base and sorted(other.values()) == list(range(50))
        with _pytest.raises(ValueError, match="prefix_chars"):
            assign_global_order(df, prefix_chars=0)

    def test_null_ids_dropped_and_columns_preserved(self, spark):
        from hbsir_old_spark.functions.sampling import assign_global_order

        df = spark.createDataFrame(
            [(1, "a"), (None, "b"), (2, "c")], "doc_id int, text string"
        )
        rows = assign_global_order(df).collect()
        assert {r["doc_id"] for r in rows} == {1, 2}
        assert set(rows[0].asDict()) == {"doc_id", "text", "order_pos"}
        assert sorted(r["order_pos"] for r in rows) == [0, 1]

    def test_no_unpartitioned_window_in_plan(self, spark):
        from hbsir_old_spark.functions.sampling import assign_global_order

        df = spark.createDataFrame([(i,) for i in range(10)], ["doc_id"])
        plan = (
            assign_global_order(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the window must be partitioned by the hash-prefix bucket — an
        # empty partition spec would serialize the whole corpus
        assert "windowspecdefinition(__bkt__" in plan


class TestSaltedSelectionIdentity:
    """The salted two-level group_quota / temperature_sample must equal the
    single-window formulation on data where stage 1 genuinely prunes
    (groups much larger than 32 * quota per bucket) — a stage-1 bug that
    degenerates on small fixtures cannot hide here."""

    def test_group_quota_matches_single_window(self, spark):
        import random

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from hbsir_old_spark.functions.sampling import group_quota

        rng = random.Random(7)
        rows = [
            (f"g{g}", i, rng.random())
            for g in range(3)
            for i in rng.sample(range(100000), 2000)
        ]
        df = spark.createDataFrame(rows, "lang string, doc_id int, q double")
        # order on doc_id (unique): every (group, salt) bucket holds ~60
        # rows, so stage 1 must prune ~57 of each for quota=3
        for quota, asc in ((3, True), (40, False)):
            got = {
                (r["lang"], r["doc_id"])
                for r in group_quota(
                    df, "lang", quota, "doc_id", ascending=asc
                ).collect()
            }
            order = F.col("doc_id") if asc else F.col("doc_id").desc()
            w = Window.partitionBy("lang").orderBy(order)
            want = {
                (r["lang"], r["doc_id"])
                for r in df.withColumn("__rn__", F.row_number().over(w))
                .filter(F.col("__rn__") <= quota)
                .collect()
            }
            assert got == want, f"quota={quota} ascending={asc}"

    def test_temperature_sample_matches_single_window(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from hbsir_old_spark.functions.sampling import hash_hex, temperature_sample

        # two heavily imbalanced groups: quotas differ per group and far
        # exceed the per-bucket population for the small group
        rows = [("big", i) for i in range(3000)] + [("small", 10_000 + i) for i in range(60)]
        df = spark.createDataFrame(rows, "lang string, doc_id int")
        got = {
            (r["lang"], r["doc_id"])
            for r in temperature_sample(
                df, "lang", alpha=0.5, target_rows=400, order_col="doc_id"
            ).collect()
        }
        # reference: quotas recomputed the same way, single window keep
        counts = {r["lang"]: r["n"] for r in df.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        tw = sum(n ** 0.5 for n in counts.values())
        quotas = {g: max(1, int(400 * (n ** 0.5) / tw + 1e-9)) for g, n in counts.items()}
        w = Window.partitionBy("lang").orderBy(hash_hex("doc_id", "temp"), F.col("doc_id"))
        ranked = df.withColumn("__rn__", F.row_number().over(w)).collect()
        want = {
            (r["lang"], r["doc_id"]) for r in ranked if r["__rn__"] <= quotas[r["lang"]]
        }
        assert got == want
        assert len(got) == sum(quotas.values())


class TestPrefixScanReferences:
    """pack_sequences and token_budget_sample vs pure-Python references on
    randomized inputs — the prefix-scan twins of the x41 reference test:
    pins the bucket hashing, cumulative-sum semantics, NULL-token
    handling, and the include-the-crossing-document budget rule against
    independent sequential implementations."""

    def test_pack_sequences_matches_reference(self, spark):
        import hashlib
        import random
        from collections import defaultdict

        from hbsir_old_spark.functions.sampling import pack_sequences

        rng = random.Random(99)
        rows = [
            (i, rng.choice([None, 0, 1, 5, 100, 513]))
            for i in rng.sample(range(100000), 300)
        ]
        df = spark.createDataFrame(rows, "doc_id int, n_tokens int")
        got = {
            r["doc_id"]: (r["pack_bucket"], r["pack_chunk"], r["pack_offset"])
            for r in pack_sequences(
                df, seq_len=512, token_col="n_tokens", order_col="doc_id"
            ).collect()
        }
        # reference: group by md5('pack|id') 2-hex prefix, running sum in
        # doc_id order within each bucket, integer division/modulo
        buckets = defaultdict(list)
        for d, n in rows:
            b = hashlib.md5(f"pack|{d}".encode()).hexdigest()[:2]
            buckets[b].append((d, 0 if n is None else n))
        expected = {}
        for b, docs in buckets.items():
            before = 0
            for d, n in sorted(docs):
                expected[d] = (b, before // 512, before % 512)
                before += n
        assert got == expected

    def test_token_budget_matches_reference(self, spark):
        import random
        from collections import defaultdict

        from hbsir_old_spark.functions.sampling import token_budget_sample

        rng = random.Random(123)
        rows = [
            (i, rng.choice(["en", "de", None]), rng.choice([None, 0, 3, 50, 120]))
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "doc_id int, lang string, n_tokens int")
        got = {
            r["doc_id"]
            for r in token_budget_sample(
                df, "lang", budget=200, token_col="n_tokens", order_col="doc_id"
            ).collect()
        }
        groups = defaultdict(list)
        for d, g, n in rows:
            groups[g].append((d, 0 if n is None else n))
        expected = set()
        for docs in groups.values():
            before = 0
            for d, n in sorted(docs):
                if before < 200:  # crossing document included
                    expected.add(d)
                before += n
        assert got == expected
