"""Physical-plan assertions: these guard the 100 TB story — filters must
reach the parquet scan, dimension joins must broadcast, hot paths must stay
JVM-side, and window computations must not multiply shuffles."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = entry_mod.q_filter_predicates(spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters: [" in plan
    assert "In(l_returnflag" in plan


def test_projection_prunes_scan_columns(spark, sf_dir):
    df = entry_mod.q_computed_column(spark, sf_dir)
    plan = plan_of(df)
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "l_shipdate" not in scan and "l_returnflag" not in scan


def test_classification_small_dim_compiles_to_expression(spark, sf_dir):
    # small dims need no join at all: the labels are CASE chains
    df = entry_mod.q_classification_join(spark, sf_dir)
    plan = plan_of(df)
    assert "Join" not in plan
    assert "CASE WHEN" in plan


def test_classification_large_dim_broadcast_joins(spark, sf_dir):
    from hbsir_old_spark.operators.classification import (
        add_classification,
        build_classification_dim,
    )

    items = {
        f"band{i}": {"code": {"start": i * 10, "end": i * 10 + 10}, "level": 1}
        for i in range(4200)  # above the expression-strategy cutoff (4096)
    }
    dim = build_classification_dim({"items": items})
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = add_classification(li, dim, code_col="l_partkey", year_col=None)
    plan = plan_of(df)
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan


def test_dim_join_chain_broadcasts(spark, sf_dir):
    df = entry_mod.q_dim_join_chain(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_weighted_ecdf_single_exchange(spark, sf_dir):
    df = entry_mod.q_weighted_ecdf(spark, sf_dir)
    plan = plan_of(df)
    # one shuffle for the window partitioning; no extra exchanges
    assert plan.count("Exchange hashpartitioning") <= 1


def test_no_python_udf_in_core_queries(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        if name == "x10_multimodal_features":
            continue  # mapInPandas is the designed exception
        plan = plan_of(fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, f"{name} fell back to a Python UDF"
        assert "ArrowEvalPython" not in plan, f"{name} uses a pandas UDF unexpectedly"


def test_ivf_assignment_no_exchange(spark, sf_dir):
    """The IVF centroid assignment must be map-side: no hash-partitioned
    Exchange anywhere in the assigned-corpus plan (the only exchanges are
    the SinglePartition collect_list of the 16 centroids and its broadcast)."""
    from pyspark.sql import functions as F

    from hbsir_old_spark.functions.similarity import assign_nearest_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("__cid__"), F.col("embedding").alias("__cvec__")
    )
    cents = (
        emb.limit(8)
        .select(F.col("__cid__").alias("__centroid__"), F.col("__cvec__").alias("__centvec__"))
        .agg(F.collect_list(F.struct("__centroid__", "__centvec__")).alias("__cents__"))
    )
    assigned = assign_nearest_centroids(emb, "__cid__", "__cvec__", cents, keep=1)
    plan = plan_of(assigned)
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_ivf_assignment_matches_window_argmax(spark, sf_dir):
    """The map-side argmax must agree row-for-row with the old window
    formulation (sim desc, centroid asc tiebreak)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hbsir_old_spark.functions.similarity import (
        assign_nearest_centroids,
        cosine_similarity,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("__cid__"), F.col("embedding").alias("__cvec__")
    )
    centroids = emb.limit(8).select(
        F.col("__cid__").alias("__centroid__"), F.col("__cvec__").alias("__centvec__")
    )
    cents_arr = centroids.agg(
        F.collect_list(F.struct("__centroid__", "__centvec__")).alias("__cents__")
    )
    got = {
        (r["__cid__"], r["__centroid__"])
        for r in assign_nearest_centroids(emb, "__cid__", "__cvec__", cents_arr, keep=2).collect()
    }
    w = Window.partitionBy("__cid__").orderBy(F.col("__csim__").desc(), F.col("__centroid__"))
    want = {
        (r["__cid__"], r["__centroid__"])
        for r in (
            emb.join(F.broadcast(centroids))
            .withColumn("__csim__", cosine_similarity(F.col("__cvec__"), F.col("__centvec__")))
            .withColumn("__crank__", F.row_number().over(w))
            .filter(F.col("__crank__") <= 2)
            .collect()
        )
    }
    assert got == want


def test_groupby_has_partial_aggregation(spark, sf_dir):
    plan = plan_of(entry_mod.q_groupby_sum(spark, sf_dir))
    # map-side combine: HashAggregate appears before and after the exchange
    assert plan.count("HashAggregate") >= 2


def test_token_freq_prunes_to_text_and_partially_aggregates(spark, sf_dir):
    # x18: the scan must read ONLY text, and the count must partial-agg
    # before its Exchange (the shuffle carries (token, partial) rows)
    df = entry_mod.q_token_freq(spark, sf_dir)
    plan = plan_of(df)
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "text" in scan and "doc_id" not in scan and "lang" not in scan
    assert plan.index("partial_count") > plan.index("Exchange") > plan.index(
        "count("
    ), "partial aggregation must sit below (after, in bottom-up text) the Exchange"


def test_funnel_one_event_scan_per_step(spark, sf_dir):
    # s8 (r14): each funnel pass is ONE left join + conditional min-agg,
    # so the executed plan scans the event stream exactly once per step.
    # The pre-r14 shape consumed the per-user frame twice per pass and
    # re-executed step 1's aggregation ~2^(k-1) times (7 scans for the
    # 3-step gate). No eager materialization: the plan must stay lazy
    # (no RDD roots) — the linear chain makes checkpoints unnecessary.
    df = entry_mod.q_funnel(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("Scan parquet") == 3, plan
    assert "ExistingRDD" not in plan, plan


def test_group_quota_single_exchange(spark, sf_dir):
    # x17: the two-level salted selection spends its two hash Exchanges
    # on the (group, salt) and (group) ranking windows; the gate's final
    # agg rides the stage-2 partitioning (no third Exchange). A Spark
    # version that stops reusing that partitioning for the agg would
    # break this budget — loosen consciously if that happens.
    df = entry_mod.q_group_quota(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("Exchange hashpartitioning") <= 2


def test_weighted_breaks_single_sketch_pass(spark, sf_dir):
    # w4b: the GK probe grid feeds two broadcast joins; without the eager
    # localCheckpoint each embeds its own copy of the sketch subtree and
    # the dominant full-data pass runs twice (ReusedExchange is NOT
    # guaranteed — measured 0 on this shape). Pinned: the breaks plan
    # scans the fact exactly once (the histogram pass) and reads the
    # materialized grid as an RDD.
    from hbsir_old_spark.operators.quantile import weighted_approx_quantile_breaks

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    b = weighted_approx_quantile_breaks(
        li, "l_extendedprice", "l_quantity", bins=10, group_cols=("l_returnflag",)
    )
    plan = plan_of(b)
    assert plan.count("FileScan") == 1, plan
    assert "ExistingRDD" in plan, plan


def test_real_corpus_food_plan(spark, sf_dir):
    # l3: the real-corpus cleaning pipeline must stay a pure expression
    # layer — one pruned scan of lineitem (only the 5 consumed columns),
    # one hash aggregation, no join, no Python UDF. The year-resolved
    # category mapping compiles to a literal-map lookup, not a dim join.
    df = entry_mod.q_real_corpus_food(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("FileScan") == 1, plan
    assert "Join" not in plan and "BatchEvalPython" not in plan, plan
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "l_orderkey" not in scan, "ID is aggregated away; must be pruned"


def test_real_household_decode_plan(spark, sf_dir):
    # l4: attribute decode is year-branched integer arithmetic — one scan
    # of customer, no join against any mapping table, no UDF.
    df = entry_mod.q_real_household_decode(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("FileScan") == 1, plan
    assert "Join" not in plan and "BatchEvalPython" not in plan, plan


def test_repetition_filter_is_map_only(spark, sf_dir):
    # x25: the Gopher prefilter must stay a map-only pass — a
    # hash-partitioned Exchange or explode here would be a scale
    # regression for what should be an embarrassingly parallel scan. The
    # one allowed Exchange is ensure_min_partitions' ROUND-ROBIN spread
    # of the single-file local fixture scan (r14: the one-row-group
    # parquet otherwise serializes every per-row feature onto one core;
    # at real scale the scan has thousands of splits and the helper
    # no-ops, so the production plan carries zero Exchanges).
    df = entry_mod.q_repetition_filter(spark, sf_dir)
    plan = plan_of(df)
    assert "Exchange hashpartitioning" not in plan, plan
    assert plan.count("Exchange") <= 1, plan
    assert "Generate" not in plan  # no explode
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmeans_assign_is_map_side(spark, sf_dir):
    # the Lloyd assignment pass: broadcast single-row centroid array, no
    # shuffle of the data side, no Python
    from hbsir_old_spark.functions.clustering import kmeans_assign

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [[float(i == j) for j in range(64)] for i in range(4)]
    plan = plan_of(kmeans_assign(emb, cents))
    # the one-row centroid BroadcastExchange is the design; a shuffle of
    # the data side is the regression being guarded
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semantic_dedup_joins_on_cluster_not_cartesian(spark, sf_dir):
    # the pairwise check must be keyed on the cluster id; the only
    # nested-loop join allowed is the one-row centroid broadcast
    from hbsir_old_spark.functions.clustering import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [[float(i == j) for j in range(64)] for i in range(4)]
    plan = plan_of(semantic_dedup(emb, cents, threshold=0.9))
    assert "CartesianProduct" not in plan, plan
    assert "__kc__" in plan  # pair join keyed on the cluster column


def test_lm_scores_partial_agg_and_no_python(spark, sf_dir):
    # x30: bigram counting must partially aggregate (map-side combine
    # before the shuffle) and the whole score pipeline stays JVM-side
    df = entry_mod.q_lm_perplexity(spark, sf_dir)
    plan = plan_of(df)
    assert "partial_count" in plan or "partial" in plan.lower(), plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_is_hash_join_on_key(spark, sf_dir):
    # s6: the interval join must extract user_id as the hash-join key with
    # the time range as a join-side filter — a nested-loop join over the
    # range condition alone would be quadratic at corpus scale. Pushed
    # event_type filters must reach both scans.
    df = entry_mod.q_interval_join(spark, sf_dir)
    plan = plan_of(df)
    assert "HashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("event_type") >= 2  # filter pushed into both scans


def test_multi_year_food_unions_per_year_branches(spark, sf_dir):
    # l14: three per-era subplans, each a pure expression layer over its
    # lineitem slice — one Union, one scan per year branch, no join, no
    # Python UDF, and only one final aggregation exchange.
    df = entry_mod.q_multi_year_food(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("FileScan") == 3, plan
    assert "Union" in plan, plan
    assert "Join" not in plan and "BatchEvalPython" not in plan, plan


def test_full_span_food_scans_once_per_era_pair(spark, sf_dir):
    # l15: 39 years through the era-batched build with a load_years
    # loader — scans are per (spec-group x layout-era-frame) pair, NOT per
    # year: 8 here (the 1369-73 layout frame feeds three Price-variant
    # spec groups; 1383-1401 spans two layout frames) vs 39 per-year.
    # Every scan carries a disjoint year slice, so total data read stays
    # one corpus pass. The only join is the 1363-68 Duration
    # classification BROADCAST (dim side is a local relation); no shuffle
    # join, no Python UDF anywhere.
    df = entry_mod.q_full_span_food(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("FileScan") == 8, plan
    assert "Union" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_multi_year_partitioned_layout_prunes_by_year(spark, sf_dir, tmp_path):
    # the 100 TB layout: survey years live in Year=<y> partitions; a
    # per-year raw loader reading that layout must produce scans with a
    # partition filter so each branch touches ONLY its year's files.
    import pyspark.sql.functions as F

    src = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(2000)
    root = str(tmp_path / "food_years")
    src.select(
        (F.lit(1375) + (F.col("l_linenumber") % 3) * 19).alias("Year"),
        F.col("l_orderkey").alias("ADDRESS"),
        F.col("l_quantity").alias("COL4_5"),
    ).write.partitionBy("Year").mode("overwrite").parquet(root)
    branch = spark.read.parquet(root).filter(F.col("Year") == 1394).drop("Year")
    plan = plan_of(branch.select("ADDRESS", "COL4_5"))
    assert "PartitionFilters: [isnotnull(Year" in plan, plan
    assert "1394" in plan[plan.index("PartitionFilters") :].splitlines()[0], plan


def test_j10_broadcasts_dims_and_pushes_filters(spark, sf_dir):
    """The TPC-H Q5 shape must compile to a broadcast cascade: the
    region/nation dims broadcast (never shuffle the fact side on their
    keys), the r_name and o_orderdate filters reach the scans, and
    nothing degenerates into a cartesian product."""
    plan = plan_of(entry_mod.queries()["j10_local_supplier_revenue"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan
    # the filters must appear INSIDE a PushedFilters list (a post-scan
    # Filter node would also contain the predicate text — the earlier
    # substring-only check was satisfiable without any pushdown)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("EqualTo(r_name,ASIA)" in ln for ln in pushed), (
        "r_name filter did not reach the region scan's PushedFilters"
    )
    assert any("GreaterThanOrEqual(o_orderdate" in ln for ln in pushed), (
        "o_orderdate range did not reach the orders scan's PushedFilters"
    )


def test_x22b_bloom_probe_is_broadcast_and_map_side(spark, sf_dir):
    """The bloom ingest gate's shape: the filter rides to every task as
    ONE broadcast row (BroadcastNestedLoopJoin against the single-row
    bloom frame), the fingerprint verify is a (broadcast) hash anti join
    — never a sort-merge join — and no Python executes anywhere. The
    union-of-filters pattern re-reads the batch once per branch (misses /
    hits), which is map-only; the point at scale is that only the HIT
    sliver reaches the verify join's exchange."""
    plan = plan_of(entry_mod.queries()["x22b_bloom_dedup"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # the broadcast bloom row
    assert "LeftAnti" in plan  # the fingerprint verify
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan or "BuildRight, Cross" in plan


def test_x50_capstone_shuffles_only_agg_state(spark, sf_dir):
    """The multimodal capstone's 100 TB shape: Python stays confined to
    the four codec mapInPandas boundaries (two generator builders, the
    image resize, the audio decode); each leg PARTIALLY aggregates before
    its Exchange, and the resized pixel buffers are projected away into
    their sha2 fingerprint BEFORE the shuffle — only (key, agg-state)
    rows cross the wire, never image bytes. The doc_id pruning reaches
    both parquet scans."""
    plan = plan_of(entry_mod.q_multimodal_capstone(spark, sf_dir))
    assert plan.count("MapInPandas") == 4
    assert plan.count("Exchange") == 2  # one hash shuffle per leg
    assert "partial_min" in plan and "partial_sum" in plan
    # the Exchange inputs carry the fingerprint grouping expression, not
    # the pixel payload (sha2 computed map-side, pixels pruned)
    for seg in plan.split("Exchange hashpartitioning")[1:]:
        first_line = seg.splitlines()[0]
        assert "pixels" not in first_line and "content" not in first_line
    assert "LessThan(doc_id,200)" in plan  # pushed to both scans
    assert "EvalPython" not in plan  # no row-at-a-time Python anywhere


def test_resize_scale_probe_parallelizes_codec_stage(spark, sf_dir):
    """The bench throughput probe must not serialize the codec stage onto
    one task when the documents table is a single parquet file: an
    explicit round-robin repartition (ensure_min_partitions) sits below
    the asset-builder mapInPandas."""
    plan = plan_of(entry_mod.q_resize_scale_probe(spark, sf_dir))
    assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan
    assert plan.count("MapInPandas") == 2  # builder + resize only


def test_x51_near_dedup_pairs_band_join_not_cartesian(spark, sf_dir):
    """The perceptual image near-dedup's 100 TB shape: candidates come
    from an equi-join on (band, bh) — never an all-pairs cross join — and
    what shuffles is the (id, band, bh) signature table, never pixel
    buffers or PNG bytes. Python stays confined to the codec mapInPandas
    (decode + dHash); the pairing, popcount verify, and aggregation are
    JVM expressions."""
    from hbsir_old_spark.functions.multimodal import (
        image_dhash,
        image_near_dup_pairs,
    )

    assets = entry_mod._near_png_assets_from_docs(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .filter("doc_id < 120")
    )
    pairs = image_near_dup_pairs(image_dhash(assets), max_hamming=6)
    plan = plan_of(pairs)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "band" in plan and "bh" in plan  # the banded equi-join keys
    assert "EvalPython" not in plan  # popcount verify is bit_count, JVM-side
    for seg in plan.split("Exchange hashpartitioning")[1:]:
        first_line = seg.splitlines()[0]
        assert "pixels" not in first_line and "content" not in first_line


def test_x51x_scale_probe_parallelizes_codec_stage(spark, sf_dir):
    """The bench probe must not serialize the decode+dHash stage onto one
    task when the documents table is a single parquet file (the x48x
    guard applied to the near-dedup path). The codec stage is pinned
    PRE-checkpoint (image_near_dup_pairs eagerly materializes the hash
    table, so the probe's own executed plan starts from an ExistingRDD
    scan); the probe's full plan is pinned for join shape."""
    from hbsir_old_spark.functions.multimodal import image_dhash

    codec = plan_of(image_dhash(entry_mod._x51x_assets(spark, sf_dir)))
    assert "REPARTITION_BY_NUM" in codec or "RoundRobinPartitioning" in codec
    assert codec.count("MapInPandas") == 2  # asset builder + dHash only
    plan = plan_of(entry_mod.q_image_near_dedup_scale_probe(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan  # agg state reduced before the exchange
