"""Physical-plan quality gates — correctness isn't enough at 100 TB.

Asserts the plans we'd want on a 1000-executor cluster: filters pushed to
the parquet scan, columns pruned, small dims broadcast, top-N planned as
TakeOrderedAndProject (not a global sort), whole-stage codegen present.
"""

from __future__ import annotations

from featurestore_for_joycastle_java_spark import registry

registry.load_catalog()

from featurestore_for_joycastle_java_spark.registry import QUERIES

import contextlib
import io


def plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "filter_project_pushdown")
    assert "PushedFilters" in plan
    # both predicates pushed
    assert "l_quantity" in plan.split("PushedFilters")[1].split("\n")[0]
    assert "l_returnflag" in plan.split("PushedFilters")[1].split("\n")[0]


def test_column_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "filter_project_pushdown")
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    # only needed columns read: 3 projected + 2 filter cols
    for col in ["l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_returnflag"]:
        assert col in read_schema
    for col in ["l_partkey", "l_shipdate", "l_tax", "l_comment"]:
        assert col not in read_schema


def test_q5_broadcasts_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q5_revenue")
    assert "BroadcastHashJoin" in plan, "dims should broadcast, not shuffle"


def test_topn_avoids_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sort_limit_topn")
    assert "TakeOrderedAndProject" in plan


def test_ingest_stays_in_codegen(spark, sf_dir):
    # regex extract + filter + projection must all run inside whole-stage
    # codegen (no Python, no row-at-a-time eval)
    plan = plan_of(spark, sf_dir, "ingest_dwd")
    assert "codegen id" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_no_cartesian_in_joins(spark, sf_dir):
    # every equi-join query must plan hash/merge joins, never cartesian
    for name in ["tpch_q3_shipping", "tpch_q5_revenue", "join_left_outer", "join_semi", "join_anti"]:
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Two tables bucketed identically on the join key must join with no
    Exchange (shuffle) on either side — the co-located-join contract that
    saves the fact-table shuffle at 100 TB."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from featurestore_for_joycastle_java_spark.operators.relational import (
        write_bucketed,
    )
    from featurestore_for_joycastle_java_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, ["l_orderkey"])
    joined = (
        spark.table("b_orders")
        .join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # force the big-big strategy (tiny fixtures would broadcast and prove
    # nothing about the 100 TB shape)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        # no shuffle anywhere: bucketing satisfies the join distribution
        # AND the groupBy-on-bucket-key distribution
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # and the result matches the plain (shuffling) join
        expected = (
            orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, expected.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_scalable_rank_window_is_partitioned(spark, sf_dir):
    # the scale-safe rank twin must run its fact-table window hash-
    # partitioned on the range bucket; only the tiny frames (32 bucket
    # counts, 25 distinct nations) may see a SinglePartition window
    plan = plan_of(spark, sf_dir, "window_rank_scalable")
    assert "hashpartitioning(_bucket" in plan, (
        "fact-table row_number window should be partitioned by range bucket"
    )
    # offsets come back via broadcast, not another shuffle of the fact
    assert "BroadcastHashJoin" in plan


def test_partitioned_layout_prunes_partitions(spark, sf_dir, tmp_path):
    # the demux layout's whole point at 100 TB: a reader filtering on the
    # partition key must scan ONE directory, not the corpus — visible in
    # the plan as a partition filter with pruned input
    from featurestore_for_joycastle_java_spark.sources import load_table
    from pyspark.sql import functions as F

    out = str(tmp_path / "dwd")
    ev = load_table(spark, sf_dir, "events")
    ev.write.partitionBy("event_type").parquet(out)
    df = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    pf_line = plan.split("PartitionFilters")[1].split("\n")[0]
    assert "event_type" in pf_line
    # and the scan honors it: files read come only from the one partition
    n_purchase = ev.filter(F.col("event_type") == "purchase").count()
    assert df.count() == n_purchase


def test_srp_topk_candidates_from_bucket_join(spark, sf_dir):
    # the SRP plan must (a) broadcast the tiny hyperplane table into the
    # encode, and (b) generate candidates from an equi-join on the bucket
    # keys — never a cross/nested-loop product of corpus x queries
    plan = plan_of(spark, sf_dir, "sim_srp_topk")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "tbl" in plan and "code" in plan
    assert "CartesianProduct" not in plan


def test_simhash_md5_shuffle_carries_votes_not_tokens(spark, sf_dir):
    # the 60 per-bit votes must partial-aggregate BEFORE the exchange
    # (map-side combine): the groupBy(id) shuffle carries 60 longs per
    # doc, not the exploded token rows. partial_sum in the plan details
    # is the map-side combine; without it the exchange ships token rows.
    plan = plan_of(spark, sf_dir, "dedup_simhash_md5")
    assert "partial_sum" in plan, "vote sums must map-side combine"


def test_winnow_no_shuffle_before_fingerprint_index(spark, sf_dir):
    # fingerprint selection is per-row HOFs: the only SHUFFLE exchange in
    # the plan must sit above (run after) every Generate — node ids in
    # formatted explain are postorder, so upstream operators have LOWER
    # ids. BroadcastExchange is not a shuffle of the corpus and is exempt.
    import re as _re

    plan = plan_of(spark, sf_dir, "text_winnow_pairs")
    tree = plan.split("\n\n")[0]
    gen_ids = [int(m) for m in _re.findall(r"Generate \((\d+)\)", tree)]
    shuffle_ids = [
        int(m)
        for m in _re.findall(r"(?<!Broadcast)Exchange \((\d+)\)", tree)
    ]
    assert gen_ids, "fingerprint index must come from an explode"
    assert shuffle_ids, "the fp-pair groupBy must shuffle"
    assert max(gen_ids) < min(shuffle_ids), (
        f"a shuffle ran before the fingerprint index: {tree}"
    )
    assert "CartesianProduct" not in plan


def test_funnel_single_exchange(spark, sf_dir):
    """The three stacked funnel windows + the per-user rollup must share
    ONE hash partitioning on user_id: exactly one shuffle Exchange in the
    whole plan (the scan side), everything above it exchange-free."""
    import re as _re

    plan = plan_of(spark, sf_dir, "funnel_conversion")
    tree = plan.split("\n\n")[0]
    shuffles = _re.findall(r"(?<!Broadcast)Exchange \(\d+\)", tree)
    # one user_id exchange + the final single-partition gather for the
    # global one-row aggregate (touches pre-aggregated rows only)
    assert len(shuffles) <= 2, f"funnel should shuffle once on user_id: {tree}"
    assert plan.count("Window") >= 3, "three stacked window stages expected"


def test_asof_nearest_exchanges(spark, sf_dir):
    """Dual-direction (nearest) as-of: BOTH window fills share one
    exchange of the union (a third shuffle would mean the descending
    window re-exchanged it). Two exchanges total: the right-side
    tie-dedup lag (clicks only — the union output can't inherit a
    single branch's partitioning) and the union fill."""
    import re as _re

    plan = plan_of(spark, sf_dir, "asof_nearest_error_click")
    tree = plan.split("\n\n")[0]
    shuffles = _re.findall(r"(?<!Broadcast)Exchange \(\d+\)", tree)
    assert len(shuffles) == 2, (
        f"nearest as-of: right-dedup + one union fill exchange: {tree}"
    )


def test_zscore_stats_broadcast_no_fact_window(spark, sf_dir):
    """Anomaly z-scores must come from a broadcast of the 5-row stats
    frame onto the events scan — no Window over the fact table and no
    shuffle of the events side."""
    plan = plan_of(spark, sf_dir, "feature_anomaly_zscore")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan, "z-score must not window the fact table"


def test_morton_cluster_layout_properties(spark, sf_dir, tmp_path):
    """cluster_by_morton must produce (a) the roundtrip-exact row set,
    (b) range-disjoint partitions (each output file owns a contiguous
    morton slice), and (c) tight per-file 2-D locality — the properties
    file-skipping actually prunes on."""
    from pyspark.sql import functions as F

    from featurestore_for_joycastle_java_spark.operators.layout import (
        cluster_by_morton,
        morton_key,
    )
    from featurestore_for_joycastle_java_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    x, y = F.col("user_id"), F.floor(F.col("value") * 100).cast("long")
    out = str(tmp_path / "zordered")
    cluster_by_morton(
        ev.select("event_id", "user_id", "value"), x, y, bits=17
    ).write.parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()

    # per-file morton ranges must not overlap (range partitioning)
    stats = (
        back.withColumn(
            "m",
            morton_key(
                F.col("user_id"),
                F.floor(F.col("value") * 100).cast("long"),
                bits=17,
            ),
        )
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in stats)
    assert len(spans) > 1
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next, f"overlapping morton ranges: {spans}"


def test_pit_assembly_single_exchange(spark, sf_dir):
    """feature_training_set_pit: the THREE as-of fills must share ONE
    exchange + ONE Window over the union (the multi_asof_join contract)
    — 4 shuffles total (3 per-feature windows + 1 assembly), never a
    per-feature join chain that re-shuffles the spine."""
    import re as _re

    plan = plan_of(spark, sf_dir, "feature_training_set_pit")
    tree = plan.split("\n\n")[0]
    shuffles = _re.findall(r"(?<!Broadcast)Exchange \((\d+)\)", tree)
    windows = [int(m) for m in _re.findall(r"Window \((\d+)\)", tree)]
    unions = [int(m) for m in _re.findall(r"Union \((\d+)\)", tree)]
    assert len(shuffles) == 4, f"3 feature + 1 assembly exchange: {tree}"
    assert len(unions) == 1
    # node ids are postorder: exactly ONE Window sits above the union —
    # all three fills fused into it
    assert sum(1 for w in windows if w > unions[0]) == 1, tree


def test_salted_distinct_two_stage(spark, sf_dir):
    """agg_salted_distinct: stage 1 must shuffle on (event_type, salt) —
    the 64x fan-out that breaks a hot group key — with stage 2 merging
    per-salt partials."""
    import re as _re

    plan = plan_of(spark, sf_dir, "agg_salted_distinct")
    # dedup phase spreads on (type, salt, user); the per-salt distinct
    # count then shuffles on (type, salt) — one row per distinct user,
    # split 64 ways — and only 64 pre-counted rows/type reach the final
    # (type) exchange (the alias compiles to _groupingexpression)
    assert _re.search(
        r"hashpartitioning\(event_type#\d+, _groupingexpression#\d+, user_id",
        plan,
    ), "dedup exchange must carry (type, salt, user)"
    assert _re.search(
        r"hashpartitioning\(event_type#\d+, _groupingexpression#\d+, \d+\)",
        plan,
    ), "per-salt count exchange must carry (type, salt)"


def test_scd2_apply_closed_rows_never_window(spark, sf_dir):
    """feature_scd2_apply: the rebuild windows run over (open rows ∪
    batch) only; closed history is a filter pass-through that unions in
    ABOVE every Window (postorder ids: every Window node sits below the
    final Union)."""
    import re as _re

    plan = plan_of(spark, sf_dir, "feature_scd2_apply")
    tree = plan.split("\n\n")[0]
    unions = [int(m) for m in _re.findall(r"Union \((\d+)\)", tree)]
    windows = [int(m) for m in _re.findall(r"Window \((\d+)\)", tree)]
    assert unions and windows
    assert all(w < max(unions) for w in windows), (
        f"closed rows must bypass the rebuild windows: {tree}"
    )
