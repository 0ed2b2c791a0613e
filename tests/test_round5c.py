"""Round-5c operator tests: Bloom prune properties + plan gates, the
lateral-alias regression pin, and sliding-distinct bounds.

(Cross-engine value parity for every round5c query is covered by
tests/test_oracle_parity.py via registry parametrization.)
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark import registry

registry.load_catalog()

from featurestore_for_joycastle_java_spark.operators.bloom import (
    bloom_build,
    bloom_prune,
)
from featurestore_for_joycastle_java_spark.registry import QUERIES


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bloom_no_false_negatives(spark, sf_dir):
    """Every true join key must survive the prune — false negatives would
    silently drop rows from the downstream exact join."""
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pruned = bloom_prune(orders, cust, "o_custkey", "c_custkey")
    exact = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_semi"
    )
    # pruned ⊇ exact: the anti join of exact against pruned is empty
    missing = exact.join(
        pruned.select("o_orderkey"), "o_orderkey", "left_anti"
    ).count()
    assert missing == 0


def test_bloom_actually_prunes(spark, sf_dir):
    """The filter must reject a meaningful share of non-matching rows —
    otherwise it's pure overhead (k=3 at 16 KiB over a few hundred keys
    should sit near its analytic false-positive rate, far under 50%)."""
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    total = orders.count()
    kept = bloom_prune(orders, cust, "o_custkey", "c_custkey").count()
    exact = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_semi"
    ).count()
    assert exact <= kept <= total
    false_pos = kept - exact
    non_matching = total - exact
    if non_matching:
        assert false_pos / non_matching < 0.05, (
            f"bloom fp rate {false_pos}/{non_matching} way past design"
        )


def test_bloom_build_is_one_row_bitmap(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey"
    )
    b = bloom_build(cust, "c_custkey")
    rows = b.collect()
    assert len(rows) == 1
    bitmap = rows[0]["__bloom__"]
    assert 0 < len(bitmap) <= (1 << 17) // 64


def test_bloom_prune_plan_broadcasts_and_stays_jvm(spark, sf_dir):
    plan = _plan(QUERIES["join_bloom_prune"](spark, sf_dir))
    assert "BatchEvalPython" not in plan, "probe must stay JVM-side"
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the dim side of the exact join broadcasts too
    assert "BroadcastHashJoin" in plan


def test_sliding_distinct_blowup_bounded(spark, sf_dir):
    """The explode stage must emit exactly 7 rows per distinct (user,
    day) pair — the property that keeps the rewrite scale-safe."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    n_pairs = du.count()
    exploded = du.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6)))
    ).count()
    assert exploded == 7 * n_pairs


def test_int8_quantize_rounds_against_raw_scale(spark, sf_dir):
    """Regression pin for the lateral-column-alias hazard: max_err must
    always be ≤ scale/2 + tiny (errors against the RAW scale; quantizing
    against a rounded scale pushes some errors past the half-step)."""
    rows = QUERIES["sim_int8_quantize"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # both sides are rounded to 6dp on output → ±5e-7 slop each
        assert r["max_err"] <= r["scale"] / 2 + 1.1e-6, (
            f"vec {r['vec_id']}: err {r['max_err']} > half-step of "
            f"{r['scale']}"
        )
        assert r["n_sat"] >= 1  # the max-abs component always saturates


def test_mode_per_group_stays_aggregation(spark, sf_dir):
    """Pure-aggregation mode: no Window operator anywhere (a rank-filter
    rewrite would sort without partial aggregation); both shuffles carry
    map-side-combined partials, so ≤2 exchanges and every aggregate has
    a partial_ stage."""
    plan = _plan(QUERIES["agg_mode_per_group"](spark, sf_dir))
    assert "Window" not in plan
    # tree occurrences only ("Exchange (n)"); details repeat each node
    assert plan.count("Exchange (") <= 2
    assert "partial_min" in plan and "partial_count" in plan


def test_lateral_topn_decorrelates(spark, sf_dir):
    """Spark must rewrite the correlated LATERAL top-2 into a ranked
    window under a join — never a per-outer-row re-scan (cartesian)."""
    plan = _plan(QUERIES["join_lateral_topn"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_pagerank_deterministic_across_widths(spark, sf_dir):
    """Integer PageRank must be bit-identical under different shuffle
    widths — the property float PageRank lacks."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        a = sorted(
            map(tuple, QUERIES["graph_pagerank_int"](spark, sf_dir).collect())
        )
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = sorted(
            map(tuple, QUERIES["graph_pagerank_int"](spark, sf_dir).collect())
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_bitmap_distinct_matches_countdistinct(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {
        r["event_type"]: (r["n_users"], r["n_words"])
        for r in QUERIES["agg_bitmap_exact_distinct"](spark, sf_dir).collect()
    }
    assert set(got) == set(exact)
    for t, (n_users, n_words) in got.items():
        assert n_users == exact[t]
        assert n_words <= n_users  # compression, never inflation


def test_mad_ignores_single_extreme(spark):
    """Median/MAD must not move when ONE extreme value is injected —
    the robustness property that motivates MAD over z-score."""
    base = [(i, float(v)) for i, v in enumerate([10, 11, 12, 13, 14] * 5)]
    clean = spark.createDataFrame(base, "event_id long, value double")
    dirty = clean.union(
        spark.createDataFrame([(99, 1e9)], "event_id long, value double")
    )

    def med_mad(df):
        v6 = F.floor(F.col("value") * F.lit(1e6)).cast("bigint")
        m = df.select(v6.alias("v6")).agg(
            F.percentile("v6", F.lit(0.5)).alias("med6")
        )
        med6 = m.collect()[0]["med6"]
        mad6 = (
            df.select(F.abs(v6 - F.lit(med6)).alias("dev6"))
            .agg(F.percentile("dev6", F.lit(0.5)).alias("mad6"))
            .collect()[0]["mad6"]
        )
        return med6, mad6

    med_c, mad_c = med_mad(clean)
    med_d, mad_d = med_mad(dirty)
    assert med_c == med_d == 12_000_000.0
    assert mad_c == mad_d == 1_000_000.0
    # and the planted point is exactly the one past 3*1.4826*MAD
    assert abs(1e9 * 1e6 - med_d) > 4.4478 * mad_d


def test_target_encoding_broadcasts_stats(spark, sf_dir):
    """LOO encoding must ride a broadcast of the tiny category-stats
    frame — no window over the rows, no shuffle join."""
    plan = _plan(QUERIES["feature_target_encoding"](spark, sf_dir))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_null_safe_join_is_hash_join(spark, sf_dir):
    """eqNullSafe must still plan as a hash join (the coalesced-key
    rewrite), never a nested-loop scan."""
    plan = _plan(QUERIES["join_null_safe_eq"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_auc_combines_before_distinct_frame_window(spark, sf_dir):
    """The fact table must collapse via partial aggregation BEFORE the
    cumulative window (which then sees only the distinct-score frame)."""
    plan = _plan(QUERIES["eval_feature_auc"](spark, sf_dir))
    assert "partial_sum" in plan or "partial_count" in plan
    assert "Window" in plan


def test_corr_single_aggregation_pass(spark, sf_dir):
    """All five moment sums in ONE aggregate over one scan — no window,
    no join, no second exchange."""
    plan = _plan(QUERIES["eval_feature_corr"](spark, sf_dir))
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange (") <= 1


def test_transitions_single_user_partition_window(spark, sf_dir):
    plan = _plan(QUERIES["feature_event_transitions"](spark, sf_dir))
    # the per-user lead window partitions by user_id — never a global
    # (empty-partition) window over the fact table
    assert "Window" in plan
    assert "partitionBy=[]" not in plan.replace(" ", "")
