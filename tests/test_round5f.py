"""Round-5f operator tests: k-fold partition/leakage invariants,
association-rule bounds, link-prediction non-adjacency, min-max range
endpoints, confusion-matrix totals, and the mapInArrow door checked
against the fixture's own n_chars column plus a plan gate.

(Cross-engine value parity for every round5f query is covered by
tests/test_oracle_parity.py via registry parametrization.)
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark import registry

registry.load_catalog()

from featurestore_for_joycastle_java_spark.operators.graphs import (
    cosupply_edges,
)
from featurestore_for_joycastle_java_spark.registry import QUERIES
from featurestore_for_joycastle_java_spark.sources import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# -------------------------------------------------------------- training


def test_kfold_partitions_users_and_events(spark, sf_dir):
    rows = QUERIES["train_kfold_assign"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r["n_users"] for r in rows) == (
        ev.select("user_id").distinct().count()
    )
    assert sum(r["n_events"] for r in rows) == ev.count()
    assert {r["fold"] for r in rows} <= set(range(5))


def test_kfold_is_group_level(spark, sf_dir):
    """No user may straddle folds: recomputing the fold per EVENT and
    counting distinct folds per user must give exactly 1 everywhere."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 5
        ).alias("fold"),
    )
    bad = (
        ev.groupBy("user_id")
        .agg(F.countDistinct("fold").alias("nf"))
        .filter(F.col("nf") > 1)
        .count()
    )
    assert bad == 0


# ------------------------------------------------------------ assoc rules


def test_assoc_bounds(spark, sf_dir):
    rows = QUERIES["assoc_basket_lift"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["co"] >= 5
        assert r["tok_a"] < r["tok_b"]
        # confidence >= support (cnt_a <= n_docs), both in [0, 1e6]
        assert 0 <= r["support_ppm"] <= r["conf_ab_ppm"] <= 1_000_000
        assert 0 <= r["conf_ba_ppm"] <= 1_000_000
        assert r["lift_ppm"] > 0


def test_assoc_co_bounded_by_marginals(spark, sf_dir):
    t = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    cnt = {r["tok"]: r["c"] for r in t.groupBy("tok").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    for r in QUERIES["assoc_basket_lift"](spark, sf_dir).collect():
        assert r["co"] <= min(cnt[r["tok_a"]], cnt[r["tok_b"]])


# ----------------------------------------------------------------- graph


def test_linkpred_pairs_not_adjacent(spark, sf_dir):
    rows = QUERIES["graph_link_common_neighbors"](spark, sf_dir).collect()
    assert rows
    edges = {
        (r["u"], r["v"]) for r in cosupply_edges(spark, sf_dir).collect()
    }
    for r in rows:
        assert (r["u"], r["v"]) not in edges
        assert r["u"] < r["v"]
        assert r["cn"] >= 1
        assert 0 < r["jaccard_ppm"] <= 1_000_000
    cns = [r["cn"] for r in rows]
    assert cns == sorted(cns, reverse=True)


# -------------------------------------------------------------- features


def test_minmax_endpoints(spark, sf_dir):
    df = QUERIES["feature_minmax_scale"](spark, sf_dir)
    stats = df.groupBy("event_type").agg(
        F.min("scaled_ppm").alias("lo"), F.max("scaled_ppm").alias("hi")
    )
    for r in stats.collect():
        assert r["lo"] == 0
        assert r["hi"] == 1_000_000


def test_minmax_no_fact_shuffle_join(spark, sf_dir):
    """The stats attach must be a broadcast join — a SortMergeJoin here
    would shuffle the whole fact table for a |types|-row dim."""
    plan = _plan(QUERIES["feature_minmax_scale"](spark, sf_dir))
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------------------ eval


def test_confusion_totals(spark, sf_dir):
    r = QUERIES["eval_confusion_threshold"](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
    tp = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") >= 245.0)
    ).count()
    assert r["tp"] == tp
    assert 0 <= r["precision_ppm"] <= 1_000_000
    assert 0 <= r["recall_ppm"] <= 1_000_000
    assert 0 <= r["f1_ppm"] <= 1_000_000


# ------------------------------------------------------------- UDF doors


def test_arrow_map_matches_fixture_columns(spark, sf_dir):
    """The fixture generator sets n_chars = length(text), so the Arrow
    door's n_chars_udf must reproduce the stored column exactly."""
    got = QUERIES["udf_arrow_map"](spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    bad = (
        got.join(src, "doc_id")
        .filter(F.col("n_chars_udf") != F.col("n_chars"))
        .count()
    )
    assert bad == 0


def test_arrow_map_plan_is_arrow_not_row_python(spark, sf_dir):
    plan = _plan(QUERIES["udf_arrow_map"](spark, sf_dir))
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan or "PythonMapInArrow" in plan
    assert "BatchEvalPython" not in plan
