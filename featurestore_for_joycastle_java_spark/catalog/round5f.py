"""Round-5 fourth-continuation additions (registered below the driver
window, after ``round5e``) — driver rows due in the r6 rotation; until
then covered by tests/test_oracle_parity.py and the SIM sweeps.

Gap analysis behind the picks (SURVEY §2 delta after round5e):

- ``train_kfold_assign``: GROUP k-fold cross-validation assignment —
  folds keyed on the ENTITY (user), not the row, so no user's events
  straddle folds (the leakage mode plain row-hashing k-fold has).
- ``assoc_basket_lift``: association-rule mining (support /
  confidence / lift) over document token baskets — the market-basket
  read, a-priori pruned, in exact integer ppm.
- ``graph_link_common_neighbors``: common-neighbor / Jaccard link
  prediction on the co-supply graph — the third graph read beside
  PageRank / CC / triangles, sharing `operators/graphs.py`.
- ``feature_minmax_scale``: per-type min-max scaling to integer ppm —
  completes the scaler family (z-score exists, robust-MAD exists).
- ``eval_confusion_threshold``: thresholded confusion matrix +
  precision/recall/F1 in integer ppm — the operating-point companion
  to AUC (threshold-free ranking) and calibration (probability).
- ``udf_arrow_map``: `mapInArrow` door — the zero-copy Arrow
  batch-transform API (the fourth Python-execution surface beside
  pandas scalar UDF, grouped-agg UDF, and Arrow UDTF), verified
  against a pure-SQL oracle of the same arithmetic.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.operators.graphs import (
    cosupply_edges,
    degrees,
)
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


# -------------------------------------------------------------- training


@query(
    "train_kfold_assign",
    # Fold = md5(user_id) first-8-hex mod 5 (the repo's cross-engine
    # hash pattern) — deterministic, reproducible, and GROUP-level:
    # every event of a user lands in the same fold by construction.
    oracle="""
WITH f AS (
    SELECT user_id,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 5 AS fold
    FROM (SELECT DISTINCT user_id FROM events)),
e AS (
    SELECT e.user_id, f.fold,
           CAST(FLOOR(e.value * 1000000.0) AS BIGINT) AS vm,
           CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events e JOIN f USING (user_id))
SELECT fold,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(vm) AS BIGINT) AS sum_value_micro,
       CAST(SUM(pos) * 1000000 // COUNT(*) AS BIGINT) AS pos_ppm
FROM e GROUP BY 1
""",
)
def train_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP 5-fold cross-validation assignment: the fold is a
    deterministic hash of the USER, so all of a user's events share a
    fold — row-level fold hashing leaks user-specific signal from
    train folds into the validation fold (the same user on both
    sides), which this construction rules out. Output is the per-fold
    balance sheet (users, events, value mass, positive ppm) a CV
    harness checks before trusting fold symmetry.

    Scale shape: fold derives from a hash of the join key itself, so
    the event→fold attach is a broadcast of the user-dim frame (or at
    extreme user cardinality, recomputing md5 per event row — shown
    here as the dim join because real feature stores carry more
    per-user state than the hash); one map-side-combined groupBy to 5
    rows."""
    users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
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
    )
    e = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.floor(F.col("value") * F.lit(1e6)).cast("bigint").alias("vm"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("pos"),
        )
        .join(F.broadcast(users), "user_id")
    )
    return e.groupBy("fold").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("vm").cast("bigint").alias("sum_value_micro"),
        F.expr("sum(pos) * 1000000 DIV count(1)")
        .cast("bigint")
        .alias("pos_ppm"),
    )


# ------------------------------------------------------------ assoc rules


@query(
    "assoc_basket_lift",
    # Integer-ppm association metrics: support = co/n_docs, confidence
    # = co/cnt_a, lift = (co·n)/(cnt_a·cnt_b) — all as ·1e6 floor
    # divisions of exact counts. minsup co >= 5 bounds the output.
    oracle="""
WITH t AS (
    SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
    FROM documents),
c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY 1),
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM t),
co AS (
    SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(COUNT(*) AS BIGINT) AS co
    FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.tok < b.tok
    GROUP BY 1, 2 HAVING COUNT(*) >= 5)
SELECT co.tok_a, co.tok_b, co.co,
       CAST(co.co * 1000000 // n.n_docs AS BIGINT) AS support_ppm,
       CAST(co.co * 1000000 // ca.cnt AS BIGINT) AS conf_ab_ppm,
       CAST(co.co * 1000000 // cb.cnt AS BIGINT) AS conf_ba_ppm,
       CAST(CAST(co.co AS HUGEINT) * n.n_docs * 1000000
            // (CAST(ca.cnt AS HUGEINT) * cb.cnt) AS BIGINT) AS lift_ppm
FROM co
JOIN c ca ON ca.tok = co.tok_a
JOIN c cb ON cb.tok = co.tok_b
CROSS JOIN n
""",
)
def assoc_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over document token baskets: support,
    directed confidences, and lift for every token pair co-occurring
    in ≥ 5 documents — the market-basket / cross-sell read (Agrawal &
    Srikant, VLDB 1994), in exact integer ppm (lift = co·n/(ca·cb)
    as a single floor division of exact counts — no float ratios).

    Scale shape: baskets dedup to distinct (doc, token) first; pair
    enumeration is a PER-DOC self-join (shuffle on doc_id, Σ per-doc
    t² — bounded by the longest basket, never corpus-quadratic), then
    one map-side-combined groupBy to the pair frame, which the
    vocabulary bounds at |V|²/2 regardless of corpus size. The
    a-priori minsup prune (HAVING co ≥ 5) applies at that aggregate.
    Token-count and n_docs frames are Zipf-small → broadcast. The
    distinct basket frame feeds four branches (counts, n_docs, both
    sides of the pair join); ReuseExchange shares the distinct's
    shuffle across them at runtime (measured equal with an explicit
    cache — omitted to keep the plan barrier-free)."""
    t = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    c = t.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    n = t.agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
    a, b = t.alias("a"), t.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(
            F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
        .filter(F.col("co") >= 5)
    )
    ca = c.select(F.col("tok").alias("tok_a"), F.col("cnt").alias("ca"))
    cb = c.select(F.col("tok").alias("tok_b"), F.col("cnt").alias("cb"))
    return (
        co.join(F.broadcast(ca), "tok_a")
        .join(F.broadcast(cb), "tok_b")
        .crossJoin(F.broadcast(n))
        .select(
            "tok_a",
            "tok_b",
            "co",
            F.expr("co * 1000000 DIV n_docs").cast("bigint").alias(
                "support_ppm"
            ),
            F.expr("co * 1000000 DIV ca").cast("bigint").alias("conf_ab_ppm"),
            F.expr("co * 1000000 DIV cb").cast("bigint").alias("conf_ba_ppm"),
            # co·n·10⁶ wraps int64 once n_docs ≳ 3×10⁶ (co ≤ n), so the
            # lift product runs in decimal(38,0)/HUGEINT — the
            # ts_autoperiod escalation pattern (r11 overflow audit)
            F.expr(
                "CAST(co AS DECIMAL(19,0)) * n_docs * 1000000"
                " DIV (CAST(ca AS DECIMAL(19,0)) * cb)"
            )
            .cast("bigint")
            .alias("lift_ppm"),
        )
    )


# ----------------------------------------------------------------- graph


@query(
    "graph_link_common_neighbors",
    # Declarative oracle: wedge-centered common-neighbor counts for
    # non-adjacent pairs, Jaccard in integer ppm, deterministic top-50
    # by (cn DESC, u, v).
    oracle="""
WITH bip AS (
    SELECT DISTINCT l_partkey AS p, l_suppkey AS s
    FROM lineitem WHERE l_quantity >= 49.0),
e AS (
    SELECT DISTINCT a.s AS u, b.s AS v
    FROM bip a JOIN bip b ON a.p = b.p AND a.s < b.s),
adj AS (
    SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
cn AS (
    SELECT a.y AS u, b.y AS v, CAST(COUNT(*) AS BIGINT) AS cn
    FROM adj a JOIN adj b ON a.x = b.x AND a.y < b.y
    GROUP BY 1, 2),
nonedge AS (
    SELECT cn.u, cn.v, cn.cn
    FROM cn LEFT JOIN e ON e.u = cn.u AND e.v = cn.v
    WHERE e.u IS NULL)
SELECT ne.u, ne.v, ne.cn,
       CAST(ne.cn * 1000000 // (du.d + dv.d - ne.cn) AS BIGINT)
           AS jaccard_ppm
FROM nonedge ne
JOIN deg du ON du.x = ne.u
JOIN deg dv ON dv.x = ne.v
ORDER BY ne.cn DESC, ne.u ASC, ne.v ASC
LIMIT 50
""",
)
def graph_link_common_neighbors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Link prediction on the co-supply graph: the 50 NON-adjacent
    supplier pairs with the most common neighbors (plus neighborhood
    Jaccard in ppm) — "these two suppliers ship alongside the same
    partners but never co-supply; they are the likeliest next edge"
    (Liben-Nowell & Kleinberg, CIKM 2003). Complements PageRank
    (centrality), CC (reachability), triangles (density).

    Scale shape: candidate pairs come from the WEDGE join (common
    neighbor = wedge center), so only pairs at distance 2 are ever
    materialized — never the quadratic non-edge set; the Σ deg² wedge
    cost is the same bound as triangle counting. Anti-join against
    the edge list removes adjacent pairs; degree frame broadcasts;
    final top-50 is a TakeOrderedAndProject with a total-order
    tiebreak.

    Plan note (measured, sf0.1): the edge list feeds four branches
    (adj ×2 via the union, the anti-join, degrees); the static plan
    repeats the subtree but ReuseExchange deduplicates at runtime —
    1.5 s as-is vs 2.8 s with `.cache()` (materialization barrier >
    reuse savings; cache rejected on measurement)."""
    e = cosupply_edges(spark, sf_dir)
    adj = e.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    ).unionAll(e.select(F.col("v").alias("x"), F.col("u").alias("y")))
    a, b = adj.alias("a"), adj.alias("b")
    cn = (
        a.join(
            b,
            (F.col("a.x") == F.col("b.x")) & (F.col("a.y") < F.col("b.y")),
        )
        .groupBy(F.col("a.y").alias("u"), F.col("b.y").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cn"))
    )
    nonedge = cn.join(e, ["u", "v"], "left_anti")
    deg = degrees(e)
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    return (
        nonedge.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            "u",
            "v",
            "cn",
            F.expr("cn * 1000000 DIV (du + dv - cn)")
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
        .orderBy(F.col("cn").desc(), F.col("u").asc(), F.col("v").asc())
        .limit(50)
    )


# -------------------------------------------------------------- features


@query(
    "feature_minmax_scale",
    # scaled_ppm = (x - min)·1e6 DIV (max - min) — exact integer
    # micro-units in, integer ppm out; degenerate (max == min) group
    # scales to 0 explicitly on both engines.
    oracle="""
WITH e AS (
    SELECT event_id, event_type,
           CAST(FLOOR(value * 1000000.0) AS BIGINT) AS vm
    FROM events),
s AS (
    SELECT event_type, MIN(vm) AS lo, MAX(vm) AS hi
    FROM e GROUP BY 1)
SELECT e.event_id, e.event_type,
       CAST(CASE WHEN s.hi = s.lo THEN 0
            ELSE (e.vm - s.lo) * 1000000 // (s.hi - s.lo) END AS BIGINT)
           AS scaled_ppm
FROM e JOIN s USING (event_type)
""",
)
def feature_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type min-max scaling of event values to integer ppm —
    completing the scaler family (z-score = variance-normalized,
    MAD = robust, min-max = bounded [0, 1] for models that need a
    fixed input range). Exact: micro-unit integers in, ppm floors
    out; a degenerate group (max = min) scales to 0 rather than
    dividing by zero.

    Scale shape: the stats frame is one map-side-combined groupBy to
    |types| rows, broadcast back onto the fact — one fact pass, no
    fact shuffle at all (the groupBy reduces map-side; the join is
    broadcast)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * F.lit(1e6)).cast("bigint").alias("vm"),
    )
    s = e.groupBy("event_type").agg(
        F.min("vm").alias("lo"), F.max("vm").alias("hi")
    )
    return e.join(F.broadcast(s), "event_type").select(
        "event_id",
        "event_type",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(F.expr("(vm - lo) * 1000000 DIV (hi - lo)"))
        .cast("bigint")
        .alias("scaled_ppm"),
    )


# ------------------------------------------------------------------ eval


@query(
    "eval_confusion_threshold",
    # Confusion counts are exact integers; precision/recall/F1 are
    # single ppm floor divisions of those counts (F1 simplifies to
    # 2·tp·1e6 DIV (2·tp + fp + fn) — no float intermediate).
    oracle="""
WITH e AS (
    SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
           CASE WHEN value >= 245.0 THEN 1 ELSE 0 END AS yhat
    FROM events),
m AS (
    SELECT CAST(SUM(y * yhat) AS BIGINT) AS tp,
           CAST(SUM((1 - y) * yhat) AS BIGINT) AS fp,
           CAST(SUM(y * (1 - yhat)) AS BIGINT) AS fn,
           CAST(SUM((1 - y) * (1 - yhat)) AS BIGINT) AS tn
    FROM e)
SELECT tp, fp, fn, tn,
       CAST(tp * 1000000 // (tp + fp) AS BIGINT) AS precision_ppm,
       CAST(tp * 1000000 // (tp + fn) AS BIGINT) AS recall_ppm,
       CAST(2 * tp * 1000000 // (2 * tp + fp + fn) AS BIGINT) AS f1_ppm
FROM m
""",
)
def eval_confusion_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix and precision/recall/F1 at a fixed operating
    point (score = event value, threshold 245.0, label = purchase) —
    the deployment-side companion to AUC: AUC says the score RANKS
    well, this says what the chosen cutoff actually does. Counts are
    exact integers from one map-side-combined pass; the three metrics
    are single ppm floor divisions (F1 computed as 2tp/(2tp+fp+fn),
    never from float precision/recall intermediates).

    Scale shape: one fact pass to a 1-row frame; nothing else."""
    e = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.when(F.col("value") >= 245.0, 1).otherwise(0).alias("yhat"),
    )
    m = e.agg(
        F.sum(F.col("y") * F.col("yhat")).cast("bigint").alias("tp"),
        F.sum((1 - F.col("y")) * F.col("yhat")).cast("bigint").alias("fp"),
        F.sum(F.col("y") * (1 - F.col("yhat"))).cast("bigint").alias("fn"),
        F.sum((1 - F.col("y")) * (1 - F.col("yhat")))
        .cast("bigint")
        .alias("tn"),
    )
    return m.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr("tp * 1000000 DIV (tp + fp)").cast("bigint").alias(
            "precision_ppm"
        ),
        F.expr("tp * 1000000 DIV (tp + fn)").cast("bigint").alias(
            "recall_ppm"
        ),
        F.expr("2 * tp * 1000000 DIV (2 * tp + fp + fn)")
        .cast("bigint")
        .alias("f1_ppm"),
    )


# ------------------------------------------------------------- UDF doors


@query(
    "udf_arrow_map",
    # The oracle replays the same arithmetic in pure SQL: char length
    # and the split-token count via length-difference — exact integers,
    # so the Arrow path's results are bit-checkable.
    oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_udf,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
           AS n_words_udf
FROM documents
""",
)
def udf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInArrow` door: per-document character and word counts
    computed in Python over zero-copy Arrow record batches — the
    fourth Python-execution surface (pandas scalar UDF, grouped-agg
    UDF, Arrow UDTF, and now raw-Arrow batch map), for transforms that
    want columnar batch access without a pandas conversion (pandas
    copies strings into Python objects; `pyarrow.compute` kernels stay
    in Arrow buffers end-to-end).

    The batch function is a pure function of its batch (no state, no
    ordering assumption), so partitioning and batch sizing are free to
    vary — the contract that makes the operator embarrassingly
    parallel at any scale. Results are verified bit-exactly against a
    pure-SQL replay, pinning the Arrow path's semantics (UTF-8 char
    length, separator-count word arithmetic) to the engine's."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in it:
            text = rb.column(rb.schema.get_field_index("text"))
            n_chars = pc.cast(pc.utf8_length(text), pa.int64())
            n_words = pc.cast(
                pc.add(pc.count_substring(text, pattern=" "), 1), pa.int64()
            )
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(rb.schema.get_field_index("doc_id")),
                    n_chars,
                    n_words,
                ],
                names=["doc_id", "n_chars_udf", "n_words_udf"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        batches, "doc_id long, n_chars_udf long, n_words_udf long"
    )
