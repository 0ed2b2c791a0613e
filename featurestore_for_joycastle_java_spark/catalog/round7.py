"""Round-7 additions (VERDICT r6 asks #6-#8): incremental corpus dedup
(new-batch MinHash probe against persisted signatures), streaming
point-in-time enrichment (foreachBatch + multi_asof_join over the
versioned SCD1 dimension sink), and SemDeDup-style embedding-cluster
dedup.

All three are composites of existing operators — the point is the
WORKFLOW each one pins: ingestion-time dedup that never rescans the
corpus, a continuously-maintained dimension consumed leakage-free by a
second stream, and cluster-then-prune semantic dedup whose candidate
count is Σm² instead of n².
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark import streaming as ST
from featurestore_for_joycastle_java_spark.operators import dedup as D
from featurestore_for_joycastle_java_spark.operators.asof import multi_asof_join
from featurestore_for_joycastle_java_spark.operators.similarity import (
    semdedup_survivors,
)
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table

# Shingle CTE shared with catalog/dedup.py's oracles (3-token shingles,
# distinct, docs with >= 3 tokens).
_SHINGLES = """
t AS (
    SELECT doc_id,
           list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
    FROM documents),
s AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, len(toks) - 1),
               i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS sh
    FROM t WHERE len(toks) >= 3)
"""

_SH_DIST = """ROUND(1.0 - CAST(LEN(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / (LEN(a.sh) + LEN(b.sh) - LEN(list_intersect(a.sh, b.sh))), 6)"""

#: sf_dir -> persisted base-corpus signature parquet path (one write per
#: process, atexit-cleaned — the "signatures live in storage" half of the
#: incremental workflow).
_SIG_SCRATCH: dict[str, str] = {}

#: sf_dir -> (dim_dir, out_dir) for the PIT-enrich composite (the dim
#: maintenance + enrichment drains run once per process; atexit-cleaned).
_PIT_SCRATCH: dict[str, tuple[str, str]] = {}

#: sf_dir -> persisted corpus fingerprint-index parquet path (the exact-
#: dedup twin of _SIG_SCRATCH; one write per process, atexit-cleaned).
_FP_SCRATCH: dict[str, str] = {}

# Cross-engine content fingerprint (catalog/dedup.py's _FP).
_FP = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"




@query(
    "stream_pit_enrich",
    # Leakage-free by construction: an event is enriched only with a
    # dimension version whose timestamp is <= the event's own — the
    # multi_asof_join backward-inclusive rule. Against a Type-1 (current-
    # row-only) dimension that means: matched iff the user's LATEST
    # purchase is not in the event's future, else null (the only retained
    # version would leak). The oracle states exactly that, declaratively.
    oracle="""
WITH dim AS (
    SELECT user_id, value AS profile_value, ts AS dim_ts
    FROM (SELECT user_id, value, ts,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE event_type = 'purchase')
    WHERE rn = 1)
SELECT c.event_id, c.user_id,
       CASE WHEN d.dim_ts <= c.ts THEN d.profile_value END AS profile_value,
       CASE WHEN d.dim_ts <= c.ts THEN epoch_us(d.dim_ts) END AS prof_ts_us
FROM events c LEFT JOIN dim d USING (user_id)
WHERE c.event_type = 'click'
""",
)
def stream_pit_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming point-in-time enrichment — the feature-store serving
    topology end-to-end: stream #1 maintains a per-user profile dimension
    (latest purchase value) through the exactly-once versioned SCD1 sink
    (``streaming.scd1_upsert_stream_sink``); stream #2 drains the click
    events through ``foreachBatch``, each batch point-in-time joining the
    CURRENT committed dimension snapshot with ``multi_asof_join`` (clicks
    are the spine, the dimension is the feature frame, match rule
    backward-inclusive dim_ts <= click ts) and appending the enriched
    batch to the serving output.

    Order correctness: within a batch the sink reduces with ``max_by``
    over a (ts, event_id) struct, so the retained version is the global
    latest by event time, not by arrival — which is what makes the batch
    oracle exact. Cross-batch the SCD1 merge is latest-ARRIVAL-wins; the
    availableNow drain of the single-file fixture is one batch, and the
    multi-batch ordering + exactly-once property is pinned separately in
    tests/test_round7.py over a controlled 3-file source.

    Scale shape: dim maintenance is O(|batch| + |dim|) per trigger (the
    sink's documented cost); enrichment per batch is the single-shuffle
    multi_asof_join on user_id — the dimension re-read each batch, no
    state held for the join side. At 100 TB both halves are the standard
    continuously-updated feature-serving pattern."""
    paths = _PIT_SCRATCH.get(sf_dir)
    if paths is None:
        root = tempfile.mkdtemp(prefix="fs_pit_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        dim_dir = os.path.join(root, "dim")
        out_dir = os.path.join(root, "out")

        # stream #1: maintain the profile dimension off the purchase
        # stream (key user_id, order = event-time with event_id tiebreak)
        purchases = (
            ST.file_stream_source(spark, sf_dir)
            .filter(F.col("event_type") == "purchase")
            .select(
                "user_id",
                F.col("value").alias("profile_value"),
                F.col("ts").alias("dim_ts"),
                F.struct(F.col("ts"), F.col("event_id")).alias("__ord"),
            )
        )
        q1 = ST.scd1_upsert_stream_sink(
            purchases, dim_dir, key_col="user_id", order_col="__ord"
        )
        q1.awaitTermination()

        # stream #2: enrich clicks per micro-batch against the committed
        # dimension (read inside foreachBatch → always the newest
        # committed snapshot, never a partial write)
        clicks = ST.file_stream_source(spark, sf_dir).filter(
            F.col("event_type") == "click"
        )
        q2 = pit_enrich_stream_sink(clicks, dim_dir, out_dir)
        q2.awaitTermination()
        _PIT_SCRATCH[sf_dir] = (dim_dir, out_dir)
    else:
        _, out_dir = paths

    return spark.read.parquet(out_dir).select(
        "event_id", "user_id", "profile_value", "prof_ts_us"
    )


def pit_enrich_stream_sink(
    clicks, dim_dir: str, out_dir: str, checkpoint_dir: str | None = None
):
    """Start the enrichment stream: each micro-batch multi_asof_joins the
    newest COMMITTED dimension snapshot and writes its output to
    ``out_dir/b=<batch_id>`` with overwrite — a replayed batch (failure
    after write, before checkpoint commit) deterministically rewrites its
    own directory, so delivery is exactly-once, the same discipline as
    the SCD1 sink's versioned snapshots. Shared by the registered query
    and the multi-batch test."""

    def enrich_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        dim = ST.read_dim_latest(sp, dim_dir).select(
            "user_id", "dim_ts", "profile_value"
        )
        enriched = multi_asof_join(
            batch_df.select("event_id", "user_id", "ts"),
            [(dim, "dim_ts", ["profile_value"], "prof")],
            on=["user_id"],
            left_ts="ts",
        )
        enriched.select(
            "event_id",
            "user_id",
            "profile_value",
            F.unix_micros("prof_ts_matched").alias("prof_ts_us"),
        ).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"b={batch_id}")
        )

    return (
        clicks.writeStream.foreachBatch(enrich_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or tempfile.mkdtemp(prefix="fs_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )


def _recrawl_batch(docs: DataFrame) -> DataFrame:
    """Synthetic ingestion batch for the exact-dedup probe (the fixture
    has no exact duplicates, so the batch manufactures the three cases
    the operator must separate — derived IDENTICALLY in the oracle):
    - re-crawls of every 7th doc (case + whitespace variants — the
      normalizing fingerprint must collapse them onto the original);
    - novel docs (every doc_id % 7 == 1 doc with a suffix token);
    - a second copy of each novel doc (batch-INTERNAL duplicate — must
      resolve to the first copy, not to the corpus)."""
    recrawl = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit(" "), F.upper("text"), F.lit("  ")).alias("text"),
    )
    novel = docs.filter(F.col("doc_id") % 7 == 1).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xnovel")).alias("text"),
    )
    novel2 = docs.filter(F.col("doc_id") % 7 == 1).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xnovel")).alias("text"),
    )
    return recrawl.unionByName(novel).unionByName(novel2)


@query(
    "dedup_incremental_exact",
    oracle=f"""
WITH batch AS (
    SELECT doc_id + 1000000 AS doc_id,
           ' ' || upper(text) || '  ' AS text
    FROM documents WHERE doc_id % 7 = 0
    UNION ALL
    SELECT doc_id + 1000000, text || ' xnovel'
    FROM documents WHERE doc_id % 7 = 1
    UNION ALL
    SELECT doc_id + 2000000, text || ' xnovel'
    FROM documents WHERE doc_id % 7 = 1),
idx AS (
    SELECT {_FP} AS fp, MIN(doc_id) AS base_min
    FROM documents GROUP BY 1),
bfp AS (
    SELECT doc_id, {_FP} AS fp FROM batch),
pm AS (
    SELECT doc_id, fp,
           MIN(doc_id) OVER (PARTITION BY fp ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmin
    FROM bfp)
SELECT p.doc_id,
       LEAST(i.base_min, p.pmin) AS dup_of,
       LEAST(i.base_min, p.pmin) IS NULL AS accept
FROM pm p LEFT JOIN idx i USING (fp)
""",
)
def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EXACT dedup — the fingerprint twin of
    ``dedup_incremental_batch``: the corpus's normalized-content md5
    index (fp -> min doc_id) is PERSISTED once; each ingestion batch
    fingerprints itself, resolves batch-internal duplicates with a
    preceding-min window over its own fp groups, and left-joins the
    index — ``dup_of`` = the smallest matching id (corpus beats batch,
    earlier batch row beats later), ``accept`` = no match anywhere.

    Scale shape: the probe is one batch-sized window plus ONE hash join
    of batch fingerprints against the persisted index — the corpus is
    never rescanned, the classic Bloom-fronted exact-dedup ingest path
    (the index itself is the exact tier). Batch = a synthetic re-crawl
    (see ``_recrawl_batch``) because the fixture has no exact dups."""
    from featurestore_for_joycastle_java_spark.operators.text import (
        fingerprint,
    )

    docs = load_table(spark, sf_dir, "documents")

    fp_path = _FP_SCRATCH.get(sf_dir)
    if fp_path is None:
        root = tempfile.mkdtemp(prefix="fs_fpidx_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        fp_path = os.path.join(root, "fp_index")
        (
            docs.select(
                fingerprint(F.col("text")).alias("fp"), F.col("doc_id")
            )
            .groupBy("fp")
            .agg(F.min("doc_id").alias("base_min"))
            .write.mode("overwrite")
            .parquet(fp_path)
        )
        _FP_SCRATCH[sf_dir] = fp_path
    idx = spark.read.parquet(fp_path)

    from pyspark.sql import Window

    bfp = _recrawl_batch(docs).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )
    w = (
        Window.partitionBy("fp")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pm = bfp.withColumn("pmin", F.min("doc_id").over(w))
    dup_of = F.least("base_min", "pmin")  # both engines skip NULL args
    return pm.join(idx, "fp", "left").select(
        "doc_id",
        dup_of.alias("dup_of"),
        dup_of.isNull().alias("accept"),
    )


@query(
    "train_token_budget_mix",
    # The running sum is order-deterministic (doc_id unique within a
    # source) and pure integer; the kept set is the maximal prefix whose
    # PRIOR cumulative stays under the budget (greedy fill — the last
    # kept doc may overflow).
    oracle="""
WITH t AS (
    SELECT source, doc_id,
           len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS n_tok
    FROM documents),
c AS (
    SELECT source, doc_id, n_tok,
           SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM t)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs_total,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens_total,
       CAST(SUM(CASE WHEN cum - n_tok < 500 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs_kept,
       CAST(SUM(CASE WHEN cum - n_tok < 500 THEN n_tok ELSE 0 END)
            AS BIGINT) AS n_tokens_kept
FROM c GROUP BY 1
""",
)
def train_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing: each source contributes documents in
    deterministic (doc_id) order until its 500-token budget is filled —
    the per-source allocation step of training-mixture construction
    (fixed token budgets per domain, greedy prefix fill; the companion
    to the temperature-weighted `train_weighted_sample`).

    Scale shape: the per-source running sum uses
    ``operators.ranks.grouped_prefix_sum`` — the two-pass range-bucketed
    prefix sum — so NO window ever sees a whole source (a 100 TB corpus
    with 5 sources would put 20 TB through one task under a plain
    ``Window.partitionBy(source)``); the fact shuffles once on
    (source, bucket) and the offsets frame is sources × 32 rows. The
    final rollup is an ordinary map-side-combined groupBy."""
    from featurestore_for_joycastle_java_spark.operators.ranks import (
        grouped_prefix_sum,
    )
    from featurestore_for_joycastle_java_spark.operators.text import (
        token_count,
    )

    t = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tok"),
    )
    c = grouped_prefix_sum(
        t, ["source"], "doc_id", "n_tok", out_col="cum"
    )
    kept = (F.col("cum") - F.col("n_tok")) < 500
    return c.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_total"),
        F.sum("n_tok").cast("bigint").alias("n_tokens_total"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_docs_kept"),
        F.sum(F.when(kept, F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("n_tokens_kept"),
    )


#: sf_dir -> (lineitem_table, orders_table) bucketed-table names already
#: created in this process's session catalog (files under the session
#: warehouse dir; metadata is session-scoped, so existence is re-checked
#: against the live catalog too).
_BUCKET_SCRATCH: dict[str, tuple[str, str]] = {}


@query(
    "layout_bucketed_join",
    oracle="""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
)
def layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join — the storage-layout answer to the
    biggest shuffle in the warehouse: lineitem and orders are written
    ONCE as bucketed tables (8 buckets on the join key, sorted within
    buckets), and every subsequent fact-to-fact join on that key runs
    with NO Exchange on either side (plan-gated in tests/test_round7.py
    — zero shuffles feeding the SortMergeJoin). At 100 TB this is the
    difference between re-shuffling both fact tables on every join and
    paying the layout cost once at ingest: the standard bucketing /
    storage-partitioned-join contract. The ``merge`` hint pins the
    sort-merge strategy so the gate proves bucketing (a broadcast would
    trivially have no shuffle and prove nothing)."""
    import hashlib

    names = _BUCKET_SCRATCH.get(sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    lt, ot = f"bkt_lineitem_{tag}", f"bkt_orders_{tag}"
    if names is None or not spark.catalog.tableExists(lt):
        # EXTERNAL tables under a per-process scratch root: the shared
        # spark-warehouse location outlives the (session-scoped) table
        # metadata, so a managed table would hit LOCATION_ALREADY_EXISTS
        # on the next process (caught by the r7 full-registry sweep)
        root = tempfile.mkdtemp(prefix="fs_bkt_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        for t in (lt, ot):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        od = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", os.path.join(root, lt))
            .saveAsTable(lt)
        )
        (
            od.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", os.path.join(root, ot))
            .saveAsTable(ot)
        )
        _BUCKET_SCRATCH[sf_dir] = (lt, ot)
    j = (
        spark.table(lt)
        .hint("merge")
        .join(
            spark.table(ot),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(
            F.floor(F.col("l_extendedprice") * F.lit(100.0)).cast("bigint")
        )
        .cast("bigint")
        .alias("revenue_cents"),
    )


@query(
    "layout_zorder_prune",
    # Everything runs in BUCKET space (16 user levels x 12 hour levels)
    # on both engines, so layouts, file boundaries, zone maps and the
    # predicate are integer-deterministic; the 1-D sort orders by the
    # SAME bucket column it is compared on (ordering by raw user_id
    # would agree on buckets but shuffle ties differently).
    oracle="""
WITH mx AS (SELECT MAX(user_id) AS mu FROM events),
e AS (
    SELECT event_id,
           LEAST(15, CAST(FLOOR(user_id * 16.0 / (mu + 1)) AS BIGINT))
               AS u_b,
           CAST(EXTRACT(hour FROM ts) // 2 AS BIGINT) AS h_b
    FROM events CROSS JOIN mx),
m AS (
    SELECT event_id, u_b, h_b,
           (((u_b >> 0) & 1) << 0) + (((h_b >> 0) & 1) << 1)
         + (((u_b >> 1) & 1) << 2) + (((h_b >> 1) & 1) << 3)
         + (((u_b >> 2) & 1) << 4) + (((h_b >> 2) & 1) << 5)
         + (((u_b >> 3) & 1) << 6) + (((h_b >> 3) & 1) << 7) AS morton
    FROM e),
lay AS (
    SELECT 'natural' AS layout, event_id // 500 AS fileno, u_b, h_b FROM m
    UNION ALL
    SELECT 'sorted_user',
           (ROW_NUMBER() OVER (ORDER BY u_b, event_id) - 1) // 500, u_b, h_b
    FROM m
    UNION ALL
    SELECT 'zorder',
           (ROW_NUMBER() OVER (ORDER BY morton, event_id) - 1) // 500,
           u_b, h_b
    FROM m),
f AS (
    SELECT layout, fileno,
           MIN(u_b) AS lo_u, MAX(u_b) AS hi_u,
           MIN(h_b) AS lo_h, MAX(h_b) AS hi_h,
           COUNT(*) AS n,
           SUM(CASE WHEN u_b BETWEEN 4 AND 11 AND h_b BETWEEN 4 AND 5
                    THEN 1 ELSE 0 END) AS nm
    FROM lay GROUP BY 1, 2)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN hi_u < 4 OR lo_u > 11 OR hi_h < 4 OR lo_h > 5
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_skip,
       CAST(SUM(CASE WHEN hi_u < 4 OR lo_u > 11 OR hi_h < 4 OR lo_h > 5
                     THEN 0 ELSE n END) AS BIGINT) AS n_rows_scanned,
       CAST(SUM(nm) AS BIGINT) AS n_matching
FROM f GROUP BY 1
""",
)
def layout_zorder_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-interleaved) clustering vs 1-D sort for 2-D
    zone-map pruning — the multi-dimensional extension of
    ``layout_zonemap_stats`` and the WHY behind Delta/Iceberg Z-ORDER:
    a 1-D user sort makes user-predicate pruning perfect and hour
    pruning useless (every file spans all hours); interleaving the bits
    of (user-bucket, hour-bucket) gives BOTH dimensions partial
    locality, so a 2-D box predicate (middle user band x morning hours)
    skips far more files than either 1-D layout. Quantifies all three
    layouts on identical 500-row files: n_skip / n_rows_scanned /
    n_matching per layout, with identical n_matching across layouts as
    the built-in consistency check.

    Scale shape: bucket + Morton are pure per-row integer expressions;
    the two sorted layouts use the two-pass range-bucketed
    ``global_row_number`` (no single-partition fact window — the
    Z-ORDER WRITE itself at 100 TB is exactly this global sort); file
    stats are one map-side-combined groupBy per layout to an O(files)
    frame; the summary aggregates the metadata frame."""
    from featurestore_for_joycastle_java_spark.operators.ranks import (
        global_row_number,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.hour("ts").alias("hr")
    )
    mx = ev.agg(F.max("user_id").alias("mu"))
    e = ev.crossJoin(F.broadcast(mx)).select(
        "event_id",
        F.least(
            F.lit(15),
            F.floor(F.col("user_id") * 16.0 / (F.col("mu") + 1)),
        )
        .cast("bigint")
        .alias("u_b"),
        F.floor(F.col("hr") / 2).cast("bigint").alias("h_b"),
    )

    def bit(c, i, k):
        return F.shiftleft(
            F.shiftright(F.col(c), i).bitwiseAND(F.lit(1)), k
        )

    morton = sum(
        [bit("u_b", i, 2 * i) for i in range(4)]
        + [bit("h_b", i, 2 * i + 1) for i in range(4)],
        F.lit(0),
    )
    m = e.withColumn("morton", morton)

    def filed(df, order_col):
        r = global_row_number(df, order_col, ["event_id"], out_col="__rn")
        return r.select(
            F.expr("CAST((__rn - 1) DIV 500 AS BIGINT)").alias("fileno"),
            "u_b",
            "h_b",
        )

    nat = m.select(
        F.expr("event_id DIV 500").alias("fileno"), "u_b", "h_b"
    ).withColumn("layout", F.lit("natural"))
    srt = filed(m, "u_b").withColumn("layout", F.lit("sorted_user"))
    zo = filed(m, "morton").withColumn("layout", F.lit("zorder"))

    match = (F.col("u_b").between(4, 11)) & (F.col("h_b").between(4, 5))
    f = (
        nat.unionByName(srt)
        .unionByName(zo)
        .groupBy("layout", "fileno")
        .agg(
            F.min("u_b").alias("lo_u"),
            F.max("u_b").alias("hi_u"),
            F.min("h_b").alias("lo_h"),
            F.max("h_b").alias("hi_h"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(match, 1).otherwise(0)).alias("nm"),
        )
    )
    skip = (
        (F.col("hi_u") < 4)
        | (F.col("lo_u") > 11)
        | (F.col("hi_h") < 4)
        | (F.col("lo_h") > 5)
    )
    return f.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(F.when(skip, 1).otherwise(0)).cast("bigint").alias("n_skip"),
        F.sum(F.when(skip, 0).otherwise(F.col("n")))
        .cast("bigint")
        .alias("n_rows_scanned"),
        F.sum("nm").cast("bigint").alias("n_matching"),
    )


@query(
    "agg_hll_mergeable",
    # The estimates are not SQL-replayable (Apache DataSketches binary
    # state); the oracle pins the EXACT count and the two booleans the
    # operator exists to prove — merged-vs-direct closeness and the
    # error bound — which flip on any drift and fail the value hash
    # (the agg_approx_*_bounded pattern). Closeness, NOT equality: the
    # union promotes sketches to a different target representation
    # (HLL_8) than a directly-built sketch, so estimates can differ by
    # a few counts once past sparse mode (sf0.1: merged 1488 vs direct
    # 1494 vs exact 1500) — caught by the r7 full-registry sweep; the
    # lattice merge guarantees bounded closeness, not bit equality.
    oracle="""
SELECT COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS merge_within_1pct,
       TRUE AS within_5pct
FROM events
""",
)
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches, Spark 3.5+
    ``hll_sketch_agg``/``hll_union_agg``): per-event-type sketches
    unioned must estimate within 1 % of one sketch built over the whole
    table (and within 5 % of exact) — the lattice-merge property that
    makes distinct-count state shardable, persistable and incrementally
    maintainable. Equality would be too strong: the union's target
    representation differs from a directly-built sketch past sparse
    mode (see the oracle comment). This is the real-sketch upgrade of
    ``agg_approx_distinct_bounded`` (whose HLL++ state never leaves the
    aggregation) and the distinct-count sibling of
    ``agg_incremental_merge``'s partial-aggregate contract: at 100 TB
    you keep one small sketch per (day, slice) and answer any rollup by
    unioning sketches, never rescanning the fact. The parquet
    round-trip of the binary sketch column is pinned in
    tests/test_round7.py."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias(
            "est_m"
        )
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias(
            "est_d"
        ),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return merged.crossJoin(F.broadcast(direct)).select(
        "exact_users",
        (
            F.abs(F.col("est_m") - F.col("est_d")) / F.col("exact_users")
            <= 0.01
        ).alias("merge_within_1pct"),
        (
            F.abs(F.col("est_d") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.05
        ).alias("within_5pct"),
    )


#: sf_dir -> (index_dir, cent_path) for the incremental IVF index (base
#: assignments + centroid set persisted once per process; atexit-cleaned).
_IVF_SCRATCH: dict[str, tuple[str, str]] = {}


@query(
    "sim_ivf_incremental",
    # Same fully-replayable shape as sim_ivf_topk, with the centroid set
    # frozen at INDEX-BUILD time (the 16 lowest-id BASE vectors): the
    # oracle replays cell assignment for base and batch against those
    # same centroids, probes, and ranks — so the incremental append is
    # checked against the exact declarative definition, not against a
    # replay of the engine's storage layout.
    oracle="""
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings),
cents AS (
    SELECT vec_id AS cent_id, v AS cv FROM e
    WHERE vec_id % 5 != 0 ORDER BY vec_id LIMIT 16),
assigned AS (
    SELECT vec_id, cent_id, v FROM (
        SELECT e.vec_id, c.cent_id, e.v,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                   list_inner_product(e.v, c.cv)
                   / (SQRT(list_inner_product(e.v, e.v))
                      * SQRT(list_inner_product(c.cv, c.cv))) DESC,
                   c.cent_id) AS rn
        FROM e CROSS JOIN cents c)
    WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
probes AS (
    SELECT query_id, cent_id, qv FROM (
        SELECT q.query_id, c.cent_id, q.qv,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                   list_inner_product(q.qv, c.cv)
                   / (SQRT(list_inner_product(q.qv, q.qv))
                      * SQRT(list_inner_product(c.cv, c.cv))) DESC,
                   c.cent_id) AS rn
        FROM q CROSS JOIN cents c)
    WHERE rn <= 4),
scored AS (
    SELECT p.query_id, a.vec_id,
           ROUND(list_inner_product(p.qv, a.v)
                 / (SQRT(list_inner_product(p.qv, p.qv))
                    * SQRT(list_inner_product(a.v, a.v))), 6) AS cos_sim
    FROM probes p JOIN assigned a USING (cent_id))
SELECT query_id, vec_id, cos_sim, rnk
FROM (SELECT query_id, vec_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rnk
      FROM scored)
WHERE rnk <= 5
""",
)
def sim_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance — the ANN member of the
    incremental trilogy (MinHash probe, fingerprint probe, and now the
    vector index): the BASE corpus (vec_id % 5 != 0) is indexed ONCE —
    centroids = its 16 lowest-id vectors, cell assignments persisted to
    parquet; the ingestion batch (vec_id % 5 == 0) is assigned to the
    SAME frozen centroids (zero-shuffle broadcast fold) and appended as
    a second index segment. Queries probe the union of segments.

    This is how a production IVF index absorbs writes: cell geometry
    frozen between rebuilds, appends routed by the existing centroids,
    periodic re-fit offline (the k-means variant). Assignment of a new
    vector costs O(n_centroids) — never touches the corpus; the probe
    scans ~n_probe/n_centroids of the index regardless of how many
    segments it accumulated. Drift caveat at 100 TB: a frozen geometry
    degrades as the batch distribution shifts — the re-fit cadence is
    the recall/cost knob (same trade Faiss/Milvus document)."""
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        as_double,
        assign_nearest_cell,
        cosine,
    )
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") % 5 != 0)
    batch = e.filter(F.col("vec_id") % 5 == 0)

    paths = _IVF_SCRATCH.get(sf_dir)
    if paths is None:
        root = tempfile.mkdtemp(prefix="fs_ivfidx_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        cent_path = os.path.join(root, "centroids")
        base_seg = os.path.join(root, "seg_base")
        batch_seg = os.path.join(root, "seg_batch")
        cents = (
            base.orderBy("vec_id")
            .limit(16)
            .select(
                F.col("vec_id").alias("cent_id"),
                as_double(F.col("embedding")).alias("__mv"),
            )
        )
        cents.write.mode("overwrite").parquet(cent_path)
        stored = spark.read.parquet(cent_path)
        c_base = base.select(
            "vec_id", as_double(F.col("embedding")).alias("__cv")
        )
        assign_nearest_cell(c_base, stored, "vec_id").write.mode(
            "overwrite"
        ).parquet(base_seg)
        # the APPEND: batch assigned against the FROZEN centroid set
        c_new = batch.select(
            "vec_id", as_double(F.col("embedding")).alias("__cv")
        )
        assign_nearest_cell(c_new, stored, "vec_id").write.mode(
            "overwrite"
        ).parquet(batch_seg)
        paths = (root, cent_path)
        _IVF_SCRATCH[sf_dir] = paths
    root, cent_path = paths
    cents = spark.read.parquet(cent_path)
    index = spark.read.parquet(os.path.join(root, "seg_base")).unionByName(
        spark.read.parquet(os.path.join(root, "seg_batch"))
    )

    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("__qv"),
    )
    scored_c = q.join(F.broadcast(cents)).select(
        "query_id",
        "__qv",
        "cent_id",
        cosine(F.col("__qv"), F.col("__mv")).alias("__cs"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("__cs").desc(), F.col("cent_id")
    )
    probes = (
        scored_c.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= 4)
        .select("query_id", "cent_id", "__qv")
    )
    scored = index.join(F.broadcast(probes), "cent_id").select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "query_id", "vec_id", "cos_sim", F.col("rnk").cast("int").alias("rnk")
        )
    )


#: sf_dir -> decisions dir for the streaming incremental dedup (drained
#: once per process; atexit-cleaned).
_SDEDUP_SCRATCH: dict[str, str] = {}


def _incremental_dedup_processor(idx_dir: str, out_dir: str):
    """foreachBatch processor for the streaming incremental exact dedup:
    batch-internal preceding-min window + one join against the newest
    committed index version; exactly-once per-batch overwrite sinks.

    Cross-batch semantics are FIRST-ARRIVAL-WINS: the keeper of a
    fingerprint is whichever doc was accepted in the earliest batch
    (lowest id within a batch breaks ties). When arrival order across
    batches disagrees with id order, this intentionally diverges from
    the declarative id-order preceding-min rule — pinned red/green in
    ``tests/test_round7.py::test_stream_incremental_dedup_out_of_order``.
    Factored out of ``stream_incremental_dedup`` so that test drives the
    exact production processor."""
    from pyspark.sql import Window

    from featurestore_for_joycastle_java_spark.operators.text import (
        fingerprint,
    )
    from featurestore_for_joycastle_java_spark.streaming import (
        _committed_versions,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        bfp = batch_df.select(
            "doc_id", fingerprint(F.col("text")).alias("fp")
        )
        w = (
            Window.partitionBy("fp")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        pm = bfp.withColumn("pmin", F.min("doc_id").over(w))
        prev = [v for v in _committed_versions(idx_dir) if v < batch_id]
        if prev:
            idx = sp.read.parquet(os.path.join(idx_dir, f"v={max(prev)}"))
            j = pm.join(idx, "fp", "left")
        else:
            j = pm.withColumn("keep_id", F.lit(None).cast("long"))
        dup_of = F.least("keep_id", "pmin")
        dec = j.select(
            "doc_id",
            "fp",
            dup_of.alias("dup_of"),
            dup_of.isNull().alias("accept"),
        )
        dec.select("doc_id", "dup_of", "accept").write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"b={batch_id}"))
        accepted = dec.filter("accept").select(
            "fp", F.col("doc_id").alias("keep_id")
        )
        new_idx = (
            sp.read.parquet(os.path.join(idx_dir, f"v={max(prev)}"))
            .unionByName(accepted)
            if prev
            else accepted
        )
        new_idx.write.mode("overwrite").parquet(
            os.path.join(idx_dir, f"v={batch_id}")
        )

    return process


@query(
    "stream_incremental_dedup",
    # Arrival order == doc_id order BY CONSTRUCTION (the recrawl batch's
    # ids are originals + 1M/2M and it arrives second), so the streaming
    # index semantics — dup_of = the keeper accepted before you —
    # collapse to one declarative preceding-min window over the combined
    # arrival sequence. With out-of-order ids across batches the two
    # would diverge (first-ARRIVAL wins, documented); the id scheme here
    # makes the oracle exact.
    oracle="""
WITH batch AS (
    SELECT doc_id + 1000000 AS doc_id,
           ' ' || upper(text) || '  ' AS text
    FROM documents WHERE doc_id % 7 = 0
    UNION ALL
    SELECT doc_id + 1000000, text || ' xnovel'
    FROM documents WHERE doc_id % 7 = 1
    UNION ALL
    SELECT doc_id + 2000000, text || ' xnovel'
    FROM documents WHERE doc_id % 7 = 1),
allr AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id, text FROM batch),
f AS (
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM allr),
pm AS (
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY fp ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS dup_of
    FROM f)
SELECT doc_id, dup_of, dup_of IS NULL AS accept FROM pm
""",
)
def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING incremental exact dedup — the continuous run of
    ``dedup_incremental_exact``: documents arrive as micro-batches (the
    original corpus, then the synthetic re-crawl batch — two files, one
    per trigger); ``foreachBatch`` resolves each batch against a
    VERSIONED fingerprint index (batch-internal preceding-min window +
    one join against the newest committed index version), emits per-doc
    accept/dup_of decisions to a per-batch overwrite directory, and
    writes index version v=<batch_id> = previous ∪ newly-accepted keys.
    Both sinks follow the SCD1 sink's exactly-once discipline: a
    replayed batch re-reads the same predecessor version and rewrites
    its own outputs deterministically.

    Scale shape per trigger: O(|batch|) window + one hash join against
    the index (at 100 TB: a Bloom-fronted key-value table; here the
    plain-parquet expression of it). The corpus is never rescanned —
    the index carries everything the stream needs."""
    out_dir = _SDEDUP_SCRATCH.get(sf_dir)
    if out_dir is None:
        root = tempfile.mkdtemp(prefix="fs_sdedup_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        src_dir = os.path.join(root, "src")
        idx_dir = os.path.join(root, "idx")
        out_dir = os.path.join(root, "out")
        os.makedirs(src_dir)

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        f1 = os.path.join(src_dir, "f1")
        f2 = os.path.join(src_dir, "f2")
        docs.coalesce(1).write.parquet(f1)
        _recrawl_batch(docs).coalesce(1).write.parquet(f2)
        # deterministic arrival order: f1 strictly older than f2
        base_t = 1_700_000_000
        for d, t in ((f1, base_t), (f2, base_t + 100)):
            for fn in os.listdir(d):
                os.utime(os.path.join(d, fn), (t, t))

        process = _incremental_dedup_processor(idx_dir, out_dir)

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src_dir, "*"))
        )
        q = (
            stream.writeStream.foreachBatch(process)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="fs_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _SDEDUP_SCRATCH[sf_dir] = out_dir

    return spark.read.parquet(out_dir).select("doc_id", "dup_of", "accept")


@query(
    "sim_quantized_rerank",
    # Quantization replays sim_int8_quantize's bit-exact formula
    # (round-half-up via floor(x/scale + 0.5), clamped); the coarse
    # scores are integer dot products of integral-double codes — exact
    # in both engines — so the top-20 candidate sets match exactly, and
    # the final ranking uses the 6dp-rounded float cosine with vec_id
    # tiebreaks. Fully deterministic two-stage retrieval.
    oracle="""
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings),
s AS (
    SELECT vec_id, v,
           list_max(list_transform(v, x -> ABS(x))) / 127.0 AS scale
    FROM e),
q8 AS (
    SELECT vec_id, v,
           list_transform(v, x -> GREATEST(-127.0,
               LEAST(127.0, FLOOR(x / scale + 0.5)))) AS qc
    FROM s WHERE scale > 0),
qry AS (
    SELECT vec_id AS query_id, v AS qv, qc AS qqc
    FROM q8 WHERE vec_id < 10),
coarse AS (
    SELECT query_id, vec_id, qv, cv,
           ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY approx DESC, vec_id) AS crn
    FROM (
        SELECT q.query_id, c.vec_id, q.qv, c.v AS cv,
               list_inner_product(q.qqc, c.qc) AS approx
        FROM qry q CROSS JOIN q8 c)),
rer AS (
    SELECT query_id, vec_id,
           ROUND(list_inner_product(qv, cv)
                 / (SQRT(list_inner_product(qv, qv))
                    * SQRT(list_inner_product(cv, cv))), 6) AS cos_sim
    FROM coarse WHERE crn <= 20)
SELECT query_id, vec_id, cos_sim, rnk
FROM (SELECT query_id, vec_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rnk
      FROM rer)
WHERE rnk <= 5
""",
)
def sim_quantized_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval with int8 quantization — the standard
    vector-serving pattern (Faiss/Milvus/pgvector all ship it): a
    COARSE scan scores every corpus vector with the INTEGER dot product
    of its int8 codes (4× less memory bandwidth than float32, exact
    integer arithmetic), keeps the top-20 candidates per query, and an
    EXACT float-cosine re-rank of just those candidates produces the
    final top-5. Quantization is ``sim_int8_quantize``'s bit-exact
    round-half-up formula (kept textually in sync — see that query's
    lateral-alias caution).

    Scale shape: query codes broadcast, the coarse scan is stateless
    per-row work over the corpus (at 100 TB it composes with the IVF
    cell pruning — scan only probed cells, with int8 bandwidth); the
    re-rank touches 20 rows per query. The windows see |corpus| scored
    rows per query only in this flat demonstration — the composed form
    inherits IVF's ~n_probe/n_centroids scan fraction."""
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        as_double,
        cosine,
    )
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    scale = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x))) / F.lit(
        127.0
    )
    s = e.select("vec_id", "v", scale.alias("scale")).filter(
        F.col("scale") > 0
    )
    qc = F.transform(
        F.col("v"),
        lambda x: F.greatest(
            F.lit(-127.0),
            F.least(F.lit(127.0), F.floor(x / F.col("scale") + F.lit(0.5))),
        ),
    )
    q8 = s.select("vec_id", "v", qc.alias("qc"))
    qry = q8.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("qc").alias("qqc"),
    )
    # integer dot of integral-double codes: left-to-right fold, exact
    approx = F.aggregate(
        F.zip_with("qqc", "qc", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = q8.join(F.broadcast(qry)).select(
        "query_id", "vec_id", "qv", F.col("v").alias("cv"), approx.alias("approx")
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("vec_id")
    )
    cand = (
        scored.withColumn("crn", F.row_number().over(wc))
        .filter(F.col("crn") <= 20)
        .select("query_id", "vec_id", "qv", "cv")
    )
    rer = cand.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        rer.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "query_id", "vec_id", "cos_sim", F.col("rnk").cast("int").alias("rnk")
        )
    )


@query(
    "agg_approx_topk",
    # Exactness argument, not a tolerance: approx_top_k's Misra-Gries
    # style summary is EXACT while the tracked-item capacity (100 here)
    # exceeds the column's cardinality (~5 event types), so the emitted
    # counts equal the true counts and the top-3 set is the true top-3 —
    # the oracle replays it declaratively. Past capacity the counts
    # become estimates; capacity is the knob that trades memory for the
    # exact-prefix guarantee.
    oracle="""
SELECT event_type, CAST(n AS BIGINT) AS est_n
FROM (SELECT event_type, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events GROUP BY 1)
WHERE rn <= 3
""",
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via ``approx_top_k`` (Spark 4 SQL) — the bounded-
    memory frequent-items sketch: one pass, O(capacity) state per
    partition, mergeable partials; at 100 TB the only way to answer
    "top URLs / tokens / keys" without a full groupBy of a
    billion-key column. Run with capacity > cardinality it degrades
    gracefully to EXACT counts (the property this fixture pins); at
    true scale the capacity bounds memory and the result is the
    guaranteed-superset heavy-hitter estimate."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "__events_topk"
    )
    return spark.sql(
        """
        SELECT t.item AS event_type, t.count AS est_n
        FROM (SELECT explode(approx_top_k(event_type, 3, 100)) AS t
              FROM __events_topk)
        """
    ).select("event_type", F.col("est_n").cast("bigint").alias("est_n"))


@query(
    "dedup_containment_pairs",
    # Asymmetric by design: C(A,B) = |A∩B| / |A| — both directions
    # emitted, no a<b normalization; the 6dp round happens before the
    # threshold so the pair SET matches the oracle exactly (the
    # dedup_jaccard_pairs precedent). Bounded scope (one source) like
    # the other exact pair anchors; the corpus-scale path reuses the
    # MinHash/LSH machinery with a containment verify.
    oracle="""
WITH t AS (
    SELECT doc_id,
           list_distinct(list_filter(string_split(lower(text), ' '),
                                     x -> x <> '')) AS toks
    FROM documents WHERE source = 'src0')
SELECT a.doc_id AS id_contained, b.doc_id AS id_container,
       ROUND(CAST(LEN(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / LEN(a.toks), 6) AS containment
FROM t a JOIN t b ON a.doc_id != b.doc_id
WHERE ROUND(CAST(LEN(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / LEN(a.toks), 6) >= 0.9
""",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set CONTAINMENT pairs (C(A,B) = |A∩B|/|A| >= 0.9) within
    one source — the asymmetric cousin of Jaccard that catches what
    symmetric similarity misses: a document swallowed inside a larger
    one (boilerplate wrappers, quoted articles, template expansions)
    scores low Jaccard but containment ~1. Emits ORDERED pairs
    (contained, container) in both directions where they hold.

    Scale shape: same inverted-index equi-join as
    ``dedup_jaccard_pairs`` (explode → token join → per-pair overlap
    counts) — candidate pairs share >= 1 token, never all-pairs; the
    denominator is the CONTAINED side's set size only. Bounded to one
    source as the exact anchor; corpus-wide, the LSH banding machinery
    applies with a containment verify on candidates."""
    from featurestore_for_joycastle_java_spark.operators.text import tokens

    t = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source") == "src0")
        .select(
            "doc_id", F.array_distinct(tokens(F.col("text"))).alias("toks")
        )
        .filter(F.size("toks") > 0)
    )
    ex = t.select("doc_id", F.explode("toks").alias("tok"))
    a, b = ex.alias("a"), ex.alias("b")
    overlap = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_contained"),
            F.col("b.doc_id").alias("id_container"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = t.select("doc_id", F.size("toks").alias("n_toks"))
    return (
        overlap.join(
            sizes.withColumnRenamed("doc_id", "id_contained"), "id_contained"
        )
        .select(
            "id_contained",
            "id_container",
            F.round(
                F.col("n_inter") / F.col("n_toks").cast("double"), 6
            ).alias("containment"),
        )
        .filter(F.col("containment") >= 0.9)
    )


@query(
    "udtf_table_arg_stats",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
            AS BIGINT) AS total_toks
FROM documents GROUP BY 1
""",
)
def udtf_table_arg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF with a TABLE argument (Spark 4:
    ``f(TABLE(t) PARTITION BY col)``) — the sixth API door next to the
    scalar pandas UDF, grouped-agg UDF, Arrow lateral UDTF,
    ``mapInArrow`` and the Python Data Source: Catalyst shuffles the
    input on the PARTITION BY key and feeds each group to ONE UDTF
    instance (``eval`` per row, ``terminate`` per group), i.e. the
    groupBy-apply topology expressed as a SQL table function. The
    Python body computes per-source doc/token totals — deliberately
    SQL-replayable so the door itself (partitioning contract, instance
    lifecycle, row batching) is what the oracle checks. Production use
    of this door is group-wise Python that SQL can't express (per-group
    model scoring, sequence alignment); the per-group state here is two
    counters, so memory is O(1) per instance at any group size."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="source string, n_docs long, total_toks long")
    class SourceStats:
        def __init__(self):
            self.src = None
            self.n = 0
            self.toks = 0

        def eval(self, row):
            self.src = row["source"]
            self.n += 1
            self.toks += len([t for t in row["text"].split(" ") if t])

        def terminate(self):
            if self.src is not None:
                yield self.src, self.n, self.toks

    spark.udtf.register("source_stats", SourceStats)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "__docs_tblarg"
    )
    return spark.sql(
        "SELECT source, n_docs, total_toks "
        "FROM source_stats(TABLE(__docs_tblarg) PARTITION BY source)"
    )


# ---------------------------------------------------------------------------
# Single-pass table profiler
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    # (name, kind) — kind picks which min/max lane the column reports in.
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _profile_oracle() -> str:
    parts = []
    for c, kind in _PROFILE_COLS:
        if kind == "num":
            mn = f"ROUND(CAST(MIN({c}) AS DOUBLE), 6)"
            mx = f"ROUND(CAST(MAX({c}) AS DOUBLE), 6)"
            ms = "CAST(NULL AS VARCHAR)"
            xs = "CAST(NULL AS VARCHAR)"
        elif kind == "ts":
            mn = "CAST(NULL AS DOUBLE)"
            mx = "CAST(NULL AS DOUBLE)"
            ms = f"strftime(MIN({c}), '%Y-%m-%d %H:%M:%S')"
            xs = f"strftime(MAX({c}), '%Y-%m-%d %H:%M:%S')"
        else:
            mn = "CAST(NULL AS DOUBLE)"
            mx = "CAST(NULL AS DOUBLE)"
            ms = f"MIN({c})"
            xs = f"MAX({c})"
        parts.append(
            f"SELECT '{c}' AS column_name, COUNT(*) AS n_rows,\n"
            f"       COUNT(*) - COUNT({c}) AS n_nulls,\n"
            f"       COUNT(DISTINCT {c}) AS n_distinct,\n"
            f"       {mn} AS min_num, {mx} AS max_num,\n"
            f"       {ms} AS min_str, {xs} AS max_str\n"
            f"FROM orders"
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY column_name"


@query("profile_table_stats", oracle=_profile_oracle())
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan table profiler — the data-quality summary every
    ingestion pipeline runs before training (per-column row/null/distinct
    counts plus typed min/max), computed in ONE scan of the table.

    Shape: unpivot each row to one (column_name, value) entry per
    profiled column map-side (the ``stack``/explode long form), then
    aggregate in TWO hash levels — level 1 groups by (column, canonical
    value key) so duplicates collapse under map-side combine, level 2
    reduces the |columns| x |distinct| frame to one row per column
    (n_rows = Σcnt, n_nulls = Σcnt over null keys, n_distinct = row
    count, min/max = min/max of the per-value typed lanes). Every stage
    is partially aggregated (map-side combined) and fully parallel —
    the string-typed min/max lanes make Spark pick SortAggregate over
    HashAggregate, but that sort is per-partition over combined
    partials, not a single-task barrier.

    Why not one wide agg with N ``count(distinct)``? Catalyst rewrites
    multiple distinct aggregates via Expand(xN+1) feeding a
    SINGLE-PARTITION SortAggregate — measured 5.4 s at sf0.1 vs 2.7 s
    for this shape, and at 100 TB that final single-task sort over the
    expanded fact is the "last reducer" scale-killer. The two-level
    form shuffles only per-task-distinct partial rows and its final
    stages see |columns| x |distinct| and |columns| rows respectively.
    (The ~2 %-error one-liner alternative stays
    ``approx_count_distinct`` in a plain wide agg.)

    Canonical value key: ``CAST(value AS STRING)`` — injective per
    column (long/double/timestamp/string renderings are value-faithful
    in Spark 3+), so level-2 ``count(dk)`` equals the exact
    ``COUNT(DISTINCT col)``. Floating columns add ``+ 0.0`` first:
    IEEE addition of +0.0 is exact for every value but normalizes -0.0
    to +0.0, matching how Spark's own aggregation keys (and DuckDB's
    DISTINCT) treat the two zeros as one value — without it the string
    keys '-0.0'/'0.0' would double-count. (All NaNs render as one
    'NaN' string, which already matches grouping semantics.)

    Reference scope: the reference pipeline has no profiler; this is the
    north-star data-pipeline surface (SURVEY.md §2.3 family).
    """
    t = load_table(spark, sf_dir, "orders")
    # null lanes cast to the COLUMN's actual type (the fixture's
    # o_orderdate is TIMESTAMP_NTZ — a bare "timestamp" null would force
    # an implicit NTZ->TZ coercion inside the array unification, making
    # the rendered min/max session-timezone-dependent)
    ts_type = next(
        t.schema[c].dataType for c, kind in _PROFILE_COLS if kind == "ts"
    )
    entries = []
    for c, kind in _PROFILE_COLS:
        col = F.col(c)
        is_float = t.schema[c].dataType.simpleString() in ("double", "float")
        dk = (col + F.lit(0.0)) if is_float else col
        entries.append(
            F.struct(
                F.lit(c).alias("column_name"),
                dk.cast("string").alias("dk"),
                (
                    col.cast("double")
                    if kind == "num"
                    else F.lit(None).cast("double")
                ).alias("vnum"),
                (col if kind == "ts" else F.lit(None).cast(ts_type)).alias(
                    "vts"
                ),
                (
                    col if kind == "str" else F.lit(None).cast("string")
                ).alias("vstr"),
            )
        )
    long_form = t.select(
        F.explode(F.array(*entries)).alias("e")
    ).select("e.*")

    # level 1: one row per (column, distinct value) — map-side combine
    # collapses repeats before the shuffle; the typed lanes are constant
    # per key, so min == the value itself
    per_value = long_form.groupBy("column_name", "dk").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("vnum").alias("vnum"),
        F.min("vts").alias("vts"),
        F.min("vstr").alias("vstr"),
    )

    # level 2: |columns| groups — trivially small at any scale
    stats = per_value.groupBy("column_name").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("dk").isNull(), F.col("cnt"))), F.lit(0)
        )
        .cast("long")
        .alias("n_nulls"),
        F.count("dk").alias("n_distinct"),
        F.round(F.min("vnum"), 6).alias("min_num"),
        F.round(F.max("vnum"), 6).alias("max_num"),
        F.min("vts").alias("__mn_ts"),
        F.max("vts").alias("__mx_ts"),
        F.min("vstr").alias("__mn_str"),
        F.max("vstr").alias("__mx_str"),
    )

    ts_cols = [c for c, kind in _PROFILE_COLS if kind == "ts"]
    is_ts = F.col("column_name").isin(ts_cols)
    return stats.select(
        "column_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_num",
        "max_num",
        F.when(is_ts, F.date_format("__mn_ts", "yyyy-MM-dd HH:mm:ss"))
        .otherwise(F.col("__mn_str"))
        .alias("min_str"),
        F.when(is_ts, F.date_format("__mx_ts", "yyyy-MM-dd HH:mm:ss"))
        .otherwise(F.col("__mx_str"))
        .alias("max_str"),
    ).orderBy("column_name")


# ---------------------------------------------------------------------------
# Data-quality expectations + join-key skew diagnostic
# ---------------------------------------------------------------------------


@query(
    "quality_expectations",
    oracle="""
SELECT * FROM (
SELECT 'completeness_custkey' AS rule, COUNT(*) AS n_rows,
       CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_violations,
       COUNT(*) - COUNT(o_custkey) = 0 AS passed
FROM orders
UNION ALL
SELECT 'unique_orderkey', COUNT(*),
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
       COUNT(*) - COUNT(DISTINCT o_orderkey) = 0
FROM orders
UNION ALL
SELECT 'range_totalprice', COUNT(*),
       CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                      OR o_totalprice > 600000 THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                 OR o_totalprice > 600000 THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 'set_orderstatus', COUNT(*),
       CAST(SUM(CASE WHEN o_orderstatus IS NULL
                      OR o_orderstatus NOT IN ('F','O','P')
                THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN o_orderstatus IS NULL
                 OR o_orderstatus NOT IN ('F','O','P')
           THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 'fk_custkey_customer', (SELECT COUNT(*) FROM orders),
       CAST((SELECT COUNT(*) FROM orders o
             LEFT JOIN customer c ON o.o_custkey = c.c_custkey
             WHERE c.c_custkey IS NULL) AS BIGINT),
       (SELECT COUNT(*) FROM orders o
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL) = 0
) ORDER BY rule
""",
)
def quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (the Deequ / Great-Expectations
    pattern): declarative rules evaluated as ONE aggregate pass over the
    fact table — completeness, uniqueness, numeric range, value-set
    membership — plus one referential-integrity check as a broadcast
    anti-join count.

    Scale shape: the four row-local rules share a single scan (each is a
    map-side-combined aggregate expression; the uniqueness rule is the
    only distinct aggregate, so no Expand is planned). The FK rule is a
    LEFT ANTI join from the 100 TB fact to the dimension key set —
    broadcast when the dim fits (here), shuffle-hash on the key
    otherwise; either way the violation COUNT is the only driver-side
    value. Output is one row per rule so a scheduler can gate a pipeline
    on ``passed`` without re-reading anything.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")

    bad_price = F.when(
        F.col("o_totalprice").isNull()
        | (F.col("o_totalprice") < 0)
        | (F.col("o_totalprice") > 600000),
        1,
    ).otherwise(0)
    bad_status = F.when(
        F.col("o_orderstatus").isNull()
        | ~F.col("o_orderstatus").isin("F", "O", "P"),
        1,
    ).otherwise(0)
    wide = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("v_complete"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("v_unique"),
        F.sum(bad_price).cast("long").alias("v_range"),
        F.sum(bad_status).cast("long").alias("v_set"),
    )
    local = wide.selectExpr(
        "stack(4, "
        "'completeness_custkey', n, v_complete, "
        "'unique_orderkey', n, v_unique, "
        "'range_totalprice', n, v_range, "
        "'set_orderstatus', n, v_set"
        ") AS (rule, n_rows, n_violations)"
    )
    orphans = (
        orders.join(
            F.broadcast(cust),
            orders.o_custkey == cust.c_custkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .crossJoin(orders.agg(F.count(F.lit(1)).alias("n_rows")))
        .select(
            F.lit("fk_custkey_customer").alias("rule"),
            "n_rows",
            "n_violations",
        )
    )
    return (
        local.unionByName(orphans)
        .withColumn("passed", F.col("n_violations") == 0)
        .orderBy("rule")
    )


@query(
    "diag_key_skew",
    oracle="""
WITH per_key AS (
    SELECT o_custkey AS cust_key, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey),
tot AS (
    SELECT SUM(n_orders) AS total, AVG(n_orders) AS mean_per_key
    FROM per_key)
SELECT cust_key, n_orders,
       ROUND(CAST(n_orders AS DOUBLE) / total, 6) AS share,
       ROUND(CAST(n_orders AS DOUBLE) / mean_per_key, 6) AS skew_x
FROM per_key, tot
ORDER BY n_orders DESC, cust_key
LIMIT 10
""",
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the 10 heaviest ``o_custkey`` values
    with their row share and skew factor (count / mean-count-per-key) —
    the number you read BEFORE choosing salted vs AQE-skew-join for a
    100 TB join (the engine's salted paths: ``join_salted_skew``,
    ``agg_salted_distinct``).

    Shape: one map-side-combined groupBy to per-key counts, the global
    total/mean as a second tiny aggregate over the per-key frame
    (broadcast back via crossJoin — 1 row), and a TakeOrderedAndProject
    top-10. Nothing materializes the full key histogram on the driver.
    Ties broken by key for deterministic output.
    """
    per_key = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust_key"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    tot = per_key.agg(
        F.sum("n_orders").alias("total"),
        F.avg("n_orders").alias("mean_per_key"),
    )
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "cust_key",
            "n_orders",
            F.round(F.col("n_orders") / F.col("total"), 6).alias("share"),
            F.round(F.col("n_orders") / F.col("mean_per_key"), 6).alias(
                "skew_x"
            ),
        )
        .orderBy(F.desc("n_orders"), "cust_key")
        .limit(10)
    )


@query(
    "quality_delete_propagation",
    oracle="""
SELECT * FROM (
SELECT 'customer' AS table_name,
       (SELECT COUNT(*) FROM customer) AS n_before,
       (SELECT COUNT(*) FROM customer WHERE c_custkey % 100 = 0)
           AS n_deleted,
       (SELECT COUNT(*) FROM customer WHERE c_custkey % 100 <> 0)
           AS n_after
UNION ALL
SELECT 'orders',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders WHERE o_custkey % 100 = 0),
       (SELECT COUNT(*) FROM orders WHERE o_custkey % 100 <> 0)
) ORDER BY table_name
""",
)
def quality_delete_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation audit: a deletion list (here the
    deterministic ``c_custkey % 100 = 0`` cohort standing in for a GDPR
    erasure queue) is propagated to every table keyed by the subject, and
    the audit reports per-table before/deleted/after counts — the numbers
    a compliance job must log before rewriting files.

    Shape: the deletion list is TINY relative to the corpus, so each fact
    table pays exactly one scan joined LEFT against the broadcast list
    (count(*) vs count(matched key) gives deleted vs surviving in the
    same aggregate — no second pass, no anti-join re-scan). At 100 TB the
    actual rewrite is the storage layer's job (Delta/Iceberg delete
    vectors or copy-on-write compaction, cf. ``layout_compaction_bins``);
    this query is the O(one scan per table) accounting step that gates it.
    Null keys never match the list (SQL join semantics), so they are
    counted as surviving — the conservative choice for erasure.
    """
    dele = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 100 == 0)
        .select(F.col("c_custkey").alias("del_key"))
        # an erasure queue can carry the same subject twice; a duplicate
        # key on the build side would multiply fact rows through the
        # LEFT join and double-count n_deleted
        .distinct()
    )

    def audit(df: DataFrame, key: str, name: str) -> DataFrame:
        return (
            df.join(
                F.broadcast(dele), F.col(key) == F.col("del_key"), "left"
            )
            .agg(
                F.count(F.lit(1)).alias("n_before"),
                F.count("del_key").alias("n_deleted"),
            )
            .select(
                F.lit(name).alias("table_name"),
                "n_before",
                "n_deleted",
                (F.col("n_before") - F.col("n_deleted")).alias("n_after"),
            )
        )

    cust = audit(load_table(spark, sf_dir, "customer"), "c_custkey", "customer")
    orde = audit(load_table(spark, sf_dir, "orders"), "o_custkey", "orders")
    return cust.unionByName(orde).orderBy("table_name")


@query(
    "profile_null_patterns",
    oracle="""
WITH e AS (
    SELECT CASE WHEN event_id % 13 = 0 THEN NULL ELSE user_id END AS u,
           CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS v,
           CASE WHEN event_id % 7 = 0 THEN NULL ELSE props END AS p
    FROM events)
SELECT u IS NULL AS null_user, v IS NULL AS null_value,
       p IS NULL AS null_props,
       COUNT(*) AS n_rows,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / (SELECT COUNT(*) FROM events), 6) AS share
FROM e
GROUP BY 1, 2, 3
ORDER BY null_user, null_value, null_props
""",
)
def profile_null_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missingness-pattern fingerprint: which COMBINATIONS of columns are
    null together, with row counts and shares — the diagnostic that
    separates "5 % of each column is missing independently" from "5 % of
    ROWS are missing everything" (joint patterns drive imputation and
    upstream-bug triage; Little & Rubin's missing-data taxonomy starts
    here).

    The fixture is fully dense, so a deterministic null mask (event_id
    mod 13/11/7 for user/value/props) is injected identically in engine
    and oracle — the query's subject is the PATTERN aggregation, which
    the mask makes 8-way non-trivial (incl. the joint 1001st row where
    7·11·13 | event_id).

    Shape: one scan, one groupBy over at most 2^k patterns (k = audited
    columns) — map-side combine collapses each partition to ≤2^k rows, so
    the shuffle is bytes regardless of table size. For wide tables pack
    the k flags into one LONG bitmask (same plan, one column); the share
    denominator is a 1-row broadcast subquery, not a window over the
    fact.
    """
    ev = load_table(spark, sf_dir, "events")
    masked = ev.select(
        F.when(F.col("event_id") % 13 == 0, None)
        .otherwise(F.col("user_id"))
        .alias("u"),
        F.when(F.col("event_id") % 11 == 0, None)
        .otherwise(F.col("value"))
        .alias("v"),
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("props"))
        .alias("p"),
    )
    total = ev.agg(F.count(F.lit(1)).alias("__total"))
    return (
        masked.groupBy(
            F.col("u").isNull().alias("null_user"),
            F.col("v").isNull().alias("null_value"),
            F.col("p").isNull().alias("null_props"),
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .select(
            "null_user",
            "null_value",
            "null_props",
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
        )
        .orderBy("null_user", "null_value", "null_props")
    )


#: sf_dir -> scratch root holding the two heterogeneous-schema parquet
#: batches (one write per process, atexit-cleaned).
_EVOLVE_SCRATCH: dict[str, str] = {}


@query(
    "layout_schema_evolution",
    # The batches are DERIVED from orders deterministically (even keys =
    # v1 without o_orderstatus, odd keys = v2 without o_custkey), so the
    # mergeSchema fill-null contract is declaratively restatable on the
    # base table: a column is present exactly on its batch's rows.
    oracle="""
SELECT * FROM (
SELECT 'o_custkey' AS column_name,
       (SELECT COUNT(*) FROM orders) AS n_rows,
       (SELECT COUNT(o_custkey) FROM orders WHERE o_orderkey % 2 = 0)
           AS n_present
UNION ALL
SELECT 'o_orderkey', (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(o_orderkey) FROM orders)
UNION ALL
SELECT 'o_orderstatus', (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(o_orderstatus) FROM orders WHERE o_orderkey % 2 = 1)
UNION ALL
SELECT 'o_totalprice', (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(o_totalprice) FROM orders)
) ORDER BY column_name
""",
)
def layout_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution: two ingestion batches written with
    DIFFERENT schemas (v1 carries ``o_custkey``, v2 drops it and adds
    ``o_orderstatus``) are read back as ONE table under
    ``mergeSchema=true``, and the audit counts per-column presence across
    the unified frame — pinning the fill-null contract (a column absent
    from a file reads as null for that file's rows, never an error).

    This is the lakehouse reality a 100 TB corpus lives with: producers
    evolve additively over years, and the reader must unify thousands of
    heterogeneous footers. ``mergeSchema`` pays a per-file footer read at
    planning (why Delta/Iceberg move the unified schema into the
    transaction log instead — same read semantics, O(1) planning); the
    audit itself is one scan with per-column count aggregates, map-side
    combined. Scratch batches are written once per process and
    atexit-cleaned (plan-lint eager list, tests/test_plan_lint.py).
    """
    root = _EVOLVE_SCRATCH.get(sf_dir)
    if root is None or not os.path.isdir(root):
        root = tempfile.mkdtemp(prefix="fs_evolve_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders")
        (
            orders.filter(F.col("o_orderkey") % 2 == 0)
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .write.mode("overwrite")
            .parquet(os.path.join(root, "b1"))
        )
        (
            orders.filter(F.col("o_orderkey") % 2 == 1)
            .select("o_orderkey", "o_totalprice", "o_orderstatus")
            .write.mode("overwrite")
            .parquet(os.path.join(root, "b2"))
        )
        _EVOLVE_SCRATCH[sf_dir] = root

    unified = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "b1"), os.path.join(root, "b2")
    )
    cols = ["o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice"]
    assert sorted(unified.columns) == cols, unified.columns
    wide = unified.agg(
        F.count(F.lit(1)).alias("__rows"),
        *[F.count(c).alias(f"{c}__p") for c in cols],
    )
    lanes = ", ".join(f"'{c}', __rows, {c}__p" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {lanes}) AS (column_name, n_rows, n_present)"
    ).orderBy("column_name")


@query(
    "text_phrase_match",
    oracle="""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
    FROM documents)
SELECT doc_id,
       CAST(LEN(list_filter(range(1, LEN(toks)),
                i -> toks[i] = 'hash' AND toks[i+1] = 'join'))
            AS BIGINT) AS n_occurrences
FROM t
WHERE LEN(list_filter(range(1, LEN(toks)),
          i -> toks[i] = 'hash' AND toks[i+1] = 'join')) > 0
ORDER BY doc_id
""",
)
def text_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-index phrase search: every document containing the
    exact phrase "hash join", with its occurrence count — resolved by
    JOINING the two terms' posting lists on (doc, adjacent position),
    the classic positional-inverted-index algorithm (Manning/Raghavan/
    Schütze IR ch. 2), never a LIKE scan over the full text.

    Shape: a per-doc HOF extracts (term, pos) structs for ONLY the
    phrase's terms before anything explodes — the exploded posting frame
    is O(df(hash) + df(join)), not O(total tokens) — then one equi-join
    on (doc_id, pos+1) and a count per doc. At 100 TB the posting lists
    are the PERSISTED inverted index (built once, cf. ``text_bm25_topk``'s
    term dimension): a phrase query touches two postings and joins them
    co-partitioned on doc_id, cost independent of corpus text volume.
    The oracle replays the phrase predicate declaratively per document.
    """
    docs = load_table(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(transform(filter(split(lower(text), ' '), "
                "x -> x <> ''), (t, i) -> struct(t AS term, i AS pos)), "
                "s -> s.term IN ('hash', 'join'))"
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.term").alias("term"), F.col("s.pos").alias("pos"))
    first = postings.filter(F.col("term") == "hash").select(
        "doc_id", "pos"
    )
    second = postings.filter(F.col("term") == "join").select(
        F.col("doc_id").alias("doc_id2"), F.col("pos").alias("pos2")
    )
    return (
        first.join(
            second,
            (F.col("doc_id") == F.col("doc_id2"))
            & (F.col("pos2") == F.col("pos") + 1),
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy("doc_id")
    )


@query(
    "diag_join_cardinality",
    oracle="""
WITH co AS (
    SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
cl AS (
    SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1)
SELECT (SELECT COUNT(*) FROM orders) AS n_orders,
       (SELECT COUNT(*) FROM lineitem) AS n_lineitem,
       CAST((SELECT COALESCE(SUM(co.c * cl.c), 0)
             FROM co JOIN cl ON co.k = cl.k) AS BIGINT) AS n_join_predicted,
       (SELECT COUNT(*) FROM orders o JOIN lineitem l
        ON o.o_orderkey = l.l_orderkey) AS n_join_actual,
       CAST((SELECT COALESCE(SUM(co.c * cl.c), 0)
             FROM co JOIN cl ON co.k = cl.k) AS BIGINT)
           = (SELECT COUNT(*) FROM orders o JOIN lineitem l
              ON o.o_orderkey = l.l_orderkey) AS match_exact
""",
)
def diag_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality prediction WITHOUT running the join: |A ⋈ B| =
    Σ_k c_A(k)·c_B(k) over the two key histograms — the estimate a
    planner (or an engineer deciding whether a 100 TB fact-to-fact join
    is feasible) computes before committing the shuffle. The query emits
    the prediction AND the measured join count with an equality bit; the
    identity is exact, so the oracle pins both numbers.

    Scale shape: the two histograms are map-side-combined groupBys that
    shrink each fact to its key cardinality, and the histogram join is
    keys-sized, not rows-sized — at 100 TB that is the difference between
    a diagnostic you run casually and the join itself. The measured
    column exists as the correctness anchor; drop it in production and
    only the histogram stage remains. Sketch variant for unbounded key
    cardinality: per-key counts → count-min (cf. ``agg_countmin_user_
    counts``), prediction = Σ over heavy hitters + tail bound.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    co = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c_o")
    )
    cl = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c_l")
    )
    pred = co.join(cl, "k").agg(
        F.coalesce(F.sum(F.col("c_o") * F.col("c_l")), F.lit(0))
        .cast("long")
        .alias("n_join_predicted")
    )
    actual = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .agg(F.count(F.lit(1)).alias("n_join_actual"))
    )
    return (
        orders.agg(F.count(F.lit(1)).alias("n_orders"))
        .crossJoin(li.agg(F.count(F.lit(1)).alias("n_lineitem")))
        .crossJoin(F.broadcast(pred))
        .crossJoin(F.broadcast(actual))
        .withColumn(
            "match_exact",
            F.col("n_join_predicted") == F.col("n_join_actual"),
        )
    )


#: sf_dir -> (sink_dir, n_dropped) for the watermark-drop stream (one
#: drain per process, atexit-cleaned).
_LATE_SCRATCH: dict[str, tuple[str, int]] = {}


@query(
    "stream_late_drops",
    # Watermark replay, derived like the engine's three arrival batches
    # (delay 30 min, 1-h tumbling windows, append mode):
    #   batch 1: 08:00..09:59  -> watermark after it: 09:29
    #   batch 2: one 09:59 row (bridge -- the wm a batch USES lags one
    #            commit behind the data, measured; the bridge batch makes
    #            09:29 effective for batch 3)
    #   batch 3: the %9==2 rows at 07:00..07:49 have window end 08:00 <
    #            09:29 -> DROPPED (excluded below); the %9==5 rows at
    #            09:05..09:24 are row-late (ts < 09:29) but their window
    #            [09:00,10:00) is still open -> KEPT (window-level
    #            lateness, the semantic this query pins); %9==8 fresh.
    # Final wm = max(all arrivals) - 30 min = 11:17; append emits only
    # windows whose end <= 11:17 (the [11:00,12:00) window never emits).
    oracle="""
WITH b1 AS (
    SELECT TIMESTAMP '2026-01-01 08:00:00'
           + to_minutes(CAST(event_id % 120 AS BIGINT)) AS ts
    FROM events WHERE event_id < 600 AND event_id % 3 <> 2),
b2 AS (
    SELECT TIMESTAMP '2026-01-01 09:59:00' AS ts
    FROM events WHERE event_id = 2),
b3_kept AS (
    SELECT CASE WHEN event_id % 9 = 5
                THEN TIMESTAMP '2026-01-01 09:05:00'
                     + to_minutes(CAST(event_id % 20 AS BIGINT))
                ELSE TIMESTAMP '2026-01-01 10:30:00'
                     + to_minutes(CAST(event_id % 80 AS BIGINT)) END AS ts
    FROM events
    WHERE event_id < 600 AND event_id % 3 = 2 AND event_id <> 2
      AND event_id % 9 <> 2),
b3_all AS (
    SELECT ts FROM b3_kept
    UNION ALL
    SELECT TIMESTAMP '2026-01-01 07:00:00'
           + to_minutes(CAST(event_id % 50 AS BIGINT))
    FROM events
    WHERE event_id < 600 AND event_id % 9 = 2 AND event_id <> 2),
wm AS (SELECT MAX(ts) - INTERVAL 30 MINUTE AS w FROM b3_all),
kept AS (
    SELECT ts FROM b1 UNION ALL SELECT ts FROM b2
    UNION ALL SELECT ts FROM b3_kept)
SELECT strftime(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
       COUNT(*) AS n_events
FROM kept, wm
WHERE DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR <= wm.w
GROUP BY 1 ORDER BY 1
""",
)
def stream_late_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data accounting: a 3-batch file stream drains
    through a 1-hour tumbling count with a 30-minute watermark in APPEND
    mode, and the sink shows exactly which data survived: rows later
    than the watermark whose WINDOW is already closed are dropped (the
    07:xx batch-3 stragglers), rows equally "late" whose window is still
    open are counted (the 09:05-09:24 stragglers — lateness is decided
    per WINDOW, not per row), and windows the final watermark never
    passed ([11:00,12:00)) are withheld from the append sink entirely.

    Measured mechanics this encodes: the watermark a batch USES lags one
    commit behind the batch whose data produced it — hence the 1-row
    bridge batch between the fresh load and the stragglers; availableNow
    runs a final no-data batch to advance the watermark and flush
    closeable windows; and late rows are discarded by a Filter node
    planned BEFORE the aggregation, so ``numRowsDroppedByWatermark``
    (a state-operator metric) does NOT see them — real drop accounting
    is input-minus-sink, which the test asserts. At 100 TB the same topology is the hourly-rollup
    ingest: state is one count per open window per key, dropped-row
    counts are the ops signal for "our producers are later than the
    watermark budget".
    """
    hit = _LATE_SCRATCH.get(sf_dir)
    if hit is None or not os.path.isdir(hit[0]):
        root = tempfile.mkdtemp(prefix="fs_late_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        src = os.path.join(root, "src")
        out = os.path.join(root, "out")
        os.makedirs(src)
        ev = load_table(spark, sf_dir, "events").select("event_id")
        m = "make_interval(0, 0, 0, 0, 0, CAST(%s AS INT), 0)"
        b1 = ev.filter("event_id < 600 AND event_id % 3 <> 2").selectExpr(
            "TIMESTAMP '2026-01-01 08:00:00' + "
            + m % "event_id % 120"
            + " AS ts"
        )
        b2 = ev.filter("event_id = 2").selectExpr(
            "TIMESTAMP '2026-01-01 09:59:00' AS ts"
        )
        b3 = ev.filter(
            "event_id < 600 AND event_id % 3 = 2 AND event_id <> 2"
        ).selectExpr(
            "CASE WHEN event_id % 9 = 2 THEN "
            "TIMESTAMP '2026-01-01 07:00:00' + " + m % "event_id % 50"
            + " WHEN event_id % 9 = 5 THEN "
            "TIMESTAMP '2026-01-01 09:05:00' + " + m % "event_id % 20"
            + " ELSE TIMESTAMP '2026-01-01 10:30:00' + "
            + m % "event_id % 80"
            + " END AS ts"
        )
        base_t = 1_700_000_000
        for i, b in enumerate((b1, b2, b3)):
            d = os.path.join(src, f"f{i}")
            b.coalesce(1).write.parquet(d)
            for fn in os.listdir(d):
                os.utime(
                    os.path.join(d, fn), (base_t + i * 100, base_t + i * 100)
                )
        stream = (
            spark.readStream.schema("ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src, "*"))
        )
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "n_events",
            )
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option(
                "checkpointLocation", os.path.join(root, "ck")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        )
        _LATE_SCRATCH[sf_dir] = (out, dropped)
        hit = (out, dropped)
    return spark.read.parquet(hit[0]).orderBy("window_start")


@query(
    "profile_observe_metrics",
    oracle="""
SELECT (SELECT COUNT(*) FROM orders) AS n_input,
       (SELECT CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT) FROM orders) AS n_nonpositive,
       (SELECT COUNT(DISTINCT o_orderstatus) FROM orders) AS n_status,
       (SELECT COUNT(*) FROM (
            SELECT o_orderstatus FROM orders GROUP BY o_orderstatus))
           AS n_result_rows
""",
)
def profile_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metrics piggybacking via the ``Observation`` API: a production
    aggregation runs ONCE, and QC counters (input rows, non-positive
    prices, distinct statuses) ride along as ``observe`` accumulators on
    the SAME scan — zero extra passes, exact values, no sampling. The
    query returns the observed metrics plus the result-set size, so the
    oracle can pin that observation semantics equal a (conceptually
    second-scan) declarative restatement.

    This is the 100 TB answer to "instrument the pipeline without
    doubling its cost": every Spark action already streams each row
    through the plan, and ``CollectMetrics`` taps that stream with
    aggregate expressions evaluated JVM-side (plan node below the agg —
    no Python, no second job). Contrast `profile_table_stats`, which IS
    the second scan when no production query is in flight to ride on.
    """
    from pyspark.sql import Observation

    obs = Observation("qc")
    observed = load_table(spark, sf_dir, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("n_nonpositive"),
        # DISTINCT aggregates are rejected in observed metrics
        # (INVALID_OBSERVED_METRICS): CollectMetrics must be a mergeable
        # accumulator. approx_count_distinct (HLL) is the sanctioned
        # form -- exact here (3 statuses is far under HLL's sparse-mode
        # exactness threshold), approximate-by-design at high cardinality.
        F.approx_count_distinct("o_orderstatus").alias("n_status"),
    )
    # the "production" query: per-status rollup (its action triggers the
    # observation; result size carried into the output)
    result = observed.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    n_result_rows = result.count()
    got = obs.get
    return spark.createDataFrame(
        [
            (
                got["n_input"],
                got["n_nonpositive"],
                got["n_status"],
                n_result_rows,
            )
        ],
        "n_input long, n_nonpositive long, n_status long, "
        "n_result_rows long",
    )


@query(
    "sim_mips_topk",
    # The oracle is the DIRECT answer: exact max-inner-product top-5 per
    # query. Engine-side the shortlist travels through the augmented-
    # cosine space; parity against this direct form IS the proof of the
    # MIPS->cosine reduction identity.
    oracle="""
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
scored AS (
    SELECT q.query_id, e.vec_id,
           ROUND(list_inner_product(qv, v), 6) AS dot_r
    FROM q CROSS JOIN e)
SELECT query_id, vec_id, dot_r, rnk
FROM (SELECT *, CAST(ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY dot_r DESC, vec_id) AS INT) AS rnk
      FROM scored)
WHERE rnk <= 5
""",
)
def sim_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search via the MIPS→cosine reduction
    (Bachrach et al., RecSys 2014; Shrivastava & Li, NIPS 2014): corpus
    vectors are augmented with one extra coordinate sqrt(M² − |x|²)
    (M = max corpus norm) and queries with 0, after which COSINE order in
    the augmented space equals INNER-PRODUCT order in the original space
    — cos_aug(q,x) = q·x / (|q|·M), a per-query monotone transform.

    Engine route: augmented-cosine shortlist (top-20 per query) → exact
    dot-product re-rank to top-5; the oracle computes direct MIPS top-5,
    so parity proves the reduction end-to-end. The shortlist margin
    absorbs last-ulp reorderings of the float division.

    Why it matters at 100 TB: recommendation scoring is MIPS (user·item,
    no normalization), but every sublinear index the engine has — SRP
    buckets (`sim_srp_topk`), IVF cells (`sim_ivf_topk`), int8 coarse
    scan (`sim_quantized_rerank`) — is built for COSINE/L2 geometry.
    The augmentation is one narrow column appended at index-build time,
    and unlocks all of them for inner-product retrieval unchanged.
    """
    from featurestore_for_joycastle_java_spark.operators import (
        similarity as S,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", S.as_double(F.col("embedding")).alias("v")
    )
    mx = e.agg(
        F.max(S.l2_norm(F.col("v"))).alias("m")
    )
    # augmented corpus: [x, sqrt(M^2 - |x|^2)]; norm becomes M for every
    # vector, so cosine denominators are constant per query
    aug = e.crossJoin(F.broadcast(mx)).select(
        "vec_id",
        "v",
        F.concat(
            "v",
            F.array(
                F.sqrt(
                    F.col("m") * F.col("m")
                    - S.dot(F.col("v"), F.col("v"))
                )
            ),
        ).alias("va"),
    )
    q = aug.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.concat("v", F.array(F.lit(0.0))).alias("qa"),
    )
    from pyspark.sql import Window

    scored = q.crossJoin(aug.select("vec_id", "v", "va")).select(
        "query_id",
        "vec_id",
        "qv",
        "v",
        S.cosine(F.col("qa"), F.col("va")).alias("cos_aug"),
    )
    w20 = Window.partitionBy("query_id").orderBy(
        F.desc("cos_aug"), "vec_id"
    )
    shortlist = scored.withColumn(
        "crank", F.row_number().over(w20)
    ).filter(F.col("crank") <= 20)
    rerank = shortlist.select(
        "query_id",
        "vec_id",
        F.round(S.dot(F.col("qv"), F.col("v")), 6).alias("dot_r"),
    )
    w5 = Window.partitionBy("query_id").orderBy(F.desc("dot_r"), "vec_id")
    return (
        rerank.withColumn("rnk", F.row_number().over(w5).cast("int"))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "vec_id", "dot_r", "rnk")
    )


@query(
    "feature_quantile_bins",
    oracle="""
WITH b AS (
    SELECT list_transform(
        quantile_cont(o_totalprice,
            [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
        x -> ROUND(x, 6)) AS bs
    FROM orders)
SELECT CAST(LEN(list_filter(bs, x -> o_totalprice > x)) AS INT) AS bin,
       COUNT(*) AS n_orders,
       ROUND(MIN(o_totalprice), 6) AS min_price,
       ROUND(MAX(o_totalprice), 6) AS max_price
FROM orders, b
GROUP BY 1 ORDER BY 1
""",
)
def feature_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth quantile binning (the QuantileDiscretizer / feature-
    bucketing primitive): decile boundaries computed EXACTLY (linear-
    interpolated type-7 percentiles — Spark ``percentile`` and DuckDB
    ``quantile_cont`` agree bit-for-bit on this fixture), rounded to 6dp
    ONCE, then every row assigned bin = #(boundaries < value) via an
    array HOF against the broadcast 9-element boundary list. Rounding
    before assignment makes membership decisions identical across
    engines; the strict ``>`` is the documented edge rule.

    Scale path: exact percentile aggregates buffer the column per
    partition — fine to ~10⁸ rows/partition, the wrong tool at 100 TB.
    The one-line switch is ``approx_percentile`` (t-digest sketch,
    mergeable partials) for the boundary stage; the assignment HOF and
    the binning contract are unchanged. Bins feed target encoding
    (`feature_target_encoding`) and monotonic-feature checks.
    """
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.transform(
            F.percentile(
                "o_totalprice",
                F.array(*[F.lit(i / 10) for i in range(1, 10)]),
            ),
            lambda x: F.round(x, 6),
        ).alias("bs")
    )
    return (
        orders.crossJoin(F.broadcast(bounds))
        .select(
            F.size(
                F.filter(
                    "bs", lambda b: F.col("o_totalprice") > b
                )
            )
            .cast("int")
            .alias("bin"),
            "o_totalprice",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 6).alias("min_price"),
            F.round(F.max("o_totalprice"), 6).alias("max_price"),
        )
        .orderBy("bin")
    )


@query(
    "er_customer_clusters",
    # Recursive-CTE CC over the same blocked match predicate — engine
    # (iterative min-label propagation) and oracle converge to the same
    # unique min-reachable-id fixpoint (dedup_cc_clusters pattern).
    oracle="""
WITH RECURSIVE
r AS (
    SELECT c_custkey AS record_id, c_name AS nm,
           c_nationkey AS nk, c_acctbal AS ab
    FROM customer
    UNION ALL
    SELECT c_custkey + 1000000, substr(c_name, 1, 17) || 'X',
           c_nationkey, c_acctbal
    FROM customer WHERE c_custkey % 50 = 0),
pairs AS (
    SELECT a.record_id AS id_a, b.record_id AS id_b
    FROM r a JOIN r b
      ON a.record_id < b.record_id
     AND a.nk = b.nk
     AND substr(a.nm, 10, 4) = substr(b.nm, 10, 4)
    WHERE levenshtein(a.nm, b.nm) <= 1 AND a.ab = b.ab),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION ALL
    SELECT id_b AS src, id_a AS dst FROM pairs),
reach AS (
    SELECT record_id AS node, record_id AS comp FROM r
    UNION
    SELECT e.dst AS node, q.comp AS comp
    FROM reach q JOIN edges e ON e.src = q.node),
cc AS (SELECT node AS record_id, MIN(comp) AS cluster_id
       FROM reach GROUP BY 1)
SELECT record_id, cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
           AS n_members,
       record_id >= 1000000 AS is_synthetic
FROM cc
""",
)
def er_customer_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over STRUCTURED records — the record-linkage
    workflow (Fellegi-Sunter framing, modern blocking practice): a dirty
    re-registration batch (every 50th customer re-enters with a
    corrupted name, deterministic in both engines) is resolved against
    the master by blocking → multi-field fuzzy scoring → connected
    components → cluster ids.

    Stages and their 100 TB shape:
    - BLOCK on (nationkey, 4-digit name prefix): the self-join is an
      equi-join on the block key — Σ block² comparisons, never n² (the
      same inverted-index discipline as the document-dedup family, but
      over typed fields).
    - SCORE within block: thresholded ``levenshtein(name) ≤ 1`` AND
      exact ``acctbal`` agreement — a compound predicate, because name
      edit distance alone is useless here (every customer name is lev-1
      from its key-neighbors: single-field fuzzy matching is the classic
      ER mistake this query's fixture makes visible).
    - CLUSTER with the generic CC operator (min-label propagation,
      O(log diameter) rounds) rather than assuming matches form neat
      pairs — real linkage graphs chain (A~B~C), and survivorship needs
      the component, not the edge. Oracle replays the fixpoint as a
      recursive CTE.
    """
    from pyspark.sql import Window

    records, cc = _er_records_and_clusters(spark, sf_dir)
    w = Window.partitionBy("cluster_id")
    return cc.select(
        "record_id",
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("n_members"),
        (F.col("record_id") >= 1000000).alias("is_synthetic"),
    )


def _er_records_and_clusters(spark, sf_dir):
    """Shared ER pipeline: (records, record->cluster labels). Blocking,
    compound scoring, and CC exactly as documented on
    ``er_customer_clusters``."""
    from featurestore_for_joycastle_java_spark.operators import dedup as D

    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("record_id"),
        F.col("c_name").alias("nm"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_acctbal").alias("ab"),
    )
    dirty = cust.filter(F.col("c_custkey") % 50 == 0).select(
        (F.col("c_custkey") + 1000000).alias("record_id"),
        F.concat(F.substring("c_name", 1, 17), F.lit("X")).alias("nm"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_acctbal").alias("ab"),
    )
    records = base.unionByName(dirty)
    blocked = records.withColumn("blk", F.substring("nm", 10, 4))
    a = blocked.alias("a")
    b = blocked.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.nk") == F.col("b.nk"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.record_id") < F.col("b.record_id")),
        )
        # acctbal equality FIRST (codegen And short-circuits left-to-
        # right, the rare balance match gates the string verify); the
        # 3-arg levenshtein itself short-circuits above the threshold
        # (returns -1), so far pairs never pay full edit-distance
        .filter(
            (F.col("a.ab") == F.col("b.ab"))
            & (F.levenshtein(F.col("a.nm"), F.col("b.nm"), 1) >= 0)
        )
        .select(
            F.col("a.record_id").alias("id_a"),
            F.col("b.record_id").alias("id_b"),
        )
    )
    cc = D.connected_components(
        records.select("record_id"), edges, id_col="record_id"
    ).withColumnRenamed("component", "cluster_id")
    return records, cc


@query(
    "er_golden_record",
    oracle="""
WITH RECURSIVE
r AS (
    SELECT c_custkey AS record_id, c_name AS nm,
           c_nationkey AS nk, c_acctbal AS ab
    FROM customer
    UNION ALL
    SELECT c_custkey + 1000000, substr(c_name, 1, 17) || 'X',
           c_nationkey, c_acctbal
    FROM customer WHERE c_custkey % 50 = 0),
pairs AS (
    SELECT a.record_id AS id_a, b.record_id AS id_b
    FROM r a JOIN r b
      ON a.record_id < b.record_id
     AND a.nk = b.nk
     AND substr(a.nm, 10, 4) = substr(b.nm, 10, 4)
    WHERE levenshtein(a.nm, b.nm) <= 1 AND a.ab = b.ab),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION ALL
    SELECT id_b AS src, id_a AS dst FROM pairs),
reach AS (
    SELECT record_id AS node, record_id AS comp FROM r
    UNION
    SELECT e.dst AS node, q.comp AS comp
    FROM reach q JOIN edges e ON e.src = q.node),
cc AS (SELECT node AS record_id, MIN(comp) AS cluster_id
       FROM reach GROUP BY 1)
SELECT cc.cluster_id,
       arg_min(r.nm, r.record_id) AS canonical_name,
       ROUND(MAX(r.ab), 2) AS canonical_acctbal,
       CAST(COUNT(*) AS BIGINT) AS n_sources
FROM cc JOIN r USING (record_id)
GROUP BY cc.cluster_id
HAVING COUNT(*) > 1
ORDER BY cc.cluster_id
""",
)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship — the second half of master-data consolidation: for
    every multi-record entity cluster from `er_customer_clusters`, build
    the GOLDEN record with field-level survivorship rules (name = the
    oldest source's via ``min_by`` on record id — "system of record
    wins"; balance = MAX across sources — "most favorable value";
    n_sources for lineage). Clusters of one are pass-throughs and are
    excluded — the golden-record table is the consolidation DELTA a
    merge job applies.

    Shape: the cluster labels come from the shared blocked-CC pipeline
    (O(Σ block²) + O(log diameter) rounds); survivorship itself is ONE
    groupBy over the labeled records with ``min_by``/``max`` — rule
    changes (most-recent wins, majority vote, source priority) swap
    aggregate expressions, not pipeline structure.
    """
    records, cc = _er_records_and_clusters(spark, sf_dir)
    labeled = cc.join(records, "record_id")
    return (
        labeled.groupBy("cluster_id")
        .agg(
            F.min_by("nm", "record_id").alias("canonical_name"),
            F.round(F.max("ab"), 2).alias("canonical_acctbal"),
            F.count(F.lit(1)).alias("n_sources"),
        )
        .filter(F.col("n_sources") > 1)
        .orderBy("cluster_id")
    )


@query(
    "agg_theta_audience_overlap",
    # Below the sketch's nominal-entries threshold (default 2^12 = 4096)
    # a theta sketch retains EVERY distinct hash, so estimates are exact
    # and deterministic — and distinct users per segment are 150/1500 at
    # sf0.01/0.1 — hence the oracle pins the EXACT set algebra, not
    # bounds. Past saturation the same query degrades to ~1-2% estimates
    # (docstring) and an agg_hll_mergeable-style boolean oracle applies.
    oracle="""
WITH u AS (SELECT DISTINCT event_type, user_id FROM events)
SELECT a.et AS seg_a, b.et AS seg_b,
       a.n AS n_a, b.n AS n_b,
       (SELECT COUNT(*) FROM
            (SELECT user_id FROM u WHERE event_type = a.et
             INTERSECT
             SELECT user_id FROM u WHERE event_type = b.et))
           AS n_overlap,
       (SELECT COUNT(*) FROM
            (SELECT user_id FROM u WHERE event_type = a.et
             UNION
             SELECT user_id FROM u WHERE event_type = b.et))
           AS n_union,
       (SELECT COUNT(*) FROM
            (SELECT user_id FROM u WHERE event_type = a.et
             EXCEPT
             SELECT user_id FROM u WHERE event_type = b.et))
           AS n_only_a
FROM (SELECT event_type AS et, COUNT(DISTINCT user_id) AS n FROM u
      GROUP BY 1) a
JOIN (SELECT event_type AS et, COUNT(DISTINCT user_id) AS n FROM u
      GROUP BY 1) b
  ON (a.et, b.et) IN (('click','purchase'), ('click','view'),
                      ('signup','error'))
ORDER BY seg_a, seg_b
""",
)
def agg_theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap analytics via THETA sketches (Apache DataSketches,
    Spark 4 ``theta_sketch_agg``/``theta_intersection``/``theta_union``/
    ``theta_difference``): one sketch per behavioral segment (event
    type), then the full distinct-set ALGEBRA — overlap, union, and
    A-minus-B — evaluated sketch-on-sketch without ever re-touching the
    fact table.

    This is the capability boundary HLL cannot cross: HLL union is
    lossless but HLL has NO intersection (inclusion-exclusion on
    estimates compounds error and goes negative on small overlaps);
    theta sketches carry a hash SAMPLE, so intersections and differences
    are first-class. At 100 TB: one sketch per (segment, day) persisted
    at ingest — any "users who did A and B but not C this week" question
    becomes set algebra over kilobyte sketches. Below nominal entries
    (4096) the sketch keeps every hash and the numbers are EXACT (the
    fixture regime, pinned by the oracle); past it they are ~1-2%
    estimates with the same algebra.
    """
    u = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.col("user_id").cast("int").alias("uid"))
    )
    sk = u.groupBy("event_type").agg(
        F.expr("theta_sketch_agg(uid)").alias("s"),
        F.countDistinct("uid").cast("long").alias("n"),
    )
    pairs = spark.createDataFrame(
        [("click", "purchase"), ("click", "view"), ("signup", "error")],
        "seg_a string, seg_b string",
    )
    a = sk.alias("a")
    b = sk.alias("b")
    return (
        pairs.join(a, F.col("seg_a") == F.col("a.event_type"))
        .join(b, F.col("seg_b") == F.col("b.event_type"))
        .select(
            "seg_a",
            "seg_b",
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            F.expr(
                "CAST(theta_sketch_estimate("
                "theta_intersection(a.s, b.s)) AS BIGINT)"
            ).alias("n_overlap"),
            F.expr(
                "CAST(theta_sketch_estimate("
                "theta_union(a.s, b.s)) AS BIGINT)"
            ).alias("n_union"),
            F.expr(
                "CAST(theta_sketch_estimate("
                "theta_difference(a.s, b.s)) AS BIGINT)"
            ).alias("n_only_a"),
        )
        .orderBy("seg_a", "seg_b")
    )


@query(
    "agg_kll_quantile_merge",
    # KLL estimates are not SQL-replayable (randomized compactor state);
    # the oracle pins the exact stream length (KLL tracks n exactly) and
    # the rank-error booleans the sketch guarantees (k=200 default:
    # ~1.65% normalized rank error at 99% confidence; 3% bound leaves
    # margin) — the agg_hll_mergeable pattern for quantiles.
    oracle="""
SELECT COUNT(*) AS n_rows,
       TRUE AS rank_p50_ok,
       TRUE AS rank_p90_ok
FROM orders
""",
)
def agg_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE sketches (Apache DataSketches KLL, Spark 4
    ``kll_sketch_agg_double``/``kll_sketch_merge_double``): one sketch
    per order-priority slice, merged into a whole-table sketch whose
    p50/p90 are then validated against the EXACT empirical CDF — the
    engine computes the true rank of each estimated quantile (one
    filter-count per quantile) and asserts it within the sketch's rank-
    error bound. n is tracked exactly by KLL, so merged n must equal
    COUNT(*) bit-for-bit.

    The quantile sibling of `agg_hll_mergeable` and the sketch behind
    "p99 latency per (service, day), rollup-able to any period without
    rescanning": percentile_approx answers one query; persisted KLL
    partials answer every future rollup by merge. At 100 TB the slice
    sketches are the stored artifact; this query IS the merge path.
    """
    orders = load_table(spark, sf_dir, "orders")
    slices = orders.groupBy("o_orderpriority").agg(
        F.expr("kll_sketch_agg_double(o_totalprice)").alias("sk")
    )
    # kll_sketch_merge_double is a 2-arg SCALAR merge (not an agg):
    # fold the slice sketches with an aggregate HOF — the same
    # left-fold a 100 TB rollup runs over persisted partials
    merged = slices.agg(
        F.collect_list("sk").alias("sks")
    ).selectExpr(
        "aggregate(slice(sks, 2, size(sks) - 1), sks[0], "
        "(acc, x) -> kll_sketch_merge_double(acc, x)) AS m"
    ).select(
        F.expr("kll_sketch_get_n_double(m)").cast("long").alias("n_rows"),
        F.expr("kll_sketch_get_quantile_double(m, 0.5)").alias("p50"),
        F.expr("kll_sketch_get_quantile_double(m, 0.9)").alias("p90"),
    )
    est = merged.collect()[0]
    total = est["n_rows"]
    # ONE validation scan for both quantiles (r12 opt, guide §2.4 —
    # the two filter().count() passes re-read orders once per quantile
    # for two independent conditional counts the same aggregate
    # computes together; counts identical by construction)
    ranks = orders.agg(
        F.sum((F.col("o_totalprice") <= est["p50"]).cast("long")).alias(
            "n50"
        ),
        F.sum((F.col("o_totalprice") <= est["p90"]).cast("long")).alias(
            "n90"
        ),
    ).collect()[0]
    r50 = ranks["n50"] / total
    r90 = ranks["n90"] / total
    return spark.createDataFrame(
        [(total, abs(r50 - 0.5) <= 0.03, abs(r90 - 0.9) <= 0.03)],
        "n_rows long, rank_p50_ok boolean, rank_p90_ok boolean",
    )


@query(
    "diag_table_diff",
    # The "new version" is derived from orders deterministically:
    # %97==0 rows deleted, %101==0 rows repriced (+10), keys+2M added
    # for %503==0 — so the diff is declaratively restatable.
    oracle="""
WITH v2 AS (
    SELECT o_orderkey, o_totalprice + 10.0 AS o_totalprice
    FROM orders WHERE o_orderkey % 97 <> 0 AND o_orderkey % 101 = 0
    UNION ALL
    SELECT o_orderkey, o_totalprice
    FROM orders WHERE o_orderkey % 97 <> 0 AND o_orderkey % 101 <> 0
    UNION ALL
    SELECT o_orderkey + 2000000, o_totalprice
    FROM orders WHERE o_orderkey % 503 = 0),
j AS (
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS okey,
           CASE WHEN b.o_orderkey IS NULL THEN 'removed'
                WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN a.o_totalprice <> b.o_totalprice THEN 'changed'
                ELSE 'unchanged' END AS change_type
    FROM orders a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey)
SELECT change_type, COUNT(*) AS n_rows,
       MIN(okey) AS min_key, MAX(okey) AS max_key
FROM j GROUP BY 1 ORDER BY 1
""",
)
def diag_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset version diff (the data-reconciliation op behind "what
    changed between yesterday's snapshot and today's"): FULL OUTER join
    on the key classifies every row as added / removed / changed /
    unchanged, rolled up with per-class key ranges for the audit log.

    Shape: ONE co-partitioned full-outer join on the key (both sides
    shuffle once on o_orderkey; with both snapshots bucketed on the key
    — `layout_bucketed_join` — even that shuffle disappears), then a
    4-group aggregate. 'changed' compares the tracked column directly
    here; for wide tables the standard trick is comparing a precomputed
    per-row content hash so the join carries 2 columns, not 50. At
    100 TB this query is why snapshots keep PRIMARY-KEY layout: the
    diff is a merge-scan, never a rebuild.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    v2 = (
        orders.filter(
            (F.col("o_orderkey") % 97 != 0)
        ).select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 101 == 0,
                F.col("o_totalprice") + 10.0,
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    ).unionByName(
        orders.filter(F.col("o_orderkey") % 503 == 0).select(
            (F.col("o_orderkey") + 2000000).alias("o_orderkey"),
            "o_totalprice",
        )
    )
    a = orders.alias("a")
    b = v2.alias("b")
    j = a.join(
        b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    ).select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias(
            "okey"
        ),
        F.when(F.col("b.o_orderkey").isNull(), "removed")
        .when(F.col("a.o_orderkey").isNull(), "added")
        .when(
            F.col("a.o_totalprice") != F.col("b.o_totalprice"), "changed"
        )
        .otherwise("unchanged")
        .alias("change_type"),
    )
    return (
        j.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("okey").alias("min_key"),
            F.max("okey").alias("max_key"),
        )
        .orderBy("change_type")
    )


#: BFS depth bound shared by the engine loop and the oracle's recursive
#: CTE (the graph_closeness_multi_bfs discipline, r11): 30 ≫ the
#: measured single-digit co-supply diameter, and a deeper future
#: fixture truncates BOTH sides at the same depth instead of diverging.
_BFS_MAX_HOPS = 30


@query(
    "graph_bfs_hops",
    # Recursive-CTE BFS with a generous depth cap (30 ≫ the co-supply
    # diameter — the engine loop shares the bound via _BFS_MAX_HOPS;
    # UNION-dedup alone cannot terminate on cyclic graphs because
    # revisits arrive with ever-larger hop counts).
    oracle=f"""
WITH RECURSIVE
bip AS (
    SELECT DISTINCT l_partkey AS p, l_suppkey AS s
    FROM lineitem WHERE l_quantity >= 49.0),
e AS (
    SELECT a.s AS u, b.s AS v
    FROM bip a JOIN bip b ON a.p = b.p AND a.s < b.s
    GROUP BY 1, 2),
dir AS (
    SELECT u AS src, v AS dst FROM e
    UNION ALL
    SELECT v AS src, u AS dst FROM e),
s0 AS (SELECT MIN(u) AS s FROM e),
walk AS (
    SELECT s AS node, 0 AS hops FROM s0
    UNION
    SELECT d.dst AS node, w.hops + 1 AS hops
    FROM walk w JOIN dir d ON d.src = w.node
    WHERE w.hops < {_BFS_MAX_HOPS})
SELECT node, CAST(MIN(hops) AS INT) AS hops
FROM walk GROUP BY 1 ORDER BY node
""",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS (shortest hop counts) over the co-supply graph
    — the traversal member of the graph family (PageRank, k-core,
    triangles, common-neighbors, CC): distances from the minimum-key
    supplier to every reachable node by frontier expansion.

    Loop shape (the Pregel/BSP pattern, same discipline as the CC
    operator): per round ONE join frontier→neighbors + ONE left-anti
    prune against the visited set, both localCheckpointed so lineage
    stays flat; the only driver-side value per round is the 1-row
    frontier count; rounds = eccentricity of the source (single-digit
    here — dense projection graphs have tiny diameters). At 100 TB the
    edge list is hash-partitioned on src once and every round's join
    reuses that partitioning. The oracle replays the fixpoint as a
    depth-capped recursive CTE.
    """
    from featurestore_for_joycastle_java_spark.operators.graphs import (
        cosupply_edges,
    )

    e = cosupply_edges(spark, sf_dir).localCheckpoint(eager=True)
    # r13: hash-partition at the session shuffle width (scale-adaptive),
    # not a hard-coded 32 — the width the loop's joins then reuse.
    direct = (
        e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(e.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .repartition(F.col("src"))
        .localCheckpoint(eager=True)
    )
    src = e.agg(F.min("u")).collect()[0][0]
    visited = spark.createDataFrame([(src, 0)], "node long, hops int")
    visited = visited.localCheckpoint(eager=True)
    frontier = visited
    hop = 0
    while hop < _BFS_MAX_HOPS:
        hop += 1
        # r13 (guide §2.4): the frontier count IS the materializing
        # action of a LAZY checkpoint (the CC-loop discipline) — one job
        # per round instead of eager-checkpoint + count; and the visited
        # set stays a plain union of already-persisted per-round RDDs
        # (depth = eccentricity, single-digit here) instead of paying a
        # third per-round copy job.
        nxt = (
            frontier.join(direct, frontier.node == direct.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).cast("int").alias("hops"))
            .localCheckpoint(eager=False)
        )
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited.orderBy("node")


# --- r7-window head (already driver-verified r7) registers last so the
# --- r8 driver window (first 50 registered) is exactly the never-checked set.
@query(
    "dedup_incremental_batch",
    # The engine output is EXACT-verified shingle-jaccard on candidates
    # probed incrementally, so (same recall argument as dedup_minhash_lsh:
    # candidate recall is 1.0 on the fixtures, banding floor ~0.9998 at
    # the generator's 0.8+ similarity) it equals the exact all-pairs
    # answer restricted to pairs with >= 1 new-batch member — which is
    # what the oracle computes declaratively. The full-rebuild composition
    # law (incremental == rebuild restricted to >=1-new) is pinned
    # engine-vs-engine in tests/test_round7.py.
    oracle=f"""
WITH {_SHINGLES}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       {_SH_DIST} AS jaccard_dist
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)
  AND {_SH_DIST} <= 0.4
""",
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup: the docs with ``doc_id % 5 = 0`` arrive
    as today's ingestion batch; the other 80 % are the existing corpus
    whose 64-perm MinHash signatures are PERSISTED (parquet scratch,
    written once per process and read back — the index-on-storage half of
    the workflow). The probe bands the batch, joins batch bands against
    the corpus band index (one hash join — the corpus never self-joins),
    and exact-verifies shingle Jaccard on candidates only, fetching raw
    text solely for candidate ids. Emits every near-dup pair with >= 1
    new member. See ``operators.dedup.minhash_lsh_pairs_incremental``
    for the composition law and the 100 TB cost argument."""
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    base = docs.filter(F.col("doc_id") % 5 != 0)

    sig_path = _SIG_SCRATCH.get(sf_dir)
    if sig_path is None:
        root = tempfile.mkdtemp(prefix="fs_sigs_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        sig_path = os.path.join(root, "base_sigs")
        D.minhash_signatures(
            base, "doc_id", "text", shingle_k=3, num_perm=64
        ).write.mode("overwrite").parquet(sig_path)
        _SIG_SCRATCH[sf_dir] = sig_path
    base_sigs = spark.read.parquet(sig_path)

    return D.minhash_lsh_pairs_incremental(
        base,
        new,
        "doc_id",
        "text",
        base_sigs=base_sigs,
        max_jaccard_distance=0.4,
        shingle_k=3,
        num_perm=64,
        n_bands=16,
    )


@query(
    "dedup_semdedup",
    # lowid centroids make the whole index SQL-replayable (the
    # sim_ivf_topk pattern): assignment ties broken by lowest cent_id on
    # the UNROUNDED cosine (the engine fold keeps the first strict max in
    # cent_id order; Spark's HOF cosine is bit-identical to DuckDB's
    # list_inner_product on double-cast input — verified for the IVF
    # family); the near-dup predicate uses the 6dp-ROUNDED cosine so the
    # pair set is engine-stable. The k-means production variant is the
    # same operator with centroids="kmeans" (recall-style checks only).
    oracle="""
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings),
cents AS (
    SELECT vec_id AS cent_id, v AS cv FROM e ORDER BY vec_id LIMIT 16),
assigned AS (
    SELECT vec_id, cent_id, v FROM (
        SELECT e.vec_id, c.cent_id, e.v,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                   list_inner_product(e.v, c.cv)
                   / (SQRT(list_inner_product(e.v, e.v))
                      * SQRT(list_inner_product(c.cv, c.cv))) DESC,
                   c.cent_id) AS rn
        FROM e CROSS JOIN cents c)
    WHERE rn = 1),
dropped AS (
    SELECT DISTINCT b.vec_id
    FROM assigned a JOIN assigned b
      ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
    WHERE ROUND(list_inner_product(a.v, b.v)
          / (SQRT(list_inner_product(a.v, a.v))
             * SQRT(list_inner_product(b.v, b.v))), 6) >= 0.4)
SELECT s.vec_id, s.cent_id,
       d.vec_id IS NULL AS survivor
FROM assigned s LEFT JOIN dropped d ON s.vec_id = d.vec_id
""",
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style embedding-cluster dedup (Abbas et al., 2023):
    16 cells, intra-cluster cosine >= 0.4 prune, keep-lowest-id
    canonicalization — per-vector (vec_id, cent_id, survivor). The
    deterministic lowid-centroid variant so the full index replays in
    SQL; ``semdedup_survivors(centroids="kmeans")`` is the production
    fit. Candidate pairs = Σ m_i² (~7.8 k on the 500-vec fixture vs
    124 750 all-pairs, a 16× prune — asserted in tests)."""
    e = load_table(spark, sf_dir, "embeddings")
    return semdedup_survivors(
        e, "vec_id", "embedding", n_centroids=16, threshold=0.4
    )
