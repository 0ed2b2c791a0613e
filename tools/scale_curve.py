"""Measured scaling curves for the headline scale-path operators —
committed evidence for the 100 TB design claims, not just prose.

Inflates the sf0.1 ``documents`` / ``embeddings`` tables by 2x/4x/8x
(every other table symlinked) and times a representative set of
registry queries at each factor, fitting the growth exponent
``alpha`` in ``t ~ factor^alpha`` by least squares on the log-log
curve. A bucketed/banded/cell-pruned operator should come out near
alpha <= 1 (linear scan + near-linear shuffle); anything trending
toward 2 would expose a hidden all-pairs stage.

Inflation preserves the dup/cluster structure WITHIN each replica and
breaks it ACROSS replicas:

- documents: replica i shifts doc_id by i*10_000_000 and rewrites the
  text through an alphabet rotation (``translate`` by i letters), so
  near-dup pairs replicate per copy instead of exploding quadratically
  across copies (identical copies would make every replica of doc X
  match every other — a measurement artifact, not a corpus shape);
  n_chars is preserved by construction (translate is 1:1).
- embeddings: replica i shifts vec_id the same way and offsets every
  component by i*0.0137, displacing the replica's point cloud so
  cluster structure repeats instead of stacking.

Also measures the INCREMENTAL ingest claim directly: a fixed 500-doc
batch probed (``minhash_lsh_pairs_incremental``) against a corpus of
growing size whose MinHash signatures are persisted to parquet — the
per-batch cost should grow only with the linear corpus-index scan
term, far below the full rebuild's slope.

Usage: python tools/scale_curve.py [out.json] [factors...]
Writes SCALETEST_r{N}.json-style artifact (default SCALETEST.json).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_SF = "/root/testdata/sf0.1"
_SCRATCH = os.path.join(_REPO, ".scratch", "scale")
_ALPHA = "abcdefghijklmnopqrstuvwxyz"

#: relational queries timed on the inflated FACT tables (lineitem /
#: orders / customer replicated with consistent key offsets; dims
#: symlinked — facts grow, dims don't, the realistic star-schema shape)
_TPCH_QUERIES = [
    "tpch_q1_pricing",  # single-scan agg
    "tpch_q3_shipping",  # customer x orders x lineitem join
    "tpch_q9_profit",  # 6-way join, the heaviest classic
    "tpch_q18_bigorders",  # group-having semi-join + top-k
]

#: the reference's flagship pipeline (events fact inflated): JSON parse +
#: regex extract + completeness filter + demux — the queries BASELINE.md's
#: single 5.78s number describes, here as a measured curve (batch plan and
#: the availableNow streaming drain)
_FLAGSHIP_QUERIES = [
    "ingest_dwd",
    "ingest_demux_counts",
    "stream_drain_demux_counts",
]

#: streaming-state family (VERDICT r8 ask #8): the claimed cost model is
#: state-rows x trigger-commits (a fixed floor) plus a linear per-event
#: term — measured under the same 2x/4x/8x event inflation as the drain
#: so the claim is a curve, not a docstring
_STREAMING_STATE_QUERIES = [
    "stream_stateful_totals",
    "stream_hourly_active_users",
    "stream_late_drops",
]

#: as-of/PIT family (VERDICT r9 ask #5 — the one headline family with
#: no measured alpha): plain backward as-of, the bucketed skew-mitigated
#: twin, the multi_asof_join training-set assembly, and the
#: grouped_prefix_sum-backed token-budget mix — all union+window /
#: two-pass-bucketed shapes whose claimed cost is ONE key shuffle plus
#: local sorts, so alpha should sit near 1
_ASOF_QUERIES = [
    "asof_backward_purchase_click",
    "asof_bucketed_backward",
    "feature_training_set_pit",
    "train_token_budget_mix",
]

#: registry queries timed per factor — each one's 100 TB story is a
#: bucketed / banded / cell-pruned / single-scan shape that must NOT
#: bend quadratic as the driving table grows
_QUERIES = [
    "dedup_exact_groups",  # one md5-key hash shuffle
    "dedup_minhash_lsh",  # banded LSH candidates + exact verify
    "dedup_simhash_md5",  # banded simhash
    "dedup_semdedup",  # cell-bucketed embedding dedup
    "dedup_cc_clusters",  # jaccard edges + iterative min-label CC
    "sim_cosine_topk",  # brute-force ANN baseline (fixed query set)
    "sim_ivf_topk",  # cell-pruned ANN
    "text_bm25_topk",  # inverted-index retrieval
    "text_stats",  # single-scan HOF text analysis
]

#: round-10b/10c additions (r10 continuation): iterative-graph,
#: pairwise-statistic, and matrix-build shapes whose 100 TB story is
#: vocabulary-/cell-/dimension-bounded work after one corpus-sized
#: collapse — alpha should sit near 1 for all of them
_R10_ADDITIONS_QUERIES = [
    "graph_label_propagation",  # O(k*E) sync LPA on the trade graph
    "text_textrank_keywords",  # vocab-bounded pagerank after one explode
    "text_keyword_rake",  # phrase windows + word aggregate
    "eval_kendall_tau",  # cell-banded pair stage (cells, not users)
    "eval_auc_delong_se",  # distinct-score collapse + two windows
    "sim_covariance_matrix",  # d^2 cells, corpus-size-independent output
    "sim_power_iteration_pc1",  # Gram build + d-sized iteration
    "feature_quantile_normalize",  # two-pass global rank + source windows
    # joined after SCALETEST_r10add.json was cut (round-10d/e); covered
    # by the next full-suite run
    "graph_closeness_multi_bfs",  # simultaneous 8-root BFS
    "ts_binary_segmentation",  # collapse-first CUSUM argmax
    # er_blocking_metrics read alpha 2.03 in SCALETEST_r10 — an
    # inflation artifact (replicas shared c_name, one giant block).
    # Re-included now that the customer replication regenerates c_name
    # from the offset key (VERDICT r10 ask #6); expected ~Σblock²
    # within replicas, alpha ≈ 1.
    "er_blocking_metrics",
    "agg_log2_histogram",  # one combine-friendly hash aggregate
    "layout_overlap_depth",  # file-count-bounded boundary sweep
    "sim_triplet_margin_accuracy",  # LEAD + as-of triplets, d-equi dots
    "quality_functional_dependency",  # groups re-aggregated, never rows
]


def _rot(i: int) -> str:
    return _ALPHA[i % 26 :] + _ALPHA[: i % 26]


def _build_factor_dir(factor: int) -> str:
    """Scratch sf_dir with documents/embeddings inflated ``factor``x."""
    import duckdb

    from featurestore_for_joycastle_java_spark.schemas import TABLE_NAMES

    base = os.path.join(_SCRATCH, f"x{factor}")
    if os.path.isdir(base):
        shutil.rmtree(base)
    os.makedirs(base)
    con = duckdb.connect()
    doc_parts = [
        f"""SELECT doc_id + {i * 10_000_000} AS doc_id,
               translate(text, '{_ALPHA}', '{_rot(i)}') AS text,
               lang, source, n_chars
        FROM read_parquet('{_SF}/documents.parquet')"""
        for i in range(factor)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(doc_parts)}) TO "
        f"'{base}/documents.parquet' (FORMAT PARQUET)"
    )
    emb_parts = [
        f"""SELECT vec_id + {i * 10_000_000} AS vec_id,
               list_transform(embedding,
                   x -> CAST(x + {i} * 0.0137 AS FLOAT)) AS embedding,
               label
        FROM read_parquet('{_SF}/embeddings.parquet')"""
        for i in range(factor)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(emb_parts)}) TO "
        f"'{base}/embeddings.parquet' (FORMAT PARQUET)"
    )
    # fact tables: replicate with CONSISTENT key offsets so every join
    # key resolves within its replica (customer->orders->lineitem);
    # part/supplier/nation/region stay symlinked — dims don't grow.
    # c_name is REGENERATED from the offset key ('Customer#' + 9-digit
    # key, the TPC-H name=f(key) contract) so name-blocked queries see
    # replicas land in DIFFERENT blocks — identical names across
    # replicas made er_blocking_metrics read a spurious alpha 2.03
    # (one giant block), a measurement artifact (VERDICT r10 ask #6)
    _K = 100_000_000
    fact_replace = {
        "customer": (
            "c_custkey + {o} AS c_custkey, "
            "'Customer#' || lpad(CAST(c_custkey + {o} AS VARCHAR), 9, '0')"
            " AS c_name"
        ),
        "orders": "o_orderkey + {o} AS o_orderkey, o_custkey + {o} AS o_custkey",
        "lineitem": "l_orderkey + {o} AS l_orderkey",
        "events": "event_id + {o} AS event_id, user_id + {o} AS user_id",
    }
    for t, repl in fact_replace.items():
        parts = [
            f"SELECT * REPLACE ({repl.format(o=i * _K)}) "
            f"FROM read_parquet('{_SF}/{t}.parquet')"
            for i in range(factor)
        ]
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO "
            f"'{base}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in TABLE_NAMES:
        if t in ("documents", "embeddings", *fact_replace):
            continue
        src = os.path.join(_SF, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(base, f"{t}.parquet"))
    return base


def _fit_alpha(factors: list[int], times: list[float]) -> float:
    """Least-squares slope of log(t) on log(factor)."""
    xs = [math.log(f) for f in factors]
    ys = [math.log(max(t, 1e-3)) for t in times]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    return round(
        sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 2
    )


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "SCALETEST.json"
    factors = (
        [int(a) for a in sys.argv[2:]] if len(sys.argv) > 2 else [1, 2, 4, 8]
    )

    from pyspark.sql import functions as F

    from featurestore_for_joycastle_java_spark import get_spark, registry

    registry.load_catalog()
    from featurestore_for_joycastle_java_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
        minhash_signatures,
    )
    from featurestore_for_joycastle_java_spark.registry import QUERIES
    from featurestore_for_joycastle_java_spark.sources import load_table

    spark = get_spark(
        app_name="scale-curve",
        master="local[32]",
        shuffle_partitions=32,
        # inflated facts push broadcast builds past the 1g driver default
        # (q9's build side at 8x); this is measurement-harness config,
        # not an engine default — a cluster sizes its driver anyway
        extra_conf={"spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    def run(thunk) -> float:
        # time CONSTRUCTION + execution: the iterative operators (CC,
        # k-core, k-means) run their loops eagerly while the query
        # function builds the frame, so timing only the final write
        # would miss their whole cost
        t0 = time.monotonic()
        thunk().write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        spark.catalog.clearCache()
        return dt

    dirs: dict[int, str] = {}

    def _dir(f: int) -> str:
        if f not in dirs:
            dirs[f] = _build_factor_dir(f)
        return dirs[f]

    for f in factors:
        _dir(f)
    results: dict[str, dict] = {}

    def curve(name: str, thunk_for, rows_for=None, fs=None) -> None:
        fs = fs or factors
        times = []
        for f in fs:
            run(thunk_for(f))  # warm (plan/codegen) — discarded
            # min of two measured runs: the noise-floor estimator —
            # scheduler/GC contention only ever ADDS time, so min is the
            # consistent per-factor cost and keeps alpha from being bent
            # by a single contended run
            times.append(
                round(min(run(thunk_for(f)), run(thunk_for(f))), 2)
            )
        # output size recorded at the BASE factor only: a fourth
        # execution per factor just for a row count roughly doubled
        # harness time on the eager iterative queries (ADVICE r8) —
        # the timing curve is the artifact, the base count is context
        out_rows_base = (rows_for or thunk_for)(fs[0])().count()
        results[name] = {
            "sec": dict(zip(map(str, fs), times)),
            "out_rows_base": out_rows_base,
            "alpha": _fit_alpha(fs, times),
        }
        print(f"{name}: {times} alpha={results[name]['alpha']}", flush=True)

    for name in (
        _QUERIES
        + _TPCH_QUERIES
        + _FLAGSHIP_QUERIES
        + _STREAMING_STATE_QUERIES
        + _ASOF_QUERIES
        + _R10_ADDITIONS_QUERIES
    ):
        curve(
            name,
            lambda f, n=name: (lambda: QUERIES[n](spark, _dir(f))),
        )

    # hot-key as-of skew claim (VERDICT r9 ask #5): plain asof_join
    # serializes a hot entity into one window task, asof_join_bucketed
    # spreads it over (key, day-bucket). Reproduce the claim ON the
    # inflated fixtures: remap 30% of user_ids onto ONE key (the hot
    # key's row count then grows linearly with the factor — replica
    # offsets preserved for the rest), time both paths. Expected: the
    # bucketed path's advantage WIDENS with the factor — the straggler
    # is O(hot rows log hot rows) in one task while the bucketed path
    # spreads it across buckets x parallelism.
    from featurestore_for_joycastle_java_spark.operators.asof import (
        asof_join,
        asof_join_bucketed,
    )

    def _hotkey_frames(sf_dir: str):
        e = load_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.unix_micros(F.col("ts")).alias("t"),
        )
        hot = e.withColumn(
            "user_id",
            F.when(F.col("user_id") % 10 < 3, F.lit(0)).otherwise(
                F.col("user_id")
            ),
        )
        p = (
            hot.filter(F.col("event_type") == "purchase")
            .groupBy("user_id", "t")
            .agg(F.max_by("value", "event_id").alias("purchase_value"))
        )
        v = hot.filter(F.col("event_type") == "view").select(
            "event_id", "user_id", "t"
        )
        return v, p

    def _hot_plain(f: int):
        def thunk():
            v, p = _hotkey_frames(_dir(f))
            return asof_join(
                v, p, on=["user_id"], left_ts="t", right_ts="t",
                right_cols=["purchase_value"],
            )

        return thunk

    def _hot_bucketed(f: int):
        def thunk():
            v, p = _hotkey_frames(_dir(f))
            return asof_join_bucketed(
                v, p, on=["user_id"], left_ts="t", right_ts="t",
                right_cols=["purchase_value"],
                bucket_width=86_400_000_000,
            )

        return thunk

    curve("asof_plain_hotkey", _hot_plain)
    curve("asof_bucketed_hotkey", _hot_bucketed)
    hk_note = (
        "30% of events remapped onto one user_id; same frames, same "
        "day-bucket width as asof_bucketed_backward; compare the two "
        "curves at the top factor for the skew-mitigation claim"
    )
    results["asof_plain_hotkey"]["note"] = hk_note
    results["asof_bucketed_hotkey"]["note"] = hk_note

    # SemDeDup at the fixed-hardware optimum: data-adaptive (k-means)
    # centroids with k ~ sqrt(n) and a bounded training sample. The
    # fixed-16-cell registry curve above shows the anti-pattern (cells
    # grow with the corpus, Sigma m^2 bends quadratic); this one shows
    # the parametrization the operator docstring prescribes. Expected
    # alpha ~1.5 — the brute-assignment optimum (n*k assign + n^2/k
    # pairs balance at k=sqrt(n)); with k ∝ n the pair SHUFFLE is
    # linear and the n*k term is per-row broadcast compute that scales
    # with executors, not data movement (see the operator docstring).
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        semdedup_survivors,
    )

    # one extra octave (16x) vs the rest of the suite (VERDICT r9 ask
    # #7): alpha 0.95 at 8x is close enough to linear that the next
    # point shows whether the sqrt(n) cell growth holds the slope or
    # the Sigma m^2 pair term starts bending
    semdedup_fs = factors + [factors[-1] * 2] if len(factors) > 1 else factors
    curve(
        "semdedup_kmeans_sqrt_cells",
        lambda f: (
            lambda: semdedup_survivors(
                load_table(spark, _dir(f), "embeddings"),
                n_centroids=int(16 * f**0.5),
                centroids="kmeans",
                fit_sample=64 * int(16 * f**0.5),
            )
        ),
        fs=semdedup_fs,
    )

    # ... and at CONSTANT CELL SIZE (k = n/m-bar, VERDICT r10 ask #3):
    # the remedy for the sqrt curve's measured 16x bend (2^1.57/octave
    # once Sigma m^2 dominates). Holding m-bar fixed keeps the pair
    # stage linear (Sigma m^2 ~ n*m-bar); the n*k assignment fold grows
    # instead but shuffles nothing. Expected: the 16x octave stays near
    # the earlier slope instead of bending. m-bar = 125 (the base
    # factor's 2000 vectors / 16 cells) so the x1 point matches the
    # sqrt curve's start and the two curves differ ONLY in how k grows.
    curve(
        "semdedup_kmeans_cellsize",
        lambda f: (
            lambda: semdedup_survivors(
                load_table(spark, _dir(f), "embeddings"),
                centroids="kmeans",
                fit_sample=64 * 16 * f,
                corpus_rows=2000 * f,
                target_cell_size=125,
            )
        ),
        fs=semdedup_fs,
    )

    # incremental-ingest claim: fixed 500-doc batch, growing corpus with
    # PERSISTED signatures (index build excluded from the probe timing —
    # that is the operator's contract at ingest time)
    import duckdb

    batch_path = os.path.join(_SCRATCH, "batch")
    if os.path.isdir(batch_path):
        shutil.rmtree(batch_path)
    os.makedirs(batch_path)
    duckdb.connect().execute(
        f"""COPY (SELECT doc_id + 90_000_000 AS doc_id,
                   translate(text, '{_ALPHA}', '{_rot(13)}') AS text,
                   lang, source, n_chars
            FROM read_parquet('{_SF}/documents.parquet')
            WHERE doc_id < 500)
        TO '{batch_path}/documents.parquet' (FORMAT PARQUET)"""
    )
    batch = spark.read.parquet(f"{batch_path}/documents.parquet")
    probe_times = []
    for f in factors:
        corpus = load_table(spark, _dir(f), "documents")
        sig_path = os.path.join(_SCRATCH, f"sigs_x{f}")
        # num_perm must match the probe's banding (64 = the operator
        # default the registry queries use)
        minhash_signatures(corpus, "doc_id", "text", num_perm=64).write.mode(
            "overwrite"
        ).parquet(sig_path)
        sigs = spark.read.parquet(sig_path)
        probe = lambda: minhash_lsh_pairs_incremental(
            corpus, batch, "doc_id", "text", base_sigs=sigs
        )
        run(probe)
        probe_times.append(round(min(run(probe), run(probe)), 2))
    results["incremental_probe_persisted_sigs"] = {
        "sec": dict(zip(map(str, factors), probe_times)),
        "batch_docs": 500,
        "alpha": _fit_alpha(factors, probe_times),
        "note": "fixed batch vs growing corpus; signatures persisted — "
        "the slope is the corpus-index scan term, not a rebuild",
    }
    print(
        f"incremental_probe: {probe_times} "
        f"alpha={results['incremental_probe_persisted_sigs']['alpha']}",
        flush=True,
    )

    # derive from the actual fixture, not a hardcoded 5000*f — the
    # sf0.1 row count has changed between rounds before (ADVICE r8)
    base_docs = (
        duckdb.connect()
        .execute(
            f"SELECT COUNT(*) FROM read_parquet('{_SF}/documents.parquet')"
        )
        .fetchone()[0]
    )
    doc = {
        "sf_base": _SF,
        "factors": factors,
        "docs_at_factor": {str(f): base_docs * f for f in factors},
        "method": "noop-format write; per factor: one discarded warm run "
        "(plan/codegen), then MIN of two measured runs (noise-floor "
        "estimator — contention only adds time); cache cleared between "
        "runs, local[32]/32 shuffle partitions",
        "alpha": "least-squares slope of log(sec) vs log(factor); ~1 = "
        "linear, ~2 = quadratic; sub-second times include fixed "
        "scheduling overhead that biases alpha DOWN at small factors",
        "queries": results,
    }
    with open(os.path.join(_REPO, out), "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    shutil.rmtree(_SCRATCH, ignore_errors=True)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
