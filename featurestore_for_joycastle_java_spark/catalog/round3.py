"""Round-3 additions: the r2 dead surface wired to full cross-engine
oracles — SRP cosine LSH top-k, md5-based SimHash near-dup pairs, and
winnowing (MOSS) fingerprint candidate pairs. Registered FIRST so the
driver's 50-entry correctness window covers them.

All three are built on engine-portable hashing (md5 parity / md5-prefix
integers), which is what lets DuckDB replay the ENTIRE index — buckets,
candidates, scores — instead of the rows-only checks their xxhash64/JVM
siblings used to get (both replaced in r4 by the boolean-oracled
``sim_lsh_recall`` / ``dedup_simhash_check`` in catalog/round4.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from featurestore_for_joycastle_java_spark.operators import dedup as D
from featurestore_for_joycastle_java_spark.operators.similarity import srp_topk
from featurestore_for_joycastle_java_spark.operators.text import winnow_fingerprints
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


@query(
    "sim_srp_topk",
    # FULL index replay: the md5-parity hyperplanes are a public spec, so
    # the oracle rebuilds them (range x range x range -> list per (table,
    # bit)), recomputes every bucket code, the candidate join, the exact
    # cosine re-rank — the whole ANN index, not just a recall floor.
    oracle="""
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
p AS (
    SELECT t.tbl, b.bit,
           list(CASE WHEN CAST(('0x' || substr(md5(t.tbl || '_' || b.bit
                                                || '_' || d.dim_i), 1, 1))
                          AS INT) % 2 = 1
                     THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END
                ORDER BY d.dim_i) AS pv
    FROM range(8) AS t(tbl), range(8) AS b(bit), range(64) AS d(dim_i)
    GROUP BY 1, 2),
cc AS (
    SELECT e.vec_id, p.tbl,
           SUM(CASE WHEN list_inner_product(e.v, p.pv) > 0
                    THEN CAST(1 AS BIGINT) << p.bit
                    ELSE CAST(0 AS BIGINT) END) AS code
    FROM e CROSS JOIN p GROUP BY 1, 2),
qc AS (
    SELECT q.query_id, p.tbl,
           SUM(CASE WHEN list_inner_product(q.qv, p.pv) > 0
                    THEN CAST(1 AS BIGINT) << p.bit
                    ELSE CAST(0 AS BIGINT) END) AS code
    FROM q CROSS JOIN p GROUP BY 1, 2),
cand AS (
    SELECT DISTINCT qc.query_id, cc.vec_id
    FROM qc JOIN cc ON qc.tbl = cc.tbl AND qc.code = cc.code),
scored AS (
    SELECT c.query_id, c.vec_id,
           ROUND(list_inner_product(q.qv, e.v)
                 / (SQRT(list_inner_product(q.qv, q.qv))
                    * SQRT(list_inner_product(e.v, e.v))), 6) AS cos_sim
    FROM cand c
    JOIN q ON c.query_id = q.query_id
    JOIN e ON c.vec_id = e.vec_id)
SELECT query_id, vec_id, cos_sim, rnk
FROM (SELECT *, CAST(ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS INT) AS rnk
      FROM scored)
WHERE rnk <= 5
""",
)
def sim_srp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-5 via sign-random-projection LSH — the
    cosine-native ANN path with a FULLY deterministic, engine-replayable
    index (md5-parity ±1 hyperplanes, no seed, no JVM state). Candidates
    come only from equal (table, code) buckets; exact cosine re-ranks the
    candidate set. Retires the rows-only oracle duty that the seeded BRP
    path (``operators.similarity.lsh_topk``) can't provide. 8 tables ×
    8 bits (r4, was 16×6): same plane budget cut 96→64 — smaller encode
    fold and 4× more buckets per table, with per-query candidate volume
    down ~4× at equal recall in the high-cos band top-k draws from."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return srp_topk(e, queries, k=5, n_tables=8, n_bits=8, dim=64)


@query(
    "dedup_simhash_md5",
    # With n_bands=4 and max_hamming=3, pigeonhole makes banding recall
    # exactly 1 (3 flipped bits touch at most 3 of 4 bands), so the banded
    # output EQUALS the all-pairs answer — which is what the oracle
    # replays: md5-prefix 60-bit token hashes -> per-bit votes -> simhash
    # -> hamming <= 3 over all pairs. Full value parity, unlike the
    # engine-local xxhash64 twin (checked by ``dedup_simhash_check``).
    oracle="""
WITH tok AS (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS t
    FROM documents),
h AS (
    SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
    FROM tok),
v AS (
    SELECT doc_id, b.bit,
           SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
    FROM h CROSS JOIN range(60) AS b(bit)
    GROUP BY 1, 2),
sh AS (
    SELECT doc_id,
           SUM(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << bit
                    ELSE CAST(0 AS BIGINT) END) AS simhash
    FROM v GROUP BY 1)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
)
def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs on the CROSS-ENGINE 60-bit hash
    (``md5_hash60``: first 15 hex chars of md5 as an integer): explode
    tokens, 60 per-bit signed votes (map-side combined — the shuffle
    carries 60 longs per doc, not the tokens), banded candidate join,
    bit_count(xor) verify. Same scalable shape as the xxhash64 variant;
    the portable hash buys a full DuckDB value oracle."""
    from featurestore_for_joycastle_java_spark.operators.text import md5_hash60

    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_near_pairs(
        docs,
        "doc_id",
        "text",
        max_hamming=3,
        n_bands=4,
        bits=60,
        token_hash=md5_hash60,
    )


@query(
    "text_winnow_pairs",
    # Winnowing is deterministic given the token stream and the (k, w)
    # parameters, and the shingle hash is the portable md5-prefix — the
    # oracle replays the full pipeline with DuckDB list ops: positional
    # 3-token shingles -> 60-bit hashes -> min per 4-wide window ->
    # distinct fingerprints -> pair counts.
    oracle="""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
    FROM documents),
h AS (
    SELECT doc_id,
           list_transform(range(1, len(toks) - 1),
               i -> CAST(('0x' || substr(md5(concat_ws(' ', toks[i],
                          toks[i+1], toks[i+2])), 1, 15)) AS BIGINT)) AS hs
    FROM t WHERE len(toks) >= 3),
w AS (
    SELECT doc_id,
           list_distinct(list_transform(
               range(1, greatest(len(hs) - 3, 1) + 1),
               i -> list_min(hs[i:i+3]))) AS fps
    FROM h),
f AS (SELECT doc_id, unnest(fps) AS fp FROM w)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 2
""",
)
def text_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-similarity candidate pairs via winnowing fingerprints
    (Schleimer/Wilkerson/Aiken, the MOSS algorithm): any shared token run
    of ≥ k+w-1 = 6 tokens guarantees a shared fingerprint — the
    partial-overlap signal whole-doc hashing and bag-of-shingles Jaccard
    both miss. Fingerprint selection is all higher-order functions on one
    row (no explode until the index); the pair join shuffles on
    fingerprint values — one uniform shuffle, the exact-dedup shape.
    Pairs sharing ≥ 2 fingerprints are reported with their shared count."""
    docs = load_table(spark, sf_dir, "documents")
    # the fingerprint index feeds BOTH sides of the self-join — cache it
    # once instead of running the tokenize→shingle-hash→window cascade
    # twice (same lifetime note as the minhash shingle cache: blocks are
    # LRU-evictable and unpersist with the plan's garbage collection)
    fps = docs.select(
        "doc_id",
        F.explode(winnow_fingerprints(F.col("text"), k=3, w=4)).alias("fp"),
    ).cache()
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


@query(
    "feature_ewma_decay",
    # The fold is the DEFINITION of EWMA, and both engines run the same
    # IEEE ops in the same order (Spark aggregate and DuckDB list_reduce
    # are both left-to-right over the ordered values), so the unrounded
    # doubles agree bit-for-bit; 6dp rounding is belt and braces. The two
    # r3 latent divergences are pinned (r4, ADVICE fix): null values are
    # excluded EXPLICITLY on both sides (Spark collect_list drops them
    # silently, DuckDB list() keeps them), and the oracle orders by
    # (ts, event_id, value) — the exact field order of Spark's struct
    # sort — so a regenerated fixture with nulls or (ts, event_id) ties
    # cannot flip parity.
    oracle="""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(list_reduce(list(value ORDER BY ts, event_id, value),
                         (acc, v) -> 0.3 * v + 0.7 * acc), 6) AS ewma_value
FROM events
WHERE value IS NOT NULL
GROUP BY user_id
""",
)
def feature_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed feature value per user (alpha = 0.3) — the
    recency-weighted aggregate a feature store serves next to plain
    sums/averages. See ``operators.features.ewma_decay`` for semantics
    and the 100 TB envelope (this registration folds the full fixture;
    the ``since`` time-slice bound is exercised in tests)."""
    from featurestore_for_joycastle_java_spark.operators.features import (
        ewma_decay,
    )

    ev = load_table(spark, sf_dir, "events")
    return ewma_decay(
        ev, "user_id", "ts", "event_id", "value", alpha=0.3
    )


#: ONE ANSI-SQL string, two engines: Spark executes it via spark.sql over
#: registered temp views, DuckDB executes the identical text as the oracle.
#: Decimal-accumulated money math keeps the result engine-exact.
_SQL_FRONTEND_TEXT = """
SELECT l_returnflag,
       l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(23,6)))
            AS DOUBLE) AS revenue,
       CAST(SUM(CAST(l_quantity AS DECIMAL(23,6))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("sql_frontend_revenue", oracle=_SQL_FRONTEND_TEXT)
def sql_frontend_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-TEXT front end: the exact oracle string executed by
    ``spark.sql`` over registered temp views — parser, analyzer, and
    Catalyst all exercised on ANSI text rather than the DataFrame DSL
    (every other query registers plans programmatically; a user of the
    engine gets both doors). The one SQL string is engine-portable by
    construction: decimal-accumulated sums, explicit casts, no dialect
    functions."""
    from featurestore_for_joycastle_java_spark.sources import (
        register_temp_views,
    )

    register_temp_views(spark, sf_dir)
    return spark.sql(_SQL_FRONTEND_TEXT)


_NEARDUP_PREP_ORACLE = """
WITH RECURSIVE
t AS (
    SELECT doc_id, source, n_chars,
           list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
    FROM documents),
q AS (SELECT doc_id, source, n_chars, len(toks) AS n_tok, toks
      FROM t WHERE len(toks) >= 30),
s AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, len(toks) - 1),
               i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS sh
    FROM q),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE ROUND(1.0 - CAST(LEN(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (LEN(a.sh) + LEN(b.sh) - LEN(list_intersect(a.sh, b.sh))), 6)
          <= 0.4),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION ALL
    SELECT id_b AS src, id_a AS dst FROM pairs),
reach AS (
    SELECT doc_id AS node, doc_id AS comp FROM q
    UNION
    SELECT e.dst AS node, r.comp AS comp
    FROM reach r JOIN edges e ON e.src = r.node),
cc AS (SELECT node AS doc_id, MIN(comp) AS component FROM reach GROUP BY 1),
surv AS (
    SELECT q.doc_id, q.source, q.n_tok,
           (ROW_NUMBER() OVER (PARTITION BY cc.component
                               ORDER BY q.n_chars DESC, q.doc_id) = 1)
               AS is_surv
    FROM q JOIN cc USING (doc_id)),
k AS (
    SELECT *,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
               % 1000 AS bucket,
           CASE WHEN source IN ('src0', 'src1') THEN 1000 ELSE 500 END AS rate
    FROM surv)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN is_surv THEN 1 ELSE 0 END) AS BIGINT)
           AS n_survivors,
       CAST(SUM(CASE WHEN is_surv AND bucket < rate THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN is_surv AND bucket < rate THEN n_tok ELSE 0 END)
            AS BIGINT) AS n_tokens_kept
FROM k GROUP BY 1
"""


@query(
    "train_corpus_prep_neardup",
    # LSH candidate recall is 1.0 at fixture scales (pair set == exact
    # all-pairs shingle jaccard — established by dedup_minhash_lsh's exact
    # oracle; gating to a subset of docs only removes pairs), so the WHOLE
    # near-dup pipeline replays exactly: gate -> shingle-jaccard pairs ->
    # recursive-CTE components -> survivor window -> md5-bucket sample ->
    # per-source card.
    #
    # SCALE-COUPLED, NOT STRUCTURAL: band recall is 1-(1-s^r)^b < 1, so
    # the equality with the exact-all-pairs oracle is an empirical fact of
    # the swept scales (sf0.001/0.01/0.1), not a theorem. After any
    # fixture regen or at a NEW scale factor, a value-hash failure HERE is
    # the index dropping a borderline pair, not an engine bug — re-run
    # tools/driver_sim.py at that scale before treating it as one.
    oracle=_NEARDUP_PREP_ORACLE,
)
def train_corpus_prep_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus preparation on the NEAR-dup path — the composite
    ``train_corpus_prep`` (exact dedup) upgraded to the pipeline a
    pretraining job actually needs at 100 TB, every stage the scale path:

    1. quality gate: whitespace-token count >= 30 (stateless, pushable);
    2. near-dup clustering across sources: MinHash-LSH candidate pairs
       (banded equal-hash join, never all-pairs) -> distributed min-label
       connected components;
    3. survivor retention: longest doc per cluster, min-doc_id tiebreak
       (one window over the clustered docs);
    4. deterministic stratified downsample of survivors: md5(doc_id)
       bucket < per-source rate — reproducible across engines, runs, and
       repartitions;
    5. per-source composition card: candidates -> survivors -> kept ->
       kept tokens (exact BIGINT counts).

    Stage-ordering bugs (sample-before-dedup, dedup across gated-out
    docs, survivor picked before clustering) all flip the card and fail
    the value hash."""
    from featurestore_for_joycastle_java_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    # the gated scan feeds three plan branches (LSH signature build, CC
    # node set, retention join) — cache it once instead of re-tokenizing
    # the corpus per branch (same lifetime note as the minhash cache)
    gated = (
        docs.withColumn("n_tok", F.size(tokens(F.col("text"))))
        .filter(F.col("n_tok") >= 30)
        .cache()
    )
    pairs = D.minhash_lsh_pairs(gated, "doc_id", "text", max_jaccard_distance=0.4)
    cc = D.connected_components(gated, pairs, id_col="doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % 1000
    )
    rate = F.when(F.col("source").isin("src0", "src1"), 1000).otherwise(500)
    flagged = (
        gated.select("doc_id", "source", "n_chars", "n_tok")
        .join(cc, "doc_id")
        .select(
            "source",
            "n_tok",
            (F.row_number().over(w) == 1).alias("is_surv"),
            (bucket < rate).alias("is_sampled"),
        )
    )
    kept = F.col("is_surv") & F.col("is_sampled")
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.when(F.col("is_surv"), 1).otherwise(0)).alias("n_survivors"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tok")).otherwise(0)).alias("n_tokens_kept"),
    )

