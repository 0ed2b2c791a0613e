"""Round-4 additions: the last quadratic-only LLM-pipeline surface gains
its bucketed twin (embedding near-dup PAIRS via SRP-LSH, full index-replay
oracle), and the two formerly rows-only queries are replaced by
driver-checkable boolean harnesses (``sim_lsh_recall``,
``dedup_simhash_check``) — the rows-only set is now empty.

Registered FIRST so the driver's 50-entry correctness window covers the
new queries, then rotates through the modules whose latest driver rows
are r1/r2 (asof, ingest, relational, round2, streaming, multimodal, …).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.operators import dedup as D
from featurestore_for_joycastle_java_spark.operators import similarity as S
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


@query(
    "dedup_embedding_srp",
    # FULL index replay, the sim_srp_topk pattern self-joined: the
    # md5-parity hyperplanes are a public spec, so the oracle rebuilds
    # them, recomputes every bucket code, the equal-(table,code) candidate
    # self-join, and the exact cosine verify — the whole near-dup index,
    # not a recall floor. Whatever the index's recall, both engines see
    # the SAME candidates, so the match is exact by construction.
    oracle="""
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings),
p AS (
    SELECT t.tbl, b.bit,
           list(CASE WHEN CAST(('0x' || substr(md5(t.tbl || '_' || b.bit
                                                || '_' || d.dim_i), 1, 1))
                          AS INT) % 2 = 1
                     THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END
                ORDER BY d.dim_i) AS pv
    FROM range(16) AS t(tbl), range(6) AS b(bit), range(64) AS d(dim_i)
    GROUP BY 1, 2),
cc AS (
    SELECT e.vec_id, p.tbl,
           SUM(CASE WHEN list_inner_product(e.v, p.pv) > 0
                    THEN CAST(1 AS BIGINT) << p.bit
                    ELSE CAST(0 AS BIGINT) END) AS code
    FROM e CROSS JOIN p GROUP BY 1, 2),
cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM cc a JOIN cc b ON a.tbl = b.tbl AND a.code = b.code
                        AND a.vec_id < b.vec_id)
SELECT c.id_a, c.id_b,
       ROUND(list_inner_product(ea.v, eb.v)
             / (SQRT(list_inner_product(ea.v, ea.v))
                * SQRT(list_inner_product(eb.v, eb.v))), 6) AS cos_sim
FROM cand c
JOIN e ea ON c.id_a = ea.vec_id
JOIN e eb ON c.id_b = eb.vec_id
WHERE ROUND(list_inner_product(ea.v, eb.v)
      / (SQRT(list_inner_product(ea.v, ea.v))
         * SQRT(list_inner_product(eb.v, eb.v))), 6) >= 0.4
""",
)
def dedup_embedding_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup PAIRS via SRP-LSH buckets — the 100 TB twin of
    the exact all-pairs anchor ``dedup_embedding_cosine`` (bench=False,
    quadratic): candidates only from equal (table, code) buckets of the
    corpus's own codes, exact cosine verify ≥ 0.4 on candidates only.
    Never all-pairs — the self-join shuffles on bucket values, so
    candidate volume is Σ_buckets m² (tune n_bits with corpus size), not
    n². Recall is a similarity-dependent index property, exactly replayed
    by the oracle: ≈0.7 at the 0.4 decision boundary on the fixtures
    (16 tables × 6 bits; borderline-cos pairs rarely share buckets) and
    ≈1 in the ≥0.9 band where true duplicates live — the operating regime
    of a dedup pass."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.srp_near_pairs(
        e, "vec_id", "embedding", threshold=0.4, n_tables=16, n_bits=6, dim=64
    )


@query(
    "sim_lsh_recall",
    oracle="""
SELECT COUNT(*) AS n_queries, 5 AS k, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 10
""",
    bench=False,  # recall-verification harness (runs LSH AND brute-force
    # ground truth); the operational BRP path stays benched via tests
)
def sim_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH top-5, checked by a recall bound
    against brute force (the ``sim_ivf_kmeans_recall`` pattern): BRP
    hashes are JVM-seeded so no external engine can replay the index —
    instead the average top-5 recall over the 10-query batch must clear
    0.8 (measured 0.98-1.0 across sf0.001-0.1; the floor sits under the
    band so only a real bucketing regression flips the boolean and fails
    the value hash). Replaces r1's rows-only ``sim_lsh_topk``
    registration — the raw top-k surface remains
    ``operators.similarity.lsh_topk``, recall-asserted in
    tests/test_similarity.py; oracle duty for SRP-style index replay
    lives with ``sim_srp_topk``."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    lsh = S.lsh_topk(e, q, k=5).select("query_id", "vec_id")
    brute = S.brute_force_topk(e, q, k=5).select("query_id", "vec_id")
    hits = lsh.join(brute, ["query_id", "vec_id"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    nq = q.agg(F.count(F.lit(1)).alias("n_queries"))
    return nq.crossJoin(hits).select(
        "n_queries",
        F.lit(5).cast("int").alias("k"),
        (F.col("n_hits") / (F.col("n_queries") * 5) >= 0.8).alias("recall_ok"),
    )


@query(
    "dedup_simhash_check",
    # The xxhash64 SimHash index is engine-local, but one property of it
    # is NOT hash-dependent: identical token multisets give identical
    # per-bit votes, hence identical simhash, hence hamming 0 — and
    # banding catches hamming 0 unconditionally (all bands equal). So
    # every exact-duplicate pair (fingerprint-equal, ≥1 token) MUST
    # appear in the banded output. The oracle computes the ground-truth
    # exact-dup pair count independently (md5 fingerprint join) and
    # asserts the containment booleans by construction — a broken hash,
    # vote, band split, or verify filter loses hamming-0 pairs and flips
    # n_missed/contains_exact_dups, failing the value hash.
    oracle="""
WITH d AS (
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    WHERE len(list_filter(string_split(lower(text), ' '), x -> x <> '')) >= 1),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM d a JOIN d b ON a.fp = b.fp AND a.doc_id < b.doc_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_dup_pairs,
       CAST(0 AS BIGINT) AS n_missed,
       TRUE AS contains_exact_dups
FROM pairs
""",
    bench=False,  # verification harness (simhash + fingerprint ground
    # truth); the operational banded path is benched as dedup_simhash_md5
)
def dedup_simhash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64 SimHash banding, checked by a structural containment
    bound: the banded near-dup output must contain EVERY exact-duplicate
    pair (hamming 0 is caught unconditionally by pigeonhole — identical
    normalized text ⇒ identical votes ⇒ identical hash). Ground truth is
    restricted to docs with ≥1 token on both sides (a token-less doc has
    no simhash row — structural, engine-independent). Replaces r1's
    rows-only ``dedup_simhash_pairs`` registration; the cross-engine
    value-oracled pair surface is ``dedup_simhash_md5``."""
    from featurestore_for_joycastle_java_spark.operators.text import (
        fingerprint,
        tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh_pairs = D.simhash_near_pairs(
        docs, "doc_id", "text", max_hamming=3
    ).select("id_a", "id_b")
    gated = docs.filter(F.size(tokens(F.col("text"))) >= 1).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )
    a, b = gated.alias("a"), gated.alias("b")
    exact = a.join(
        b,
        (F.col("a.fp") == F.col("b.fp"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
    )
    missed = exact.join(sh_pairs, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("n_missed")
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_dup_pairs"))
    return n_exact.crossJoin(missed).select(
        "n_exact_dup_pairs",
        "n_missed",
        (F.col("n_missed") == 0).alias("contains_exact_dups"),
    )
