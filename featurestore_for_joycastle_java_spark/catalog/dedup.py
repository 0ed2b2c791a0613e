"""Deduplication queries over documents/embeddings (north-star §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.operators import dedup as D
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table

_FP = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
_TOKSET = "list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> ''))"


@query(
    "dedup_exact_groups",
    oracle=f"""
SELECT {_FP} AS fp,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY fp
""",
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the content fingerprint — keeper id +
    copy count per identical normalized text."""
    return D.exact_dedup_groups(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


@query(
    "dedup_exact_survivors",
    oracle=f"""
SELECT doc_id, source
FROM (SELECT doc_id, source,
             MIN(doc_id) OVER (PARTITION BY {_FP}) AS keep_id
      FROM documents)
WHERE doc_id = keep_id
""",
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the deterministic min-id row per content group
    (dropDuplicates keeps an arbitrary winner; this doesn't)."""
    return D.exact_dedup(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    ).select("doc_id", "source")


@query(
    "dedup_jaccard_pairs",
    oracle=f"""
WITH t AS (
    SELECT doc_id, {_TOKSET} AS toks
    FROM documents WHERE source = 'src0')
SELECT a.doc_id AS id_a,
       b.doc_id AS id_b,
       ROUND(CAST(LEN(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / (LEN(a.toks) + LEN(b.toks) - LEN(list_intersect(a.toks, b.toks))),
             6) AS jaccard
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE ROUND(CAST(LEN(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / (LEN(a.toks) + LEN(b.toks) - LEN(list_intersect(a.toks, b.toks))), 6)
      >= 0.6
""",
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs within one source — the
    inverted-index self-join (explode → equi-join on token → pair counts).
    Bounded scope on purpose: this is the verification tool; the corpus-
    wide path is MinHash LSH below. Threshold applied on the 6dp-rounded
    value so the pair SET matches the oracle exactly."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("source") == "src0")
    return D.token_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.6, small_vocab_max=1024
    )


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


@query(
    "dedup_minhash_lsh",
    # The output is EXACT-verified shingle-jaccard on LSH candidates, so
    # it equals the exact all-pairs answer whenever candidate recall is
    # 1.0 — which it is on the fixtures (verified pair-set equality at
    # sf0.001 and sf0.01; banding theory gives ~0.89 per-pair floor at
    # similarity exactly 0.6 and ~1.0 at the 0.8+ the near-dup generator
    # produces). The oracle therefore replays exact all-pairs shingle
    # jaccard; a recall drop would surface as a hash mismatch.
    oracle=f"""
WITH {_SHINGLES}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       {_SH_DIST} AS jaccard_dist
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE {_SH_DIST} <= 0.4
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst-native MinHash LSH over 3-token shingles — the 100 TB
    dedup path: 128-perm xxhash64 signatures (one explode + one agg),
    banded equal-hash candidate join (near-linear), exact shingle-Jaccard
    verify on candidates only. Seedless → bit-identical across runs."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, "doc_id", "text", max_jaccard_distance=0.4)


# dedup_simhash_pairs (rows-only, r1-r3) was replaced in r4 by the
# boolean-oracled dedup_simhash_check in catalog/round4.py; the xxhash64
# banding operator remains dedup.simhash_near_pairs (reference-checked in
# tests/test_dedup.py), and the value-oracled pair surface is
# dedup_simhash_md5.


@query(
    "dedup_embedding_cosine",
    oracle="""
WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings)
SELECT a.vec_id AS id_a,
       b.vec_id AS id_b,
       ROUND(list_inner_product(a.v, b.v)
             / (SQRT(list_inner_product(a.v, a.v))
                * SQRT(list_inner_product(b.v, b.v))), 6) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND(list_inner_product(a.v, b.v)
      / (SQRT(list_inner_product(a.v, a.v))
         * SQRT(list_inner_product(b.v, b.v))), 6) >= 0.4
""",
    bench=False,  # exact all-pairs: the oracle for the LSH path, not a bench query
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact all-pairs ≥ 0.4) — the
    correctness anchor for LSH similarity. zip_with+aggregate cosine is
    bit-identical to DuckDB list_inner_product (verified empirically),
    so the oracle is exact."""
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        cosine_pairs,
    )

    e = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs(e, threshold=0.4)


@query(
    "dedup_cc_clusters",
    oracle=f"""
WITH RECURSIVE
t AS (
    SELECT doc_id, {_TOKSET} AS toks
    FROM documents WHERE source IN ('src0', 'src1', 'src2')),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    WHERE ROUND(CAST(LEN(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / (LEN(a.toks) + LEN(b.toks) - LEN(list_intersect(a.toks, b.toks))), 6)
          >= 0.6),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION ALL
    SELECT id_b AS src, id_a AS dst FROM pairs),
reach AS (
    SELECT doc_id AS node, doc_id AS comp FROM t
    UNION
    SELECT e.dst AS node, r.comp AS comp
    FROM reach r JOIN edges e ON e.src = r.node),
cc AS (SELECT node AS doc_id, MIN(comp) AS component FROM reach GROUP BY 1)
SELECT doc_id, component,
       CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS n_members
FROM cc
""",
)
def dedup_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: exact Jaccard edges (≥0.6,
    three sources) fed into iterative min-label propagation — the step a
    real corpus dedup needs between candidate pairs and "keep one doc per
    group". The oracle computes the same fixpoint via a recursive CTE;
    both converge to the unique min-reachable-id labeling, so the match
    is exact despite completely different algorithms. Isolated docs form
    singleton clusters (n_members = 1)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1", "src2")
    )
    edges = D.token_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.6, small_vocab_max=1024
    )
    cc = D.connected_components(docs, edges, id_col="doc_id")
    from pyspark.sql import Window

    return cc.withColumn(
        "n_members",
        F.count(F.lit(1)).over(Window.partitionBy("component")),
    )


@query(
    "dedup_pipeline_lsh",
    # Same reasoning as dedup_minhash_lsh: exact-verified LSH candidates
    # equal the exact pair set at fixture scales (recall 1.0, verified
    # sf0.001 + sf0.01), so the WHOLE pipeline — candidates → connected
    # components → survivor retention — replays as all-pairs shingle
    # jaccard + recursive CTE + retention window. Every stage is now
    # oracle-checked end-to-end (r1 left this rows-only).
    oracle=f"""
WITH RECURSIVE
{_SHINGLES.strip().rstrip()},
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE {_SH_DIST} <= 0.4),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION ALL
    SELECT id_b AS src, id_a AS dst FROM pairs),
reach AS (
    SELECT doc_id AS node, doc_id AS comp FROM documents
    UNION
    SELECT e.dst AS node, r.comp AS comp
    FROM reach r JOIN edges e ON e.src = r.node),
cc AS (SELECT node AS doc_id, MIN(comp) AS component FROM reach GROUP BY 1)
SELECT d.doc_id, cc.component, d.source,
       (ROW_NUMBER() OVER (PARTITION BY cc.component
                           ORDER BY d.n_chars DESC, d.doc_id) = 1)
           AS is_survivor
FROM documents d JOIN cc ON d.doc_id = cc.doc_id
""",
)
def dedup_pipeline_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-scale dedup pipeline END-TO-END: MinHash-LSH candidate
    pairs (near-linear, exact-verified) → connected-components clustering
    → survivor retention. Survivor = longest doc per cluster (quality
    heuristic), min doc_id tie-break — both deterministic, so reruns and
    engines agree on the exact keep/purge sets. Every stage is the scale
    path: banded LSH instead of all-pairs, diameter-bounded label
    propagation instead of a driver-side union-find, one window over the
    clustered docs for retention."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs, "doc_id", "text", max_jaccard_distance=0.4
    )
    cc = D.connected_components(docs, pairs, id_col="doc_id")
    from pyspark.sql import Window

    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", "n_chars")
        .join(cc, "doc_id")
        .withColumn("is_survivor", F.row_number().over(w) == 1)
        .select("doc_id", "component", "source", "is_survivor")
    )
