"""Deduplication operators for LLM-data pipelines (north-star §2.3):
exact (fingerprint hash-groupBy), MinHash LSH, SimHash banding, n-gram /
token-set Jaccard, embedding-cosine near-dup.

Scale ladder (what to use at which size):
- exact:     hash-groupBy — one shuffle on the fingerprint; linear.
- MinHash LSH / SimHash banding: candidates via equal-band join — shuffle
  on band values; near-linear; THE 100 TB path.
- exact Jaccard / all-pairs cosine: quadratic in the candidate block —
  kept as correctness oracles for the LSH paths and for small scopes
  (single source, candidate verification), never the whole corpus.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

from featurestore_for_joycastle_java_spark.operators.text import fingerprint, tokens


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical (normalized) content: fingerprint → keeper id +
    copy count. One shuffle on the md5 key; at 100 TB the md5 spreads
    uniformly so no skew."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_" + id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep exactly one row per identical content — the min-id row
    (deterministic, unlike dropDuplicates' arbitrary winner)."""
    w = Window.partitionBy(fingerprint(F.col(text_col)))
    return (
        df.withColumn("__min_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("__min_id"))
        .drop("__min_id")
    )


def token_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float
) -> DataFrame:
    """Exact token-set Jaccard over all pairs sharing ≥1 token, via an
    inverted-index self-join (explode distinct tokens → equi-join on the
    token). Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard
    rounded to 6 (threshold applied on the rounded value so the result
    SET is reproducible bit-for-bit across engines).

    Quadratic in documents-per-shared-token — correct tool for a bounded
    scope (one source, an LSH candidate bucket), not a whole 100 TB corpus
    (common tokens blow up the join; that's what MinHash LSH is for)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n_toks"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_toks").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_toks").alias("n_b"))
    jac = F.round(
        F.col("n_inter")
        / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        6,
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# --- SimHash ----------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash per document, entirely in Catalyst: explode tokens,
    xxhash64 each, per-bit signed vote (+1/-1) aggregated, sign → bit.

    One explode + one groupBy(id) shuffle; the 64 conditional sums are
    map-side-combined, so the shuffle carries 64 longs per doc, not the
    tokens. (xxhash64 is Spark-specific → SimHash values are engine-local;
    pair detection is what's testable, via the Python reference in
    tests.)"""
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select("id", F.xxhash64("tok").alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftrightunsigned("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    g = tok.groupBy("id").agg(*votes)
    # bit 63 would overflow a signed-long literal (1<<63); shiftleft wraps
    # in the JVM (two's complement), which is exactly what we want.
    sim = reduce(
        lambda acc, i: acc.bitwiseOR(
            F.when(
                F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
        ),
        range(bits),
        F.lit(0).cast("long"),
    )
    return g.select("id", sim.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup candidates via SimHash banding: split the 64-bit hash into
    ``n_bands`` bands; any pair agreeing on a full band is a candidate
    (guaranteed to catch hamming ≤ n_bands-1 by pigeonhole); verify with
    bit_count(xor). Shuffles on band values — near-linear, the scalable
    shape."""
    sh = simhash(df, id_col, text_col)
    band_bits = 64 // n_bands
    mask = (1 << band_bits) - 1
    bands = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned("simhash", i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("id", "simhash", "band.band_idx", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)


# --- MinHash LSH (pyspark.ml) ----------------------------------------------


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_jaccard_distance: float = 0.4,
    shingle_k: int = 3,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup pairs via MinHash LSH over k-token shingles
    (shingle → HashingTF sparse vector → MinHash → banded join inside
    approxSimilarityJoin). Fixed seed → reproducible runs. Returns
    (id_a, id_b, jaccard_dist). The 100 TB dedup path."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from featurestore_for_joycastle_java_spark.operators.text import shingles

    docs = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_k).alias("sh")
    ).filter(F.size("sh") > 0)
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features)
    feats = tf.transform(docs)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(feats)
    # pre-hash ONCE and cache: the self-join otherwise re-tokenizes,
    # re-shingles and re-hashes the corpus on both sides (2x the whole
    # pipeline) — this halves the dominant cost at every scale.
    hashed = model.transform(feats).cache()
    pairs = model.approxSimilarityJoin(
        hashed, hashed, max_jaccard_distance, distCol="jaccard_dist"
    )
    return (
        pairs.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )
