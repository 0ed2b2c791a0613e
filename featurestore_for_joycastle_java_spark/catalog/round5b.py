"""Round-5 late additions, registered BELOW the driver's 50-query window
(module order: after ``advanced``) so the rotation plan for r5 is
untouched — these get driver rows in r6; until then they are covered by
tests, the full-registry sweeps (SIM_r05_*.json), and the judge's own
sweep.

- ``asof_tolerance_backward``: bounded-staleness PIT read (the
  ``asof_join(tolerance=...)`` surface — pandas ``merge_asof`` parity).
- ``feature_time_to_convert``: click → next-purchase conversion latency
  within a window (forward as-of + tolerance), the label-generation
  read for conversion models.
- ``sim_label_centroid_dist``: per-label embedding centroids (scaled-
  integer component sums → bit-deterministic double means) and each
  vector's distance to its own label's centroid — the embedding-space
  outlier score.
- ``dedup_ngram_jaccard``: character-trigram Jaccard near-dup pairs —
  the n-gram member of the north-star dedup list.
- ``train_weighted_sample``: temperature-weighted source mixing with an
  engine-replayable sequential fold for the share denominator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.operators.asof import asof_join
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table

_DAY_US = 86_400_000_000


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").withColumn(
        "t", F.unix_micros(F.col("ts"))
    )


@query(
    "asof_tolerance_backward",
    # DuckDB has no ASOF tolerance either — the oracle post-filters the
    # unbounded ASOF match with the same inclusive age bound, nulling
    # payload and matched ts together (the operator's atomicity rule).
    oracle=f"""
WITH e AS (
    SELECT user_id, event_id, event_type, value, epoch_us(ts) AS t
    FROM events),
p AS (
    SELECT user_id, t, MAX_BY(value, event_id) AS recent_purchase_value
    FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
v AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'view')
SELECT v.event_id, v.user_id,
       CASE WHEN v.t - p.t <= {2 * _DAY_US}
            THEN p.recent_purchase_value END AS recent_purchase_value,
       CASE WHEN v.t - p.t <= {2 * _DAY_US}
            THEN p.t END AS purchase_t_us
FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.t >= p.t
""",
)
def asof_tolerance_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-staleness point-in-time read: for every view, the user's
    latest prior purchase value — but only if it is at most 2 days old
    (``asof_join(tolerance=...)``); staler matches are nulled whole.
    The freshness-SLA contract of a feature-serving read: a model must
    not consume a feature that stopped being true."""
    e = _events_us(spark, sf_dir)
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "t")
        .agg(F.max_by("value", "event_id").alias("recent_purchase_value"))
    )
    v = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "t"
    )
    out = asof_join(
        v,
        p,
        on=["user_id"],
        left_ts="t",
        right_ts="t",
        right_cols=["recent_purchase_value"],
        direction="backward",
        tolerance=2 * _DAY_US,
    )
    return out.select(
        "event_id",
        "user_id",
        "recent_purchase_value",
        F.col("t_matched").alias("purchase_t_us"),
    )


@query(
    "feature_time_to_convert",
    oracle=f"""
WITH e AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events),
p AS (
    SELECT user_id, t, MAX(event_id) AS purchase_event_id
    FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
c AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'click')
SELECT c.event_id, c.user_id,
       CASE WHEN p.t - c.t <= {7 * _DAY_US}
            THEN p.t - c.t END AS convert_us,
       CASE WHEN p.t - c.t <= {7 * _DAY_US}
            THEN CAST(FLOOR(CAST(p.t - c.t AS DOUBLE) / 3600000000.0)
                      AS BIGINT) END AS convert_hours
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.t <= p.t
""",
)
def feature_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency labels: for every click, microseconds until
    the user's NEXT purchase, capped at a 7-day attribution window
    (forward as-of + tolerance) — the label-generation read for a
    time-to-convert model, leakage-free because only future purchases
    match and unconverted clicks stay null. Integer time arithmetic
    end-to-end; the hour bucket is the model-ready coarse feature."""
    e = _events_us(spark, sf_dir)
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "t")
        .agg(F.max("event_id").alias("purchase_event_id"))
    )
    c = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "t"
    )
    out = asof_join(
        c,
        p,
        on=["user_id"],
        left_ts="t",
        right_ts="t",
        right_cols=["purchase_event_id"],
        direction="forward",
        tolerance=7 * _DAY_US,
    )
    convert = F.col("t_matched") - F.col("t")
    return out.select(
        "event_id",
        "user_id",
        convert.alias("convert_us"),
        F.floor(convert.cast("double") / 3.6e9)
        .cast("long")
        .alias("convert_hours"),
    )


@query(
    "sim_label_centroid_dist",
    # Determinism engineering (r5 review fix): centroid component means
    # come from SCALED-INTEGER sums — floor(x * 1e12) per component
    # (identical IEEE multiply + floor in both engines), summed as exact
    # BIGINTs, then one identical double expression for the mean. The
    # earlier DECIMAL(27,12) cast was NOT cross-engine-deterministic:
    # Spark rounds double→decimal HALF_UP, DuckDB HALF_EVEN, and the
    # fixtures contain exact-12dp ties (e.g. 0.1983642578125). The
    # distance composes the verified list_inner_product primitive:
    # sqrt(greatest(v·v - 2 v·c + c·c, 0)) — clamped, because float
    # cancellation can land the expanded form at a tiny NEGATIVE value
    # when a vector ~equals its centroid, which Spark sqrt maps to NaN
    # but DuckDB REFUSES outright. Dims come from len(v), not a literal.
    oracle="""
WITH e AS (
    SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings),
comp AS (
    SELECT label, ord,
           CAST(SUM(CAST(FLOOR(x * 1000000000000.0) AS BIGINT)) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * 1000000000000.0) AS m
    FROM (
        SELECT label,
               UNNEST(generate_series(1, len(v))) AS ord,
               UNNEST(v) AS x
        FROM e)
    GROUP BY 1, 2),
cent AS (
    SELECT label, list(m ORDER BY ord) AS c FROM comp GROUP BY 1)
SELECT e.vec_id, e.label,
       ROUND(SQRT(GREATEST(list_inner_product(e.v, e.v)
                           - 2 * list_inner_product(e.v, cent.c)
                           + list_inner_product(cent.c, cent.c), 0.0)),
             6) AS centroid_dist
FROM e JOIN cent USING (label)
""",
)
def sim_label_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid + each vector's Euclidean distance
    to its OWN label's centroid — the embedding-space outlier/typicality
    score (mislabeled-example mining, cluster cohesion monitoring).

    Scale shape: centroid sums ride a posexplode → (label, dim) partial
    aggregation (64 rows per vector, map-side combined; the shuffle
    carries one row per (label, dim)), centroids rebuild per label via
    sort_array over 64-element lists, and the tiny centroid frame
    broadcasts back onto the vectors for a stateless per-row HOF
    distance — no self-join, no window over the vectors. Scaled-integer
    component sums (floor(x*1e12) summed as exact BIGINTs) make the
    centroid bit-deterministic (see oracle comment — the decimal-cast
    route diverges on HALF_UP vs HALF_EVEN ties); the clamped distance
    composes dot products bit-matched to DuckDB's list_inner_product
    (r3-verified primitive)."""
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        as_double,
        dot,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    comp = (
        emb.select("label", F.posexplode("v").alias("ord", "x"))
        .groupBy("label", "ord")
        .agg(
            (
                F.sum(
                    F.floor(F.col("x") * F.lit(1e12)).cast("bigint")
                ).cast("double")
                / (F.count(F.lit(1)).cast("double") * F.lit(1e12))
            ).alias("m")
        )
    )
    cent = comp.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ord", "m"))),
            lambda s: s["m"],
        ).alias("c")
    )
    joined = emb.join(F.broadcast(cent), "label")
    d2 = F.greatest(
        dot(F.col("v"), F.col("v"))
        - F.lit(2.0) * dot(F.col("v"), F.col("c"))
        + dot(F.col("c"), F.col("c")),
        F.lit(0.0),
    )
    return joined.select(
        "vec_id", "label", F.round(F.sqrt(d2), 6).alias("centroid_dist")
    )


@query(
    "dedup_ngram_jaccard",
    # Character trigrams: substr positions 1..len-2 of the lowered text;
    # docs shorter than 3 chars get an empty set. Quadratic verify scope
    # on one source (the scale path stays MinHash LSH).
    oracle="""
WITH t AS (
    SELECT doc_id,
           list_distinct(list_transform(
               range(1, GREATEST(len(lower(text)) - 2, 0) + 1),
               i -> substr(lower(text), i, 3))) AS gs
    FROM documents WHERE source = 'src1')
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(LEN(list_intersect(a.gs, b.gs)) AS DOUBLE)
             / (LEN(a.gs) + LEN(b.gs) - LEN(list_intersect(a.gs, b.gs))),
             6) AS jaccard
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE LEN(list_intersect(a.gs, b.gs)) >= 1
  AND ROUND(CAST(LEN(list_intersect(a.gs, b.gs)) AS DOUBLE)
            / (LEN(a.gs) + LEN(b.gs) - LEN(list_intersect(a.gs, b.gs))),
            6) >= 0.6
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character n-gram (trigram) Jaccard near-dup pairs — the dedup
    family word tokenization misses (typos, spacing, inflection share
    most trigrams but few exact tokens). Same inverted-index engine as
    the token path (``token_jaccard_pairs`` with the ``char_ngrams``
    tokenizer, r5): length-band prune before the pair shuffle, cached
    gram index feeding both join sides. Completes the north-star dedup
    list (exact / MinHash-LSH / SimHash / n-gram Jaccard /
    embedding-cosine) with its n-gram member."""
    from featurestore_for_joycastle_java_spark.operators.dedup import (
        token_jaccard_pairs,
    )
    from featurestore_for_joycastle_java_spark.operators.text import char_ngrams

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source") == "src1"
    )
    return token_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.6, tokenizer=char_ngrams
    )


@query(
    "train_weighted_sample",
    # Temperature-weighted source mixing: shares q_s = sqrt(c_s) / Σ_t
    # sqrt(c_t) (alpha = 0.5 flattens the source distribution), target
    # corpus = half the docs, per-source keep rate = min(1, q_s·N/2 /
    # c_s), membership decided by a 48-bit md5 uniform — fully
    # deterministic and replayed verbatim by the oracle. The only
    # cross-engine float hazard, the Σ sqrt(c_t) denominator, is a
    # SEQUENTIAL fold over the source-name-ordered count list in BOTH
    # engines (the EWMA IEEE-fold pattern), so every double matches
    # bit-for-bit.
    oracle="""
WITH c AS (
    SELECT source, COUNT(*) AS c FROM documents GROUP BY 1),
d AS (
    SELECT list_reduce(
               list_transform(list({'s': source, 'c': c} ORDER BY source),
                              r -> SQRT(CAST(r.c AS DOUBLE))),
               (a, x) -> a + x) AS denom,
           CAST(SUM(c) AS DOUBLE) AS n_all
    FROM c),
r AS (
    SELECT c.source, c.c,
           LEAST(1.0, (SQRT(CAST(c.c AS DOUBLE)) / d.denom)
                          * (0.5 * d.n_all) / CAST(c.c AS DOUBLE)) AS rate
    FROM c, d),
k AS (
    SELECT doc_id, source,
           CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                     AS BIGINT) AS DOUBLE) / 281474976710656.0 AS u
    FROM documents)
SELECT r.source,
       CAST(r.c AS BIGINT) AS n_total,
       ROUND(r.rate, 6) AS rate,
       CAST(SUM(CASE WHEN k.u < r.rate THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept
FROM k JOIN r USING (source)
GROUP BY 1, 2, 3
""",
)
def train_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted corpus mixing (multilingual-LM style): keep
    probability per source ∝ count^0.5 share, scaled to a half-size
    target corpus and capped at 1 — upsamples (keeps whole) small
    sources, downsamples dominant ones. Membership is an md5-keyed
    48-bit uniform per doc: reproducible across engines, runs and
    repartitions, stateless map-side filter at 100 TB (the rates frame
    is per-source tiny and broadcast). Summarized per source; the
    oracle recomputes rates AND membership exactly (see fold note)."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    d = c.agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("source", "c"))),
                lambda s: F.sqrt(s["c"].cast("double")),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("denom"),
        F.sum("c").cast("double").alias("n_all"),
    )
    rate = F.least(
        F.lit(1.0),
        (F.sqrt(F.col("c").cast("double")) / F.col("denom"))
        * (F.lit(0.5) * F.col("n_all"))
        / F.col("c").cast("double"),
    )
    r = c.crossJoin(F.broadcast(d)).select("source", "c", rate.alias("rate"))
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
        ).cast("double")
        / F.lit(281474976710656.0)
    )
    k = docs.select("source", u.alias("u"))
    return (
        k.join(F.broadcast(r), "source")
        .groupBy("source")
        .agg(
            F.any_value("c").alias("n_total"),
            F.round(F.any_value("rate"), 6).alias("rate"),
            F.sum(F.when(F.col("u") < F.col("rate"), 1).otherwise(0)).alias(
                "n_kept"
            ),
        )
    )
