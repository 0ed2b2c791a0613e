"""Text-analysis queries over the documents table (north-star §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.operators import text as T
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table

# DuckDB twin of operators.text.tokens()
_TOKS = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


def _sw_hits(words: list[str]) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({_TOKS}, x -> list_contains({arr}, x)))"


@query(
    "text_stats",
    oracle=f"""
SELECT doc_id,
       CAST(LEN({_TOKS}) AS INT) AS n_tokens,
       CAST(LEN(list_distinct({_TOKS})) AS INT) AS n_uniq_tokens,
       CAST(LENGTH(text) AS INT) AS n_chars_calc,
       CAST(list_sum(list_transform({_TOKS}, t -> LENGTH(t))) AS BIGINT)
           AS sum_token_chars,
       CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes
FROM documents
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + basic stats, all in codegen (split + HOFs)."""
    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        F.length("text").alias("n_chars_calc"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sum_token_chars"),
        F.octet_length("text").alias("n_bytes"),
    )


@query(
    "text_quality",
    oracle=f"""
SELECT doc_id,
       ROUND(0.5 * LEAST(CAST(LEN({_TOKS}) AS DOUBLE) / 100.0, 1.0)
           + 0.3 * LEAST(CASE WHEN LEN({_TOKS}) > 0
                 THEN CAST({_sw_hits(T.LANG_STOPWORDS["en"])} AS DOUBLE)
                      / LEN({_TOKS}) ELSE 0.0 END * 5.0, 1.0)
           + 0.2 * (1.0 - CASE WHEN LENGTH(text) > 0
                 THEN CAST(LENGTH(regexp_replace(text,
                      '[^.,!?;:''"()-]', '', 'g')) AS DOUBLE) / LENGTH(text)
                 ELSE 0.0 END), 6) AS quality,
       CAST(LEN({_TOKS}) AS INT) >= 50 AS long_enough
FROM documents
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/stopword/punctuation heuristic in [0,1]."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.quality_score(F.col("text")).alias("quality"),
        (T.token_count(F.col("text")) >= 50).alias("long_enough"),
    )


_LANG_CASE = f"""
CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
     WHEN {_sw_hits(T.LANG_STOPWORDS["en"])} >= {_sw_hits(T.LANG_STOPWORDS["fr"])}
          AND {_sw_hits(T.LANG_STOPWORDS["en"])} >= {_sw_hits(T.LANG_STOPWORDS["es"])}
          AND {_sw_hits(T.LANG_STOPWORDS["en"])} >= {_sw_hits(T.LANG_STOPWORDS["de"])}
         THEN 'en'
     WHEN {_sw_hits(T.LANG_STOPWORDS["fr"])} >= {_sw_hits(T.LANG_STOPWORDS["es"])}
          AND {_sw_hits(T.LANG_STOPWORDS["fr"])} >= {_sw_hits(T.LANG_STOPWORDS["de"])}
         THEN 'fr'
     WHEN {_sw_hits(T.LANG_STOPWORDS["es"])} >= {_sw_hits(T.LANG_STOPWORDS["de"])}
         THEN 'es'
     ELSE 'de'
END
"""


@query(
    "text_lang_id",
    oracle=f"""
SELECT lang_pred, lang AS lang_label, COUNT(*) AS n_docs
FROM (SELECT {_LANG_CASE} AS lang_pred, lang FROM documents)
GROUP BY lang_pred, lang
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic vs the labeled lang column (confusion
    counts). The fixture text is synthetic English-ish tokens for every
    label, so the interesting part is determinism, not accuracy."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            T.lang_id(F.col("text")).alias("lang_pred"),
            F.col("lang").alias("lang_label"),
        )
        .groupBy("lang_pred", "lang_label")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of normalized text) — the exact-dedup key,
    reproducible across engines by construction."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))
