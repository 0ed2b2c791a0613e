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


# BPE-ish pre-tokenizer (GPT-2 style, simplified): a token is an optionally
# space-prefixed letter run, digit run, or punctuation run, else a whitespace
# run. Deliberately lookahead-free so Java regex (Spark) and RE2 (DuckDB)
# produce identical leftmost-first matches.
_BPE_PAT = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


@query(
    "text_bpe_tokens",
    oracle=f"""
SELECT doc_id,
       CAST(LEN(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+'))
           AS INT) AS n_pieces,
       CAST(LEN(list_filter(
               regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+'),
               x -> NOT regexp_matches(x, '^\\s+$')))
           AS INT) AS n_word_pieces,
       CAST(LEN({_TOKS}) AS INT) AS n_ws_tokens
FROM documents
""",
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (north star: "whitespace + a BPE-ish
    regex"): a GPT-2-style pre-tokenizer regex (letter/digit/punct runs
    with optional leading space) next to plain whitespace tokens. All in
    codegen — ``regexp_extract_all`` + higher-order ``filter``, no UDF."""
    d = load_table(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all("text", F.lit(_BPE_PAT), 0)
    return d.select(
        "doc_id",
        F.size(pieces).alias("n_pieces"),
        F.size(
            F.filter(pieces, lambda x: ~x.rlike(r"^\s+$"))
        ).alias("n_word_pieces"),
        T.token_count(F.col("text")).alias("n_ws_tokens"),
    )


@query(
    "text_tfidf",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, UNNEST({_TOKS}) AS term FROM documents),
tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks GROUP BY 1, 2),
dfq AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT t.doc_id, t.term, t.tf, d.df,
           ROUND(t.tf * LN(CAST(n.n_docs AS DOUBLE) / d.df), 6) AS tfidf
    FROM tf t JOIN dfq d USING (term) CROSS JOIN n),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
    FROM scored)
SELECT doc_id, term, tf, df, tfidf FROM ranked WHERE rk <= 5
""",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document. Plan shape for scale: tf is one
    map-side-combined groupBy on (doc, term); df is a second combine on
    term; the corpus size joins in as a broadcast 1-row aggregate (no
    driver-side count()); ranking is a bounded per-doc window. Ordering
    is on the ROUNDED score with a term tie-break so both engines pick
    the identical top-5 set."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .drop("rk")
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
