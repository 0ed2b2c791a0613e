"""Multimodal-column queries (north-star §2.3): binary blob stats
(oracle-checked) and the stubbed decode pipeline (rows-only — the decode
stand-in is Python-side by design)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from featurestore_for_joycastle_java_spark.operators import multimodal as M
from featurestore_for_joycastle_java_spark.registry import query
from featurestore_for_joycastle_java_spark.sources import load_table


@query(
    "multimodal_blob_stats",
    oracle="""
SELECT doc_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS blob_len,
       md5(text) AS blob_md5
FROM documents
""",
)
def multimodal_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata entirely JVM-side: byte length + content
    hash of the blob (utf-8 text bytes standing in for media bytes)."""
    d = M.attach_blob(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.octet_length("blob").alias("blob_len"),
        F.md5("blob").alias("blob_md5"),
    )


@query(
    "multimodal_decode_features",
    # The decode stage is a (stubbed) Python codec over mapInPandas —
    # inherently non-SQL; determinism is asserted in tests/test_multimodal.py.
    bench=True,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal pipeline shape: attach blob → Arrow-batched
    mapInPandas decode/feature-extract → typed rows."""
    d = M.attach_blob(load_table(spark, sf_dir, "documents"))
    return M.fake_decode_features(d)
