"""featurestore_for_joycastle_java_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``liangkaixin/featurestore-for-joycastle-java`` (a Java
Kafka→SQLite streaming-ETL feature-store ingest pipeline), widened to the
full DataFrame feature-engineering surface plus LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis).

Design stance (see SURVEY.md §7):
- DataFrame/SQL only; Catalyst plans everything. No RDDs in operator paths.
- No ``collect()`` / driver-side data loops inside operators — every op is a
  distributed plan that survives a 1000-executor, 100 TB deployment.
- Python UDFs only where built-ins genuinely can't express the semantics,
  and then always Arrow-batched (pandas_udf / applyInPandas / mapInPandas).
"""

from featurestore_for_joycastle_java_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
