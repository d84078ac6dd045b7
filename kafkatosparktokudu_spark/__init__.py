"""PySpark-native analytics engine with the query / data-processing
capabilities of the reference CDC pipeline (fcvane/KafkaToSparkToKudu).

The reference is a Spark-Streaming (DStream) Kafka -> Kudu upsert pipeline
(see /root/reference/src/main/Scala/com/DataSynchronization/*.scala). This
package re-expresses that surface Spark-first:

- ``sources``     batch parquet fixtures + Kafka / file streaming sources
- ``operators``   CDC parse/normalize/merge, dedup, similarity, text, multimodal
- ``functions``   reusable column-expression builders (vectors, text, hashing)
- ``plans``       the analytic query surface (queries + DuckDB oracle SQL)
- ``streaming``   Structured Streaming wiring (foreachBatch sync, replay, metrics)
"""

__version__ = "0.1.0"
