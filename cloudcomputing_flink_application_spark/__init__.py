"""spark_graft — a PySpark-native streaming analytics engine.

Capability reference: hasanyah/cloudcomputing-flink-application (five event-time
streaming queries over highway-telemetry and NYC-taxi streams), re-expressed
Spark-first on DataFrame / Catalyst / Structured Streaming, and extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) designed for 100 TB scale.

Layout:
  session     — SparkSession factory with pinned semantics (UTC, AQE, Arrow)
  schemas     — named StructTypes for every input table
  sources     — batch/streaming readers + derived reference-shaped views
  functions   — scalar expression helpers (exact arithmetic, text, hashing)
  operators   — the query operators (telematics, taxi, dedup, similarity, ...)
  streaming   — stateful streaming variants (count windows via state store)
  plans       — plan-inspection helpers (pushdown / broadcast assertions)
"""

__version__ = "0.1.0"
