"""bob_vector_db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``bob-ros2/bob_vector_db`` reference.

The reference (see ``/root/repo/SURVEY.md``) is a ROS2 vector-database
ingestion node: it normalizes JSON "embed messages", embeds text/images, and
upserts ``(id, vectors, payload)`` points into cosine-distance collections
whose query surface is top-k nearest-neighbor search.  This package re-expresses
both halves — ingestion/normalization AND the similarity-query surface — as
idiomatic Spark DataFrame pipelines, plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal columns) that a
100 TB corpus pipeline needs.

Layout:
    session     — tuned SparkSession factory
    sources     — fixture/table loaders, JSON message & binary sources
    functions   — vector math, text analysis, deterministic hashing (all
                  JVM-side ``pyspark.sql.functions`` expressions; no Python
                  UDFs in the hot path)
    operators   — normalize/zip-explode, kNN join, top-k, dedup family,
                  upsert, as-of join, centroids
    streaming   — Structured Streaming ingest + windowed aggregation
    plans       — plan-inspection helpers (explain/pushdown assertions)
    queries     — the named query registry consumed by __spark_entry__.py
"""

__version__ = "0.1.0"
