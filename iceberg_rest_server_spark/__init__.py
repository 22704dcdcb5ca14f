"""PySpark-native analytics engine with the query and data-processing
capabilities of hansetag/iceberg-rest-server (reference: /root/reference).

The reference is the catalog/metadata plane of an Iceberg lakehouse that
delegates all query execution to Spark (see SURVEY.md). This package
re-expresses both planes Spark-first:

- ``queries/``    — the declared query inventory (SURVEY.md §2F, Q01–Q33),
  each as a declarative DataFrame/SQL plan Catalyst can optimize.
- ``operators/``  — engine extensions Spark lacks natively (as-of join,
  MinHash-LSH dedup, ANN similarity, text analysis, multimodal plumbing),
  built shuffle-parallel for 100 TB scale.
- ``streaming/``  — Structured Streaming queries (tumbling/session windows,
  watermarks, stateful dedup).
- ``catalog/``    — a PySpark-compatible Iceberg REST catalog plane
  (metadata builder, commit requirements, metastore, HTTP server).
"""

__version__ = "0.1.0"
