"""ihop_reddit_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of UMassCDS/IHOP-Reddit, re-expressed Spark-first
and designed for 100 TB scale.

Layout (SURVEY.md is the blueprint; §2 the operator inventory):

* ``session``    — SparkSession factory (UTC, AQE, Arrow).
* ``schemas``    — explicit source schemas + sentinels.
* ``operators``  — relational core: filters, projections, top-N, joins,
  aggregations, windows, set ops.
* ``sources``    — scans (JSON-lines/CSV/parquet) and sinks (parquet/CSV,
  partitioned + bucketed writers).
* ``plans``      — end-to-end pipelines (community2vec prep, bag-of-words).
* ``functions``  — scalar/text/vector column expression library.
* ``datapipe``   — LLM-data-pipeline extensions: dedup, similarity search,
  text quality, multimodal columns.
* ``ml``         — text pipeline, community2vec, clustering, metrics.
* ``streaming``  — Structured Streaming surface over the events table.
"""

__version__ = "0.1.0"
