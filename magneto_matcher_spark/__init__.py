"""magneto_matcher_spark — a brand-new PySpark-native CDC / incremental-ingest
engine with the query and data-processing capabilities of the Magneto
schema-matching reference (arXiv:2412.08194).

Layout
------
- ``session``    : SparkSession factory (Arrow on, AQE on).
- ``schemas``    : canonical StructTypes (transcripts, change feed, profiles,
                   candidates, matches).
- ``sources``    : deterministic change-feed generator + lake table layer
                   (Iceberg-semantics over Parquet + JSON snapshot log).
- ``plans``      : batch apply plan (normalize → max-LSN dedup → MERGE) and the
                   matcher cascade plan.
- ``streaming``  : Structured Streaming / replay driver with exactly-once
                   snapshot-summary offsets.
- ``operators``  : the Magneto operator library re-expressed Spark-first
                   (profiling, sampling, serialization, string similarity,
                   embeddings, rerankers, metrics) plus large-scale
                   training-data ops (dedup, ANN, text analysis).
- ``functions``  : scalar expression builders (the cleaning layer).
"""

__version__ = "0.1.0"
