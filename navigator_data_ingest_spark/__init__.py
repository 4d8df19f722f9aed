"""PySpark-native analytics/ingest engine.

A ground-up Spark rebuild of the capabilities of
climatepolicyradar/navigator-data-ingest (reference at /root/reference),
re-expressed as DataFrame transformations so the same pipeline scales to
100 TB on a cluster, plus the LLM-training-data operators (dedup,
similarity search, text analysis, multimodal plumbing) such a pipeline
needs.

Layout:
    session      — tuned SparkSession builder
    sources/     — table readers (parquet tables, pipeline-updates JSON)
    functions/   — pure column-expression building blocks
    operators/   — ingest / dedup / similarity / text / analytics ops
    plans/       — end-to-end batch pipeline composition
    streaming/   — Structured Streaming variants
"""

__version__ = "0.1.0"
