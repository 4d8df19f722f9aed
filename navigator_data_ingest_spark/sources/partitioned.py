"""Hive-style partitioned parquet layout with partition pruning.

At 100 TB the cheapest scan is the one that never happens: laying the
corpus out as ``partitionBy(lang)`` (or date, source, ...) directories
means a query that filters on the partition column opens ONLY the
matching directories — the other ~95% of the corpus is skipped at
planning time, before any I/O. This is directory-level pruning on top
of parquet's row-group statistics, and it is the standard layout for
language- or date-sliced training-corpus reads.

The plan-shape test pins the proof: the scan's ``PartitionFilters``
carries the lang predicate and zero data filters remain (the partition
column never materializes in the files), so a 1-of-5-langs read touches
1/5th of the directories regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from navigator_data_ingest_spark.sources.sinks import sink_path
from navigator_data_ingest_spark.sources.tables import load_table


def write_partitioned(spark: SparkSession, sf_dir: str) -> str:
    """documents -> parquet dataset partitioned by lang (idempotent)."""
    out = sink_path("documents_by_lang", sf_dir)
    (
        load_table(spark, sf_dir, "documents")
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(out)
    )
    return out


DOCS_PART_SCHEMA = "doc_id bigint, text string, source string, n_chars bigint, lang string"


def pruned_read(spark: SparkSession, path: str, lang: str) -> DataFrame:
    """Per-source stats over ONE lang partition (pruned scan, no write).

    Explicit schema on the read-back: a zero-row upstream (filter-to-
    zero, empty backfill window) writes NO data files, and schema
    inference over the bare directory raises UNABLE_TO_INFER_SCHEMA —
    the round-9 empty-input-axis class. The declared schema is what the
    writer contractually produces, so non-empty reads are unchanged.
    """
    return (
        spark.read.schema(DOCS_PART_SCHEMA).parquet(path)
        .filter(F.col("lang") == lang)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("source")
    )


def sink_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: partitioned write, then a pruned single-lang read.

    Correctness is oracled against the unpartitioned original; the
    pruning itself (PartitionFilters on lang, no post-scan lang filter)
    is pinned in tests/test_plan_shape.py.
    """
    path = write_partitioned(spark, sf_dir)
    return pruned_read(spark, path, "en")


def sink_partitioned_prune_sql() -> str:
    return """
    SELECT source,
           count(*)::bigint AS n_docs,
           sum(n_chars)::bigint AS total_chars,
           round(avg(n_chars), 6) AS avg_chars
    FROM documents
    WHERE lang = 'en'
    GROUP BY source
    ORDER BY source
    """


def sink_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the warehouse backfill primitive:
    rewriting ONE partition of a partitioned dataset replaces exactly
    that directory and leaves every other partition's files untouched
    (static overwrite mode would truncate the whole table first).

    Round trip: documents land partitioned by ``lang`` (v1); a
    corrected 'en' slice (a deterministic +1000 char-count marker) is
    written with ``partitionOverwriteMode=dynamic``; the read-back must
    show marked 'en' rows and UNTOUCHED originals everywhere else —
    which is exactly what the oracle recomputes. At 100 TB this is the
    daily-backfill path: the rewrite cost is one partition, not the
    table.
    """
    import os

    from navigator_data_ingest_spark.sources.sinks import sink_path

    out = sink_path("dynpart", sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    fixed_en = docs.where(F.col("lang") == "en").withColumn(
        "n_chars", F.col("n_chars") + F.lit(1000)
    )
    (
        fixed_en.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang")
        .parquet(out)
    )
    assert os.path.isdir(out)
    # explicit schema: empty-input robustness (see pruned_read)
    return (
        spark.read.schema(
            "doc_id bigint, source string, n_chars bigint, lang string"
        )
        .parquet(out)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


def sink_partition_overwrite_sql() -> str:
    return """
    SELECT doc_id, lang, source,
           CASE WHEN lang = 'en' THEN n_chars + 1000 ELSE n_chars END AS n_chars
    FROM documents
    ORDER BY doc_id
    """
