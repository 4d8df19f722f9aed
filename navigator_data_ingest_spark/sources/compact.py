"""Small-file compaction: the maintenance pass every long-lived
100 TB dataset needs.

Streaming ingest and per-batch writes accumulate thousands of tiny
files; every later scan then pays per-file open cost and the driver
pays per-file listing/planning cost (the classic "small files
problem"). Compaction rewrites a fragmented dataset into
~TARGET_FILE_BYTES files, sized from the dataset's OWN on-disk
footprint (a metadata listing, not a data read), and clusters rows by
a sort key via ``repartitionByRange`` so the rewritten files carry
tight min/max statistics — post-compaction scans prune files by range
predicate, which round-robin coalesce would destroy.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from navigator_data_ingest_spark.sources.sinks import sink_path
from navigator_data_ingest_spark.sources.tables import load_table

# demo target sized to the test SFs; production would use 128 MiB
TARGET_FILE_BYTES = 4 << 20
FRAGMENT_PARTS = 64


def _dir_bytes(path: str) -> int:
    """On-disk payload bytes of a parquet dataset (metadata-only)."""
    total = 0
    for root, _, names in os.walk(path):
        for n in names:
            if n.startswith("part-"):
                total += os.path.getsize(os.path.join(root, n))
    return total


def parquet_file_count(path: str) -> int:
    return sum(
        n.startswith("part-") and n.endswith(".parquet")
        for root, _, names in os.walk(path)
        for n in names
    )


def write_fragmented(spark: SparkSession, sf_dir: str) -> str:
    """events -> deliberately over-partitioned layout (the 'before')."""
    frag = sink_path("events_fragmented", sf_dir)
    (
        load_table(spark, sf_dir, "events")
        .repartition(FRAGMENT_PARTS)
        .write.mode("overwrite")
        .parquet(frag)
    )
    return frag


def compact(spark: SparkSession, src: str, dst: str, sort_col: str) -> int:
    """Rewrite ``src`` into ceil(bytes/TARGET) range-clustered files."""
    n_files = max(1, math.ceil(_dir_bytes(src) / TARGET_FILE_BYTES))
    (
        spark.read.parquet(src)
        .repartitionByRange(n_files, sort_col)
        .write.mode("overwrite")
        .parquet(dst)
    )
    return n_files


def sink_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: fragment -> compact -> read back, aggregated.

    The oracle proves the rewrite is lossless (per-type counts, value
    sums, id range over the COMPACTED copy vs the original table); the
    file-count collapse and range-clustering are pinned in pytest
    (tests/test_compact.py) — they are filesystem facts, not row facts.
    """
    frag = write_fragmented(spark, sf_dir)
    out = sink_path("events_compacted", sf_dir)
    compact(spark, frag, out, "event_id")
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
        .orderBy("event_type")
    )


def sink_compact_sql() -> str:
    return """
    SELECT event_type,
           count(*)::bigint AS n_events,
           round(sum(value), 6) AS total_value,
           min(event_id)::bigint AS min_id,
           max(event_id)::bigint AS max_id
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """
