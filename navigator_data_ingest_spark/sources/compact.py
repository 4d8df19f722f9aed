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


# --------------------------------------------------------------------------
# range-sorted write with a file-disjointness audit
# --------------------------------------------------------------------------

RANGE_FILES = 8  # target file count for the sorted layout


def sink_range_sorted_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered sorted write + the audit that PROVES pruning
    will work: orders rewritten via ``repartitionByRange(o_totalprice)``
    + ``sortWithinPartitions``, read back with ``input_file_name()``,
    per-file [min, max] ranges computed, and overlapping file pairs
    counted — zero overlaps is the property file-skipping relies on
    (a min/max footer check can exclude a file iff ranges are
    disjoint). layout_zorder/layout_hilbert audit the in-plan
    clustering; this one audits the ACTUAL files on disk.

    The overlap count is a self-join on the FILE-count-bounded range
    table (RANGE_FILES rows) using interval logic — bounded by
    construction. Range boundaries are sampled by Spark internally, so
    the audit reports file COUNT and overlap count (deterministic: the
    written partitioning always yields disjoint ranges and a fixed
    file count) plus exact totals the oracle replays from the source.
    """
    out = sink_path("range_sorted", sf_dir)
    (
        load_table(spark, sf_dir, "orders")
        .repartitionByRange(RANGE_FILES, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).withColumn("f", F.input_file_name())
    ranges = back.groupBy("f").agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    a = ranges.select("f", "lo", "hi")
    b = ranges.select(
        F.col("f").alias("f2"), F.col("lo").alias("lo2"), F.col("hi").alias("hi2")
    )
    overlaps = (
        a.join(F.broadcast(b), F.col("f") < F.col("f2"))
        .where((F.col("lo") <= F.col("hi2")) & (F.col("lo2") <= F.col("hi")))
        .agg(F.count(F.lit(1)).alias("n_overlapping_pairs"))
    )
    # file COUNT is not certified as an exact constant: RangePartitioner
    # can leave partitions empty (low-cardinality sort keys, tiny SFs)
    # and empty partitions write no file — the stable contract is
    # least(n_rows, 1) <= files <= RANGE_FILES, certified as a boolean
    # (the lower bound collapses to 0 on a zero-row source, where no
    # file is the CORRECT outcome — r11 SWEEP_EMPTY allowlist
    # retirement), with n_rows itself coalesced to the count the
    # oracle's count(*) yields on empty.
    totals = ranges.agg(
        (
            (F.count(F.lit(1)) >= F.least(F.coalesce(F.sum("n"), F.lit(0)), F.lit(1)))
            & (F.count(F.lit(1)) <= RANGE_FILES)
        ).alias("files_within_target"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_rows"),
        F.round(F.min("lo"), 2).alias("global_min"),
        F.round(F.max("hi"), 2).alias("global_max"),
    )
    return totals.crossJoin(F.broadcast(overlaps)).select(
        "files_within_target",
        "n_rows",
        "global_min",
        "global_max",
        "n_overlapping_pairs",
    )


def sink_range_sorted_write_sql() -> str:
    return f"""
    SELECT true AS files_within_target,
           count(*)::BIGINT AS n_rows,
           round(min(o_totalprice), 2) AS global_min,
           round(max(o_totalprice), 2) AS global_max,
           0::BIGINT AS n_overlapping_pairs
    FROM orders
    """


# --------------------------------------------------------------------------
# publish-with-integrity: per-partition checksum manifest
# --------------------------------------------------------------------------


def sink_checksum_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned publish with an integrity MANIFEST: orders written
    partitioned by priority, read back, and summarized as the
    (partition, row-count, content-checksum) table a downstream
    consumer verifies before trusting the hand-off — the sink-side
    twin of functions/witness.py's in-query witnesses.

    The checksum is a COMMUTATIVE sum of portable per-row 32-bit
    hashes over the key business columns (md5-derived — the oracle
    replays it from the SOURCE rows, proving the round trip moved
    every row exactly once); commutativity makes it partition- and
    order-invariant, the property a distributed writer needs. All
    exact integers. NULL rule: NULL key fields hash their literal
    '<null>' marker (both engines).
    """
    from navigator_data_ingest_spark.functions import exprs as X

    out = sink_path("orders_manifest", sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    (
        orders
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(out)
    )
    # explicit (writer-derived) schema: a zero-row table writes no
    # partition dirs and inference raises UNABLE_TO_INFER_SCHEMA
    # (round-9 empty-input axis); non-empty reads are unchanged
    back = spark.read.schema(orders.schema).parquet(out)
    row = (
        "coalesce(cast(o_orderkey as string), '<null>') || ':' ||"
        " coalesce(cast(cast(round(o_totalprice * 100) as bigint) as string),"
        " '<null>')"
    )
    h = X.sp_hash32(f"({row})", "manifest")
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # DECIMAL(38,0) accumulator: a BIGINT sum of 32-bit row
            # hashes overflows (ANSI raises) at ~2^31 rows/partition —
            # the witness.py overflow discipline applied to the sink.
            # Emitted as STRING: Spark decimal(38,0) and DuckDB
            # HUGEINT/DECIMAL(38,0) are different hash surfaces for the
            # driver (the src_text_lines r7 flip class), so both
            # engines emit identical decimal-string bytes.
            F.expr(f"cast(sum(cast({h} as decimal(38,0))) as string)").alias(
                "content_checksum"
            ),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .withColumnRenamed("o_orderpriority", "partition_value")
        .orderBy("partition_value")
    )


def sink_checksum_manifest_sql() -> str:
    from navigator_data_ingest_spark.functions import exprs as X

    row = (
        "coalesce(o_orderkey::VARCHAR, '<null>') || ':' ||"
        " coalesce(round(o_totalprice * 100)::BIGINT::VARCHAR, '<null>')"
    )
    h = X.dk_hash32(f"({row})", "manifest")
    return f"""
    SELECT o_orderpriority AS partition_value,
           count(*)::BIGINT AS n_rows,
           sum({h}::HUGEINT)::VARCHAR AS content_checksum,
           min(o_orderkey)::BIGINT AS min_key,
           max(o_orderkey)::BIGINT AS max_key
    FROM orders
    GROUP BY 1 ORDER BY partition_value
    """
