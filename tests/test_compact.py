"""Small-file compaction: filesystem facts the SQL oracle can't see."""

from __future__ import annotations

from navigator_data_ingest_spark.sources import compact as C
from navigator_data_ingest_spark.sources.sinks import sink_path
from tests.conftest import SF_CORRECT


def test_compact_collapses_file_count(spark):
    frag = C.write_fragmented(spark, SF_CORRECT)
    out = sink_path("events_compacted", SF_CORRECT)
    n_target = C.compact(spark, frag, out, "event_id")
    assert C.parquet_file_count(frag) == C.FRAGMENT_PARTS
    got = C.parquet_file_count(out)
    assert got == n_target
    assert got < C.FRAGMENT_PARTS // 4, "compaction barely reduced file count"
    # lossless: same rows before and after
    assert spark.read.parquet(out).count() == spark.read.parquet(frag).count()


def test_compact_files_are_range_clustered(spark):
    """repartitionByRange must leave files with DISJOINT event_id
    ranges — that's what makes post-compaction min/max pruning work."""
    out = sink_path("events_compacted", SF_CORRECT)
    frag = C.write_fragmented(spark, SF_CORRECT)
    C.compact(spark, frag, out, "event_id")
    import pyspark.sql.functions as F

    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next, "file id-ranges overlap: not range-clustered"
