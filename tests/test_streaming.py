"""Streaming semantics tests: dedup state and watermark late-data drops.

The registry round-trip already proves availableNow parity with the
batch oracle; these tests force MULTI-batch runs (maxFilesPerTrigger=1)
to exercise what only shows up across micro-batches: watermark
advancement dropping late data, and duplicate suppression.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from navigator_data_ingest_spark.streaming.streams import (
    _run_to_memory,
    read_stream_events,
    windowed_dedup_agg,
)

BASE_NS = 1_767_225_600_000_000_000  # 2026-01-01T00:00:00Z in ns
HOUR_NS = 3_600_000_000_000


def _write_events(path: str, rows: list[tuple[int, int, float]]) -> None:
    """rows: (event_id, ts_ns, value); one parquet file."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["click"] * len(rows)),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        path,
    )


def test_dedup_suppresses_duplicate_events(spark):
    d = tempfile.mkdtemp(prefix="nav_stream_dedup_")
    # event 1 appears three times with identical (event_id, ts)
    _write_events(
        os.path.join(d, "a.parquet"),
        [(1, BASE_NS, 1.0), (1, BASE_NS, 1.0), (1, BASE_NS, 1.0), (2, BASE_NS, 2.0)],
    )
    agg = windowed_dedup_agg(read_stream_events(spark, d, glob="*.parquet"))
    out = _run_to_memory(agg, "t_dedup", "update").collect()
    assert len(out) == 1
    assert out[0].n_events == 2  # not 4
    assert out[0].sum_value == 3.0


def test_watermark_drops_late_data_across_batches(spark):
    """A sufficiently-late event is dropped once the watermark commits.

    Spark commits the watermark conservatively with a one-batch lag
    (the value derived from batch N's max event time takes effect in
    batch N+2's late-row filter), so the drop needs three micro-batches:
    batch 0 sets max event time 12:00, batch 1 lets the 11:00 watermark
    commit, batch 2's 09:30 event lands behind it and is dropped.
    """
    d = tempfile.mkdtemp(prefix="nav_stream_late_")
    a = os.path.join(d, "a.parquet")
    b = os.path.join(d, "b.parquet")
    c = os.path.join(d, "c.parquet")
    _write_events(a, [(1, BASE_NS + 10 * HOUR_NS, 1.0), (2, BASE_NS + 12 * HOUR_NS, 1.0)])
    _write_events(b, [(3, BASE_NS + 11 * HOUR_NS + HOUR_NS // 2, 1.0)])
    _write_events(c, [(4, BASE_NS + 9 * HOUR_NS + HOUR_NS // 2, 100.0)])
    # deterministic processing order via strictly increasing mtimes
    for i, f in enumerate((a, b, c)):
        os.utime(f, (1_700_000_000 + i * 100,) * 2)
    agg = windowed_dedup_agg(
        read_stream_events(spark, d, glob="*.parquet", max_files_per_trigger=1)
    )
    rows = _run_to_memory(agg, "t_late", "update").collect()
    hours = sorted(r.window_start.hour for r in rows)
    assert 9 not in hours, f"late event survived the watermark: {rows}"
    assert hours == [10, 11, 12]
    assert all(r.sum_value < 100.0 for r in rows)


def test_firstseen_emits_once_across_batches(spark):
    """A user present in several micro-batches yields exactly one row —
    the state survives batch boundaries and suppresses re-emission."""
    from navigator_data_ingest_spark.streaming.streams import (
        firstseen_agg,
    )

    d = tempfile.mkdtemp(prefix="nav_stream_first_")
    a, b = os.path.join(d, "a.parquet"), os.path.join(d, "b.parquet")
    _write_events(a, [(10, BASE_NS + 2 * HOUR_NS, 5.0), (11, BASE_NS + 1 * HOUR_NS, 7.0)])
    _write_events(b, [(12, BASE_NS, 9.0)])  # same user, earlier ts, later batch
    os.utime(a, (1_700_000_000,) * 2)
    os.utime(b, (1_700_000_100,) * 2)
    agg = firstseen_agg(
        read_stream_events(spark, d, glob="*.parquet", max_files_per_trigger=1)
    )
    rows = _run_to_memory(agg, "t_firstseen", "append").collect()
    assert len(rows) == 1
    # first SEEN = batch-1's (ts, event_id) min, not the global min
    assert rows[0].first_event_id == 11 and rows[0].first_value == 7.0
