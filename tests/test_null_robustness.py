"""NULL-injection regression pins: the round-4 driver failures and every
operator the round-5 injected sweep flagged must stay green on a
testdata copy with ~1% of each realistically-nullable column nulled.

The fixture (scripts/null_inject.py) is deterministic, so these pins
replay the exact rows that diverged: Spark-vs-DuckDB NULL window
ordering, derived keys going NULL through inner joins, NULL-propagating
concat, NaN poisoning in Python stages, and the IN-(subquery-with-NULL)
trap. The FULL registry is swept under injection by
``SWEEP_NULL_INJECT=1 scripts/sweep.py`` each round; this module keeps
the historically-diverged subset in the default pytest run.
"""

from __future__ import annotations

import pytest

from navigator_data_ingest_spark import registry
from scripts.null_inject import build
from tests.conftest import SF_CORRECT
from tests.oracle import compare, duckdb_con

# every op that EVER diverged under NULL injection (r4 driver fails +
# r5 injected-sweep finds), plus the NULL-consistent siblings the judge
# used as controls
PINNED = [
    "stats_mann_whitney",
    "q_events_concurrency",
    "q_events_mad",
    "q_events_zscore",
    "stats_two_way_anova",
    "stats_length_regression",
    "mm_frame_sample",
    "mm_decode_stub",
    "filter_blocklist",
    "src_binary_files",
    "q_pandas_udf_scalar",
    "q_apply_in_arrow",
    "q_events_asof",
    "dedup_bloom",
    "q_xml_roundtrip",
    "q_events_top_paths",
    "stream_windowed_topk",
    "stream_tws_totals",
    "stream_multiplex_router",
    "stream_timeout_finalize",
    # r5 batch-2 find: per-field max_by skips NULL values and tears the
    # matched row — whole-struct max_by pinned
    "q_events_latest_by",
]

# rows-only under injection (no oracle): must at least run clean
PINNED_ROWS_ONLY = ["dedup_recall_report"]


@pytest.fixture(scope="module")
def null_sf():
    return build(SF_CORRECT)


@pytest.fixture(scope="module")
def null_con(null_sf):
    c = duckdb_con(null_sf)
    yield c
    c.close()


@pytest.mark.parametrize("name", PINNED)
def test_null_injected_parity(spark, null_con, null_sf, name):
    oracles = registry.oracle_sql()
    assert name in oracles, f"{name} lost its oracle"
    fn = registry.queries()[name]
    ok, msg = compare(fn(spark, null_sf), null_con, oracles[name])
    assert ok, f"{name} under NULL injection: {msg}"


@pytest.mark.parametrize("name", PINNED_ROWS_ONLY)
def test_null_injected_runs(spark, null_sf, name):
    fn = registry.queries()[name]
    assert fn(spark, null_sf).count() >= 0


def test_fixture_actually_injects(null_sf):
    import duckdb

    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM '{null_sf}/events.parquet' WHERE value IS NULL"
    ).fetchone()[0]
    con.close()
    assert n > 0, "injection fixture has no NULL events.value"
