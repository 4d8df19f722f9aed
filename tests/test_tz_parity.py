"""Session-timezone parity (the r5 q_events_concurrency secondary
failure mode).

A registry query whose OUTPUT carries an absolute epoch value must not
move when ``spark.sql.session.timeZone`` does: the DuckDB oracle reads
the parquet timestamps as naive values, so any Spark NTZ->LTZ cast on
the way to an epoch output silently shifts the answer under a non-UTC
driver session. These tests run the epoch-emitting ops under
America/New_York (DST-bearing, offset-bearing) and diff against the
oracle — the same check the driver would apply from a non-UTC host.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from tests.conftest import SF_CORRECT
from tests.oracle import compare, duckdb_con

# ops whose OUTPUT columns include an absolute epoch / wall-clock value
# (diffs of two epochs cancel the session offset except across DST
# transitions; absolute outputs shift by the whole offset)
EPOCH_OUTPUT_OPS = [
    "q_events_concurrency",  # first_peak_us
    # epoch-DERIVED ops (diffs/splits) — a DST boundary inside the data
    # window would shift even diffs under the old NTZ->LTZ cast idiom;
    # all now ride the NTZ-domain epoch (functions/exact.sp_epoch_us)
    "q_events_latest_by",
    "stats_ks_drift",
    "q_events_sessionize",
    "q_events_inter_arrival",
]


@pytest.mark.parametrize("name", EPOCH_OUTPUT_OPS)
def test_epoch_output_ops_under_nonutc_session(spark, name):
    q = entry.queries()[name]
    sql = entry.oracle_sql()[name]
    con = duckdb_con(SF_CORRECT)
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ok, msg = compare(q(spark, SF_CORRECT), con, sql)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert ok, msg
