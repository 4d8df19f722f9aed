"""Pin the round-half-boundary robustness axis (scripts/boundary_probe.py).

The four r5 driver hash-fails were the cross-engine ``round(p/q, 6)``
class. These tests run exactly those ops — plus a sample of the ops
converted to integer-exact HALF_UP this round — against the
boundary-friendly fixture (2^a·5^b cardinalities, quarter-quantized
money, minute-floored timestamps) and diff Spark vs the DuckDB oracle.
A failure here is a cross-engine rounding divergence the plain fixture
would miss.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from scripts.boundary_probe import build
from tests.conftest import SF_CORRECT
from tests.oracle import compare, duckdb_con

# the r5 driver-proven class members + converted high-traffic ratios
PINNED = [
    "stats_runs_test",
    "stats_capture_recapture",
    "stats_mann_whitney",
    "q_events_concurrency",
    "q_events_heavy_hitters",
    "stats_ab_srm",
    "stats_mcnemar",
    "stats_dispersion_index",
    "stats_herfindahl",
    "stats_gini_exact",
    "stats_fleiss_kappa",
    "stats_cohens_kappa",
    "q_events_inter_arrival",
    "stats_bootstrap_ci",
]


@pytest.fixture(scope="module")
def probe_dir():
    return build(SF_CORRECT, "/tmp/boundary_sf001_fixture")


@pytest.mark.parametrize("name", PINNED)
def test_boundary_probe_parity(spark, probe_dir, name):
    q = entry.queries()[name]
    sql = entry.oracle_sql()[name]
    con = duckdb_con(probe_dir)
    ok, msg = compare(q(spark, probe_dir), con, sql)
    assert ok, msg
