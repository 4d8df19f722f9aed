"""Row-order (float-summation-noise) regression pins.

The r5 shuffled-row probe (scripts/shuffle_rows.py) re-ran every oracle
on a deterministically permuted copy of sf0.01 — same values, different
summation order on BOTH engines — and flagged exactly two ops:
``q_cube_pricing`` (round(sum(double), 6) whose grand-total 6th decimal
sits below the sum's ULP → now exact integer cents) and
``src_file_metadata`` (asserted physical order == doc_id order → now a
permutation-invariant set certification). This module pins those two
plus q1 (the grand-total control that was always order-safe) on the
shuffled fixture; the full registry is probed by running
``scripts/sweep.py <shuffled-dir>`` per round.
"""

from __future__ import annotations

import pytest

from navigator_data_ingest_spark import registry
from scripts.shuffle_rows import build
from tests.conftest import SF_CORRECT
from tests.oracle import compare, duckdb_con

PINNED = ["q_cube_pricing", "src_file_metadata", "q1_pricing_summary"]


@pytest.fixture(scope="module")
def shuf_sf():
    return build(SF_CORRECT)


@pytest.fixture(scope="module")
def shuf_con(shuf_sf):
    c = duckdb_con(shuf_sf)
    yield c
    c.close()


@pytest.mark.parametrize("name", PINNED)
def test_shuffled_row_parity(spark, shuf_con, shuf_sf, name):
    oracles = registry.oracle_sql()
    fn = registry.queries()[name]
    ok, msg = compare(fn(spark, shuf_sf), shuf_con, oracles[name])
    assert ok, f"{name} under shuffled row order: {msg}"
