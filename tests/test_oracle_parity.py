"""Every registered query with an oracle must hash-match DuckDB at sf0.01.

This mirrors the driver's CORRECTNESS gate so breakage is caught before
a round ends.
"""

from __future__ import annotations

import pytest

from navigator_data_ingest_spark import registry
from tests.conftest import SF_CORRECT
from tests.oracle import compare, duckdb_con

_ORACLES = registry.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_CORRECT)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, con, name):
    fn = registry.queries()[name]
    ok, msg = compare(fn(spark, SF_CORRECT), con, _ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_all_queries_run_on_smoke(spark):
    from tests.conftest import SF_SMOKE

    for name, fn in registry.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name
