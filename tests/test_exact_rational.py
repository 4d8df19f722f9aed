"""Pin the integer-exact HALF_UP rational helper (functions/exact.py).

The r5 driver proved the cross-engine class: Spark round(DOUBLE, 6) is
shortest-decimal-repr HALF_UP, DuckDB rounds the binary double, and any
exact rational terminating at a 7th-decimal '5' flips between them.
These tests assert (a) the two engines' raw round() really DO diverge on
a boundary rational (the mechanism), and (b) sp_rat6/dk_rat6 agree with
each other and with exact Python integer arithmetic on boundary cases,
negatives, and a hypothesis sweep.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from navigator_data_ingest_spark.functions.exact import (
    dk_rat6,
    sp_epoch_us,
    sp_rat6,
)


def py_rat6(p: int, q: int) -> float:
    """Reference: HALF_UP micro-units of p/q in exact integer arithmetic."""
    assert q > 0
    sign = -1 if p < 0 else 1
    micros = sign * ((2 * abs(p) * 1_000_000 + q) // (2 * q))
    return micros / 1_000_000.0


# p/q cases that terminate at the 7th decimal digit '5' (reduced
# denominator divides 2e6) — the exact class the r5 driver data hit.
BOUNDARY = [
    (400001, 400000),     # 1.0000025  -> 1.000003 HALF_UP
    (-400001, 400000),    # -1.0000025 -> -1.000003 (away from zero)
    (3, 800000),          # 0.00000375 -> 0.000004
    (4000003, 1600000),   # 2.500001875 -> 2.500002
    (7, 2000000),         # 0.0000035  -> 0.000004
    (1, 3),               # non-terminating control
    (0, 7),
    (12345678901234567, 987654321),  # decimal(38,0) headroom path
]


def test_engines_diverge_on_raw_round(spark):
    """The mechanism itself: raw round(p/q, 6) disagrees across engines
    on a boundary rational — this is WHY the helper exists."""
    s = (
        spark.sql(
            "SELECT round(cast(400001 as double) / cast(400000 as double), 6) AS r"
        )
        .collect()[0]
        .r
    )
    d = duckdb.sql(
        "SELECT round(400001::DOUBLE / 400000::DOUBLE, 6) AS r"
    ).fetchone()[0]
    assert s == 1.000003 and d == 1.000002  # noqa: PLR2004


@pytest.mark.parametrize("p,q", BOUNDARY)
def test_rat6_cross_engine(spark, p, q):
    expected = py_rat6(p, q)
    s = spark.sql(f"SELECT {sp_rat6(str(p), str(q))} AS v").collect()[0].v
    d = duckdb.sql(f"SELECT {dk_rat6(str(p), str(q))} AS v").fetchone()[0]
    assert s == expected
    assert d == expected


@settings(max_examples=200, deadline=None)
@given(
    p=st.integers(min_value=-(10**15), max_value=10**15),
    q=st.integers(min_value=1, max_value=10**12),
)
def test_rat6_duckdb_matches_python(p, q):
    # Helper contract: |p*1e6/q| < 2^53 so the output double is exact.
    if abs(p) * 1_000_000 // q >= 2**53:
        q = abs(p) // 10**9 + 1  # rescale into contract range
    # DuckDB evaluates instantly; the Spark expression is pinned equal to
    # the same formula in test_rat6_cross_engine and below on a sample.
    d = duckdb.sql(f"SELECT {dk_rat6(str(p), str(q))} AS v").fetchone()[0]
    assert d == py_rat6(p, q)


def test_rat6_spark_sample(spark):
    rows = [(400001, 400000), (-7, 3), (999999999, 7), (5, 2000000)]
    exprs = ", ".join(
        f"{sp_rat6(str(p), str(q))} AS v{i}" for i, (p, q) in enumerate(rows)
    )
    got = spark.sql(f"SELECT {exprs}").collect()[0]
    for i, (p, q) in enumerate(rows):
        assert got[f"v{i}"] == py_rat6(p, q)


def test_epoch_us_is_session_tz_free(spark):
    """sp_epoch_us must not move when the session TZ does (the second
    q_events_concurrency failure mode: NTZ->LTZ cast epoch shift)."""
    q = (
        "SELECT "
        + sp_epoch_us("timestamp_ntz'2020-06-15 12:00:00.250'")
        + " AS us"
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = spark.sql(q).collect()[0].us
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = spark.sql(q).collect()[0].us
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert utc == ny == 1592222400250000
    # and it equals DuckDB's naive epoch_us
    d = duckdb.sql(
        "SELECT epoch_us(TIMESTAMP '2020-06-15 12:00:00.250') AS us"
    ).fetchone()[0]
    assert d == utc
