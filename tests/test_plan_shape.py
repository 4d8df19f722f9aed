"""Plan-shape assertions: the SURVEY §4 scale rules, pinned.

These catch silent regressions that correctness tests can't: a filter
that stops reaching the parquet scan, a dimension join that stops
broadcasting, an accidental cartesian product in a dedup operator. All
static audits (no job runs) except the codegen check, which needs the
AQE final plan.
"""

from __future__ import annotations

import pytest

from navigator_data_ingest_spark import registry
from navigator_data_ingest_spark.plans.audit import (
    codegen_stage_count,
    plan_audit,
    pushed_filters,
    read_schemas,
)
from tests.conftest import SF_CORRECT

_Q = registry.queries()

# pure-plan queries (no side effects at plan-build time): everything
# except the sink/source round-trips, streaming drains, and python stages
_PLAN_ONLY = [
    n
    for n in _Q
    if not n.startswith(("src_", "sink_", "stream_"))
    and n not in ("ingest_download_fetch", "mm_decode_stub")
]


def test_q1_filter_reaches_scan_and_columns_pruned(spark):
    df = _Q["q1_pricing_summary"](spark, SF_CORRECT)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed
    schemas = read_schemas(df)
    assert len(schemas) == 1
    # 7 of lineitem's 16 columns read; the shipdate-only projection kept
    assert schemas[0].count(":") == 7
    assert "l_orderkey" not in schemas[0]
    audit = plan_audit(df)
    assert audit.shuffle_exchanges == 2  # partial agg + final sort
    assert audit.parquet_scans == 1


def test_q3_filters_pushed_no_cartesian(spark):
    df = _Q["q3_shipping_priority"](spark, SF_CORRECT)
    pushed = " ".join(pushed_filters(df))
    for col in ("c_mktsegment", "o_orderdate", "l_shipdate"):
        assert col in pushed, f"{col} not pushed to scan"
    audit = plan_audit(df)
    assert audit.cartesian_products == 0
    assert audit.broadcast_joins >= 1


def test_q5_dimensions_broadcast(spark):
    audit = plan_audit(_Q["q5_local_volume"](spark, SF_CORRECT))
    # nation + region at minimum must broadcast (SURVEY §4)
    assert audit.broadcast_joins >= 2
    assert audit.cartesian_products == 0


# excluded BY DESIGN: brute-force knn's all-pairs scoring, IVF's n x K
# centroid scoring and the range join's non-equi interval probe are
# deliberate broadcast nested-loops against tiny broadcast sides — the
# LSH variant / equi-joins are the pure-equijoin scale paths
_DELIBERATE_NESTED_LOOP = {
    "sim_search_bruteforce",
    "sim_search_ivf",
    "q_events_range_join",
}


@pytest.mark.parametrize(
    "name", [n for n in _PLAN_ONLY if n not in _DELIBERATE_NESTED_LOOP]
)
def test_no_accidental_cartesian_products(spark, name):
    audit = plan_audit(_Q[name](spark, SF_CORRECT))
    assert audit.cartesian_products == 0, f"{name} plans a cartesian product"


def test_dedup_lsh_joins_are_bucketed_equijoins(spark):
    """The LSH pair-join must hash-join on (band_id, band_hash)."""
    audit = plan_audit(_Q["dedup_minhash_lsh"](spark, SF_CORRECT))
    assert audit.cartesian_products == 0
    assert audit.broadcast_joins + audit.sortmerge_joins >= 1


def test_codegen_covers_q1_after_execution(spark):
    df = _Q["q1_pricing_summary"](spark, SF_CORRECT)
    df.collect()
    assert codegen_stage_count(df) >= 2, "agg pipeline fell out of codegen"
