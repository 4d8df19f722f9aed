"""Enumerate unpartitioned (global) Window operators per registry query.

Backs the tests/test_plan_shape.py allowlist: every query whose plan
contains a Window with an EMPTY partition spec must either be in the
documented bounded-intermediate allowlist or fail the suite.

Usage: python scripts/window_audit.py [sf_dir]
Prints one line per query that plans >=1 global window.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from navigator_data_ingest_spark import registry  # noqa: E402
from navigator_data_ingest_spark.plans.audit import (  # noqa: E402
    unpartitioned_window_count,
)
from navigator_data_ingest_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="window_audit")
    rows = []
    for name, fn in registry.queries().items():
        if name.startswith(("src_", "sink_", "stream_")) or name in (
            "ingest_download_fetch",
            "mm_decode_stub",
        ):
            continue  # side-effecting at plan-build time (same skip set
            # as tests/test_plan_shape.py _PLAN_ONLY)
        try:
            n = unpartitioned_window_count(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}\tERROR\t{type(exc).__name__}: {str(exc)[:80]}")
            continue
        if n:
            rows.append((name, n))
            print(f"{name}\t{n}")
    print(f"# total queries with global windows: {len(rows)}")


if __name__ == "__main__":
    main()
