#!/usr/bin/env python
"""Plan census: physical-plan shape for EVERY registry query.

Optimization-round instrument (guide §1.2/§7.2): builds each registry
query's DataFrame against a small SF dir and records plan-shape
counters — shuffle exchanges, join strategies, Python-boundary nodes,
global (unpartitioned) windows, cartesian products, parquet scans and
whether their scans carry pushed filters — without executing the query.
Output: one JSON line per query to stdout (plus a summary line), so

    python scripts/plan_census.py /root/testdata/sf0.01 > census.jsonl

gives a greppable table of every operator's plan shape. Queries whose
CONSTRUCTION runs driver-side work (bounded stripe collects, streaming
drains) still only pay that construction cost; nothing is noop-sunk.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from navigator_data_ingest_spark import registry  # noqa: E402
from navigator_data_ingest_spark.plans import audit  # noqa: E402
from navigator_data_ingest_spark.session import get_spark  # noqa: E402

_PY_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "AggregateInPandas",
    "PythonMapInArrow",
)


def census_row(name: str, df) -> dict:
    plan = audit.formatted_plan(df)
    counts: dict[str, int] = {}
    for _, node in audit._NODE.findall(plan):
        counts[node] = counts.get(node, 0) + 1
    pushed = audit.pushed_filters(df)
    scans = counts.get("Scan", 0)
    return {
        "q": name,
        "exchanges": counts.get("Exchange", 0),
        "bhj": counts.get("BroadcastHashJoin", 0),
        "smj": counts.get("SortMergeJoin", 0),
        "shj": counts.get("ShuffledHashJoin", 0),
        "cartesian": counts.get("CartesianProduct", 0),
        "bnlj": counts.get("BroadcastNestedLoopJoin", 0),
        "py_nodes": sum(counts.get(k, 0) for k in _PY_NODES),
        "batch_eval_python": counts.get("BatchEvalPython", 0),
        "windows": counts.get("Window", 0),
        "global_windows": audit.unpartitioned_window_count(df),
        "sorts": counts.get("Sort", 0),
        "scans": scans,
        "pushed_filter_scans": len(
            [m for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan) if m.group(1).strip()]
        ),
        "pushed_filters_n": len(pushed),
        "generate": counts.get("Generate", 0),
        "plan_nodes": sum(counts.values()),
        "plan_chars": len(plan),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark(app_name="plan-census")
    qs = registry.queries()
    rows = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            row = census_row(name, df)
            row["build_sec"] = round(time.perf_counter() - t0, 2)
        except Exception as e:  # construction failure is itself a finding
            row = {"q": name, "error": str(e)[:300]}
        rows.append(row)
        print(json.dumps(row), flush=True)
    ok = [r for r in rows if "error" not in r]
    summary = {
        "n": len(rows),
        "errors": len(rows) - len(ok),
        "total_exchanges": sum(r["exchanges"] for r in ok),
        "cartesian_or_bnlj": [r["q"] for r in ok if r["cartesian"] or r["bnlj"]],
        "batch_eval_python": [r["q"] for r in ok if r["batch_eval_python"]],
        "global_windows": [r["q"] for r in ok if r["global_windows"]],
        "top_exchanges": sorted(
            ((r["q"], r["exchanges"]) for r in ok), key=lambda t: -t[1]
        )[:25],
        "top_plan_nodes": sorted(
            ((r["q"], r["plan_nodes"]) for r in ok), key=lambda t: -t[1]
        )[:25],
        "top_build_sec": sorted(
            ((r["q"], r.get("build_sec", 0)) for r in ok), key=lambda t: -t[1]
        )[:25],
    }
    print(json.dumps({"summary": summary}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
