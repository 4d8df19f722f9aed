"""Cross-engine RESULT-TYPE census (VERDICT r7 "Next round" #1).

For every oracled registry key, build the Spark DataFrame under a PLAIN
ANSI session (`spark.sql.ansi.enabled=true` — the driver's Spark 4
default; none of session.py's configs may leak in) and compare each
final column's type surface against the DuckDB oracle's result types.

The r7 driver hash-flips were EXACTLY the queries whose final
projection had a different numeric type class on the two engines
(DuckDB HUGEINT vs Spark bigint; ANSI decimal division vs DOUBLE) —
values equal, surface different, invisible to the str()-normalized
local compare but visible to the driver's hasher.

Usage: python scripts/type_census.py [sf_dir] [only_prefix...]
Prints one JSON line per mismatching key and a summary.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from tests.oracle import duckdb_con  # noqa: E402
from tests.type_surface import classify_duckdb, classify_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "true")
        .getOrCreate()
    )
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"

    qs = entry.queries()
    oracles = entry.oracle_sql()
    keys = [k for k in qs if k in oracles]
    if only:
        keys = [k for k in keys if any(k.startswith(p) for p in only)]

    con = duckdb_con(sf_dir)
    n_bad = 0
    t0 = time.monotonic()
    for k in keys:
        try:
            df = qs[k](spark, sf_dir)
            sp = dict(df.dtypes)
            rel = con.sql(oracles[k])
            dk = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as exc:  # noqa: BLE001
            n_bad += 1
            print(json.dumps({k: {"err": str(exc)[:300]}}), flush=True)
            continue
        bad = {}
        for col in sorted(set(sp) | set(dk)):
            s_cls = classify_spark(sp.get(col))
            d_cls = classify_duckdb(dk.get(col))
            if s_cls != d_cls:
                bad[col] = {
                    "spark": sp.get(col),
                    "duckdb": dk.get(col),
                    "spark_cls": s_cls,
                    "duckdb_cls": d_cls,
                }
        if bad:
            n_bad += 1
            print(json.dumps({k: bad}), flush=True)
    print(
        json.dumps(
            {
                "n_keys": len(keys),
                "n_mismatch": n_bad,
                "sec": round(time.monotonic() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
