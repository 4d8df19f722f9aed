"""Driver-style full-registry sweep: run every queries() entry at sf0.01,
compare against oracle_sql() via DuckDB, and time each query.

Usage: python scripts/sweep.py [sf_dir] [only_prefix...]
Writes one JSON line per query and a summary to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from tests.oracle import compare, duckdb_con  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    if os.environ.get("SWEEP_NULL_INJECT"):
        # robustness mode: run the whole registry on a copy of sf_dir
        # with ~1% of every realistically-nullable column nulled (the
        # r4 driver failures were NULL-surface divergence; see
        # scripts/null_inject.py). Oracle views read the SAME copy, so
        # any red row is a genuine cross-engine NULL-semantics bug.
        from scripts.null_inject import build as _ni_build

        sf_dir = _ni_build(sf_dir)

    if os.environ.get("SWEEP_BOUNDARY_PROBE"):
        # robustness mode 3: boundary-friendly cardinalities/values so
        # rational outputs land on decimal rounding boundaries (the r5
        # cross-engine round-half class; see scripts/boundary_probe.py)
        from scripts.boundary_probe import build as _bp_build

        sf_dir = _bp_build(sf_dir)

    if os.environ.get("SWEEP_PLAIN"):
        # the driver's view: a virgin session, none of session.py's configs
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from navigator_data_ingest_spark.session import get_spark

        spark = get_spark()
    # ENGINE warmup (same jobs as bench.py): pay codegen JIT for the
    # md5/regexp/aggregate expression paths, fork the Arrow worker pool,
    # and read one parquet footer BEFORE the first timed query — without
    # this the first registry query carries ~4.5 s of one-time JVM setup
    # in the plain (virgin-session) mode.
    try:
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
        spark.range(0, 20000).selectExpr(
            "md5(cast(id as string)) AS h",
            "regexp_extract_all(lower('ab 12 xy xyz 9 q w'), '[a-z0-9]+', 0) AS t",
            "aggregate(sequence(1, 8), cast(0.0 as double), (a, i) -> a + i) AS f",
        ).write.format("noop").mode("overwrite").save()
        spark.range(0, 1000).mapInPandas(
            lambda it: it, schema="id bigint"
        ).write.format("noop").mode("overwrite").save()
    except Exception as exc:  # noqa: BLE001
        print(f"sweep: warmup failed ({exc}); continuing", file=sys.stderr)

    qs = entry.queries()
    oracles = entry.oracle_sql()

    def run_one(name, fn, con):
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                ok, msg = compare(df, con, oracles[name])
            else:
                n = df.count()
                ok, msg = n >= 0, f"rows-only: {n}"
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"EXC: {type(exc).__name__}: {exc}"
        dt = time.monotonic() - t0
        return {"ok": ok, "sec": round(dt, 2), "msg": msg[:200]}

    selected = [
        (name, fn)
        for name, fn in qs.items()
        if not only or any(name.startswith(p) for p in only)
    ]
    results = {}
    t_all = time.monotonic()
    n_threads = int(os.environ.get("SWEEP_THREADS", "1"))
    if n_threads > 1:
        # Spark's scheduler interleaves jobs from concurrent driver
        # threads; each worker gets its OWN DuckDB connection. Streaming
        # queries stay SERIAL: their drains set/restore session confs
        # (shuffle partitions, state-store provider), which races across
        # threads.
        from concurrent.futures import ThreadPoolExecutor

        par = [(n, f) for n, f in selected
               if not n.startswith(("stream_", "src_stream", "src_python_datasource_stream"))]
        ser = [(n, f) for n, f in selected
               if n.startswith(("stream_", "src_stream", "src_python_datasource_stream"))]

        def worker(item):
            name, fn = item
            return name, run_one(name, fn, duckdb_con(sf_dir))

        with ThreadPoolExecutor(max_workers=n_threads) as ex:
            for name, res in ex.map(worker, par):
                results[name] = res
                print(json.dumps({name: res}), flush=True)
        con = duckdb_con(sf_dir)
        for name, fn in ser:
            results[name] = run_one(name, fn, con)
            print(json.dumps({name: results[name]}), flush=True)
    else:
        con = duckdb_con(sf_dir)
        for name, fn in selected:
            results[name] = run_one(name, fn, con)
            print(json.dumps({name: results[name]}), flush=True)

    total = time.monotonic() - t_all
    bad = {k: v for k, v in results.items() if not v["ok"]}
    slow = sorted(results.items(), key=lambda kv: -kv[1]["sec"])[:15]
    print(json.dumps({
        "total_sec": round(total, 1),
        "n": len(results),
        "n_fail": len(bad),
        "fails": {k: v["msg"] for k, v in bad.items()},
        "slowest": [(k, v["sec"]) for k, v in slow],
    }, indent=1))


if __name__ == "__main__":
    main()
