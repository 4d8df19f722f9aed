"""Driver-style full-registry sweep: run every queries() entry at sf0.01,
compare against oracle_sql() via DuckDB, and time each query.

Usage: python scripts/sweep.py [sf_dir] [only_prefix...]
Writes one JSON line per query and a summary to stdout.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from tests.oracle import compare, duckdb_con  # noqa: E402

# SWEEP_EMPTY=1 allowlist: keys whose Spark and DuckDB results disagree
# on a ZERO-ROW corpus because the two engines' empty-input conventions
# differ — NOT bugs; both sides are self-consistent and the driver never
# samples empty tables. These are checked runs-without-exception in
# empty mode and fully oracle-checked on every other axis.
_EMPTY_DIVERGENCE = {
    # DuckDB emits the () grouping set's grand-total row over an empty
    # table (ANSI: aggregate over the empty group); Spark's
    # ROLLUP/CUBE/GROUPING SETS emit no rows at all.
    "q_orders_rollup": "grand-total row on empty: DuckDB 1 row, Spark 0",
    "q_cube_pricing": "grand-total row on empty: DuckDB 1 row, Spark 0",
    "q_grouping_sets": "grand-total row on empty: DuckDB 1 row, Spark 0",
    "q_groupingsets_api": "grand-total row on empty: DuckDB 1 row, Spark 0",
    # (r11 retired the four every()/invariant-row entries —
    # q_tablesample, sink_range_sorted_write, src_file_metadata,
    # sink_python_datasource — by reformulating op+oracle with
    # vacuous-truth / coalesce / CASE-on-count guards; r12 retired the
    # entire global-agg-vs-grouped 1-row/0-row shape family —
    # stats_cronbach_alpha's grouped totals CTE became a global
    # aggregate, q_orders_pareto_8020's oracle gained HAVING
    # count(*) > 0, stats_two_way_anova's grand totals moved into the
    # cells global agg, stats_bartels_rank's centered denominator was
    # expanded algebraically into the same global agg as its count, and
    # emb_variance_spectrum / emb_pca_power gained vacuous n>=1 /
    # nrm-not-null filters — all value-identical on any nonempty input
    # and fully oracle-checked in empty mode now. Only the
    # engine-semantic grouping-sets grand-total family remains.)
}

# SWEEP_ONE=1 allowlist: keys whose Spark and DuckDB results disagree on a
# SINGLE-ROW-per-table corpus for engine-semantic (not bug) reasons. Same
# contract as _EMPTY_DIVERGENCE: these are downgraded to a
# runs-without-exception check in n=1 mode and fully oracle-checked on
# every other axis. Keep this list short and every entry reasoned.
_ONE_DIVERGENCE: dict[str, str] = {}

# SWEEP_TIES=1 allowlist (round 11): every numeric VALUE column constant
# at FULL n — the all-ties corpus that exercises tie-correction factors
# (Σt³−t == n³−n exactly), zero-variance denominators and rank
# degeneracy at production-like cardinality, which the n<=5 ladder only
# probes at tiny n. Same downgrade contract as the other axes.
_TIES_DIVERGENCE: dict[str, str] = {}


def _derived_corpus(src: str, tag: str) -> str:
    """A fresh /tmp dir for a derived (empty / 1-row / ties) copy of src.

    The name embeds a hash of the FULL source path so two corpora with the
    same basename under different parents can't collide, plus this
    process's PID so two CONCURRENT sweeps in the same mode over the same
    corpus can't delete each other's tables mid-run (ADVICE r10). Stale
    dirs from dead sweeps with the same (tag, src) signature are reaped
    here — keyed off the nav_<tag>_..._<hash> prefix — so /tmp doesn't
    accumulate one copy per run.
    """
    h = hashlib.sha256(os.path.abspath(src).encode()).hexdigest()[:10]
    base = f"nav_{tag}_{os.path.basename(src.rstrip('/'))}_{h}"
    for stale in glob.glob(os.path.join("/tmp", base + "_pid*")):
        pid = stale.rsplit("_pid", 1)[-1]
        if pid.isdigit() and not os.path.exists(f"/proc/{pid}"):
            shutil.rmtree(stale, ignore_errors=True)
    out = os.path.join("/tmp", f"{base}_pid{os.getpid()}")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    return out


def _codegen_log_setup() -> str:
    """Route ERROR-level driver-JVM log events to a per-PID file.

    Whole-stage-codegen compile failures (janino '64 KB' overflows) make
    Spark degrade silently to interpreted eval — results stay green but
    the hot stage loses codegen, a constant-factor tax at 100x scale
    (VERDICT r10: one unattributed fallback during the 4-thread sweep).
    A ThresholdFilter(ERROR) File appender captures them with
    UNIX_MILLIS timestamps so the summary can attribute each event to
    the queries in flight. Must run BEFORE the JVM launches: the log4j2
    override rides spark.driver.extraJavaOptions via PYSPARK_SUBMIT_ARGS
    (local mode, so executor-side codegen errors land here too).
    """
    log_path = f"/tmp/nav_sweep_jvmerr_{os.getpid()}.log"
    conf_path = f"/tmp/nav_sweep_log4j2_{os.getpid()}.properties"
    with open(conf_path, "w") as f:
        f.write(
            "rootLogger.level = warn\n"
            "rootLogger.appenderRef.console.ref = console\n"
            "rootLogger.appenderRef.errfile.ref = errfile\n"
            "appender.console.type = Console\n"
            "appender.console.name = console\n"
            "appender.console.target = SYSTEM_ERR\n"
            "appender.console.layout.type = PatternLayout\n"
            "appender.console.layout.pattern = "
            "%d{yy/MM/dd HH:mm:ss} %p %c{1}: %m%n\n"
            "appender.errfile.type = File\n"
            "appender.errfile.name = errfile\n"
            f"appender.errfile.fileName = {log_path}\n"
            "appender.errfile.layout.type = PatternLayout\n"
            "appender.errfile.layout.pattern = %d{UNIX_MILLIS} %p %c{1}: %m%n\n"
            "appender.errfile.filter.threshold.type = ThresholdFilter\n"
            "appender.errfile.filter.threshold.level = error\n"
        )
    flag = f"-Dlog4j.configurationFile=file:{conf_path}"
    existing = os.environ.get("PYSPARK_SUBMIT_ARGS", "pyspark-shell")
    # spark-submit keeps the LAST occurrence of a duplicated --conf, so
    # blindly prepending ours would be silently dropped whenever the
    # environment already sets spark.driver.extraJavaOptions — and an
    # empty codegen_fallbacks field would then falsely read as "no
    # fallbacks" (ADVICE r11). Merge the flag into the existing value
    # instead. PYSPARK_SUBMIT_ARGS is shlex.split by pyspark's
    # java_gateway, so parse at the token level and re-quote the merged
    # multi-flag value (a bare space inside an unquoted conf would
    # otherwise shear into a stray argv token).
    import shlex as _shlex

    key = "spark.driver.extraJavaOptions="
    toks = _shlex.split(existing)
    merged = False
    for i, tok in enumerate(toks):
        if tok.startswith(key) and i > 0 and toks[i - 1] == "--conf":
            toks[i] = key + flag + " " + tok[len(key):]
            merged = True
            break
    if not merged:
        toks = ["--conf", key + flag] + toks
    os.environ["PYSPARK_SUBMIT_ARGS"] = " ".join(
        _shlex.quote(t) for t in toks
    )
    return log_path


def _scan_codegen_log(
    log_path: str, windows: dict[str, tuple[float, float]]
) -> list[dict]:
    """Attribute captured ERROR CodeGenerator events to in-flight queries.

    Each compile-failure event is one line (the multi-line generated-code
    dump has no timestamp prefix and is skipped). Attribution is by time
    overlap with each query's [start, end] wall-clock window — exact for
    serial sweeps, a small candidate set under SWEEP_THREADS.
    """
    events: list[dict] = []
    if not os.path.exists(log_path):
        return events
    for line in open(log_path, errors="replace"):
        parts = line.split(" ", 3)
        if len(parts) < 4 or not parts[0].isdigit() or parts[1] != "ERROR":
            continue
        if "CodeGenerator" not in parts[2]:
            continue
        ts = int(parts[0]) / 1000.0
        inflight = sorted(
            n for n, (a, b) in windows.items() if a - 0.5 <= ts <= b + 0.5
        )
        events.append(
            {"at": round(ts, 3), "inflight": inflight, "msg": parts[3][:200]}
        )
    return events


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    codegen_log = _codegen_log_setup()

    if os.environ.get("SWEEP_NULL_INJECT"):
        # robustness mode: run the whole registry on a copy of sf_dir
        # with ~1% of every realistically-nullable column nulled (the
        # r4 driver failures were NULL-surface divergence; see
        # scripts/null_inject.py). Oracle views read the SAME copy, so
        # any red row is a genuine cross-engine NULL-semantics bug.
        from scripts.null_inject import build as _ni_build

        sf_dir = _ni_build(sf_dir)

    empty_mode = bool(os.environ.get("SWEEP_EMPTY"))
    one_mode = bool(os.environ.get("SWEEP_ONE"))
    ties_mode = bool(os.environ.get("SWEEP_TIES"))
    if ties_mode:
        # robustness mode 6 (round 11): every numeric VALUE column is
        # replaced by its global min — full-n ALL-TIES. Identity/key/
        # sequence columns (…key, …_id, …number) and every non-numeric
        # column keep their real values, so join cardinalities, time
        # axes and text stay intact while measures, ranks and variances
        # collapse to total degeneracy: Σt³−t hits exactly n³−n,
        # group variances hit exact zero at LARGE n, rank tests see one
        # giant tie group. Oracle views read the same derived corpus.
        import re as _re

        import duckdb as _dk
        import glob as _glob

        src = sf_dir
        sf_dir = _derived_corpus(src, "ties")
        _con = _dk.connect()
        _numeric = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
                    "FLOAT", "REAL", "DOUBLE", "DECIMAL")
        # Identity/sequence columns keep their real values under the
        # ties collapse. The corpus's identity columns are enumerable —
        # list them explicitly rather than pattern-match, because a
        # loose `id$` suffix would silently exempt a future VALUE
        # column merely ending in "id" (valid, paid) from the axis
        # (ADVICE r11). The fallback regex for columns not in this
        # list is word-boundary-anchored for `id` and keeps the loose
        # key/number suffixes (every `…key`/`…number` here is a
        # compound identity name: l_orderkey, l_linenumber).
        _identity_cols = {
            "c_custkey", "c_nationkey", "doc_id", "vec_id", "event_id",
            "user_id", "l_orderkey", "l_partkey", "l_suppkey",
            "l_linenumber", "n_nationkey", "n_regionkey", "o_orderkey",
            "o_custkey", "p_partkey", "r_regionkey", "s_suppkey",
            "s_nationkey",
        }
        for _p in _glob.glob(os.path.join(src, "*.parquet")):
            _t = os.path.basename(_p)
            _cols = _con.execute(f"DESCRIBE SELECT * FROM '{_p}'").fetchall()
            _sel = []
            for _c, _ty, *_rest in _cols:
                is_value = (
                    _ty.upper().startswith(_numeric)
                    and _c not in _identity_cols
                    and not _re.search(r"key$|number$|(?:^|_)id$", _c)
                )
                if is_value:
                    _sel.append(f'(SELECT min("{_c}") FROM \'{_p}\') AS "{_c}"')
                else:
                    _sel.append(f'"{_c}"')
            _con.execute(
                f"COPY (SELECT {', '.join(_sel)} FROM '{_p}')"
                f" TO '{os.path.join(sf_dir, _t)}' (FORMAT PARQUET)"
            )
    if empty_mode or one_mode:
        # robustness mode 4 (round 9): every table ZERO rows — the
        # filter-to-zero / empty-backfill-window class a 100 TB job must
        # survive. robustness mode 5 (round 10): every table exactly ONE
        # row (deterministic: ORDER BY all columns, LIMIT 1) — the 1-row
        # group / post-filter singleton class that turns /(n-1)-style
        # denominators into ANSI DIVIDE_BY_ZERO crashes. Keys in the
        # matching allowlist are engine-semantic differences (documented
        # above), downgraded to a runs-without-exception check; everything
        # else must still match its oracle on the derived input.
        import duckdb as _dk

        src = sf_dir
        tag = "empty"
        if one_mode:
            _spec = os.environ["SWEEP_ONE"].lower()
            tag = "onedesc" if _spec == "desc" else f"one{_spec}"
        sf_dir = _derived_corpus(src, tag)
        _con = _dk.connect()
        import glob as _glob

        for _p in _glob.glob(os.path.join(src, "*.parquet")):
            _t = os.path.basename(_p)
            if one_mode:
                # SWEEP_ONE=desc draws the MAXIMUM row instead of the
                # minimum — a second, different 1-row corpus, so a guard
                # accidentally tuned to the specific min-row values
                # (zero cents, first date, label 0) is still exercised.
                # SWEEP_ONE=<n> (e.g. 2, 3) draws the first n rows —
                # the minimal-degrees-of-freedom cousin of n=1 that
                # exercises /(n-2), /(n-3) and tie corrections at the
                # smallest defined sample sizes.
                _spec = os.environ["SWEEP_ONE"].lower()
                _dir = "DESC" if _spec == "desc" else "ASC"
                _lim = int(_spec) if _spec.isdigit() else 1
                _cols = [
                    r[0]
                    for r in _con.execute(
                        f"DESCRIBE SELECT * FROM '{_p}'"
                    ).fetchall()
                ]
                _ob = ", ".join(f'"{c}" {_dir}' for c in _cols)
                _sel = f"SELECT * FROM '{_p}' ORDER BY {_ob} LIMIT {_lim}"
            else:
                _sel = f"SELECT * FROM '{_p}' LIMIT 0"
            _con.execute(
                f"COPY ({_sel})"
                f" TO '{os.path.join(sf_dir, _t)}' (FORMAT PARQUET)"
            )

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

    windows: dict[str, tuple[float, float]] = {}

    def run_one(name, fn, con):
        t0 = time.monotonic()
        w0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if empty_mode and name in _EMPTY_DIVERGENCE:
                n = df.count()
                ok, msg = n >= 0, f"runs-on-empty ({n} rows): {_EMPTY_DIVERGENCE[name]}"
            elif one_mode and name in _ONE_DIVERGENCE:
                n = df.count()
                ok, msg = n >= 0, f"runs-on-one ({n} rows): {_ONE_DIVERGENCE[name]}"
            elif ties_mode and name in _TIES_DIVERGENCE:
                n = df.count()
                ok, msg = n >= 0, f"runs-on-ties ({n} rows): {_TIES_DIVERGENCE[name]}"
            elif name in oracles:
                ok, msg = compare(df, con, oracles[name])
            else:
                n = df.count()
                ok, msg = n >= 0, f"rows-only: {n}"
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"EXC: {type(exc).__name__}: {exc}"
        dt = time.monotonic() - t0
        windows[name] = (w0, time.time())
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
    # surface whole-stage-codegen fallbacks (VERDICT r10 #3): every
    # ERROR CodeGenerator event the JVM logged, attributed to the
    # queries in flight at its timestamp. Results stay green when Spark
    # degrades to interpreted eval, so ONLY this field makes the
    # constant-factor tax visible; a non-empty list is a plan-size bug
    # to split (intermediate projection / checkpoint), not an allowlist.
    print(json.dumps({
        "total_sec": round(total, 1),
        "n": len(results),
        "n_fail": len(bad),
        "fails": {k: v["msg"] for k, v in bad.items()},
        "codegen_fallbacks": _scan_codegen_log(codegen_log, windows),
        "slowest": [(k, v["sec"]) for k, v in slow],
    }, indent=1))


if __name__ == "__main__":
    main()
