"""Round-half-boundary robustness fixture: copy a testdata sf dir with
values and cardinalities reshaped so that rational outputs land on (or
near) decimal rounding boundaries, deterministically.

The r5 driver failures (stats_runs_test, stats_capture_recapture,
stats_mann_whitney, q_events_concurrency) were the cross-engine
``round(p/q, 6)`` class: when the reduced denominator of an exact
rational divides 2·10^6 the true value can terminate at a 7th-decimal
'5' — Spark (shortest-repr HALF_UP) rounds up where DuckDB (binary
round) rounds down. The local plain/NULL/shuffle fixtures never hit the
boundary because their group counts and sums have "messy" denominators.

This fixture forces FRIENDLY denominators so any op still computing a
rational through a double divide has a far higher chance of landing on
a terminating digit:

  * every table is truncated to a 2^a·5^b row count (global counts,
    the most common q, become boundary-friendly),
  * money columns are quantized to 2-decimal steps of 1/4 dollars and
    ``events.value`` to exact multiples of 0.25 (sums and means get
    small power-of-two denominators),
  * ``events.ts`` is floored to the minute (durations/spans divide
    60e6 µs).

Run the full registry on it with

    python scripts/sweep.py $(python scripts/boundary_probe.py)

or via the env hook:

    SWEEP_BOUNDARY_PROBE=1 SWEEP_THREADS=4 python scripts/sweep.py

Every queries()/oracle_sql() pair is then compared Spark-vs-DuckDB on
the probe copy — a red row is a genuine cross-engine rounding bug (the
class functions/exact.py exists to kill). tests/test_boundary_probe.py
pins the previously-failed ops against this fixture.
"""

from __future__ import annotations

import os
import sys
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# money/value columns quantized to exact multiples of 1/4 (two decimal
# digits, power-of-two denominator after scaling)
QUANTIZE_QUARTER = {
    "orders": ["o_totalprice"],
    "lineitem": ["l_extendedprice", "l_discount", "l_tax"],
    "part": ["p_retailprice"],
    "supplier": ["s_acctbal"],
    "customer": ["c_acctbal"],
    "events": ["value"],
}


def _pow2_5_floor(n: int) -> int:
    """Largest 2^a·5^b ≤ n (a,b ≤ 40) — the boundary-friendly count."""
    best = 1
    p2 = 1
    for _ in range(41):
        p25 = p2
        while p25 <= n:
            if p25 > best:
                best = p25
            p25 *= 5
        p2 *= 2
        if p2 > n:
            break
    return best


def probe_table(src: str, dst: str, name: str) -> tuple[int, int]:
    t = pq.read_table(src)
    n = t.num_rows
    keep = _pow2_5_floor(n)
    t = t.slice(0, keep)
    for col in QUANTIZE_QUARTER.get(name, []):
        idx = t.schema.get_field_index(col)
        if idx < 0:
            continue
        typ = t.schema.field(idx).type
        arr = t.column(idx).combine_chunks()
        # round(x*4)/4: exact multiples of 0.25 (binary-exact doubles)
        q = pc.divide(pc.round(pc.multiply(arr.cast(pa.float64()), 4.0)), 4.0)
        t = t.set_column(idx, pa.field(col, pa.float64()), q.cast(pa.float64()))
    if name == "events":
        idx = t.schema.get_field_index("ts")
        ts = t.column(idx).combine_chunks()
        t = t.set_column(
            idx, t.schema.field(idx), pc.floor_temporal(ts, unit="minute")
        )
    pq.write_table(t, dst)
    return n, keep


def build(sf_dir: str, dst_dir: str | None = None) -> str:
    """Materialize the probe copy; returns its path (idempotent)."""
    if dst_dir is None:
        tag = os.path.basename(os.path.normpath(sf_dir))
        dst_dir = os.path.join(
            tempfile.gettempdir(), f"nav_boundary_{tag}_{os.getpid()}"
        )
    done = os.path.join(dst_dir, "_DONE")
    if os.path.exists(done):
        return dst_dir
    os.makedirs(dst_dir, exist_ok=True)
    lines = []
    for tbl in TABLES:
        src = os.path.join(sf_dir, f"{tbl}.parquet")
        dst = os.path.join(dst_dir, f"{tbl}.parquet")
        n, keep = probe_table(src, dst, tbl)
        lines.append(f"{tbl}: {n} -> {keep}")
    with open(done, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"boundary_probe: {dst_dir}", file=sys.stderr)
    return dst_dir


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else None
    print(build(src, dst))
