"""NULL-injection robustness fixture: copy a testdata sf dir with ~1% of
every realistically-nullable column set to NULL, deterministically.

Round-4 driver failures (stats_mann_whitney, q_events_concurrency) came
from NULL ``events.value`` rows that exist in the driver's generated
data but not in the local testdata copy — Spark windows order NULLS
FIRST where DuckDB orders NULLS LAST, and derived keys like
``floor(NULL)`` silently drop groups through inner joins. This fixture
makes the whole registry provably NULL-robust BEFORE the driver's
generator grows a new NULL surface: run

    SWEEP_NULL_INJECT=1 SWEEP_THREADS=4 python scripts/sweep.py

and every queries()/oracle_sql() pair is compared on the injected copy.

The mask is a pure function of a stable per-row key (splitmix-style
multiply + per-column salt, mod 97), so reruns inject the same cells
and pytest can pin individual operators against the same fixture
(tests/test_oracle_parity.py::test_null_injected_*).

Column choice: measure/string/payload columns a generator could
plausibly null — join keys and event timestamps stay non-NULL (nulling
a key changes query semantics rather than probing engine divergence).
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# table -> (stable key columns, columns to inject)
INJECT: dict[str, tuple[list[str], list[str]]] = {
    "events": (["event_id"], ["value", "props", "event_type"]),
    "documents": (["doc_id"], ["text", "lang", "source"]),
    "orders": (["o_orderkey"], ["o_orderstatus", "o_orderpriority"]),
    "lineitem": (
        ["l_orderkey", "l_linenumber"],
        ["l_returnflag", "l_linestatus"],
    ),
    "customer": (["c_custkey"], ["c_mktsegment", "c_name"]),
    "part": (["p_partkey"], ["p_brand", "p_type"]),
    "supplier": (["s_suppkey"], ["s_name"]),
}

_MIX = np.uint64(0x9E3779B97F4A7C15)
_MOD = np.uint64(97)  # ~1.03% of rows per column


def _mask(key: np.ndarray, salt: int) -> np.ndarray:
    k = key.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        h = (k + np.uint64(salt) * np.uint64(0x100000001B3)) * _MIX
        h ^= h >> np.uint64(31)
        h *= _MIX
    return (h % _MOD) == 0


def inject_table(src: str, dst: str, keys: list[str], cols: list[str]) -> int:
    t = pq.read_table(src)
    key = t[keys[0]].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(keys) > 1:  # composite key (lineitem): fold linenumber in
        key = key * np.int64(8) + t[keys[1]].to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
    n_nulled = 0
    for salt, col in enumerate(cols, start=1):
        idx = t.schema.get_field_index(col)
        m = _mask(key, salt)
        n_nulled += int(m.sum())
        arr = pc.if_else(
            pa.array(m), pa.nulls(len(t), type=t.schema.field(idx).type),
            t.column(idx).combine_chunks(),
        )
        t = t.set_column(idx, t.schema.field(idx), arr)
    pq.write_table(t, dst)
    return n_nulled


def build(sf_dir: str, dst_dir: str | None = None) -> str:
    """Materialize the injected copy; returns its path (idempotent per
    (sf_dir, pid) unless dst_dir is given)."""
    if dst_dir is None:
        tag = os.path.basename(os.path.normpath(sf_dir))
        dst_dir = os.path.join(
            tempfile.gettempdir(), f"nav_nullinj_{tag}_{os.getpid()}"
        )
    done = os.path.join(dst_dir, "_DONE")
    if os.path.exists(done):
        return dst_dir
    os.makedirs(dst_dir, exist_ok=True)
    total = 0
    for tbl in TABLES:
        src = os.path.join(sf_dir, f"{tbl}.parquet")
        dst = os.path.join(dst_dir, f"{tbl}.parquet")
        if tbl in INJECT:
            keys, cols = INJECT[tbl]
            total += inject_table(src, dst, keys, cols)
        else:
            # byte-copy keeps untouched tables identical
            with open(src, "rb") as fi, open(dst, "wb") as fo:
                fo.write(fi.read())
    with open(done, "w") as f:
        f.write(f"nulled_cells={total}\n")
    print(f"null_inject: {dst_dir} ({total} cells nulled)", file=sys.stderr)
    return dst_dir


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else None
    print(build(src, dst))
