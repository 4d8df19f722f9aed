"""Row-order-permuted testdata copy: the float-summation-noise probe.

Spark and DuckDB both sum doubles in data-dependent order; an output
that is only stable because today's row order happens to round the same
way on both engines is one driver-regeneration away from a hash
mismatch (the VERDICT r4 `round(x, 6)` audit class). This fixture
applies a deterministic pseudo-random permutation to every table's rows
— same values, different physical order — so

    SWEEP_PLAIN=1 scripts/sweep.py /tmp/nav_rowshuf_sf0.01_<pid>

re-certifies every oracle under a DIFFERENT summation order on BOTH
engines. An op that stays green here AND on the natural order has its
rounding margins demonstrated, not assumed.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.null_inject import TABLES  # noqa: E402

_MIX = np.uint64(0x9E3779B97F4A7C15)


def permute_table(src: str, dst: str) -> None:
    t = pq.read_table(src)
    n = len(t)
    idx = np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        key = (idx + np.uint64(1)) * _MIX
        key ^= key >> np.uint64(29)
        key *= _MIX
    order = np.argsort(key, kind="stable").astype(np.int64)
    pq.write_table(t.take(order), dst)


def build(sf_dir: str, dst_dir: str | None = None) -> str:
    if dst_dir is None:
        tag = os.path.basename(os.path.normpath(sf_dir))
        dst_dir = os.path.join(
            tempfile.gettempdir(), f"nav_rowshuf_{tag}_{os.getpid()}"
        )
    done = os.path.join(dst_dir, "_DONE")
    if os.path.exists(done):
        return dst_dir
    os.makedirs(dst_dir, exist_ok=True)
    for tbl in TABLES:
        permute_table(
            os.path.join(sf_dir, f"{tbl}.parquet"),
            os.path.join(dst_dir, f"{tbl}.parquet"),
        )
    with open(done, "w") as f:
        f.write("ok\n")
    print(f"shuffle_rows: {dst_dir}", file=sys.stderr)
    return dst_dir


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else None
    print(build(src, dst))
