#!/usr/bin/env python
"""Time one or more registry queries solo (noop sink, N reps each).

Usage: python scripts/solo_time.py q1,q2[,...] [reps] [sf_dir]

Prints per-query rep times and the median. One warmup pass of the
engine (same as bench.py) runs first so rep 1 isn't charged JVM setup.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from navigator_data_ingest_spark import registry  # noqa: E402
from navigator_data_ingest_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="solo-time")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(0, 1000).mapInPandas(lambda it: it, schema="id bigint").write.format(
        "noop"
    ).mode("overwrite").save()
    qs = registry.queries()
    for name in names:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: median {statistics.median(ts):.3f} runs={ts}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
