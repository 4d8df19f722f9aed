"""Duplicate-explosion scale probe: the adversarial fixture behind the
SURVEY perf notes, reproducible.

Synthesizes a corpus where every document and embedding is replicated
REPLICAS times (ids renumbered, payloads identical) — the worst case
for pair-generating operators, since every duplicate group contributes
~C(REPLICAS, 2) candidate pairs — then times each named query warm at
1x and at the replicated scale. A healthy operator stays within ~2x;
superlinear growth means a blocking/banding scheme is saturating.

Usage: python scripts/scale_probe.py [query ...]   (default: the
pair-generating round-2/3 set)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

# PROBE_REPLICAS=100 extends the probe to the 100x duplicate-explosion
# run recorded in BASELINE.md (default 10x keeps iteration cheap)
REPLICAS = int(os.environ.get("PROBE_REPLICAS", "10"))
SRC = "/root/testdata/sf0.01"
DST = f"/tmp/probe_dup_{REPLICAS}x"

# Alert line for probe/base wall ratio, matching the documented ~2x
# budget (module docstring, SURVEY/BASELINE perf notes): on local[32]
# the replicated corpus still fits the task slots, so a healthy
# bounded-candidate plan amortizes the extra rows across idle cores and
# stays near-flat; anything past 2x means candidate generation is
# growing with the duplicate groups, which is exactly the regression
# this probe exists to catch.
RATIO_BUDGET = 2.0

DEFAULT_QUERIES = [
    "dedup_minhash_lsh", "dedup_simhash", "dedup_fingerprint",
    "dedup_semantic", "dedup_bloom", "mm_phash_neardup",
    "text_boilerplate", "text_cooccurrence", "corpus_token_budget",
    "q_basket_pairs", "graph_triangle_count", "emb_binary_hamming",
    "dedup_recall_report",
]


def build_fixture() -> None:
    import duckdb

    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)
    con = duckdb.connect()
    con.execute(f"""
        COPY (SELECT (doc_id * {REPLICAS} + g.k) AS doc_id,
                     text, lang, source, n_chars
              FROM '{SRC}/documents.parquet',
                   generate_series(0, {REPLICAS - 1}) g(k))
        TO '{DST}/documents.parquet' (FORMAT parquet)""")
    con.execute(f"""
        COPY (SELECT (vec_id * {REPLICAS} + g.k) AS vec_id, embedding, label
              FROM '{SRC}/embeddings.parquet',
                   generate_series(0, {REPLICAS - 1}) g(k))
        TO '{DST}/embeddings.parquet' (FORMAT parquet)""")
    plain = ["region", "nation", "customer", "supplier", "part",
             "orders", "lineitem", "events"]
    if os.environ.get("PROBE_EVENTS"):
        # events duplicate explosion: same ts/user/type/value, renumbered
        # ids — the adversarial case for time-window PAIRING operators
        # (attribution, frontier scheduling, rank statistics): every
        # duplicated click meets every duplicated purchase in the same
        # bucket, so candidate pairs grow ~REPLICAS^2 per group
        plain.remove("events")
        con.execute(f"""
            COPY (SELECT (event_id * {REPLICAS} + g.k) AS event_id,
                         ts, user_id, event_type, value, props
                  FROM '{SRC}/events.parquet',
                       generate_series(0, {REPLICAS - 1}) g(k))
            TO '{DST}/events.parquet' (FORMAT parquet)""")
    for t in plain:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")


def main() -> None:
    queries = sys.argv[1:] or DEFAULT_QUERIES
    build_fixture()

    import __spark_entry__ as entry
    from navigator_data_ingest_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    spark.range(1000).selectExpr("md5(cast(id as string))").write.format(
        "noop"
    ).mode("overwrite").save()
    qs = entry.queries()
    for name in queries:
        if name not in qs:
            print(f"{name:28s} SKIP (not registered)")
            continue
        qs[name](spark, SRC).write.format("noop").mode("overwrite").save()
        t0 = time.monotonic()
        qs[name](spark, SRC).write.format("noop").mode("overwrite").save()
        base = time.monotonic() - t0
        t0 = time.monotonic()
        qs[name](spark, DST).write.format("noop").mode("overwrite").save()
        probe = time.monotonic() - t0
        ratio = probe / base if base > 0 else float("inf")
        flag = "" if ratio <= RATIO_BUDGET else "  <-- SUPERLINEAR?"
        print(f"{name:28s} 1x={base:5.2f}s {REPLICAS}x-dup={probe:6.2f}s "
              f"ratio={ratio:4.1f}{flag}", flush=True)


if __name__ == "__main__":
    main()
