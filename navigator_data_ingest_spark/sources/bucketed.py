"""Bucketed-table storage: pre-shuffled layout for repeated co-located
joins.

At 100 TB the fact-to-fact join (orders ⋈ customer on custkey) is the
recurring shuffle; bucketing both tables BY THE JOIN KEY at write time
moves that shuffle into the (one-time) write, and every subsequent join
reads bucket-aligned files with NO exchange — Spark's sort-merge join
consumes the bucketing directly. This is the Spark-native equivalent of
a co-partitioned warehouse layout; the plan-shape test pins
"zero Exchange under the join" with broadcast disabled.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from navigator_data_ingest_spark.sources.tables import load_table

N_BUCKETS = 8


def _table_name(base: str, sf_dir: str) -> str:
    """Catalog-safe deterministic name per (table, sf_dir, process).

    Pid-scoped like every other scratch artifact (publish roots,
    streaming checkpoints): two JVMs running the query concurrently —
    the driver's sweep beside a pytest session — must never drop /
    rmtree / saveAsTable the same warehouse location, or one side hits
    LOCATION_ALREADY_EXISTS mid-write. Stale dirs from dead pids are
    re-used (same pid) or ignored; the query always rewrites its own.
    """
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"nav_bucketed_{base}_{tag}_{os.getpid()}"


def write_bucketed(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders + customer bucketed and sorted by the join key.

    ``bucketBy`` requires ``saveAsTable`` (bucket metadata lives in the
    catalog); both sides use the SAME bucket count so the join aligns
    bucket-for-bucket. Idempotent: overwrite mode, deterministic names.
    """
    orders_t = _table_name("orders", sf_dir)
    customer_t = _table_name("customer", sf_dir)
    for t in (orders_t, customer_t):
        # a FRESH session's in-memory catalog doesn't know tables a prior
        # run materialized, but their warehouse directories persist on
        # disk — drop both the entry and the location or saveAsTable
        # fails with LOCATION_ALREADY_EXISTS
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        shutil.rmtree(
            os.path.join(warehouse.removeprefix("file:"), t), ignore_errors=True
        )
    (
        load_table(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .bucketBy(N_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable(orders_t)
    )
    (
        load_table(spark, sf_dir, "customer")
        .write.mode("overwrite")
        .bucketBy(N_BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable(customer_t)
    )
    return orders_t, customer_t


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-located join over the bucketed tables (no write)."""
    orders_t = _table_name("orders", sf_dir)
    customer_t = _table_name("customer", sf_dir)
    orders = spark.table(orders_t)
    customer = spark.table(customer_t)
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 6).alias("total_price"),
        )
        .orderBy("c_mktsegment", "o_orderpriority")
    )


def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: write the bucketed layout, then run the
    co-located join off it. Correctness is oracled against the plain
    parquet join; the EXCHANGE-FREE property is pinned separately in
    tests/test_plan_shape.py (broadcast disabled there so the sort-merge
    path is forced)."""
    write_bucketed(spark, sf_dir)
    return bucketed_join(spark, sf_dir)


def sink_bucketed_join_sql() -> str:
    return """
    SELECT c_mktsegment, o_orderpriority,
           count(*)::bigint AS n_orders,
           round(sum(o_totalprice), 6) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_orderpriority
    ORDER BY c_mktsegment, o_orderpriority
    """
