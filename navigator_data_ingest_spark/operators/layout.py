"""Multi-dimensional data layout: z-order (Morton) clustering.

Sorting a table by ONE column gives file-level min/max pruning on that
column only; interleaving the bits of TWO columns (the z-order curve —
the clustering scheme behind Delta/Iceberg ``OPTIMIZE ZORDER BY``)
bounds BOTH dimensions within every contiguous bucket, so scans
filtered on either column prune.

``layout_zorder`` computes the 32-bit Morton code of
(customer, order-day) map-side, buckets rows by z-prefix (a pure shift
— deterministic, no ranking pass), and emits the per-bucket bounding
box audit: both dimension spans stay bounded per bucket, which is the
property pruning exploits. At 100 TB the same z expression feeds
``repartitionByRange(z)`` + a sorted write; the audit here is the
engine-side proof of locality, replayed exactly by the DuckDB oracle
(integer shifts and masks only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from navigator_data_ingest_spark.sources.tables import load_table

Z_BITS = 16            # bits interleaved per dimension
Z_BUCKET_SHIFT = 26    # z >> shift -> 64 buckets over the 32-bit code
Z_EPOCH = "1992-01-01"  # day-number origin for the date dimension


def _sp_z(xb: str, yb: str) -> str:
    return (
        f"aggregate(sequence(0, {Z_BITS - 1}), cast(0 as bigint), (acc, i) -> "
        f"acc + shiftleft((shiftright({xb}, i) & 1), 2 * i + 1)"
        f" + shiftleft((shiftright({yb}, i) & 1), 2 * i))"
    )


def _dk_z(xb: str, yb: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(0, {Z_BITS - 1}), i -> "
        f"((({xb} >> i) & 1) << (2 * i + 1)) + ((({yb} >> i) & 1) << (2 * i))), "
        f"(a, b) -> a + b)"
    )


def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order bucket audit over orders (customer x order-day)."""
    ords = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % (1 << Z_BITS)).cast("bigint").alias("xb"),
        (
            F.datediff(F.col("o_orderdate"), F.lit(Z_EPOCH).cast("date"))
            % (1 << Z_BITS)
        ).cast("bigint").alias("yb"),
    )
    z = F.expr(_sp_z("xb", "yb"))
    return (
        ords.withColumn("bucket", F.shiftright(z, Z_BUCKET_SHIFT))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("xb") - F.min("xb")).alias("x_span"),
            (F.max("yb") - F.min("yb")).alias("y_span"),
        )
        .orderBy("bucket")
    )


def layout_zorder_sql() -> str:
    return f"""
    WITH dims AS (
        SELECT (o_custkey % {1 << Z_BITS})::bigint AS xb,
               (datediff('day', DATE '{Z_EPOCH}', o_orderdate) % {1 << Z_BITS})::bigint AS yb
        FROM orders
    ), zb AS (
        SELECT xb, yb, ({_dk_z('xb', 'yb')}) >> {Z_BUCKET_SHIFT} AS bucket
        FROM dims
    )
    SELECT bucket, count(*)::bigint AS n_rows,
           (max(xb) - min(xb))::bigint AS x_span,
           (max(yb) - min(yb))::bigint AS y_span
    FROM zb GROUP BY bucket ORDER BY bucket
    """
