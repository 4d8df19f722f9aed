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


# --------------------------------------------------------------------------
# Hilbert-curve clustering (the locality upgrade over z-order)
# --------------------------------------------------------------------------

H_BITS = 8                 # 256 x 256 grid -> 16-bit Hilbert index
H_N = 1 << H_BITS
H_BUCKET_SHIFT = 10        # d >> shift -> 64 buckets over the 16-bit code


def _hilbert_stages() -> list[tuple[str, str, str]]:
    """Per-iteration (d, new_x, new_y) SQL expressions for the standard
    xy2d recurrence (verified bijective + unit-step in tests) — the
    SAME integer-CASE text runs in Spark and DuckDB, so the curve is
    identical cross-engine by construction. The quadrant term
    (3*rx) XOR ry is expanded into its 4-row truth table to avoid
    engine-specific xor syntax."""
    stages = []
    s = H_N // 2
    while s > 0:
        rx = f"(x & {s}) > 0"
        ry = f"(y & {s}) > 0"
        quad = (
            f"CASE WHEN {rx} AND NOT ({ry}) THEN 3 "
            f"WHEN {rx} AND {ry} THEN 2 "
            f"WHEN NOT ({rx}) AND {ry} THEN 1 ELSE 0 END"
        )
        d = f"d + {s * s} * ({quad})"
        nx = (
            f"CASE WHEN NOT ({ry}) THEN "
            f"(CASE WHEN {rx} THEN {H_N - 1} - y ELSE y END) ELSE x END"
        )
        ny = (
            f"CASE WHEN NOT ({ry}) THEN "
            f"(CASE WHEN {rx} THEN {H_N - 1} - x ELSE x END) ELSE y END"
        )
        stages.append((d, nx, ny))
        s //= 2
    return stages


def layout_hilbert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve bucket audit over orders (customer x order-day) —
    the locality twin of ``layout_zorder``. The Hilbert curve never
    takes the long diagonal jumps Morton interleaving does, so its
    contiguous buckets have strictly tighter bounding boxes: compare
    this audit's x_span/y_span against layout_zorder's at the same
    bucket count (the improvement Delta/Iceberg ship as HILBERT
    clustering).

    Entirely map-side: the 8-step xy2d recurrence unrolls into chained
    integer-CASE projections (one whole-stage-codegen pass, no lambda,
    no shuffle before the 64-key bucket agg). At 100 TB the d column
    feeds ``repartitionByRange(d)`` + sorted write, exactly like the
    z-order path.
    """
    df = load_table(spark, sf_dir, "orders").selectExpr(
        f"cast(o_custkey % {H_N} as bigint) AS xb",
        f"cast(datediff(o_orderdate, date'{Z_EPOCH}') % {H_N} as bigint) AS yb",
    ).selectExpr("xb", "yb", "cast(0 as bigint) AS d", "xb AS x", "yb AS y")
    for d_e, nx_e, ny_e in _hilbert_stages():
        df = df.selectExpr(
            "xb", "yb", f"({d_e}) AS d", f"({nx_e}) AS nx", f"({ny_e}) AS ny"
        ).selectExpr("xb", "yb", "d", "nx AS x", "ny AS y")
    return (
        df.selectExpr("xb", "yb", f"(d >> {H_BUCKET_SHIFT}) AS bucket")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("xb") - F.min("xb")).alias("x_span"),
            (F.max("yb") - F.min("yb")).alias("y_span"),
        )
        .orderBy("bucket")
    )


def layout_hilbert_sql() -> str:
    # one CTE pair per recurrence step: it{k} computes (d, x_new, y_new)
    # from the previous state, r{k} renames x_new/y_new back to x/y —
    # the two-step sidesteps lateral-alias resolution differences
    ctes = ["r0 AS (SELECT xb, yb, 0::BIGINT AS d, xb AS x, yb AS y FROM dims)"]
    for k, (d_e, nx_e, ny_e) in enumerate(_hilbert_stages(), start=1):
        ctes.append(
            f"it{k} AS (SELECT xb, yb, ({d_e}) AS d, ({nx_e}) AS x_new, "
            f"({ny_e}) AS y_new FROM r{k - 1})"
        )
        ctes.append(f"r{k} AS (SELECT xb, yb, d, x_new AS x, y_new AS y FROM it{k})")
    last = f"r{len(_hilbert_stages())}"
    return f"""
    WITH dims AS (
        SELECT (o_custkey % {H_N})::BIGINT AS xb,
               (datediff('day', DATE '{Z_EPOCH}', o_orderdate) % {H_N})::BIGINT
                   AS yb
        FROM orders
    ), {", ".join(ctes)}
    SELECT (d >> {H_BUCKET_SHIFT})::BIGINT AS bucket,
           count(*)::BIGINT AS n_rows,
           (max(xb) - min(xb))::BIGINT AS x_span,
           (max(yb) - min(yb))::BIGINT AS y_span
    FROM {last} GROUP BY bucket ORDER BY bucket
    """
