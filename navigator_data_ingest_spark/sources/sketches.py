"""Mergeable-sketch persistence: build per-partition Apache DataSketches
HLL sketches, WRITE the sketch binaries to storage, read them back and
union them — the pattern a 100 TB nightly pipeline actually uses for
distinct counts (each day/source aggregates its own fixed-size sketch
once; any later rollup unions the few-KB binaries WITHOUT re-scanning
raw data).

This is a different capability from q_approx_distinct (one-shot
``approx_count_distinct`` inside a single query): here the sketch is a
first-class, persisted, re-readable artifact (Spark 4
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` over a
``binary`` column), and the union happens in a separate read of the
stored binaries.

Reference scope note: the reference pipeline has no sketch layer (it is
a 4-worker document ETL — navigator-data-ingest `main.py`); this is a
scale addition in the SURVEY §2.4 training-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from navigator_data_ingest_spark.sources.sinks import sink_path
from navigator_data_ingest_spark.sources.tables import load_table

HLL_LGK = 12  # 4096 registers: RSE ~1.6%, exact in sparse mode at test SFs
HLL_TOL_NUM, HLL_TOL_DEN = 1, 20  # |est - exact| <= exact/20 (5% ~ 3 sigma)


def _type_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE distinct-collapse shuffle feeds everything: per-type sketches,
    per-type exact counts AND the global exact count all derive from the
    deduped (event_type, user_id) frame (duplicates never move an HLL
    register, so sketching the collapsed frame is value-identical to
    sketching the raw stream). NULL rule: NULL user_id sketches nothing
    (filtered, both engines); NULL event_type is its own '<null>' scope.
    """
    return (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(
            F.coalesce(F.col("event_type"), F.lit("<null>")).alias("scope"),
            "user_id",
        )
        .distinct()
    )


def _sketch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build per-scope sketches, persist the binaries, read them back.

    Returns the READ-BACK frame (scope, sk binary, n_exact) — everything
    downstream consumes the stored artifact, proving the binary survives
    a parquet round trip.
    """
    tu = _type_user(spark, sf_dir)
    sk = tu.groupBy("scope").agg(
        F.expr(f"hll_sketch_agg(user_id, {HLL_LGK})").alias("sk"),
        F.count(F.lit(1)).alias("n_exact"),  # tu is already distinct
    )
    out = sink_path("hll_sketches", sf_dir)
    sk.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def sink_hll_sketch_union_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pytest surface with the RAW estimates: per-scope estimate from the
    stored binary plus the 'ALL' union-of-binaries estimate beside the
    exact counts (tests pin the estimate values — DataSketches HLL is
    deterministic for a fixed input SET, so they are stable — and the
    5%-band invariants the registered op hashes)."""
    back = _sketch_roundtrip(spark, sf_dir)
    per = back.select(
        "scope",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.expr("hll_sketch_estimate(sk)").cast("bigint").alias("n_est"),
    )
    glob_exact = (
        _type_user(spark, sf_dir)
        .agg(F.countDistinct("user_id").alias("n_exact"))
        .select(F.col("n_exact").cast("bigint").alias("n_exact"))
    )
    union_est = back.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))")
        .cast("bigint")
        .alias("n_est")
    )
    allrow = glob_exact.join(F.broadcast(union_est)).select(
        F.lit("ALL").alias("scope"), "n_exact", "n_est"
    )
    return per.unionAll(allrow).orderBy("scope")


def sink_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver surface: exact per-scope/global distincts (DuckDB
    recomputes them from the view) plus the sketch-accuracy invariants a
    correct persisted-HLL path must satisfy — the estimate read back
    from storage lands within the 5% band of exact (integer
    cross-multiplied, no float division), and the union estimate is at
    least every per-scope estimate (register-wise monotonicity of HLL
    union). A corrupted binary round trip, a lost scope file, or a
    broken union flips a hashed value."""
    scored = sink_hll_sketch_union_scored(spark, sf_dir)
    tol = (
        F.lit(HLL_TOL_DEN) * F.abs(F.col("n_est") - F.col("n_exact"))
        <= F.lit(HLL_TOL_NUM) * F.col("n_exact")
    )
    max_part = F.broadcast(
        scored.where(F.col("scope") != "ALL")
        .agg(F.max("n_est").alias("_max_part_est"))
    )
    return (
        scored.crossJoin(max_part)
        .select(
            "scope",
            "n_exact",
            tol.alias("est_within_tol"),
            # coalesce: with ZERO scopes (empty events) there is no
            # per-part maximum — monotonicity holds vacuously (round-9
            # empty-input axis)
            F.when(
                F.col("scope") == "ALL",
                F.coalesce(
                    F.col("n_est") >= F.col("_max_part_est"), F.lit(True)
                ),
            )
            .otherwise(F.lit(True))
            .alias("union_monotone"),
        )
        .orderBy("scope")
    )


def sink_hll_sketch_union_sql() -> str:
    return """
    WITH tu AS (
        SELECT DISTINCT coalesce(event_type, '<null>') AS scope, user_id
        FROM events WHERE user_id IS NOT NULL
    )
    SELECT * FROM (
        SELECT scope, count(*)::BIGINT AS n_exact,
               true AS est_within_tol, true AS union_monotone
        FROM tu GROUP BY scope
        UNION ALL
        SELECT 'ALL' AS scope, count(DISTINCT user_id)::BIGINT AS n_exact,
               true AS est_within_tol, true AS union_monotone
        FROM tu
    ) ORDER BY scope
    """
