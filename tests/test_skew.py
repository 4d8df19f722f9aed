"""Salted join: result parity with the plain join + salt distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from navigator_data_ingest_spark.functions.skew import SALT_COL, salted_join, with_salt


def test_salted_join_equals_plain_join(spark):
    # pathological skew: 90% of the big side has nation_id=0
    big = spark.range(10_000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id") % 25)
        .alias("nation_id"),
        (F.col("id") * 2).alias("v"),
    )
    small = spark.range(25).select(
        F.col("id").alias("nation_id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    plain = big.join(small, ["nation_id"]).select("row_id", "nation_id", "v", "name")
    salted = salted_join(
        big, small, keys=["nation_id"], salt_from=["row_id"], n_salts=8
    ).select("row_id", "nation_id", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_spreads_hot_key(spark):
    big = spark.range(8_000).select(
        F.col("id").alias("row_id"), F.lit(0).alias("k")
    )
    salted = with_salt(big, ["row_id"], 8)
    dist = salted.groupBy(SALT_COL).count().collect()
    assert len(dist) == 8  # hot key now spans 8 shuffle groups
    counts = [r["count"] for r in dist]
    assert max(counts) < 2 * min(counts)  # roughly uniform


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.range(100).select(F.col("id").alias("row_id"), (F.col("id") % 7).alias("k"))
    small = spark.range(3).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    plain = big.join(small, ["k"], "left").select("row_id", "k", "tag")
    salted = salted_join(big, small, ["k"], ["row_id"], 4, "left").select("row_id", "k", "tag")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
