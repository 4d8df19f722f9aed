"""Spark 4 DataFrame ``mergeInto`` builder API certification.

The registry op ``cdc_merge_into`` ships MERGE's three-arm semantics as
the engine-portable full-outer-join plan (Spark's own MERGE expansion),
because executing the builder needs a DSv2 catalog with row-level
operation support and the stock ``spark_catalog`` parquet tables do not
provide one. This test drives the REAL builder end-to-end so the API
surface itself is certified:

  1. the full ``mergeInto(...).whenMatched(cond).delete()
     .whenMatched().update(...).whenNotMatched().insertAll().merge()``
     chain constructs and analyzes (conditions resolve against
     target/source aliases), and
  2. execution against a v1 parquet table raises the DOCUMENTED
     ``UNSUPPORTED_FEATURE.TABLE_OPERATION`` error class — the pinned
     engine limitation a catalog with row-level support lifts.

If a future Spark build starts supporting MERGE on the default catalog,
assertion (2) fails loudly — the signal to switch cdc_merge_into to the
native path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.errors import UnsupportedOperationException

from tests.conftest import spark  # noqa: F401  (fixture re-export)


@pytest.fixture()
def merge_target(spark, tmp_path):
    name = "mi_api_target"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} (k INT, v INT) USING parquet"
        f" LOCATION '{tmp_path / 'mi_api_target'}'"
    )
    spark.range(5).selectExpr(
        "cast(id as int) k", "cast(id * 10 as int) v"
    ).write.insertInto(name)
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_merge_into_builder_pins_v1_limitation(spark, merge_target):
    source = (
        spark.range(3, 8)
        .selectExpr("cast(id as int) k", "cast(id * 100 as int) v")
        .alias("source")
    )
    builder = (
        source.mergeInto(
            merge_target, F.col(f"{merge_target}.k") == F.col("source.k")
        )
        .whenMatched(F.col("source.k") % 2 == 0)
        .delete()
        .whenMatched()
        .updateAll()
        .whenNotMatched()
        .insertAll()
    )
    # the chain itself must build; execution must fail with the
    # documented v1 error class, NOT an analysis/resolution error
    with pytest.raises(UnsupportedOperationException) as exc:
        builder.merge()
    assert "UNSUPPORTED_FEATURE.TABLE_OPERATION" in str(exc.value), str(
        exc.value
    )
    assert "MERGE INTO TABLE" in str(exc.value)


def test_merge_semantics_plan_matches_builder_arms(spark):
    """The registry op's full-outer CASE routing implements the same
    three arms the builder declares: delete-first on the delete
    condition, update on match, insert on no-match."""
    import navigator_data_ingest_spark.operators.cdc as cdc

    out = cdc.cdc_merge_into(spark, "/root/testdata/sf0.001")
    rows = {r["merge_action"] for r in out.select("merge_action").distinct().collect()}
    assert rows == {"U", "K", "I"}
    # no deleted key survives: the delete arm applies to MATCHED rows
    # only, so exclude the (plan-shifted, collision-free) insert arm by
    # action rather than by a fixed key bound (the shift is now derived
    # from max(o_orderkey) in-plan — r7 ADVICE)
    deleted = out.where(
        (F.col("o_orderkey") % cdc.MERGE_DELETE_MOD == 0)
        & (F.col("merge_action") != "I")
    ).count()
    assert deleted == 0
    # the insert arm is genuinely exercised and disjoint from target keys
    mx = (
        cdc.load_table(spark, "/root/testdata/sf0.001", "orders")
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
    )
    inserted = out.where(F.col("merge_action") == "I")
    assert inserted.count() > 0
    assert inserted.where(F.col("o_orderkey") <= mx).count() == 0
