"""Physical-layout scale features: partition pruning and bucketed joins.

These pin the two layout tools a 100 TB deployment leans on: a filter on
the partition key must prune at the FILE level (PartitionFilters, zero
data read for other partitions), and bucketed tables must co-locate join
keys so the join plans with NO shuffle exchange on either side.
"""

from __future__ import annotations

import re
import tempfile

from pyspark.sql import functions as F

from navigator_data_ingest_spark.operators.ingest import ingest_parser_input
from navigator_data_ingest_spark.plans.audit import formatted_plan, plan_audit
from navigator_data_ingest_spark.sources.sinks import write_parser_input
from tests.conftest import SF_SMOKE


def test_partition_pruning_on_geography(spark):
    out = tempfile.mkdtemp(prefix="nav_part_prune_")
    write_parser_input(ingest_parser_input(spark, SF_SMOKE), out, fmt="parquet")
    df = spark.read.parquet(out).where(F.col("document_geography") == "IDN")
    plan = formatted_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "document_geography" in m.group(1), plan
    # the pruned read returns only the partition's rows
    n_all = spark.read.parquet(out).count()
    n_idn = df.count()
    assert 0 < n_idn < n_all


def test_bucketed_join_has_no_shuffle(spark):
    """Bucketed-by-key tables join with zero Exchange operators."""
    import shutil
    from urllib.parse import urlparse

    db = "nav_bucket_test"
    # the in-memory catalog forgets tables between sessions but their
    # warehouse directories persist; clear them or saveAsTable refuses
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{db}.db", ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {db}.t_left")
    spark.sql(f"DROP TABLE IF EXISTS {db}.t_right")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("a")
    )
    right = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("b")
    )
    for name, df in (("t_left", left), ("t_right", right)):
        df.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable(
            f"{db}.{name}"
        )
    joined = spark.table(f"{db}.t_left").join(spark.table(f"{db}.t_right"), "k")
    audit = plan_audit(joined)
    assert audit.shuffle_exchanges == 0, formatted_plan(joined)
    assert joined.count() == 5_000
