"""Custom Python DataSource (the Spark 4 extension surface).

The reference ingests from an external system the engine does not
control (HTTP + S3 listings, reference utils.py:19 LawPolicyGenerator);
the Spark-4-native way to wrap such a system as a first-class table is
the Python DataSource API (``pyspark.sql.datasource``): the source
declares its schema and an explicit PARTITION list, and Spark schedules
one Python-worker read task per partition — the same partition-parallel
contract a JVM connector gets, with pushless sources still benefiting
from column pruning at the Arrow boundary.

``SyntheticCrawlDataSource`` is a deterministic stand-in for a crawl
frontier: N_PARTITIONS independent id ranges, every field derived from
md5(page_id) so a DuckDB oracle regenerates the identical table from
``generate_series`` — proving the source is partition-stable and
re-run-stable (a re-read yields byte-identical rows, the property a
restartable ingest needs).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

try:  # pyspark >= 4
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    _HAS_PYSOURCE = True
except ImportError:  # pragma: no cover - older pyspark
    _HAS_PYSOURCE = False
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]

N_PARTITIONS = 8
ROWS_PER_PARTITION = 250
_SCHEMA = "page_id bigint, url string, status int, n_bytes bigint"


def _row(page_id: int) -> tuple[int, str, int, int]:
    h = hashlib.md5(f"crawl:{page_id}".encode()).hexdigest()
    status = 404 if int(h[0:2], 16) % 10 == 0 else 200
    n_bytes = int(h[2:8], 16) % 100000
    return (page_id, f"https://example.org/p/{page_id}", status, n_bytes)


class _CrawlReader(DataSourceReader):
    def partitions(self):  # explicit split => one read task per range
        return [InputPartition(i) for i in range(N_PARTITIONS)]

    def read(self, partition):
        base = partition.value * ROWS_PER_PARTITION
        for k in range(ROWS_PER_PARTITION):
            yield _row(base + k)


class SyntheticCrawlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_crawl"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema):
        return _CrawlReader()


def src_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: register the source (idempotent per session),
    read it, and project a fetch-plan summary the ingest stage would
    hand to the downloader."""
    if not _HAS_PYSOURCE:  # pragma: no cover
        raise NotImplementedError("pyspark.sql.datasource requires Spark 4")
    try:
        spark.dataSource.register(SyntheticCrawlDataSource)
    except Exception:  # already registered in this session
        pass
    df = spark.read.format("synthetic_crawl").load()
    return df.where("status = 200").orderBy("page_id")


def src_python_datasource_sql() -> str:
    total = N_PARTITIONS * ROWS_PER_PARTITION
    h = "md5('crawl:' || i::varchar)"
    return f"""
    WITH ids AS (
        SELECT unnest(generate_series(0, {total - 1})) AS i
    ), rows_ AS (
        SELECT i::bigint AS page_id,
               'https://example.org/p/' || i::varchar AS url,
               CASE WHEN ('0x' || substr({h}, 1, 2))::uinteger % 10 = 0
                    THEN 404 ELSE 200 END AS status,
               (('0x' || substr({h}, 3, 6))::uinteger % 100000)::bigint
                   AS n_bytes
        FROM ids
    )
    SELECT page_id, url, status, n_bytes
    FROM rows_ WHERE status = 200 ORDER BY page_id
    """
