"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive normalized value matrix.
"""

from __future__ import annotations

import datetime
import math

import duckdb

from navigator_data_ingest_spark.sources.tables import TABLE_NAMES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def normalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    sp_rows = [tuple(r) for r in spark_df.collect()]
    sp_cols = spark_df.columns
    res = con.sql(sql)
    dk_cols = res.columns
    dk_rows = res.fetchall()
    if sorted(sp_cols) != sorted(c for c in dk_cols):
        return False, f"columns differ: spark={sorted(sp_cols)} duckdb={sorted(dk_cols)}"
    if len(sp_rows) != len(dk_rows):
        return False, f"row count differs: spark={len(sp_rows)} duckdb={len(dk_rows)}"
    a = normalize(sp_cols, sp_rows)
    b = normalize(list(dk_cols), dk_rows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"values differ, first diffs: {diff}"
    return True, "ok"
