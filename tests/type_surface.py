"""Cross-engine result-type classification (shared by the pytest gate
in test_type_surface.py and scripts/type_census.py).

The driver hashes query results with types intact, so a column whose
VALUES match but whose numeric type class differs between the Spark
plan and the DuckDB oracle flips the hash (all 7 r7 driver fails:
DuckDB HUGEINT window/agg sums vs Spark bigint, ANSI Spark decimal
division vs DuckDB DOUBLE). These helpers map both engines' type names
onto one class vocabulary so schema-only comparison catches the whole
class without executing anything on the Spark side.
"""

from __future__ import annotations

import re

# Class vocabulary, calibrated against 7 rounds of driver evidence:
# int widths ≤64 merge into one "int" class and both timestamp flavors
# merge into "ts" — many driver-GREEN rows carry Spark int-vs-DuckDB
# BIGINT or timestamp-vs-TIMESTAMP surfaces (q_events_attribution r5,
# q_grouping_sets r3, the stream_* family r1/r2), so the driver's hash
# is insensitive to them. The PROVEN flip classes stay distinct:
# DuckDB HUGEINT ("int128") vs int, and decimal(p,s) vs double.

# Spark dtype string -> class
_SPARK_SIMPLE = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "integer": "int",
    "bigint": "int",
    "float": "float32",
    "double": "float64",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "binary": "bin",
    "void": "null",
}

# DuckDB type string -> class
_DUCK_SIMPLE = {
    "tinyint": "int",
    "smallint": "int",
    "integer": "int",
    "int": "int",
    "bigint": "int",
    "hugeint": "int128",
    "utinyint": "int",
    "usmallint": "int",
    "uinteger": "int",
    "ubigint": "uint64",
    "float": "float32",
    "real": "float32",
    "double": "float64",
    "varchar": "str",
    "boolean": "bool",
    "bool": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp with time zone": "ts",
    "timestamptz": "ts",
    "blob": "bin",
    "null": "null",
    '"null"': "null",
}

_DEC_RE = re.compile(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", re.I)


def classify_spark(dtype: str | None) -> str:
    if dtype is None:
        return "<missing>"
    d = dtype.strip().lower()
    if d in _SPARK_SIMPLE:
        return _SPARK_SIMPLE[d]
    m = _DEC_RE.fullmatch(d)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    if d.startswith("array<") and d.endswith(">"):
        return f"array<{classify_spark(d[6:-1])}>"
    return d  # struct/map/etc: compare raw


def classify_duckdb(dtype: str | None) -> str:
    if dtype is None:
        return "<missing>"
    d = dtype.strip().lower()
    if d in _DUCK_SIMPLE:
        return _DUCK_SIMPLE[d]
    m = _DEC_RE.fullmatch(d)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    if d.endswith("[]"):
        return f"array<{classify_duckdb(d[:-2])}>"
    return d


# The blessed final-projection surface (VERDICT r7 #1): every oracled
# final column should land in this set on BOTH engines. Exact
# decimal(p,s) matches are additionally allowed when both engines agree
# (q_decimal_exact-style deliberate decimal outputs).
ALLOWED_FINAL = {
    "int",
    "float64",
    "str",
    "bool",
    "date",
    "ts",
    "array<int>",
    "array<float64>",
    "array<str>",
}
