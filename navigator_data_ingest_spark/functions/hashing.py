"""Deterministic hashing primitives shared by dedup / fingerprint ops.

All hashes are md5-derived so the exact same values are computable in
any engine (the DuckDB oracles replicate them bit-for-bit):

    seeded_hash(s, i) = int(md5(f"{i}:{s}")[:8], 16)   # 32-bit, fits i64

Spark:  conv(substr(md5(concat(i,':',s)),1,8), 16, 10)::bigint
DuckDB: ('0x' || substr(md5(i || ':' || s), 1, 8))::ubigint::bigint
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hex_prefix_to_long(hex_col: Column, n: int = 8) -> Column:
    """First ``n`` hex chars -> bigint (n<=15 keeps it in signed range)."""
    return F.conv(F.substring(hex_col, 1, n), 16, 10).cast("bigint")


def seeded_hash(value: Column, seed: Column | int) -> Column:
    """32-bit seeded hash: int(md5(f"{seed}:{value}")[:8], 16)."""
    seed_col = F.lit(seed) if isinstance(seed, int) else seed
    return hex_prefix_to_long(
        F.md5(F.concat(seed_col.cast("string"), F.lit(":"), value)), 8
    )


def tokens_col(text: Column) -> Column:
    """Lowercased alphanumeric tokens.

    DuckDB oracle: regexp_extract_all(lower(x), '[a-z0-9]+')
    """
    return F.regexp_extract_all(F.lower(text), F.lit("[a-z0-9]+"), 0)


def shingles_col(tokens: Column, k: int = 3) -> Column:
    """Array of k-token shingles (space-joined runs of k consecutive tokens).

    DuckDB oracle (k=3):
        list_transform(generate_series(1, greatest(len(t)-2,0)),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
    """
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(0)))
    joiner = lambda i: F.concat_ws(
        " ", *[F.element_at(tokens, (i + F.lit(j)).cast("int")) for j in range(k)]
    )
    return F.when(n >= k, F.transform(idx, joiner)).otherwise(
        F.array().cast("array<string>")
    )
