"""Skew mitigation: salted joins for hot keys.

AQE's skew-join split (`spark.sql.adaptive.skewJoin.*`, on by default in
our session) handles sort-merge skew at runtime; salting is the plan-
level tool for the cases AQE can't fix — a hot key in a shuffled
equi-join where one side's key distribution is pathological (e.g. a
dedup block key like language, or a fetch domain like a government CDN
hosting half the corpus).

``salted_join(big, small, keys, n_salts)``:
  * big side gets a DETERMINISTIC salt in [0, n_salts): hash of the
    whole row's non-key identity — deterministic so retried tasks and
    the DuckDB oracle reproduce identical results (never rand()).
  * small side is exploded n_salts times (one copy per salt value).
  * join on keys + salt: the hot key's rows now spread over n_salts
    reducers instead of one.

Cost model: the small side is replicated n_salts×, so pick n_salts ≈
(hot-key row count / target partition size), not "big number".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, salt_from: list[str], n_salts: int) -> DataFrame:
    """Add a deterministic salt column derived from ``salt_from`` cols."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(n_salts))
    )


def replicate_for_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Explode ``df`` once per salt value (the broadcast-ish small side)."""
    return df.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    salt_from: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``keys`` with the hot keys salted.

    ``salt_from``: big-side columns whose hash spreads the hot key's
    rows (any column(s) roughly unique per row, e.g. the row id).
    Result equals ``big.join(small, keys, how)`` row-for-row.
    """
    b = with_salt(big, salt_from, n_salts)
    s = replicate_for_salt(small, n_salts)
    return b.join(s, [*keys, SALT_COL], how).drop(SALT_COL)
