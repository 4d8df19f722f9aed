"""Vector math over ``array<float>`` embedding columns.

Implemented with higher-order functions (``zip_with`` + ``aggregate``)
so the arithmetic stays JVM-side and sequential-in-index-order — which
makes results bit-comparable with a DuckDB oracle using
``list_dot_product`` / explicit unnest-sum, modulo rounding (callers
round to 6 dp before comparing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Sum_i a[i]*b[i] in ascending index order, double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe only insofar as inputs are non-empty."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
