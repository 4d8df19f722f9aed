"""Paired Spark-SQL / DuckDB-SQL expression builders.

The dedup / similarity / text operators must produce bit-identical
results in Spark and in the DuckDB oracle. Any drift between the two
implementations shows up as a hash mismatch, so the expression text for
BOTH engines is generated here from one template per primitive:

    tokens     — lowercased [a-z0-9]+ token array
    shingles   — k-token shingle array
    hash32     — 32-bit seeded md5 hash (same value in both engines)
    fold_dot   — deterministic left-fold double dot product

All arithmetic that feeds comparisons is either integer (order-free) or
an explicit left fold (order-fixed), never an unordered SUM over
doubles — that's what keeps floating point reproducible across engines.
"""

from __future__ import annotations


# --- tokens ---------------------------------------------------------------

def sp_tokens(text: str) -> str:
    return f"regexp_extract_all(lower({text}), '[a-z0-9]+', 0)"


def dk_tokens(text: str) -> str:
    return f"regexp_extract_all(lower({text}), '[a-z0-9]+')"


# --- k-token shingles -----------------------------------------------------

def sp_shingles(t: str, k: int = 3) -> str:
    parts = " || ' ' || ".join(f"element_at({t}, cast(i + {j} as int))" for j in range(k))
    return (
        f"CASE WHEN size({t}) >= {k} THEN "
        f"transform(sequence(1, size({t}) - {k - 1}), i -> {parts}) "
        f"ELSE array() END"
    )


def dk_shingles(t: str, k: int = 3) -> str:
    parts = " || ' ' || ".join(f"{t}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({t}) >= {k} THEN "
        f"list_transform(generate_series(1, len({t}) - {k - 1}), i -> {parts}) "
        f"ELSE [] END"
    )


# --- let-binding ----------------------------------------------------------

def sp_let(var: str, value: str, body: str) -> str:
    """Bind ``value`` to lambda variable ``var``, evaluate ``body`` once.

    ``element_at(transform(array(V), x -> B), 1)`` is Spark SQL's
    let-expression: V is evaluated exactly once (as the array element)
    and every reference to ``x`` in B is a variable lookup. This is the
    antidote to projection collapse: without it, Catalyst inlines a
    named column's defining expression into EVERY reference site, and a
    reference inside a lambda body re-evaluates per array element
    (lambda-bearing expressions are exempt from subexpression
    elimination) — turning an O(tokens) pipeline into O(tokens x refs).
    """
    return f"element_at(transform(array({value}), {var} -> {body}), 1)"


# --- 32-bit seeded hash ---------------------------------------------------

def sp_hash32(s: str, seed: int | str) -> str:
    return f"cast(conv(substr(md5('{seed}:' || {s}), 1, 8), 16, 10) as bigint)"


def dk_hash32(s: str, seed: int | str) -> str:
    return f"('0x' || substr(md5('{seed}:' || {s}), 1, 8))::ubigint::bigint"


# --- deterministic left-fold dot product over array columns ---------------

def sp_fold_dot(a: str, b: str, dim: int | None = None) -> str:
    """Left-fold dot product; ``dim=None`` folds over size(a) (same
    order, any dimensionality — the library-API path).

    With a FIXED dim the fold is UNROLLED into a plain 64-term sum:
    lambda-bearing ``aggregate`` is exempt from whole-stage codegen
    (interpreted Expression.eval per element — the round-1 "determinism
    tax"), while the explicit left-associated chain compiles into the
    codegen stage. The association is identical — SQL `+` parses
    left-assoc, matching both the fold (0.0 + t1 == t1 exactly) and
    DuckDB's first-element-seeded ``list_reduce`` — so values stay
    bit-identical cross-engine.
    """
    if dim is not None:
        terms = [
            f"cast(element_at({a}, {i}) as double)"
            f" * cast(element_at({b}, {i}) as double)"
            for i in range(1, dim + 1)
        ]
        return "(" + " + ".join(terms) + ")"
    return (
        f"aggregate(sequence(1, size({a})), cast(0.0 as double), "
        f"(acc, i) -> acc + cast(element_at({a}, cast(i as int)) as double)"
        f" * cast(element_at({b}, cast(i as int)) as double))"
    )


def dk_fold_dot(a: str, b: str, dim: int) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        f"i -> {a}[i]::double * {b}[i]::double), (x, y) -> x + y)"
    )
