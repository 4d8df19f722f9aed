"""Corpus-witness pins for the two rows-only registry entries.

These ops have no DuckDB oracle (real zlib / numpy float scoring), so
their in-query ``corpus_witness`` column is the value fingerprint the
driver's rows-only check carries. Each test recomputes the witness from
an INDEPENDENT row set (direct zlib; the collected rows re-hashed
through a locally built DataFrame) and asserts the in-query value binds
to exactly those rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from navigator_data_ingest_spark.functions.witness import WITNESS_MASK
from tests.conftest import SF_CORRECT, SF_SMOKE


def _witness_of(spark, rows, schema, cols):
    """Re-hash a plain Python row list through the same masked-xxhash64
    sum the operators embed (independent plan: local DataFrame, no
    mapInPandas / broadcast)."""
    df = spark.createDataFrame(rows, schema)
    h = F.pmod(F.xxhash64(*cols), F.lit(WITNESS_MASK)).cast("decimal(38,0)")
    return df.agg(F.sum(h).cast("string")).collect()[0][0]


def test_compression_witness_matches_direct_zlib(spark):
    import zlib

    import duckdb

    from navigator_data_ingest_spark.operators import textstats as T

    out = T.text_compression_ratio_scored(spark, SF_CORRECT).collect()
    witness = {r["corpus_witness"] for r in out}
    assert len(witness) == 1, "witness must be a single corpus constant"

    raw = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_CORRECT}/documents.parquet'"
    ).fetchall()
    expected_rows = []
    for doc_id, text in raw:
        b = (text or "").encode("utf-8")
        comp = len(zlib.compress(b, T.ZLIB_LEVEL))
        ratio = round(comp / (len(b) or 1), 6)
        expected_rows.append(
            (doc_id, len(b), comp, ratio < T.LOW_ENTROPY_RATIO)
        )
    expected = _witness_of(
        spark,
        expected_rows,
        "doc_id bigint, n_bytes bigint, n_compressed bigint, is_low_entropy boolean",
        ["doc_id", "n_bytes", "n_compressed", "is_low_entropy"],
    )
    assert witness == {expected}


def test_bruteforce_np_witness_binds_to_rows(spark):
    """sim_search_bruteforce_np now carries a real SQL oracle (integer
    projection — VERDICT r8 #2), so the witness is no longer part of its
    registered surface; this test keeps certifying the witness MACHINERY
    binds arbitrary query output rows correctly."""
    from navigator_data_ingest_spark.functions.witness import corpus_witness
    from navigator_data_ingest_spark.operators.similarity import (
        sim_search_bruteforce_np,
    )

    out = corpus_witness(
        sim_search_bruteforce_np(spark, SF_SMOKE),
        "query_id", "vec_id", "rank",
    ).collect()
    witness = {r["corpus_witness"] for r in out}
    assert len(witness) == 1
    rehashed = _witness_of(
        spark,
        [(r["query_id"], r["vec_id"], int(r["rank"])) for r in out],
        "query_id bigint, vec_id bigint, rank int",
        ["query_id", "vec_id", "rank"],
    )
    assert witness == {rehashed}
