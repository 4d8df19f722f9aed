"""Pins for the 64-bit simhash spec (SURVEY §2.4: "64-bit simhash").

Three guarantees the round-2 verdict asked to pin:

1. The signature is genuinely 64 bits — two independent 32-bit words,
   at least one of which uses bits above bit 7 (so an 8-bit banding
   could not represent it).
2. Band cardinality: bands are 16-bit slices (domain 0..65535) and the
   observed distinct bucket count exceeds the 1,024-bucket ceiling of
   the old 4×8-bit scheme — bucket population must be able to GROW with
   corpus entropy instead of saturating.
3. Pair-set equality on a duplicate-explosion fixture: the banded join
   finds EXACTLY the pairs an exhaustive all-pairs hamming scan finds
   (hamming <= SIMHASH_MAX_HAMMING), i.e. banding is lossless under
   the pigeonhole guarantee (<=3 differing bits over 4 bands leaves
   >=1 band exact).
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from navigator_data_ingest_spark.operators import dedup
from navigator_data_ingest_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _dup_explosion_docs(spark, n_groups: int = 12, reps: int = 5):
    """reps exact copies of n_groups distinct texts + light mutations."""
    rows = []
    did = 0
    for g in range(n_groups):
        base = " ".join(f"tok{g}w{i}" for i in range(30))
        for r in range(reps):
            rows.append((did, base))
            did += 1
        # one near-dup per group: a single token swapped
        rows.append((did, base.replace(f"tok{g}w7", f"tok{g}alt"))); did += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_simhash_is_64_bit_two_words(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    sig = dedup._with_simhash(docs.select("doc_id", "text"))
    agg = sig.agg(
        F.max("sim_hi").alias("max_hi"),
        F.max("sim_lo").alias("max_lo"),
        F.min("sim_hi").alias("min_hi"),
        F.min("sim_lo").alias("min_lo"),
    ).collect()[0]
    # non-negative 32-bit words; at least one exceeds 8 bits of range
    for v in (agg.max_hi, agg.max_lo, agg.min_hi, agg.min_lo):
        assert 0 <= v < 2**32
    assert agg.max_hi > 255 and agg.max_lo > 255


def test_simhash_band_cardinality_exceeds_8bit_ceiling(spark):
    # 2,000 DISTINCT texts: an 8-bit scheme caps at 4*256=1,024 buckets
    # no matter the corpus, so observing >1,024 distinct buckets proves
    # the banding domain grows with corpus entropy (16-bit slices).
    docs = spark.createDataFrame(
        [(i, " ".join(f"g{i}tok{j}" for j in range(20))) for i in range(2000)],
        "doc_id bigint, text string",
    )
    sig = dedup._with_simhash(docs.select("doc_id", "text"))
    bands = sig.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bb).alias("band_id"),
                    F.expr(
                        f"({'sim_lo' if bb < 2 else 'sim_hi'} >> {16 * (bb % 2)}) & 65535"
                    ).alias("band_val"),
                )
                for bb in range(4)
            ])
        ).alias("band")
    ).select("band.band_id", "band.band_val")
    stats = bands.agg(
        F.countDistinct("band_id", "band_val").alias("buckets"),
        F.max("band_val").alias("max_val"),
    ).collect()[0]
    # 16-bit domain actually used past the 8-bit boundary, and the
    # distinct bucket count beats the old scheme's hard 1,024 ceiling
    # already at the smoke scale factor.
    assert stats.max_val > 255
    assert stats.buckets > 1024


def test_simhash_banding_equals_exhaustive_pairs(spark):
    docs = _dup_explosion_docs(spark)
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_pairs(docs).collect()
    }
    # exhaustive scan: every pair, full 64-bit hamming
    sig = {r.doc_id: (r.sim_hi, r.sim_lo) for r in dedup._with_simhash(docs).collect()}
    exhaustive = set()
    for a, b in itertools.combinations(sorted(sig), 2):
        ham = bin(sig[a][0] ^ sig[b][0]).count("1") + bin(
            sig[a][1] ^ sig[b][1]
        ).count("1")
        if ham <= dedup.SIMHASH_MAX_HAMMING:
            exhaustive.add((a, b, ham))
    assert banded == exhaustive
    # exact copies collapse to hamming 0 and are all found
    zero = {(a, b) for a, b, h in exhaustive if h == 0}
    assert len(zero) >= 12 * (5 * 4 // 2)  # n_groups * C(reps,2)
    assert zero <= {(a, b) for a, b, h in banded if h == 0}
