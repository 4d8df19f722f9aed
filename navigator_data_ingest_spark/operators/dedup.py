"""Deduplication operators for LLM training-data pipelines.

Five strategies, each shaped for 100 TB:

  exact          — md5 groupBy; one shuffle on the content hash.
  minhash_lsh    — shingle → k-minhash signature computed MAP-SIDE with
                   array expressions (no explode, no shuffle), then an
                   LSH band-bucket self-join. The only shuffle is on
                   (band_id, band_hash), and candidate pairs are
                   generated inside buckets — never O(n²).
  simhash        — 32-bit simhash computed map-side; byte-band blocking
                   join + hamming-distance verify (bit_count of xor).
  ngram_jaccard  — exact Jaccard on 3-token shingle sets within
                   (lang, size-bucket) blocks.
  embedding      — cosine near-dup pairs within label blocks, computed
                   as a deterministic left-fold (cross-engine stable).

All hashing is md5-derived (functions/exprs.py) so the DuckDB oracles
replay identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from navigator_data_ingest_spark.functions import exprs as X
from navigator_data_ingest_spark.sources.tables import load_table, scatter

N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = N_MINHASH // N_BANDS
SIMHASH_BITS = 32
SIMHASH_SEED = 99
SIMHASH_MAX_HAMMING = 3
JACCARD_THRESHOLD = 0.15
COSINE_THRESHOLD = 0.3
EMB_DIM = 64


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5(text) groups; canonical = min doc_id per group."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("content_hash")
    return (
        docs.withColumn("content_hash", F.md5("text"))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .select(
            "doc_id",
            "content_hash",
            "canonical_id",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"),
        )
        .orderBy("doc_id")
    )


# one md5 per shingle, then N_MINHASH cheap affine derivations
# (a_i*h + b_i) mod P — the standard universal-hash family trick that
# cuts the expensive hash count 16x. P prime < 2^32; products < 2^48
# stay safely inside bigint.
MINHASH_P = 4294967291


def minhash_coeffs(i: int) -> tuple[int, int]:
    return 2 * i + 1, 97 * i + 13


def _with_signature(docs: DataFrame) -> DataFrame:
    """Add mh0..mhN minhash columns from one md5 pass per shingle.

    The repartition between ``sh_h`` and the mh columns is load-bearing
    twice over: it spreads a single-file scan across the cluster AND it
    is a projection-collapse barrier — without it Catalyst inlines the
    md5 transform into all 16 min columns (lambda expressions are exempt
    from subexpression elimination), re-hashing every shingle 16 times.
    It is also the natural place the signature would be persisted in a
    real pipeline.
    """
    t = X.sp_tokens("text")
    sh = X.sp_shingles("t")
    spark = docs.sparkSession
    out = (
        docs.withColumn("t", F.expr(t))
        .withColumn("sh", F.expr(f"array_distinct({sh})"))
        .where(F.expr("size(sh) > 0"))
        .select("doc_id", F.expr(f"transform(sh, s -> {X.sp_hash32('s', 0)})").alias("sh_h"))
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    for i in range(N_MINHASH):
        a, b = minhash_coeffs(i)
        out = out.withColumn(
            f"mh{i}",
            F.expr(f"array_min(transform(sh_h, h -> ({a} * h + {b}) % {MINHASH_P}))"),
        )
    return out


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: (doc_a, doc_b, n_shared_bands).

    Signature is a per-row array computation (zero shuffle); the band
    self-join shuffles only (band_id, band_hash) — the classic
    shingle→minhash→band→bucket-join layout.
    """
    sig = _with_signature(load_table(spark, sf_dir, "documents"))
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh{b * ROWS_PER_BAND + r}").cast("string")
                        for r in range(ROWS_PER_BAND)
                    ],
                )
            ).alias("band_hash"),
        )
        for b in range(N_BANDS)
    ]
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        .orderBy("doc_a", "doc_b")
    )


def _with_simhash(docs: DataFrame) -> DataFrame:
    """Add a 32-bit simhash column, computed map-side with integer math."""
    t = X.sp_tokens("text")
    hs = f"transform(array_distinct({t}), tok -> {X.sp_hash32('tok', SIMHASH_SEED)})"
    # per-bit vote: +1 if the token hash has bit j set, else -1; bit j of
    # the simhash is 1 when the vote is positive. Integer sums -> order-free.
    simhash = (
        f"aggregate(sequence(0, {SIMHASH_BITS - 1}), cast(0 as bigint), (acc, j) -> acc + "
        f"CASE WHEN aggregate(hs, 0, (a, h) -> a + CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN shiftleft(cast(1 as bigint), j) ELSE cast(0 as bigint) END)"
    )
    return (
        docs.withColumn("hs", F.expr(hs))
        .where(F.expr("size(hs) > 0"))
        .withColumn("simhash", F.expr(simhash))
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: byte-band blocking + hamming verify."""
    sig = _with_simhash(scatter(spark, load_table(spark, sf_dir, "documents"))).select(
        "doc_id", "simhash"
    )
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bb).alias("band_id"),
                    F.expr(f"(simhash >> {8 * bb}) & 255").alias("band_val"),
                )
                for bb in range(4)
            ])
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= SIMHASH_MAX_HAMMING).orderBy(
        "doc_a", "doc_b"
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard within (lang, length-bucket) blocks.

    Blocking bounds the pair count (never all-pairs); at scale the block
    key becomes the shuffle key and skewed blocks can be salted.
    """
    t = X.sp_tokens("text")
    sh = X.sp_shingles("t")
    docs = (
        scatter(spark, load_table(spark, sf_dir, "documents"))
        .withColumn("t", F.expr(t))
        .withColumn("sh", F.expr(f"array_distinct({sh})"))
        .where(F.expr("size(sh) > 0"))
        .withColumn("block", F.expr("lang || '|' || cast(n_chars div 100 as string)"))
        .select("doc_id", "block", "sh")
    )
    a, b = docs.alias("a"), docs.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .where(jac >= JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold within label blocks.

    The dot product is an explicit left fold so Spark and the oracle sum
    in the same order (cross-engine bit-stable floats).
    """
    e = scatter(spark, load_table(spark, sf_dir, "embeddings"))
    # rename one side up front: alias-qualified column refs inside
    # F.expr() don't survive a same-source self-join
    b = e.select(
        F.col("vec_id").alias("vec_id_b"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("embedding_b"),
    )
    dot = F.expr(X.sp_fold_dot("embedding", "embedding_b", EMB_DIM))
    na = F.sqrt(F.expr(X.sp_fold_dot("embedding", "embedding", EMB_DIM)))
    nb = F.sqrt(F.expr(X.sp_fold_dot("embedding_b", "embedding_b", EMB_DIM)))
    cos = dot / (na * nb)
    return (
        e.join(
            b,
            (F.col("label") == F.col("label_b"))
            & (F.col("vec_id") < F.col("vec_id_b")),
        )
        .select(
            F.col("vec_id").alias("vec_a"),
            F.col("vec_id_b").alias("vec_b"),
            F.col("label"),
            F.round(cos, 6).alias("cos_sim"),
            cos.alias("_raw"),
        )
        .where(F.col("_raw") >= COSINE_THRESHOLD)
        .drop("_raw")
        .orderBy("vec_a", "vec_b")
    )
