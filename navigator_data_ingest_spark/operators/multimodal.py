"""Multimodal column plumbing (`mm_decode_stub`).

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, and runs decode / feature-extract / resize as an
Arrow-batched ``mapInPandas`` stage — the layout a 100 TB multimodal
corpus needs: media bytes travel in the row (or as object-store
pointers), metadata is queryable columnar, and Python touches each
batch once.

The decode itself is a DETERMINISTIC STUB: this container has no
image/audio libraries, so ``_decode_real`` raises NotImplementedError
and the stub derives fake-but-stable features from the payload bytes.
Schema, partitioning, UDF signature and batch shape are the real
design; swapping ``_decode_stub`` for a Pillow/ffmpeg call is the only
production change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from navigator_data_ingest_spark.sources.tables import load_table, scatter

MODALITIES = ["image", "audio", "video"]
FORMATS = {"image": ["png", "jpeg", "webp"], "audio": ["wav", "flac"], "video": ["mp4", "webm"]}
TARGET_SIZE = 224  # resize-to edge for image-like payloads
FEAT_DIM = 8

DECODE_RESULT_SCHEMA = (
    "doc_id bigint, modality string, format string, n_bytes bigint, "
    "out_width int, out_height int, feature array<float>"
)


def multimodal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multimodal table derived from ``documents``.

    Columns: ``media binary`` (fake payload: the doc text bytes), and a
    typed ``meta`` struct (modality, format, width/height/duration) —
    the schema shape a real corpus would store, with media inline.
    """
    did = F.col("doc_id")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]), (did % 3).cast("int") + 1
    )
    fmt_map = F.create_map(
        *[
            x
            for m, fmts in FORMATS.items()
            for x in (
                F.lit(m),
                F.element_at(
                    F.array(*[F.lit(f) for f in fmts]),
                    (did % len(fmts)).cast("int") + 1,
                ),
            )
        ]
    )
    return (
        scatter(spark, load_table(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            F.encode(F.col("text"), "utf-8").alias("media"),
            F.struct(
                modality.alias("modality"),
                F.element_at(fmt_map, modality).alias("format"),
                (128 + did % 1920).cast("int").alias("width"),
                (128 + (did * 7) % 1080).cast("int").alias("height"),
                ((did % 600) / 10.0).alias("duration_s"),
            ).alias("meta"),
        )
    )


def _decode_real(payload: bytes, modality: str, fmt: str):
    """Production decode hook (Pillow / soundfile / pyav)."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; mm_decode_stub uses the deterministic fake instead"
    )


def _decode_stub(payload: bytes, modality: str) -> list[float]:
    """Stable fake features: FEAT_DIM floats from the payload digest."""
    d = hashlib.md5(payload if payload else b"").digest()
    return [
        round(int.from_bytes(d[2 * i : 2 * i + 2], "big") / 65535.0, 6)
        for i in range(FEAT_DIM)
    ]


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow batch in -> decoded features out (one Python pass per batch).

    In production this holds the decoder state (thread pool, GPU handle)
    per task — the reason this is mapInPandas and not a per-row UDF.
    """
    for pdf in batches:
        feats, widths, heights = [], [], []
        for payload, w, h, modality in zip(
            pdf["media"], pdf["width"], pdf["height"], pdf["modality"]
        ):
            feats.append(_decode_stub(payload, modality))
            # resize: fit longest edge to TARGET_SIZE, keep aspect.
            # integer half-up arithmetic — bit-identical in the DuckDB
            # oracle, no float round-tie drift between engines.
            w, h, m = int(w), int(h), max(int(w), int(h))
            widths.append(max(1, (w * 2 * TARGET_SIZE + m) // (2 * m)))
            heights.append(max(1, (h * 2 * TARGET_SIZE + m) // (2 * m)))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "format": pdf["format"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["media"]],
                "out_width": widths,
                "out_height": heights,
                "feature": feats,
            }
        )


def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal table -> batched decode/resize/feature stage."""
    mm = multimodal_table(spark, sf_dir)
    flat = mm.select(
        "doc_id",
        "media",
        F.col("meta.modality").alias("modality"),
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(_decode_batch, schema=DECODE_RESULT_SCHEMA).orderBy(
        "doc_id"
    )
