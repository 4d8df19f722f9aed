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
    "out_width int, out_height int, feature array<float>, feature_csv string"
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
                # flat twin of `feature` for consumers that hash rows
                # (sorting/grouping over an array column is undefined in
                # pandas-side canonicalizers); same values, 6-dp fixed
                "feature_csv": [
                    ",".join(f"{v:.6f}" for v in f) for f in feats
                ],
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


def mm_decode_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry/driver projection of ``mm_decode_stub``: every column
    scalar (the array feature stays in the library API; its 6-dp csv
    twin rides along for row-hash comparison)."""
    return mm_decode_stub(spark, sf_dir).drop("feature")


N_FRAMES_MAX = 4
FRAME_STEP_S = 15.0  # one extra sampled frame per 15s of duration


def _frame_feature(payload: bytes, idx: int) -> float:
    """One deterministic scalar per sampled frame: digest of
    (payload, frame index), reproducible in the DuckDB oracle."""
    d = hashlib.md5((payload if payload else b"") + f":{idx}".encode()).digest()
    return round(int.from_bytes(d[:2], "big") / 65535.0, 6)


def _frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow batch in -> one row PER SAMPLED FRAME out (1→N mapInPandas).

    The explode happens inside the Python stage — the input batch is
    scanned once and the output rows stream out Arrow-batched, the shape
    a real ffmpeg frame sampler has (decoder state per task, frames
    yielded incrementally).
    """
    for pdf in batches:
        ids, idxs, tss, feats = [], [], [], []
        for doc_id, payload, dur in zip(
            pdf["doc_id"], pdf["media"], pdf["duration_s"]
        ):
            n = min(N_FRAMES_MAX, int(float(dur) / FRAME_STEP_S) + 1)
            for i in range(n):
                ids.append(doc_id)
                idxs.append(i)
                tss.append(round(float(dur) * i / n, 6))
                feats.append(_frame_feature(payload, i))
        yield pd.DataFrame(
            {"doc_id": ids, "frame_idx": idxs, "frame_ts": tss, "f0": feats}
        )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform temporal frame sampling over the video rows.

    min(4, duration//15 + 1) frames per clip at evenly spaced
    timestamps; each frame carries a digest-deterministic feature. The
    video filter is pushed BELOW the Python stage (only video rows cross
    the Arrow boundary), and each input row fans out to N output rows
    inside the batch — the multimodal explode pattern at scale.
    """
    mm = multimodal_table(spark, sf_dir)
    videos = mm.where(F.col("meta.modality") == "video").select(
        "doc_id", "media", F.col("meta.duration_s").alias("duration_s")
    )
    out_schema = "doc_id bigint, frame_idx int, frame_ts double, f0 double"
    return videos.mapInPandas(_frame_sample_batch, schema=out_schema).orderBy(
        "doc_id", "frame_idx"
    )
