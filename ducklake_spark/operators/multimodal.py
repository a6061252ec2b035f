"""Multimodal (image/audio/video) columns as opaque binary + metadata.

Storage convention: a modality column is a pair
``(<name> BINARY, <name>_meta STRUCT<format, width, height,
sample_rate, n_frames, duration_ms>)`` — Parquet stores the bytes as
a regular BYTE_ARRAY column, so zone maps, time travel, deletes and
compaction from the lake layer apply unchanged, and 100 TB of blobs
partitions like any other table (the metadata struct is tiny; filters
like ``width >= 512`` prune on the struct without touching bytes).

Decode / feature extraction runs in Arrow-batched Python
(``mapInPandas``): the only place raw bytes cross into Python, sized
by ``spark.sql.execution.arrow.maxRecordsPerBatch``. The actual codec
calls (PIL/libav/ffmpeg) are NOT available in this container, so the
codec boundary is a single function each (`_decode_image_real`, …)
raising ``NotImplementedError``; the deterministic fake path keeps
the full Spark plumbing — schemas, batching, partitioning —
executable and tested. Swap the codec function, nothing else moves.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def media_schema(id_field: T.StructField, name: str = "media") -> T.StructType:
    """Canonical schema for a modality table: id + bytes + typed meta."""
    return T.StructType(
        [id_field, T.StructField(name, T.BinaryType()), T.StructField(f"{name}_meta", MEDIA_META)]
    )


# -- codec boundary (container has no image/audio libs: stubbed) -----------


def _decode_image_real(data: bytes) -> np.ndarray:
    raise NotImplementedError(
        "image codec not available in this environment; "
        "plug PIL.Image.open(io.BytesIO(data)) here"
    )


def _decode_image_fake(data: bytes, w: int = 8, h: int = 8) -> np.ndarray:
    """Deterministic stand-in: h×w uint8 gray derived from sha256(data)."""
    seed = hashlib.sha256(data or b"").digest()
    reps = (w * h) // len(seed) + 1
    return np.frombuffer((seed * reps)[: w * h], dtype=np.uint8).reshape(h, w)


def _sample_frames_fake(data: bytes, n_frames: int, every: int) -> list[bytes]:
    """Deterministic frame sampler: frame i = sha256(data || '#i').

    ASCII seed suffix (not packed ints) so SQL oracles can restate it
    as plain string concatenation."""
    return [
        hashlib.sha256((data or b"") + f"#{i}".encode()).digest()
        for i in range(0, n_frames, every)
    ]


# -- operators -------------------------------------------------------------

_FEATURE_FIELDS = (
    "mean_intensity DOUBLE, std_intensity DOUBLE, "
    "p05 DOUBLE, p95 DOUBLE, byte_len BIGINT"
)


def image_features(
    df: DataFrame, *, media_col: str = "media", id_cols: tuple[str, ...] = ("doc_id",),
    fake: bool = True
) -> DataFrame:
    """Decode images and emit per-image intensity statistics.

    Arrow-batched; output = id columns + 5 feature doubles. With a
    real codec this is where resize/normalize would run.
    """
    id_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in id_cols
    )
    out_schema = f"{id_schema}, {_FEATURE_FIELDS}"
    decode = _decode_image_fake if fake else _decode_image_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[media_col].tolist()
            if not blobs:
                continue
            # decode is necessarily per-image; the statistics are one
            # vectorized pass over the stacked batch (no iterrows, no
            # per-row numpy dispatch). Formulas are INTEGER-EXACT so a
            # SQL oracle reproduces them bit-for-bit: mean/std from
            # integer sums with one double op each, percentiles by
            # nearest-rank (no float interpolation).
            decoded = [decode(b) for b in blobs]
            out = pd.DataFrame({c: pdf[c].values for c in id_cols})
            if len({d.shape for d in decoded}) == 1:
                flat = np.stack(decoded).reshape(len(blobs), -1).astype(np.int64)
                n_pix = flat.shape[1]
                sm = flat.sum(axis=1)
                sq = (flat * flat).sum(axis=1)
                srt = np.sort(flat, axis=1)
                p05_i = -(-5 * n_pix // 100) - 1   # ceil(0.05*n)-1
                p95_i = -(-95 * n_pix // 100) - 1
                out["mean_intensity"] = sm / float(n_pix)
                out["std_intensity"] = (
                    np.sqrt((n_pix * sq - sm * sm).astype(np.float64)) / n_pix
                )
                out["p05"] = srt[:, p05_i].astype(np.float64)
                out["p95"] = srt[:, p95_i].astype(np.float64)
            else:  # mixed sizes (real codec): per-image, same formulas
                rows = []
                for d in decoded:
                    a = d.astype(np.int64).ravel()
                    n_pix = a.size
                    sm, sq = int(a.sum()), int((a * a).sum())
                    srt = np.sort(a)
                    rows.append((
                        sm / float(n_pix),
                        float(np.sqrt(float(n_pix * sq - sm * sm)) / n_pix),
                        float(srt[-(-5 * n_pix // 100) - 1]),
                        float(srt[-(-95 * n_pix // 100) - 1]),
                    ))
                arr = np.array(rows)
                out["mean_intensity"] = arr[:, 0]
                out["std_intensity"] = arr[:, 1]
                out["p05"] = arr[:, 2]
                out["p95"] = arr[:, 3]
            out["byte_len"] = [len(b or b"") for b in blobs]
            yield out

    return df.select(*id_cols, media_col).mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame, *, media_col: str = "media", meta_col: str = "media_meta",
    id_cols: tuple[str, ...] = ("doc_id",), every: int = 10, fake: bool = True
) -> DataFrame:
    """Explode a video column into sampled frames (one row per frame).

    Output: id cols + frame_idx INT + frame BINARY. Partition count is
    preserved; a 100 TB video table fans out executor-side with no
    shuffle (the explode happens inside the Arrow batch).
    """
    if not fake:
        raise NotImplementedError("video codec not available; see module docstring")
    id_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in id_cols
    )
    out_schema = f"{id_schema}, frame_idx INT, frame BINARY"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            cols = [pdf[c].to_numpy() for c in id_cols]
            metas = pdf[meta_col].to_numpy()
            blobs = pdf[media_col].to_numpy()
            for i in range(len(pdf)):
                meta = metas[i]
                nf = meta["n_frames"] if meta is not None else 0
                ids = tuple(c[i] for c in cols)
                for j, frame in enumerate(
                    _sample_frames_fake(blobs[i], int(nf or 0), every)
                ):
                    rows.append(ids + (j * every, frame))
            yield pd.DataFrame(
                rows, columns=list(id_cols) + ["frame_idx", "frame"]
            )

    return df.select(*id_cols, media_col, meta_col).mapInPandas(run, out_schema)


def media_stats(df: DataFrame, *, media_col: str = "media", meta_col: str = "media_meta") -> DataFrame:
    """Metadata-only profile — never touches the bytes (no decode, the
    binary column is pruned from the scan entirely)."""
    # avg = exact integer SUM, then ONE double division — bit-identical
    # across engines, unlike incremental double accumulation (F.avg).
    return df.groupBy(F.col(f"{meta_col}.format").alias("format")).agg(
        F.count("*").alias("n"),
        F.sum(F.length(media_col)).alias("total_bytes"),
        (F.sum(f"{meta_col}.width") / F.count("*")).alias("avg_width"),
        (F.sum(f"{meta_col}.height") / F.count("*")).alias("avg_height"),
        F.max(f"{meta_col}.duration_ms").alias("max_duration_ms"),
    )


def attach_fake_media(
    df: DataFrame, *, from_col: str = "text", name: str = "media", fmt="png"
) -> DataFrame:
    """Testing helper: synthesize a media column from an existing string
    column (bytes = utf8 of the text; dims derived from its length).
    ``fmt`` may be a literal string or a Column."""
    ln = F.octet_length(F.col(from_col))
    fmt_col = F.lit(fmt) if isinstance(fmt, str) else fmt
    return df.withColumn(name, F.encode(F.col(from_col), "utf-8")).withColumn(
        f"{name}_meta",
        F.struct(
            fmt_col.alias("format"),
            (ln % 512 + 16).cast("int").alias("width"),
            (ln % 256 + 16).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            (ln % 100 + 1).cast("int").alias("n_frames"),
            (ln * 33).cast("long").alias("duration_ms"),
        ),
    )
