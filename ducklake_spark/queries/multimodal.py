"""Multimodal-column queries: binary media plumbing over ``documents``.

The container ships no image/audio codecs, so media bytes are
synthesized deterministically from ``documents.text``
(:func:`ducklake_spark.operators.multimodal.attach_fake_media`) — but
everything Spark-side is the real pipeline: BINARY columns + typed
metadata structs, metadata-only scans that never touch the bytes, and
Arrow-batched ``mapInPandas`` frame sampling whose byte fidelity the
oracle checks via sha256.

- ``mm_media_profile``: per-format stats off the metadata struct +
  byte lengths (oracle re-derives from text arithmetic).
- ``mm_frame_sample``: video-style frame sampling through the Arrow
  boundary; oracle checks sampled-frame counts AND the sha256 of
  frame 0's bytes (so the bytes that crossed into Python and back are
  verified, not just row counts).
- ``mm_image_features``: fake-decode intensity stats (np.percentile
  has no exact SQL twin -> rows-only driver check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ducklake_spark.queries import df_query


def _media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ducklake_spark.operators.multimodal import attach_fake_media
    from ducklake_spark.queries import load_tables

    load_tables(spark, sf_dir, ["documents"])
    fmt = (
        F.when(F.col("doc_id") % 3 == 0, "png")
        .when(F.col("doc_id") % 3 == 1, "jpeg")
        .otherwise("webp")
    )
    return attach_fake_media(spark.table("documents"), fmt=fmt)


def _run_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ducklake_spark.operators.multimodal import media_stats

    return media_stats(_media_df(spark, sf_dir)).orderBy("format")


_PROFILE_ORACLE = """
WITH m AS (
    SELECT doc_id,
           octet_length(encode(text)) AS bl,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                ELSE 'webp' END AS format
    FROM documents
)
SELECT format,
       COUNT(*) AS n,
       CAST(SUM(bl) AS BIGINT) AS total_bytes,
       CAST(SUM(bl % 512 + 16) AS BIGINT) * 1.0 / COUNT(*) AS avg_width,
       CAST(SUM(bl % 256 + 16) AS BIGINT) * 1.0 / COUNT(*) AS avg_height,
       MAX(bl * 33) AS max_duration_ms
FROM m GROUP BY format ORDER BY format
"""

df_query(
    "mm_media_profile",
    _run_profile,
    oracle=_PROFILE_ORACLE,
    tables=["documents"],
    doc="per-format media profile from metadata structs (bytes never decoded)",
)


def _run_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ducklake_spark.operators.multimodal import sample_frames

    frames = sample_frames(_media_df(spark, sf_dir), every=10)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sampled"),
            F.lower(
                F.hex(F.min_by("frame", "frame_idx"))
            ).alias("frame0_sha256"),
        )
        .orderBy("doc_id")
    )


_FRAMES_ORACLE = """
SELECT doc_id,
       CAST(ceil((octet_length(encode(text)) % 100 + 1) / 10.0) AS BIGINT) AS n_sampled,
       sha256(text || '#0') AS frame0_sha256
FROM documents ORDER BY doc_id
"""

df_query(
    "mm_frame_sample",
    _run_frames,
    oracle=_FRAMES_ORACLE,
    tables=["documents"],
    doc="Arrow-batched frame sampling; oracle verifies count + frame-0 sha256",
)


def _run_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ducklake_spark.operators.multimodal import image_features

    return image_features(_media_df(spark, sf_dir)).orderBy("doc_id")


# The fake decode is sha256(media) repeated to an 8x8 gray image (each
# digest byte appears twice), and image_features uses integer-exact
# formulas (nearest-rank percentiles; std from integer sums with one
# sqrt + one division by the pixel count), so DuckDB reproduces every
# double bit-for-bit from the digest bytes. Dup-sorted indices: p05 =
# ceil(.05*64)-1 = 3 -> digest-sorted[1] (arr 1-indexed [2]); p95 ->
# sorted[30] (arr[31]).
_FEATURES_ORACLE = """
WITH b AS (
    SELECT doc_id,
           octet_length(encode(text)) AS bl,
           CAST('0x' || substr(sha256(text), 2*i+1, 2) AS BIGINT) AS v
    FROM documents, generate_series(0, 31) AS g(i)
),
s AS (
    SELECT doc_id, MAX(bl) AS bl, 2*SUM(v) AS sm, 2*SUM(v*v) AS sq,
           list_sort(list(v)) AS arr
    FROM b GROUP BY doc_id
)
SELECT doc_id,
       CAST(sm AS DOUBLE)/64 AS mean_intensity,
       sqrt(CAST(64*sq - sm*sm AS DOUBLE))/64 AS std_intensity,
       CAST(arr[2] AS DOUBLE) AS p05,
       CAST(arr[31] AS DOUBLE) AS p95,
       CAST(bl AS BIGINT) AS byte_len
FROM s ORDER BY doc_id
"""

df_query(
    "mm_image_features",
    _run_features,
    oracle=_FEATURES_ORACLE,
    tables=["documents"],
    doc="fake-decode image intensity features via mapInPandas; "
        "integer-exact stats give the driver a full value-hash oracle",
)
