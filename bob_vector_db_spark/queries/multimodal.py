"""Multimodal binary columns: codecs, byte stats, binaryFile source (SURVEY S3/X2)."""


from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

from ._registry import register
from ._shared import *  # noqa: F403 — shared oracle/fixture helpers


# ---------------------------------------------------------------------------
# Multimodal binary columns (S3/X2/X5): the documents' text treated as opaque
# bytes exercises the same mapInPandas plumbing a real image corpus uses
# ---------------------------------------------------------------------------

@register(
    "mm_binary_stats",
    oracle="""
SELECT doc_id AS id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
       sha256(text) AS sha256
FROM documents
""",
)
def q_mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import multimodal as MM  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    return MM.binary_stats(MM.text_as_binary(docs))


@register("mm_byte_histogram", oracle=None)  # pandas-UDF feature path, rows-only
def q_mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # features rendered as a comma-joined string (6dp) — the driver's
    # canonicalizer cannot hash array cells even for rows-only checks.
    from ..operators import multimodal as MM  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    blobs = MM.text_as_binary(docs)
    hist = blobs.select(
        "doc_id", MM.byte_histogram_udf(16)(F.col("content")).alias("features")
    )
    return hist.select(
        "doc_id",
        F.concat_ws(
            ",", F.transform(F.col("features"), lambda x: F.format_string("%.6f", x))
        ).alias("features"),
    )


@register(
    "mm_audio_features",
    # The FAUD codec is deterministic integer arithmetic, so even the DECODE
    # path is oracle-checkable: DuckDB regenerates the PCM train per doc and
    # recomputes rate/length/energy.
    oracle="""
WITH p AS (
  SELECT doc_id, 64 + doc_id % 64 AS n, doc_id % 256 AS seed FROM documents
),
v AS (
  SELECT doc_id, n,
         list_transform(range(n),
           i -> CASE WHEN (seed + 17*i) % 256 > 127
                     THEN (seed + 17*i) % 256 - 256
                     ELSE (seed + 17*i) % 256 END) AS pcm
  FROM p
)
SELECT doc_id, CAST(16000 AS INTEGER) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       round(n / 16000.0, 6) AS duration_sec,
       round(sqrt(list_aggregate(list_transform(pcm, s -> s*s), 'sum') / n), 6) AS rms
FROM v
""",
)
def q_mm_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: PLC0415

    from ..operators import multimodal as MM  # noqa: PLC0415

    # no annotations: postponed-evaluation strings ('pd.Series') can't be
    # resolved by pandas_udf's type-hint inference with a local pd import
    def _gen(doc_ids):
        return doc_ids.map(
            lambda d: MM.fake_audio(64 + int(d) % 64, seed=int(d) % 256))

    gen_faud = F.pandas_udf(_gen, "binary")

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    blobs = docs.withColumn("content", gen_faud(F.col("doc_id")))
    out = MM.decode_audio(blobs, id_col="doc_id")
    return out.select(
        F.col("id").alias("doc_id"), "sample_rate", "n_samples",
        F.round("duration_sec", 6).alias("duration_sec"),
        F.round("rms", 6).alias("rms"),
    )


@register("mm_resize_pipeline", oracle=None)  # pixel-codec path, rows-only
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X5 composition: generate per-doc FIMG blobs, resize to a fixed
    thumbnail, decode the thumbnails — the decode→resize→feature chain a
    real image corpus runs, all through Arrow-batched mapInPandas."""
    from ..operators import multimodal as MM  # noqa: PLC0415

    def _gen(doc_ids):
        return doc_ids.map(
            lambda d: MM.fake_image(8 + int(d) % 8, 8, 1, seed=int(d) % 256))

    gen_fimg = F.pandas_udf(_gen, "binary")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    blobs = docs.withColumn("content", gen_fimg(F.col("doc_id")))
    thumbs = MM.resize_images(blobs, 4, 4, id_col="doc_id")
    out = MM.decode_images(thumbs, id_col="id")
    return out.select(
        F.col("id").alias("doc_id"), "width", "height",
        F.round("mean_pixel", 6).alias("mean_pixel"))


@register("mm_binaryfile_source", oracle=None)  # filesystem source, rows-only
def q_mm_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: a real ``spark.read.format("binaryFile")`` media source — writes a
    deterministic set of FIMG blobs to a scratch dir once, reads them back as
    (path, content) files, and decodes through the mapInPandas codec path.
    The reference's equivalent source is the ROS image topic subscription
    (embedder.py:269-303); binaryFile is the batch-Spark spelling, and at
    scale it parallelizes by file with partition pruning on path globs.
    """
    import tempfile  # noqa: PLC0415

    from ..operators import multimodal as MM  # noqa: PLC0415

    d = os.path.join(tempfile.gettempdir(), "bvds_fimg_source")
    os.makedirs(d, exist_ok=True)
    for i in range(8):
        p = os.path.join(d, f"img_{i}.fimg")
        if not os.path.exists(p):
            with open(p, "wb") as fh:
                fh.write(MM.fake_image(8 + i, 6 + i, 3, seed=i))
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.fimg")
        .load(d)
        .select(
            F.regexp_extract(F.col("path"), r"img_(\d+)\.fimg", 1)
            .cast("long").alias("media_id"),
            "content",
        )
    )
    decoded = MM.decode_images(blobs)
    return decoded.select(
        "id", "width", "height", "channels",
        F.round(F.col("mean_pixel"), 6).alias("mean_pixel"),
    )
