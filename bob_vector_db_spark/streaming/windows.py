"""Event-time windowed aggregation (SURVEY.md §2.9 T3-T6).

Each transform is written against a plain DataFrame, so the SAME function
body serves batch (driver oracle / backfill) and streaming (readStream)
inputs — Structured Streaming's unified-API contract.  Watermarks are only
attached on the streaming path (they are a no-op in batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling(df: DataFrame, ts: str = "ts", width: str = "1 hour",
             watermark: str | None = None, **aggs) -> DataFrame:
    """T3: fixed windows. aggs: output_name=Column aggregate expressions."""
    if watermark:
        df = df.withWatermark(ts, watermark)
    return (
        df.groupBy(F.window(F.col(ts), width).alias("w"))
        .agg(*[v.alias(k) for k, v in aggs.items()])
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                *aggs.keys())
    )


def sliding(df: DataFrame, ts: str = "ts", width: str = "1 hour",
            slide: str = "15 minutes", watermark: str | None = None,
            **aggs) -> DataFrame:
    """T4: overlapping windows."""
    if watermark:
        df = df.withWatermark(ts, watermark)
    return (
        df.groupBy(F.window(F.col(ts), width, slide).alias("w"))
        .agg(*[v.alias(k) for k, v in aggs.items()])
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                *aggs.keys())
    )


def session(df: DataFrame, ts: str = "ts", key: str = "user_id",
            gap: str = "30 minutes", watermark: str | None = None,
            **aggs) -> DataFrame:
    """T5: gap-based sessions per key (session_window state merge)."""
    if watermark:
        df = df.withWatermark(ts, watermark)
    return (
        df.groupBy(F.col(key), F.session_window(F.col(ts), gap).alias("w"))
        .agg(*[v.alias(k) for k, v in aggs.items()])
        .select(F.col(key),
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                *aggs.keys())
    )


def stream_dedup(df: DataFrame, keys: list[str], ts: str = "ts",
                 watermark: str | None = None) -> DataFrame:
    """T2: duplicate suppression keyed like the reference's id-keyed upsert
    (qdrant_embedder.py:58-62).  With a watermark the state is bounded."""
    if watermark:
        return df.withWatermark(ts, watermark).dropDuplicates(keys)
    return df.dropDuplicates(keys)
