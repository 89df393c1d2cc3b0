"""Streaming ingest pipeline (SURVEY.md §2.9 T1/T7, §2.1 S7/S8).

The reference's runtime is four forever-spinning topic subscriptions feeding
one embed pipeline with per-message skip-on-error (embedder.py:161-174,
217-225).  Spark shape:

    readStream (file/kafka/rate) per source, tagged with source_topic
      → unionByName(allowMissingColumns=True)                 (S8)
      → normalize_raw / parse_messages → zip_explode          (S1/S2/X5)
      → corrupt-record split: bad rows → dead-letter sink     (S7)
      → foreachBatch: upsert-by-id MERGE into the collection  (T7/S6)

Ingest-rate backpressure (the reference's QoS depth-1000 queue,
embedder.py:162) maps to ``maxFilesPerTrigger``/``maxOffsetsPerTrigger``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.normalize import normalize_raw, zip_explode
from ..operators.upsert import upsert

RAW_SCHEMA = T.StructType([T.StructField("value", T.StringType())])


def read_text_stream(spark: SparkSession, path: str,
                     source_topic: str = "embed",
                     max_files_per_trigger: int = 10) -> DataFrame:
    """One 'topic': a directory of JSON-lines text files (S1 source).

    maxFilesPerTrigger bounds per-microbatch intake — the QoS queue-depth
    analogue.
    """
    return (
        spark.readStream.schema(RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
        .withColumn("source_topic", F.lit(source_topic))
        # version for last-write-wins upsert: a later-written file beats an
        # earlier one even when one micro-batch re-reads both (file metadata
        # column; persisted by operators.upsert so it survives restarts)
        .withColumn("_ingest_ts", F.col("_metadata.file_modification_time"))
    )


def read_rate_stream(spark: SparkSession, rows_per_second: int = 500,
                     num_partitions: int = 1,
                     source_topic: str = "rate") -> DataFrame:
    """Second live source shape: the built-in rate source.

    ``rowsPerSecond`` IS the backpressure knob — it caps per-micro-batch
    intake the way the reference's QoS depth-1000 queue bounds in-flight
    messages (embedder.py:162) and maxFilesPerTrigger bounds the file
    source.  Emits (timestamp, value) with value a gap-free 0,1,2,…
    sequence, so downstream results over ``value < N`` are deterministic.
    """
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", num_partitions)
        .load()
        .withColumn("source_topic", F.lit(source_topic))
    )


def rate_records(stream: DataFrame, collection: str = "rate",
                 limit_value: int | None = None) -> DataFrame:
    """Map rate-source rows to the canonical record schema (normalize.
    zip_explode's output), so a rate topic unions with file topics in one
    pipeline.  ``limit_value`` keeps only ``value < limit_value`` — the
    deterministic prefix of the unbounded sequence."""
    if limit_value is not None:
        stream = stream.filter(F.col("value") < limit_value)
    return stream.select(
        F.lit(collection).alias("collection"),
        F.concat(F.lit("r"), F.col("value")).alias("id"),
        F.concat(F.lit("rate event "), F.col("value")).alias("document"),
        F.lit("{}").alias("payload_json"),
        F.lit(None).cast("string").alias("image_path"),
        F.lit(0).alias("pos"),
        F.col("source_topic"),
        F.col("timestamp").alias("_ingest_ts"),
    )


def union_topics(*streams: DataFrame) -> DataFrame:
    """S8: merge independently-sourced topic streams into one pipeline."""
    out = streams[0]
    for s in streams[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    return out


def split_dead_letter(records: DataFrame,
                      required: tuple[str, ...] = ("document",)) -> tuple[DataFrame, DataFrame]:
    """S7: rows missing required fields go to the dead-letter side; the main
    stream continues — the skip-on-error semantics of embedder.py:217-225."""
    cond = None
    for c in required:
        this = F.col(c).isNotNull()
        cond = this if cond is None else (cond & this)
    return records.filter(cond), records.filter(~cond)


def start_upsert_sink(records: DataFrame, store_root: str, collection: str,
                      checkpoint: str, id_col: str = "id",
                      version_col: str | None = None,
                      available_now: bool = True):
    """T7: MERGE each micro-batch into the collection table by id.

    ``available_now=False`` runs a continuous micro-batch trigger — required
    when any unioned source is unbounded (rate source); the caller stops the
    query once its completion condition holds.
    """

    def _merge(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        upsert(batch.sparkSession, store_root, collection, batch,
               id_col=id_col, version_col=version_col)

    writer = (records.writeStream.foreachBatch(_merge)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_ingest_pipeline(spark: SparkSession, in_dir: str, store_root: str,
                        collection: str, checkpoint: str,
                        default_collection: str = "default"):
    """End-to-end T1: text stream → normalize → explode → upsert sink."""
    raw = read_text_stream(spark, in_dir)
    keep = ("source_topic", "_ingest_ts")
    records = zip_explode(
        normalize_raw(raw, "value", default_collection, keep=keep), keep=keep
    )
    good, _bad = split_dead_letter(records)
    return start_upsert_sink(good, store_root, collection, checkpoint,
                             version_col="_ingest_ts")


def run_multi_topic_pipeline(spark: SparkSession, in_dir: str, store_root: str,
                             collection: str, checkpoint: str,
                             default_collection: str = "default",
                             max_files_per_trigger: int = 2,
                             rows_per_second: int = 500,
                             rate_limit_value: int | None = None,
                             queue_dir: str | None = None,
                             max_segments_per_trigger: int = 2):
    """Live S8: file topic ∪ rate topic (∪ durable-queue topic) → one
    normalize/explode/upsert pipeline — the reference's concurrent bounded
    subscriptions (embedder.py:161-174) with physically different sources.

    Every source carries its own backpressure bound (maxFilesPerTrigger /
    rowsPerSecond / maxSegmentsPerTrigger).  The rate source is unbounded,
    so the sink runs a continuous trigger; the caller polls the store and
    stops the returned query when done.  ``queue_dir`` adds the
    commit-log topic (streaming.queue_source) — the replayable-offset
    fourth shape of the reference's subscription model.
    """
    raw = read_text_stream(spark, in_dir, source_topic="embed",
                           max_files_per_trigger=max_files_per_trigger)
    keep = ("source_topic", "_ingest_ts")
    file_records = zip_explode(
        normalize_raw(raw, "value", default_collection, keep=keep), keep=keep
    )
    rate = rate_records(
        read_rate_stream(spark, rows_per_second=rows_per_second),
        collection=default_collection, limit_value=rate_limit_value,
    )
    topics = [file_records, rate]
    if queue_dir is not None:
        from .queue_source import read_queue_stream  # noqa: PLC0415

        q_raw = read_queue_stream(
            spark, queue_dir,
            max_segments_per_trigger=max_segments_per_trigger).drop("_offset")
        topics.append(zip_explode(
            normalize_raw(q_raw, "value", default_collection, keep=keep),
            keep=keep))
    good, _bad = split_dead_letter(union_topics(*topics))
    return start_upsert_sink(good, store_root, collection, checkpoint,
                             version_col="_ingest_ts", available_now=False)


def run_queue_pipeline(spark: SparkSession, log_dir: str, store_root: str,
                       collection: str, checkpoint: str,
                       default_collection: str = "default",
                       max_segments_per_trigger: int = 2):
    """Bounded drain of the durable-queue topic alone: consume every
    published segment (availableNow), merge into the store, stop.  Re-run
    with the same checkpoint after more appends and only the NEW offsets
    process — the restart/exactly-once surface of the commit-log source."""
    from .queue_source import read_queue_stream  # noqa: PLC0415

    raw = read_queue_stream(
        spark, log_dir, max_segments_per_trigger=max_segments_per_trigger)
    keep = ("source_topic", "_ingest_ts", "_offset")
    records = zip_explode(
        normalize_raw(raw, "value", default_collection, keep=keep), keep=keep
    )
    good, _bad = split_dead_letter(records)
    # the commit-log offset, not wall-clock, is the version authority here:
    # a re-delivered id from a later segment wins deterministically even if
    # two segments share one mtime granule
    return start_upsert_sink(good, store_root, collection, checkpoint,
                             version_col="_offset")
