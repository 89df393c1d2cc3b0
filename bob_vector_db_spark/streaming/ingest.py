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
                      version_col: str | None = None):
    """T7: MERGE each micro-batch into the collection table by id."""

    def _merge(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        upsert(batch.sparkSession, store_root, collection, batch,
               id_col=id_col, version_col=version_col)

    return (
        records.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


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
