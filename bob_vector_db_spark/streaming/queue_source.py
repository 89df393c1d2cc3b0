"""Durable-queue source: a directory-as-commit-log with explicit offsets
(SURVEY.md §2.1 S8's missing fourth shape; VERDICT r4 ask #6).

The reference's runtime subscribes to four DDS topics behind a bounded QoS
depth-1000 queue (embedder.py:161-174) — i.e. a replayable, offset-ordered,
intake-bounded message log.  The container has no Kafka, so this module
reproduces the Kafka SHAPE on a plain directory:

  * producers append numbered segment files ``segment-%08d.jsonl`` via an
    ATOMIC publish (tmp write + rename) — a consumer never lists a
    half-written segment; the segment number IS the offset;
  * the consumer is a file ``readStream`` whose per-trigger intake is
    bounded by ``maxFilesPerTrigger`` — the ``maxOffsetsPerTrigger``
    analogue of Kafka and the QoS-depth analogue of the reference;
  * Spark's file-source checkpoint records the committed segments, so a
    RESTART resumes from the first unprocessed offset, and the downstream
    ``foreachBatch`` upsert merge is idempotent by id — together:
    exactly-once into the store across restarts (pytest-proven in
    tests/test_streaming.py).

Scale note: one directory listing per trigger is the only metadata cost;
at production scale the same plan runs unchanged on a real Kafka source —
only ``read_queue_stream`` swaps for ``spark.readStream.format("kafka")``.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ingest import RAW_SCHEMA

_SEGMENT_RE = re.compile(r"^segment-(\d{8,})\.jsonl$")  # 8+: %08d grows past 10^8


def _next_offset(log_dir: str) -> int:
    offs = [int(m.group(1)) for f in os.listdir(log_dir)
            if (m := _SEGMENT_RE.match(f))]
    return max(offs) + 1 if offs else 0


def append_segment(log_dir: str, messages: Iterable[str | dict]) -> int:
    """Atomically publish one segment of messages; returns its offset.

    Each message becomes one ``{"value": <json-string>}`` line (the same
    wire shape the file topic consumes).  The tmp-write + link publish
    means a concurrent consumer either sees the whole segment or none of
    it, and the offset claim is EXCLUSIVE: ``os.link`` fails on an existing
    name (unlike rename, which silently clobbers), so two concurrent
    producers racing to the same offset cannot overwrite each other —
    the loser retries at the next offset.  The commit-log append contract.
    """
    os.makedirs(log_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=log_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        for m in messages:
            value = m if isinstance(m, str) else json.dumps(m)
            fh.write(json.dumps({"value": value}) + "\n")
    try:
        while True:
            offset = _next_offset(log_dir)
            final = os.path.join(log_dir, f"segment-{offset:08d}.jsonl")
            try:
                os.link(tmp, final)  # atomic claim; EEXIST = lost the race
                return offset
            except FileExistsError:
                continue
    finally:
        os.unlink(tmp)


def read_queue_stream(spark: SparkSession, log_dir: str,
                      source_topic: str = "queue",
                      max_segments_per_trigger: int = 4) -> DataFrame:
    """The consumer half: an offset-tagged, intake-bounded file stream.

    ``_offset`` is parsed from the segment name (the commit-log position —
    monotone with publish order); ``_ingest_ts`` carries the segment's
    publish time so queue records merge into the same last-write-wins
    version ordering as the file topic's records.
    """
    os.makedirs(log_dir, exist_ok=True)
    return (
        spark.readStream.schema(RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_segments_per_trigger)
        .option("pathGlobFilter", "segment-*.jsonl")
        .json(log_dir)
        .withColumn("source_topic", F.lit(source_topic))
        .withColumn(
            "_offset",
            F.regexp_extract(F.col("_metadata.file_path"),
                             r"segment-(\d+)\.jsonl$", 1).cast("long"))
        .withColumn("_ingest_ts", F.col("_metadata.file_modification_time"))
    )
