"""Structured Streaming tests (SURVEY.md §2.9 T1-T7, §5.2 item 5):
real availableNow file-stream runs + batch/stream equivalence."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from bob_vector_db_spark.sources import load_table
from bob_vector_db_spark.streaming import ingest, windows


def test_file_stream_ingest_to_upsert_sink(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    msgs = [
        {"collection": "c", "documents": ["d1", "d2"], "metadatas": [{}, {}], "ids": ["a", "b"]},
        {"data": "raw payload"},
    ]
    with open(in_dir / "batch1.jsonl", "w") as f:
        for m in msgs:
            f.write(json.dumps({"value": json.dumps(m)}) + "\n")

    q = ingest.run_ingest_pipeline(
        spark, str(in_dir), str(tmp_path / "store"), "c",
        str(tmp_path / "ckpt"), default_collection="c")
    q.awaitTermination(120)

    stored = spark.read.parquet(str(tmp_path / "store" / "collection=c"))
    docs = {r["document"] for r in stored.collect()}
    assert {"d1", "d2", "raw payload"} <= docs


def test_stream_upsert_is_idempotent_per_id(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    m1 = {"collection": "c", "documents": ["old"], "metadatas": [{}], "ids": ["same-id"]}
    with open(in_dir / "b1.jsonl", "w") as f:
        f.write(json.dumps({"value": json.dumps(m1)}) + "\n")
    q = ingest.run_ingest_pipeline(spark, str(in_dir), str(tmp_path / "store"), "c",
                                   str(tmp_path / "ck1"))
    q.awaitTermination(120)

    m2 = {"collection": "c", "documents": ["new"], "metadatas": [{}], "ids": ["same-id"]}
    with open(in_dir / "b2.jsonl", "w") as f:
        f.write(json.dumps({"value": json.dumps(m2)}) + "\n")
    q = ingest.run_ingest_pipeline(spark, str(in_dir), str(tmp_path / "store"), "c",
                                   str(tmp_path / "ck2"))
    q.awaitTermination(120)

    stored = spark.read.parquet(str(tmp_path / "store" / "collection=c"))
    rows = [r for r in stored.collect() if r["id"] == "same-id"]
    assert len(rows) == 1 and rows[0]["document"] == "new"


def test_streaming_tumbling_equals_batch(spark, sf_dir, tmp_path):
    """The same windows.tumbling transform over a readStream parquet source
    must agree with its batch run — the unified-API contract (T1/T3)."""
    ev = load_table(spark, sf_dir, "events")
    batch = windows.tumbling(ev, n_events=F.count(F.lit(1))).collect()

    src = str(tmp_path / "events_src")
    ev.write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).parquet(src)
        .transform(lambda df: windows.tumbling(df, watermark="1 hour",
                                               n_events=F.count(F.lit(1))))
    )
    # complete-mode memory sink: append mode would withhold the windows still
    # above the watermark when the stream ends (state is never flushed on
    # termination), so only complete mode can equal the batch result.
    q = (stream.writeStream.format("memory").queryName("tumbling_eq")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM tumbling_eq").collect()
    assert {(r["window_start"], r["n_events"]) for r in got} == \
           {(r["window_start"], r["n_events"]) for r in batch}


def test_session_windows_batch(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [(1, base), (1, base + dt.timedelta(minutes=10)),
            (1, base + dt.timedelta(minutes=80)),
            (2, base)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = windows.session(df, gap="30 minutes", n=F.count(F.lit(1))).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["n"])
    assert sorted(per_user[1]) == [1, 2]  # 2-event session + 1 later
    assert per_user[2] == [1]


def test_stream_dedup_batch_equivalent(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2)], "id string, v int")
    assert windows.stream_dedup(df, ["id"]).count() == 2


def test_stateful_operator_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState: state persists between micro-batches — the
    second batch's emission includes the first batch's counts."""
    from bob_vector_db_spark.streaming.stateful import running_user_stats

    src = tmp_path / "src"
    src.mkdir()
    schema = "user_id long, value long"
    spark.createDataFrame([(1, 10), (1, 20), (2, 5)], schema) \
        .coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame([(1, 30)], schema) \
        .coalesce(1).write.parquet(str(src / "b2"))

    stream = running_user_stats(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true").parquet(str(src)))
    q = (stream.writeStream.format("memory").queryName("t8_acc")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM t8_acc").collect()
    per_user = {}
    for r in rows:
        cur = per_user.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            per_user[r["user_id"]] = r
    assert per_user[1]["n_events"] == 3 and per_user[1]["total_value"] == 60.0
    assert per_user[2]["n_events"] == 1 and per_user[2]["total_value"] == 5.0
    # state genuinely crossed batches: user 1 was updated more than once
    assert sum(1 for r in rows if r["user_id"] == 1) >= 2


def test_dead_letter_split(spark):
    df = spark.createDataFrame([("ok",), (None,)], "document string")
    good, bad = ingest.split_dead_letter(df)
    assert good.count() == 1 and bad.count() == 1


def test_stream_restart_processes_only_new_files(spark, tmp_path):
    """Exactly-once across restarts: resuming from the SAME checkpoint must
    skip already-committed source files and ingest only the new ones."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def write_file(name, ids):
        with open(in_dir / name, "w") as f:
            for i in ids:
                m = {"collection": "c", "documents": [f"doc{i}"],
                     "metadatas": [{}], "ids": [str(i)]}
                f.write(json.dumps({"value": json.dumps(m)}) + "\n")

    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    write_file("b1.jsonl", range(10))
    q = ingest.run_ingest_pipeline(spark, str(in_dir), store, "c", ckpt)
    q.awaitTermination(120)

    write_file("b2.jsonl", range(10, 15))
    q2 = ingest.run_ingest_pipeline(spark, str(in_dir), store, "c", ckpt)
    q2.awaitTermination(120)
    # the restarted query continued the batch sequence instead of replaying
    assert [p["batchId"] for p in q2.recentProgress] == [1]
    # the source commit log records WHICH files batch 1 read: only the new
    # one (numInputRows is not reliable for this source, the log is)
    import os
    with open(os.path.join(ckpt, "sources", "0", "1")) as fh:
        batch1_files = fh.read()
    assert "b2.jsonl" in batch1_files and "b1.jsonl" not in batch1_files
    stored = spark.read.parquet(str(tmp_path / "store" / "collection=c"))
    assert stored.count() == 15
    assert stored.filter(F.col("id") == "3").count() == 1  # no replay dupes


# --- round 5: durable-queue commit-log source --------------------------------

def test_queue_append_segments_are_ordered_and_atomic(tmp_path):
    from bob_vector_db_spark.streaming import queue_source as QS

    log = str(tmp_path / "log")
    assert QS.append_segment(log, [{"collection": "c", "documents": ["a"],
                                    "metadatas": [{}], "ids": ["1"]}]) == 0
    assert QS.append_segment(log, ["raw text"]) == 1
    assert QS.append_segment(log, []) == 2
    import os
    names = sorted(f for f in os.listdir(log) if f.endswith(".jsonl"))
    assert names == ["segment-00000000.jsonl", "segment-00000001.jsonl",
                     "segment-00000002.jsonl"]
    assert not [f for f in os.listdir(log) if f.endswith(".tmp")]


def test_queue_pipeline_restart_exactly_once(spark, tmp_path):
    """The commit-log contract end-to-end: drain published offsets into the
    store, append more segments (including a re-delivery of an existing id),
    resume from the SAME checkpoint — only the new offsets process, the
    re-delivered id is replaced not duplicated, and the store equals the
    log's last-write-per-id state."""
    import os

    from bob_vector_db_spark.streaming import ingest, queue_source as QS

    log = str(tmp_path / "log")
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")

    def msg(i, text):
        return {"collection": "c", "documents": [text],
                "metadatas": [{}], "ids": [str(i)]}

    QS.append_segment(log, [msg(i, f"v1-{i}") for i in range(5)])
    QS.append_segment(log, [msg(i, f"v1-{i}") for i in range(5, 10)])
    q = ingest.run_queue_pipeline(spark, log, store, "c", ckpt,
                                  default_collection="c")
    q.awaitTermination(120)
    stored = spark.read.parquet(os.path.join(store, "collection=c"))
    assert stored.count() == 10

    # offset 2: re-deliver id 3 with new content + a brand-new id
    QS.append_segment(log, [msg(3, "v2-3"), msg(42, "v1-42")])
    q2 = ingest.run_queue_pipeline(spark, log, store, "c", ckpt,
                                   default_collection="c")
    q2.awaitTermination(120)
    # restart continued the batch sequence (no replay of offsets 0-1)
    with open(os.path.join(ckpt, "sources", "0", "1")) as fh:
        batch1 = fh.read()
    assert "segment-00000002" in batch1
    assert "segment-00000000" not in batch1 and "segment-00000001" not in batch1
    stored = spark.read.parquet(os.path.join(store, "collection=c"))
    assert stored.count() == 11  # 10 ids + id 42; id 3 replaced, not duped
    by_id = {r["id"]: r["document"] for r in stored.collect()}
    assert by_id["3"] == "v2-3" and by_id["42"] == "v1-42"
    assert stored.filter(F.col("id") == "3").count() == 1


def test_queue_offset_is_version_authority(spark, tmp_path):
    """Two segments published within one mtime granule: the OFFSET, not the
    file clock, must decide last-write-wins for a re-delivered id."""
    import os

    from bob_vector_db_spark.streaming import ingest, queue_source as QS

    log = str(tmp_path / "log")
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")

    def msg(i, text):
        return {"collection": "c", "documents": [text],
                "metadatas": [{}], "ids": [str(i)]}

    o1 = QS.append_segment(log, [msg(7, "older")])
    o2 = QS.append_segment(log, [msg(7, "newer")])
    # force identical mtimes — worse than any real filesystem race
    t = os.path.getmtime(os.path.join(log, f"segment-{o1:08d}.jsonl"))
    os.utime(os.path.join(log, f"segment-{o2:08d}.jsonl"), (t, t))
    q = ingest.run_queue_pipeline(spark, log, store, "c", ckpt,
                                  default_collection="c")
    q.awaitTermination(120)
    stored = spark.read.parquet(os.path.join(store, "collection=c"))
    assert [r["document"] for r in stored.collect()] == ["newer"]
