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
