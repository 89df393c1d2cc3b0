"""Structured Streaming: live ingest, windows, watermark, dedup,
queue sources, stream->store sinks (SURVEY T rows)."""


from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup, index, knn, normalize, upsert
from ..sources import load_table
from ..streaming import windows

from ._registry import register
from ._shared import *  # noqa: F403 — shared oracle/fixture helpers


# ---------------------------------------------------------------------------
# T3: tumbling event-time window (batch-equivalent of the streaming agg)
# ---------------------------------------------------------------------------

@register(
    "t3_hourly_event_windows",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
""",
)
def q_t3_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return windows.tumbling(
        ev, ts="ts", width="1 hour",
        n_events=F.count(F.lit(1)),
        total_value=F.sum(F.col("value").cast("decimal(18,4)")).cast("double"),
    )


# ---------------------------------------------------------------------------
# T4: sliding windows (batch-equivalent; every event lands in width/slide
# overlapping windows — the oracle enumerates them with a range join)
# ---------------------------------------------------------------------------

@register(
    "t4_sliding_event_windows",
    oracle="""
SELECT time_bucket(INTERVAL 15 MINUTE, ts) - j * INTERVAL 15 MINUTE AS window_start,
       time_bucket(INTERVAL 15 MINUTE, ts) - j * INTERVAL 15 MINUTE
         + INTERVAL 1 HOUR AS window_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events, range(4) r(j)
GROUP BY 1, 2
""",
)
def q_t4_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return windows.sliding(
        ev, ts="ts", width="1 hour", slide="15 minutes",
        n_events=F.count(F.lit(1)),
        total_value=F.sum(F.col("value").cast("decimal(18,4)")).cast("double"),
    )


# ---------------------------------------------------------------------------
# T5: session windows (batch-equivalent; oracle = lag-gap-cumsum)
# ---------------------------------------------------------------------------

@register(
    "t5_session_windows",
    oracle="""
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, value
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM s GROUP BY user_id, sid
""",
)
def q_t5_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return windows.session(
        ev, ts="ts", key="user_id", gap="30 minutes",
        n_events=F.count(F.lit(1)),
        total_value=F.sum(F.col("value").cast("decimal(18,4)")).cast("double"),
    )


# ---------------------------------------------------------------------------
# T2: dedup (batch form of streaming dropDuplicates, made deterministic:
# keep the FIRST event per key by event time)
# ---------------------------------------------------------------------------

@register(
    "t2_dedup_first_event",
    oracle="""
SELECT user_id, event_type, event_id, ts
FROM (SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events)
WHERE rn = 1
""",
)
def q_t2_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


# ---------------------------------------------------------------------------
# T1/T7/S7/S8 LIVE: a real Structured Streaming run — readStream over
# JSON-lines message files → normalize → zip-explode → dead-letter split →
# foreachBatch upsert sink — with availableNow so the query drains and stops.
# The stored collection must equal a plain projection of the source table,
# which is exactly the unified batch/stream API promise.
# ---------------------------------------------------------------------------

@register(
    "t1_stream_ingest_roundtrip",
    oracle="""
SELECT 'stream' AS collection, CAST(doc_id AS VARCHAR) AS id, text AS document
FROM documents WHERE doc_id < 200
""",
)
def q_t1_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from ..operators.upsert import read_collection  # noqa: PLC0415
    from ..streaming import ingest as ING  # noqa: PLC0415

    token = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.path.join(tempfile.gettempdir(), f"bvds_stream_{token}")
    in_dir = os.path.join(base, "in")
    store = os.path.join(base, "store")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(in_dir)

    rows = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200).select("doc_id", "text").collect()
    )
    # two input files → two entries in the file-stream log (S8-adjacent)
    half = len(rows) // 2 or 1
    for fi, chunk in enumerate((rows[:half], rows[half:])):
        if not chunk:
            continue
        with open(os.path.join(in_dir, f"batch{fi}.jsonl"), "w") as fh:
            for r in chunk:
                msg = {"collection": "stream", "documents": [r["text"]],
                       "metadatas": [{}], "ids": [str(r["doc_id"])]}
                fh.write(json.dumps({"value": json.dumps(msg)}) + "\n")

    q = ING.run_ingest_pipeline(spark, in_dir, store, "stream", ckpt,
                                default_collection="stream")
    q.awaitTermination(180)
    return read_collection(spark, store, "stream").select(
        "collection", "id", "document")


# ---------------------------------------------------------------------------
# T6 LIVE: watermarked streaming aggregation — a real readStream over the
# events fixture with withWatermark bounding the window state.  Complete-mode
# memory sink so the emitted result is deterministic on availableNow drain
# (append mode withholds windows still above the final watermark), which
# keeps this oracle-checkable: the result equals the batch tumbling window.
# ---------------------------------------------------------------------------

@register(
    "t6_stream_watermarked_windows",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events
FROM events
GROUP BY 1
""",
)
def q_t6_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events")
    token = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.path.join(tempfile.gettempdir(), f"bvds_wm_{token}")
    src, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    ev.write.parquet(src)

    name = f"t6_wm_{token}".replace(".", "_")
    stream = (
        spark.readStream.schema(ev.schema).parquet(src)
        .transform(lambda df: windows.tumbling(
            df, watermark="10 minutes", n_events=F.count(F.lit(1))))
    )
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.table(name).select(
        "window_start", F.col("n_events").cast("long").alias("n_events"))


# ---------------------------------------------------------------------------
# T-ext LIVE: custom stateful operator — applyInPandasWithState maintains one
# (count, sum) state row per user across micro-batches.  Drained with
# availableNow over the events fixture, the final update per key equals the
# batch group-by — the state-store-vs-batch equivalence the oracle checks.
# ---------------------------------------------------------------------------

@register(
    "t8_stateful_user_stats",
    oracle="""
SELECT user_id, COUNT(*) AS n_events,
       round(SUM(CAST(value AS DECIMAL(18,6))), 6)::DOUBLE AS total_value
FROM events
GROUP BY user_id
""",
)
def q_t8_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from ..streaming.stateful import running_user_stats  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events")
    token = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.path.join(tempfile.gettempdir(), f"bvds_state_{token}")
    src, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    # exact money-style accumulation so streaming-fold == oracle SUM: ship
    # value as micro-units (long) and divide once at the end
    ev.withColumn("value", F.round(F.col("value") * 1_000_000).cast("long")) \
        .write.parquet(src)

    schema = spark.read.parquet(src).schema
    name = f"t8_state_{token}".replace(".", "_")
    stream = running_user_stats(spark.readStream.schema(schema).parquet(src))
    # state-store instances (and their per-batch open/commit cost) scale
    # with shuffle partitions; 150 user keys need nowhere near the session
    # default of 32 — size the stateful shuffle to the KEY cardinality.
    # The count is baked into the (fresh) checkpoint, so this only affects
    # this query's stream; restore the session conf either way.
    saved_sp = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        q = (stream.writeStream.format("memory").queryName(name)
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved_sp)
    # the memory sink keeps every batch's update; the final state per user is
    # the row with the largest count (counts strictly increase per batch)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        spark.table(name)
        .withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.round(F.col("total_value") / 1_000_000, 6).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# T9 LIVE (round 4): multi-topic union under backpressure — a file topic
# (maxFilesPerTrigger=2 over 4 files → ≥2 micro-batches) unioned with a LIVE
# rate source (rowsPerSecond cap = the QoS depth-1000 bound,
# embedder.py:161-174) into one upsert sink.  The rate source is unbounded,
# so the query polls the store readback and stops at the deterministic
# target: 100 file records + rate values 0..99.
# ---------------------------------------------------------------------------

@register(
    "t9_rate_stream_backpressure",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS id, text AS document
FROM documents WHERE doc_id < 100
UNION ALL
SELECT 'r' || CAST(r AS VARCHAR), 'rate event ' || CAST(r AS VARCHAR)
FROM range(100) t(r)
""",
)
def q_t9_rate_backpressure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE multi-topic union under backpressure: file topic
    (maxFilesPerTrigger) ∪ rate topic (rowsPerSecond cap — the QoS
    depth-1000 bound, embedder.py:161-174) into one upsert sink."""
    import json  # noqa: PLC0415
    import time  # noqa: PLC0415

    from ..operators.upsert import read_collection  # noqa: PLC0415
    from ..streaming import ingest as ING  # noqa: PLC0415

    base = _tmp_base(sf_dir, "t9")
    in_dir = os.path.join(base, "in")
    store = os.path.join(base, "store")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(in_dir)

    rows = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 100).select("doc_id", "text").collect())
    for fi in range(4):
        with open(os.path.join(in_dir, f"part{fi}.jsonl"), "w") as fh:
            for r in rows[fi::4]:
                msg = {"collection": "t9", "documents": [r["text"]],
                       "metadatas": [{}], "ids": [str(r["doc_id"])]}
                fh.write(json.dumps({"value": json.dumps(msg)}) + "\n")

    q = ING.run_multi_topic_pipeline(
        spark, in_dir, store, "t9", ckpt, default_collection="t9",
        max_files_per_trigger=2, rows_per_second=400, rate_limit_value=100)
    target = len(rows) + 100
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            try:
                if read_collection(spark, store, "t9").count() >= target:
                    break
            except Exception:
                pass  # store not created yet / bucket mid-swap
            # 0.15s granularity (round 16): the poll's completion check
            # overshoots by half the sleep on average, and the count job
            # itself is ~0.2s — a coarser sleep just adds dead time to
            # every batch/ completion transition
            time.sleep(0.15)
        # graceful drain: a poll can observe count >= target while the final
        # batch's _stage_and_swap is still renaming OTHER buckets — stopping
        # then could strand a bucket in its __old trash.  Wait for the
        # in-flight trigger to finish first; every later trigger is an empty
        # batch (rate values >= limit are filtered), so stopping mid-trigger
        # after this is harmless.
        while time.time() < deadline and q.status.get("isTriggerActive"):
            time.sleep(0.05)
    finally:
        q.stop()
    q.awaitTermination(60)
    return read_collection(spark, store, "t9").select("id", "document")


# ---------------------------------------------------------------------------
# T10 LIVE (round 4): streaming dedup-by-id on a real stream — the live twin
# of t2's batch form.  Duplicates are exact row copies spread across
# micro-batches (maxFilesPerTrigger=1 over 4 files, each half repeated), so
# whichever copy dropDuplicates keeps, the emitted VALUES are deterministic
# and the append-mode drain equals DISTINCT over the fixture.
# ---------------------------------------------------------------------------

@register(
    "t10_stream_dedup_live",
    oracle="""
SELECT event_id, user_id, event_type, value
FROM events WHERE event_id < 200
""",
)
def q_t10_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE streaming dedup-by-id: watermarked dropDuplicates across
    micro-batches, deterministic append drain equals DISTINCT (T2 live)."""
    import json  # noqa: PLC0415

    base = _tmp_base(sf_dir, "t10")
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    rows = (load_table(spark, sf_dir, "events")
            .filter(F.col("event_id") < 200)
            .select("event_id", "user_id", "event_type", "value",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                    .alias("ts_str"))
            .collect())
    halves = [rows[:100], rows[:100], rows[100:], rows[100:]]
    for fi, chunk in enumerate(halves):
        with open(os.path.join(in_dir, f"f{fi}.jsonl"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps(r.asDict()) + "\n")

    schema = ("event_id long, user_id long, event_type string, "
              "value double, ts_str string")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
        .withColumn("ts", F.to_timestamp("ts_str"))
        .transform(lambda df: windows.stream_dedup(
            df, ["event_id"], watermark="1 hour"))
    )
    q = (stream.writeStream.format("memory").queryName("t10_dedup")
         .outputMode("append")
         .option("checkpointLocation", os.path.join(base, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(
        "SELECT event_id, user_id, event_type, value FROM t10_dedup")


# ---------------------------------------------------------------------------
# T11 LIVE (round 4): stream–static join — every micro-batch enriches
# against a broadcast dimension snapshot, the canonical streaming-enrichment
# shape (the payload-join the reference's metadatas perform at ingest,
# qdrant_embedder.py:130-143, done against a dimension table instead).
# ---------------------------------------------------------------------------

@register(
    "t11_stream_static_join",
    oracle="""
SELECT e.event_id, e.user_id, c.c_mktsegment, e.value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_id < 500
""",
)
def q_t11_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _tmp_base(sf_dir, "t11")
    src = os.path.join(base, "src")
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 500)
          .select("event_id", "user_id", "value"))
    ev.write.parquet(src)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .join(F.broadcast(dim), "user_id")
        .select("event_id", "user_id", "c_mktsegment", "value")
    )
    q = (stream.writeStream.format("memory").queryName("t11_enriched")
         .outputMode("append")
         .option("checkpointLocation", os.path.join(base, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(
        "SELECT event_id, user_id, c_mktsegment, value FROM t11_enriched")


# ---------------------------------------------------------------------------
# T12 LIVE (round 5): three physically different sources in ONE pipeline —
# file topic ∪ rate topic ∪ durable-queue topic (directory commit-log with
# explicit offsets, streaming/queue_source.py) — completing the reference's
# four-bounded-subscriptions model (embedder.py:161-174) with a
# replayable-offset source shape.  Each source carries its own intake bound.
# ---------------------------------------------------------------------------

@register(
    "t12_queue_multi_source",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS id, text AS document
FROM documents WHERE doc_id < 50
UNION ALL
SELECT 'r' || CAST(r AS VARCHAR), 'rate event ' || CAST(r AS VARCHAR)
FROM range(50) t(r)
UNION ALL
SELECT 'q' || CAST(r AS VARCHAR), 'queue event ' || CAST(r AS VARCHAR)
FROM range(50) t(r)
""",
)
def q_t12_queue_multi_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE three-source union: file (maxFilesPerTrigger) ∪ rate
    (rowsPerSecond) ∪ durable queue (atomic offset-named segments,
    maxSegmentsPerTrigger) → one normalize/explode/upsert sink.  The
    restart/exactly-once half of the queue contract is pytest-proven
    (tests/test_streaming.py::test_queue_pipeline_restart_exactly_once)."""
    import json  # noqa: PLC0415
    import time  # noqa: PLC0415

    from ..operators.upsert import read_collection  # noqa: PLC0415
    from ..streaming import ingest as ING  # noqa: PLC0415
    from ..streaming import queue_source as QS  # noqa: PLC0415

    base = _tmp_base(sf_dir, "t12")
    in_dir = os.path.join(base, "in")
    log_dir = os.path.join(base, "queue")
    store = os.path.join(base, "store")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(in_dir)

    rows = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 50).select("doc_id", "text").collect())
    for fi in range(2):
        with open(os.path.join(in_dir, f"part{fi}.jsonl"), "w") as fh:
            for r in rows[fi::2]:
                msg = {"collection": "t12", "documents": [r["text"]],
                       "metadatas": [{}], "ids": [str(r["doc_id"])]}
                fh.write(json.dumps({"value": json.dumps(msg)}) + "\n")
    for seg in range(2):
        QS.append_segment(log_dir, [
            {"collection": "t12", "documents": [f"queue event {i}"],
             "metadatas": [{}], "ids": [f"q{i}"]}
            for i in range(seg * 25, (seg + 1) * 25)
        ])

    q = ING.run_multi_topic_pipeline(
        spark, in_dir, store, "t12", ckpt, default_collection="t12",
        max_files_per_trigger=1, rows_per_second=400, rate_limit_value=50,
        queue_dir=log_dir, max_segments_per_trigger=1)
    target = len(rows) + 50 + 50
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            try:
                if read_collection(spark, store, "t12").count() >= target:
                    break
            except Exception:
                pass  # store not created yet / bucket mid-swap
            # 0.15s granularity (round 16): the poll's completion check
            # overshoots by half the sleep on average, and the count job
            # itself is ~0.2s — a coarser sleep just adds dead time to
            # every batch/ completion transition
            time.sleep(0.15)
        # graceful drain before stop — same rationale as t9
        while time.time() < deadline and q.status.get("isTriggerActive"):
            time.sleep(0.05)
    finally:
        q.stop()
    q.awaitTermination(60)
    return read_collection(spark, store, "t12").select("id", "document")


@register(
    "t13_stream_index_refresh",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_WS_TOKENS.format(t='text')}) AS tok
  FROM documents WHERE doc_id < 100
),
tfs AS (
  SELECT doc_id, ({DUCK_POLY_HASH.format(t='tok')}) % 64 AS bucket,
         COUNT(*) AS tf
  FROM toks GROUP BY doc_id, bucket
),
vecs AS (
  SELECT d.doc_id,
         list(CAST(coalesce(tf, 0) AS DOUBLE) ORDER BY r.j) AS vec
  FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 100) d
  CROSS JOIN range(64) r(j)
  LEFT JOIN tfs ON tfs.doc_id = d.doc_id AND tfs.bucket = r.j
  GROUP BY d.doc_id
),
q AS (SELECT doc_id AS qid, vec AS qvec FROM vecs WHERE doc_id < 3),
pairs AS (
  SELECT q.qid, v.doc_id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec) AS a,
                                         unnest(v.vec) AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec) AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(v.vec) AS b)))),
           6) AS sim
  FROM q, vecs v
  WHERE q.qid <> v.doc_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 5
""",
)
def q_t13_stream_index_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE ingest that keeps the stored ANN index FRESH: seed the
    collection with half the docs and build the IVF index once; stream the
    other half in micro-batches whose foreachBatch does upsert →
    refresh_all_indexes — the Qdrant index-at-upsert loop end-to-end.  The
    final search runs with use_index='always' (raises if ANY batch left the
    index stale) at full probe, so the result must equal the exact kNN over
    ALL 120 hash-embedded docs — which is what the oracle recomputes."""
    import json  # noqa: PLC0415

    from ..operators.embed import hash_embed_df  # noqa: PLC0415

    base = _tmp_base(sf_dir, "t13")
    store = os.path.join(base, "store")
    in_dir = os.path.join(base, "in")
    ckpt = os.path.join(base, "ck")
    os.makedirs(in_dir)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    seed = (hash_embed_df(docs.filter(F.col("doc_id") < 60),
                          dim=64, out_col="vec")
            .select(F.col("doc_id").alias("id"), "vec"))
    upsert.create_collection(
        spark, store, "docs", df=seed, id_col="id", n_buckets=8,
        vector_config={"vec": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, store, "docs", kind="ivf",
                             n_lists=8, iters=3)

    rows = docs.filter(F.col("doc_id") >= 60).select("doc_id", "text").collect()
    for fi in range(2):
        with open(os.path.join(in_dir, f"f{fi}.jsonl"), "w") as fh:
            for r in rows[fi::2]:
                fh.write(json.dumps(
                    {"id": r["doc_id"], "text": r["text"]}) + "\n")

    schema = "id long, text string"

    def _merge(batch, _bid):
        if batch.isEmpty():
            return
        emb = (hash_embed_df(batch, text_col="text", id_col="id",
                             dim=64, out_col="vec")
               .select("id", "vec"))
        upsert.upsert(batch.sparkSession, store, "docs", emb, id_col="id")
        index.refresh_all_indexes(batch.sparkSession, store, "docs")

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1).json(in_dir)
         .writeStream.foreachBatch(_merge)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    stored = upsert.read_collection(spark, store, "docs")
    qdf = (stored.filter(F.col("id") < 3)
           .select(F.col("id").alias("qid"), F.col("vec").alias("qvec")))
    out = knn.search_collection(
        spark, store, "docs", qdf, k=5, corpus_id="id", exclude_self=True,
        use_index="always", n_probe=8)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "t14_stream_tenant_ingest",
    # final state: all 100 docs hash-embedded; corpus = tenant 'en' only;
    # exact cosine top-5 for query docs 0-2.
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_WS_TOKENS.format(t='text')}) AS tok
  FROM documents WHERE doc_id < 100
),
tfs AS (
  SELECT doc_id, ({DUCK_POLY_HASH.format(t='tok')}) % 64 AS bucket,
         COUNT(*) AS tf
  FROM toks GROUP BY doc_id, bucket
),
vecs AS (
  SELECT d.doc_id, d.lang,
         list(CAST(coalesce(tf, 0) AS DOUBLE) ORDER BY r.j) AS vec
  FROM (SELECT doc_id, lang FROM documents WHERE doc_id < 100) d
  CROSS JOIN range(64) r(j)
  LEFT JOIN tfs ON tfs.doc_id = d.doc_id AND tfs.bucket = r.j
  GROUP BY d.doc_id, d.lang
),
q AS (SELECT doc_id AS qid, vec AS qvec FROM vecs WHERE doc_id < 3),
corpus AS (SELECT doc_id, vec FROM vecs WHERE lang = 'en'),
pairs AS (
  SELECT q.qid, v.doc_id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec) AS a,
                                         unnest(v.vec) AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec) AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(v.vec) AS b)))),
           6) AS sim
  FROM q, corpus v
  WHERE q.qid <> v.doc_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 5
""",
)
def q_t14_stream_tenant_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full round-6 stack LIVE: streaming micro-batches upsert into a
    MULTITENANT collection (tenant = language, one partition level above
    the id bucket) while a PER-TENANT index on tenant 'en' stays fresh —
    each foreachBatch runs upsert → refresh_all_indexes, whose row_filter
    keeps the artifact scoped to 'en' as mixed-tenant batches land.  The
    final tenant-scoped search dispatches to the tenant's own index
    (use_index='always' raises if any batch left it stale) at full probe,
    so it must equal the exact kNN over tenant 'en' — which the oracle
    recomputes."""
    import json  # noqa: PLC0415

    from ..operators.embed import hash_embed_df  # noqa: PLC0415

    base = _tmp_base(sf_dir, "t14")
    store = os.path.join(base, "store")
    in_dir = os.path.join(base, "in")
    ckpt = os.path.join(base, "ck")
    os.makedirs(in_dir)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    seed = (hash_embed_df(docs.filter(F.col("doc_id") < 60),
                          dim=64, out_col="vec")
            .join(docs.select("doc_id", "lang"), "doc_id")
            .select(F.col("doc_id").alias("id"), "vec",
                    F.col("lang").alias("tenant")))
    upsert.create_collection(
        spark, store, "docs", df=seed, id_col="id", n_buckets=8,
        tenant_col="tenant",
        vector_config={"vec": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, store, "docs", kind="ivf",
                             n_lists=4, iters=3, tenant="en")

    rows = (docs.filter(F.col("doc_id") >= 60)
            .select("doc_id", "text", "lang").collect())
    for fi in range(2):
        with open(os.path.join(in_dir, f"f{fi}.jsonl"), "w") as fh:
            for r in rows[fi::2]:
                fh.write(json.dumps(
                    {"id": r["doc_id"], "text": r["text"],
                     "tenant": r["lang"]}) + "\n")

    schema = "id long, text string, tenant string"

    def _merge(batch, _bid):
        if batch.isEmpty():
            return
        emb = (hash_embed_df(batch, text_col="text", id_col="id",
                             dim=64, out_col="vec")
               .join(batch.select("id", "tenant"), "id")
               .select("id", "vec", "tenant"))
        upsert.upsert(batch.sparkSession, store, "docs", emb, id_col="id")
        index.refresh_all_indexes(batch.sparkSession, store, "docs")

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1).json(in_dir)
         .writeStream.foreachBatch(_merge)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    stored = upsert.read_collection(spark, store, "docs")
    qdf = (stored.filter(F.col("id") < 3)
           .select(F.col("id").alias("qid"), F.col("vec").alias("qvec")))
    out = knn.search_collection(
        spark, store, "docs", qdf, k=5, corpus_id="id", exclude_self=True,
        tenant="en", use_index="always", n_probe=4)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))
