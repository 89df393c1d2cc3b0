"""Upsert-by-id semantics (S5/S6, qdrant_embedder.py:58-62,92-103) and
as-of/range joins (J6/J7)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bob_vector_db_spark.operators import asof, upsert


def test_create_collection_idempotent(spark, tmp_path):
    root = str(tmp_path / "store")
    df = spark.createDataFrame([("a", "d1")], "id string, document string")
    assert upsert.create_collection(spark, root, "c1", df) is True
    assert upsert.create_collection(spark, root, "c1", df) is False  # qdrant_embedder.py:92


def test_upsert_replaces_by_id(spark, tmp_path):
    root = str(tmp_path / "store")
    v1 = spark.createDataFrame([("a", "old"), ("b", "keep")], "id string, document string")
    upsert.upsert(spark, root, "c", v1)
    v2 = spark.createDataFrame([("a", "new"), ("c", "added")], "id string, document string")
    merged = upsert.upsert(spark, root, "c", v2)
    rows = {r["id"]: r["document"] for r in merged.collect()}
    assert rows == {"a": "new", "b": "keep", "c": "added"}


def test_create_collection_persists_vector_config(spark, tmp_path):
    """S5: dims/metric recorded per collection (qdrant_embedder.py:95-102
    named vectors_config); sidecar invisible to spark.read.parquet."""
    root = str(tmp_path / "store")
    df = spark.createDataFrame([("a", "d1")], "id string, document string")
    cfg = {"text": {"size": 512, "distance": "cosine"},
           "image": {"size": 512, "distance": "cosine"}}
    assert upsert.create_collection(spark, root, "c1", df, vector_config=cfg)
    meta = upsert.collection_meta(root, "c1")
    assert meta["vectors"] == cfg and meta["n_buckets"] == upsert.DEFAULT_N_BUCKETS
    assert upsert.collection_meta(root, "nope") is None
    # the sidecar must not leak into the data read
    assert set(upsert.read_collection(spark, root, "c1").columns) == {"id", "document"}


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """A second upsert must leave untouched bucket directories byte-identical
    (same files, same mtimes) — the scale contract: a small batch into a huge
    collection moves only the buckets its ids hash into."""
    import os

    root = str(tmp_path / "store")
    v1 = spark.createDataFrame(
        [(f"id{i}", f"doc{i}") for i in range(64)], "id string, document string")
    upsert.upsert(spark, root, "c", v1)
    path = upsert.collection_path(root, "c")
    bucket_dirs = sorted(
        d for d in os.listdir(path) if d.startswith(upsert.BUCKET_COL + "="))
    assert len(bucket_dirs) > 1  # 64 ids spread over >1 of 16 buckets

    def snapshot():
        return {
            d: sorted((f, os.path.getmtime(os.path.join(path, d, f)))
                      for f in os.listdir(os.path.join(path, d)))
            for d in bucket_dirs
        }

    before = snapshot()
    v2 = spark.createDataFrame([("id0", "doc0-v2")], "id string, document string")
    merged = upsert.upsert(spark, root, "c", v2)
    after = snapshot()

    touched = upsert._with_bucket(v2, "id", upsert.DEFAULT_N_BUCKETS) \
        .select(upsert.BUCKET_COL).first()[0]
    touched_dir = f"{upsert.BUCKET_COL}={touched}"
    assert before[touched_dir] != after[touched_dir]
    for d in bucket_dirs:
        if d != touched_dir:
            assert before[d] == after[d], f"untouched bucket {d} was rewritten"

    rows = {r["id"]: r["document"] for r in merged.collect()}
    assert rows["id0"] == "doc0-v2" and len(rows) == 64


def test_last_write_wins(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("b", 1, "z")],
        "id string, _version int, document string")
    rows = {r["id"]: r["document"] for r in upsert.last_write_wins(df).collect()}
    assert rows == {"a": "y", "b": "z"}


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00"), "q1"), (1, _ts("2024-01-01T12:00"), "q2"),
         (2, _ts("2024-01-01T10:00"), "q3")],
        "key int, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00"), 1.0), (1, _ts("2024-01-01T11:00"), 2.0),
         (2, _ts("2024-01-01T11:00"), 3.0)],
        "key int, ts timestamp, val double")
    got = {r["tag"]: r["r_val"] for r in
           asof.asof_join(left, right, on="key", ts="ts", value_cols=["val"]).collect()}
    assert got == {"q1": 1.0, "q2": 2.0, "q3": None}


def test_asof_join_equal_ts_inclusive(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01T10:00"), "q")],
                                 "key int, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts("2024-01-01T10:00"), 5.0)],
                                  "key int, ts timestamp, val double")
    row = asof.asof_join(left, right, on="key", ts="ts", value_cols=["val"]).first()
    assert row["r_val"] == 5.0


def test_range_join_bands(spark):
    items = spark.createDataFrame([(1, 5.0), (2, 15.0), (3, 25.0)], "id int, v double")
    bands = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 20.0), ("high", 20.0, 30.0)],
        "band string, lo double, hi double")
    got = {r["id"]: r["band"] for r in asof.range_join(
        items, bands, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))).collect()}
    assert got == {1: "low", 2: "mid", 3: "high"}
