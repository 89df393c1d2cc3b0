"""Store lifecycle beyond upsert: delete / compaction / catalog (the twin
half of Qdrant's upload_points at qdrant_embedder.py:58-62, and the
enumerate/drop implied by chroma_embedder.py:30-32), plus metric-aware
search driven by the persisted vectors_config (qdrant_embedder.py:95-102).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bob_vector_db_spark.operators import knn, upsert


def _mk(spark, root, name="c", n=64, n_buckets=8):
    df = spark.createDataFrame(
        [(f"id{i}", f"doc{i}", i % 4) for i in range(n)],
        "id string, document string, grp int")
    upsert.create_collection(spark, root, name, df=df, n_buckets=n_buckets)
    return df


def _fake_index(root, collection, built_version=0):
    """A minimal index meta sidecar — enough for ``_has_live_index``, so
    delta publishing has a consumer (the skip-without-consumer fast path
    stands down) without paying a real index build in lifecycle tests."""
    import json  # noqa: PLC0415

    p = os.path.join(upsert.collection_path(root, collection),
                     "_index", "probe")
    os.makedirs(p, exist_ok=True)
    with open(os.path.join(p, "meta.json"), "w") as fh:
        json.dump({"kind": "payload", "column": "grp",
                   "built_version": built_version}, fh)


def _bucket_snapshot(path):
    out = {}
    for d in os.listdir(path):
        if not d.startswith(upsert.BUCKET_COL + "="):
            continue
        full = os.path.join(path, d)
        out[d] = sorted(
            (f, os.path.getmtime(os.path.join(full, f)))
            for f in os.listdir(full) if not f.startswith("_"))
    return out


def test_delete_points_list_and_count(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk(spark, root)
    removed = upsert.delete_points(spark, root, "c", ["id0", "id1", "nope"])
    assert removed == 2
    ids = {r["id"] for r in upsert.read_collection(spark, root, "c").collect()}
    assert "id0" not in ids and "id1" not in ids and len(ids) == 62


def test_delete_points_dataframe_form(spark, tmp_path):
    root = str(tmp_path / "store")
    df = _mk(spark, root)
    doomed = df.filter(F.col("grp") == 0).select("id")
    removed = upsert.delete_points(spark, root, "c", doomed)
    assert removed == 16
    left = upsert.read_collection(spark, root, "c")
    assert left.filter(F.col("grp") == 0).count() == 0
    assert left.count() == 48


def test_delete_points_touches_only_owning_buckets(spark, tmp_path):
    """Scale contract: deleting a few ids must leave every bucket that holds
    none of them byte-identical (same files, same mtimes)."""
    root = str(tmp_path / "store")
    _mk(spark, root)
    path = upsert.collection_path(root, "c")
    before = _bucket_snapshot(path)
    upsert.delete_points(spark, root, "c", ["id0"])
    after = _bucket_snapshot(path)
    changed = [b for b in before if after.get(b) != before[b]]
    assert len(changed) == 1  # exactly the bucket id0 hashes into


def test_delete_by_filter(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk(spark, root)
    removed = upsert.delete_by_filter(spark, root, "c", "grp = 3")
    assert removed == 16
    left = upsert.read_collection(spark, root, "c")
    assert left.filter("grp = 3").count() == 0 and left.count() == 48
    # no-match filter is a no-op that opens no bucket
    assert upsert.delete_by_filter(spark, root, "c", "grp = 99") == 0


def test_delete_all_rows_drops_bucket_dirs(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk(spark, root, n=8, n_buckets=2)
    removed = upsert.delete_by_filter(spark, root, "c", "grp >= 0")
    assert removed == 8
    path = upsert.collection_path(root, "c")
    assert not [d for d in os.listdir(path)
                if d.startswith(upsert.BUCKET_COL + "=")]


def test_compaction_reduces_files_identical_readback(spark, tmp_path):
    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(f"id{i}", f"doc{i}") for i in range(64)], "id string, document string")
    # a wide (8-task) partitioned write leaves up to 8 files per bucket —
    # the same growth shape a parallel upsert's staging write produces
    upsert.create_collection(spark, root, "c", df=df.repartition(8),
                             n_buckets=4)
    before = {(r["id"], r["document"])
              for r in upsert.read_collection(spark, root, "c").collect()}
    stats = upsert.compact_collection(spark, root, "c")
    assert stats["files_after"] < stats["files_before"]
    assert stats["n_rows"] == 64
    after = {(r["id"], r["document"])
             for r in upsert.read_collection(spark, root, "c").collect()}
    assert after == before


def test_catalog_list_drop_and_meta_stability(spark, tmp_path):
    root = str(tmp_path / "store")
    upsert.create_collection(spark, root, "a", n_buckets=4)
    upsert.create_collection(
        spark, root, "b",
        vector_config={"text": {"size": 8, "distance": "dot"}})
    # idempotent re-create must NOT clobber the persisted layout
    upsert.create_collection(spark, root, "a", n_buckets=99)
    metas = {m["collection"]: m for m in upsert.list_collections(root)}
    assert set(metas) == {"a", "b"}
    assert metas["a"]["n_buckets"] == 4
    assert metas["b"]["vectors"]["text"]["distance"] == "dot"
    assert upsert.drop_collection(root, "a") is True
    assert upsert.drop_collection(root, "a") is False
    assert [m["collection"] for m in upsert.list_collections(root)] == ["b"]


def test_search_collection_uses_declared_metric(spark, tmp_path):
    """A collection declaring "dot" must rank by raw dot product — with
    deliberately non-unit vectors, that ordering differs from cosine."""
    root = str(tmp_path / "store")
    corpus = spark.createDataFrame(
        [("big", [10.0, 0.1]), ("aligned", [0.0, 1.0]), ("small", [0.1, 0.2])],
        "id string, embedding array<double>")
    upsert.create_collection(
        spark, root, "v", df=corpus,
        vector_config={"embedding": {"size": 2, "distance": "dot"}})
    q = spark.createDataFrame([(0, [0.0, 1.0])],
                              "qid long, qvec array<double>")
    got = knn.search_collection(spark, root, "v", q, k=3, corpus_id="id")
    ranked = [r["vec_id"] for r in got.orderBy("rank").collect()]
    # dot: aligned=1.0 > small=0.2 > big=0.1; cosine would put aligned then
    # small(≈0.894) then big(≈0.01) too, but with q=[1,0] they invert — use
    # a second query to pin the metric distinction
    assert ranked[0] == "aligned"
    q2 = spark.createDataFrame([(1, [1.0, 0.0])],
                               "qid long, qvec array<double>")
    got2 = knn.search_collection(spark, root, "v", q2, k=3, corpus_id="id")
    ranked2 = [r["vec_id"] for r in got2.orderBy("rank").collect()]
    assert ranked2[0] == "big"  # dot=10 wins; cosine would tie big≈1.0 too
    # explicit override beats the declared metric
    got3 = knn.search_collection(spark, root, "v", q2, k=3, corpus_id="id",
                                 metric="euclid")
    ranked3 = [r["vec_id"] for r in got3.orderBy("rank").collect()]
    assert ranked3[0] == "small"  # nearest by L2 to [1,0]


def test_search_collection_euclid_ranks_ascending(spark, tmp_path):
    root = str(tmp_path / "store")
    corpus = spark.createDataFrame(
        [("near", [1.0, 1.0]), ("far", [9.0, 9.0]), ("mid", [3.0, 3.0])],
        "id string, embedding array<double>")
    upsert.create_collection(
        spark, root, "v", df=corpus,
        vector_config={"embedding": {"size": 2, "distance": "euclid"}})
    q = spark.createDataFrame([(0, [0.0, 0.0])], "qid long, qvec array<double>")
    got = knn.search_collection(spark, root, "v", q, k=3, corpus_id="id")
    assert [r["vec_id"] for r in got.orderBy("rank").collect()] == \
        ["near", "mid", "far"]


def test_resolve_metric_aliases_and_rejects_unknown():
    assert knn.resolve_metric("Cosine") == "cosine"
    assert knn.resolve_metric("IP") == "dot"
    assert knn.resolve_metric("L2") == "euclid"
    # round 10: Distance.MANHATTAN is the fourth declared metric
    assert knn.resolve_metric("Manhattan") == "manhattan"
    assert knn.resolve_metric("l1") == "manhattan"
    with pytest.raises(ValueError, match="unknown distance metric"):
        knn.resolve_metric("chebyshev")


def test_multi_topic_pipeline_backpressure(spark, tmp_path):
    """Live S8/T9: file topic (maxFilesPerTrigger=2 over 4 files) ∪ rate
    topic under a rowsPerSecond cap → one upsert sink.  Asserts the file
    side really was split into ≥2 micro-batches (the backpressure bound)
    and the store converges to the deterministic union."""
    import json
    import time

    from bob_vector_db_spark.streaming import ingest as ING

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for fi in range(4):
        with open(in_dir / f"f{fi}.jsonl", "w") as fh:
            for i in range(fi * 5, fi * 5 + 5):
                msg = {"collection": "t", "documents": [f"d{i}"],
                       "metadatas": [{}], "ids": [f"f{i}"]}
                fh.write(json.dumps({"value": json.dumps(msg)}) + "\n")

    store = str(tmp_path / "store")
    q = ING.run_multi_topic_pipeline(
        spark, str(in_dir), store, "t", str(tmp_path / "ck"),
        default_collection="t", max_files_per_trigger=2,
        rows_per_second=50, rate_limit_value=20)
    target = 20 + 20
    deadline = time.time() + 90
    try:
        while time.time() < deadline:
            try:
                if upsert.read_collection(spark, store, "t").count() >= target:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        # rows become visible at the bucket swap INSIDE a micro-batch, i.e.
        # before that batch's progress event posts (the delta-log append
        # still runs after the swap) — drain the in-flight trigger so
        # recentProgress reflects every batch that moved the data
        while time.time() < deadline and q.status.get("isTriggerActive"):
            time.sleep(0.2)
        progresses = q.recentProgress
    finally:
        q.stop()
    q.awaitTermination(30)
    rows = {r["id"]: r["document"]
            for r in upsert.read_collection(spark, store, "t").collect()}
    assert {f"f{i}" for i in range(20)} <= set(rows)
    assert {f"r{i}" for i in range(20)} <= set(rows)
    assert rows["r3"] == "rate event 3" and rows["f7"] == "d7"
    # ≥2 micro-batches moved data: 4 files under maxFilesPerTrigger=2 cannot
    # drain in one batch
    non_empty = [p for p in progresses if p["numInputRows"] > 0]
    assert len(non_empty) >= 2


def test_update_columns_patches_only_carried_columns(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk(spark, root)  # id, document, grp
    patch = spark.createDataFrame(
        [("id3", 99), ("id7", 99)], "id string, grp int")
    upsert.update_columns(spark, root, "c", patch)
    rows = {r["id"]: (r["document"], r["grp"])
            for r in upsert.read_collection(spark, root, "c").collect()}
    assert rows["id3"] == ("doc3", 99)   # grp patched, document preserved
    assert rows["id7"] == ("doc7", 99)
    assert rows["id4"] == ("doc4", 0)    # untargeted id untouched
    assert len(rows) == 64


def test_update_columns_touches_only_owning_buckets(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk(spark, root)
    path = upsert.collection_path(root, "c")
    before = _bucket_snapshot(path)
    upsert.update_columns(
        spark, root, "c",
        spark.createDataFrame([("id0", 42)], "id string, grp int"))
    after = _bucket_snapshot(path)
    changed = [b for b in before if after.get(b) != before[b]]
    assert len(changed) == 1


def test_update_columns_explicit_null_overwrites(spark, tmp_path):
    """A NULL carried by the patch SETS null (set_payload semantics), it is
    not treated as absent."""
    root = str(tmp_path / "store")
    _mk(spark, root)
    patch = spark.createDataFrame(
        [("id1", None)], "id string, grp int")
    upsert.update_columns(spark, root, "c", patch)
    row = [r for r in upsert.read_collection(spark, root, "c").collect()
           if r["id"] == "id1"][0]
    assert row["grp"] is None and row["document"] == "doc1"


def test_update_columns_rejects_unknown_column(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk(spark, root)
    patch = spark.createDataFrame([("id0", 1)], "id string, brand_new int")
    with pytest.raises(ValueError, match="brand_new"):
        upsert.update_columns(spark, root, "c", patch)


def test_delete_by_filter_null_predicate_rows_survive(spark, tmp_path):
    """Three-valued logic: rows where the predicate is NULL did not match
    and must NOT be deleted."""
    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [("a", "de"), ("b", None), ("c", "en")], "id string, lang string")
    upsert.create_collection(spark, root, "c", df=df, n_buckets=2)
    removed = upsert.delete_by_filter(spark, root, "c", "lang = 'de'")
    assert removed == 1
    ids = {r["id"] for r in upsert.read_collection(spark, root, "c").collect()}
    assert ids == {"b", "c"}  # the NULL-lang row survived


def test_update_columns_rejects_duplicate_patch_ids(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk(spark, root)
    patch = spark.createDataFrame(
        [("id3", 1), ("id3", 2)], "id string, grp int")
    with pytest.raises(ValueError, match="duplicate id"):
        upsert.update_columns(spark, root, "c", patch)


def test_upsert_created_store_records_layout(spark, tmp_path):
    """A store born from upsert() (no create_collection) must still write
    the meta sidecar, so delete/update hash with the TRUE bucket count."""
    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(f"id{i}", f"d{i}") for i in range(32)], "id string, document string")
    upsert.upsert(spark, root, "c", df, n_buckets=4)
    meta = upsert.collection_meta(root, "c")
    assert meta is not None and meta["n_buckets"] == 4
    removed = upsert.delete_points(spark, root, "c",
                                   [f"id{i}" for i in range(32)])
    assert removed == 32  # every id found in its true bucket


def test_delete_refuses_metaless_store(spark, tmp_path):
    """An externally-assembled directory with no layout record must be
    rejected, not guessed at (wrong bucket count = silent misses)."""
    import shutil

    root = str(tmp_path / "store")
    _mk(spark, root)
    os.remove(os.path.join(upsert.collection_path(root, "c"),
                           upsert.META_FILE))
    with pytest.raises(ValueError, match="no .*sidecar|layout is unknown"):
        upsert.delete_points(spark, root, "c", ["id0"])
    shutil.rmtree(root)


def test_compaction_files_per_bucket_spreads_files(spark, tmp_path):
    """files_per_bucket > 1 must actually spread each bucket's rows over
    that many files (salted repartition key), with identical readback."""
    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(f"id{i}", i) for i in range(400)], "id string, v long")
    upsert.create_collection(spark, root, "c", df=df, n_buckets=4)
    before = {r["id"]: r["v"]
              for r in upsert.read_collection(spark, root, "c").collect()}
    stats = upsert.compact_collection(spark, root, "c", files_per_bucket=2)
    # 4 buckets × 2 files; salting is hash-based so allow one collision short
    assert stats["files_after"] > 4
    assert stats["files_after"] <= 8
    after = {r["id"]: r["v"]
             for r in upsert.read_collection(spark, root, "c").collect()}
    assert after == before


def test_collection_version_bumps_on_mutations_not_compaction(spark, tmp_path):
    """Every data mutation bumps the meta version; compaction (identical
    content) does not — the staleness signal persisted indexes key on."""
    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(f"id{i}", i) for i in range(40)], "id string, v long")
    upsert.create_collection(spark, root, "c", df=df, n_buckets=4)
    assert upsert.collection_version(root, "c") == 0
    upsert.upsert(spark, root, "c", spark.createDataFrame(
        [("id1", 99)], "id string, v long"))
    assert upsert.collection_version(root, "c") == 1
    upsert.delete_points(spark, root, "c", ["id2"])
    assert upsert.collection_version(root, "c") == 2
    upsert.update_columns(spark, root, "c", spark.createDataFrame(
        [("id3", -1)], "id string, v long"))
    assert upsert.collection_version(root, "c") == 3
    upsert.delete_by_filter(spark, root, "c", "v = 5")
    assert upsert.collection_version(root, "c") == 4
    upsert.compact_collection(spark, root, "c")
    assert upsert.collection_version(root, "c") == 4


def test_recover_collection_restores_stranded_buckets(spark, tmp_path):
    """A crash between the two swap renames leaves a bucket only in its
    __old trash; recover_collection restores it, removes completed-swap
    leftovers, and clears orphaned staging dirs."""
    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(f"id{i}", i) for i in range(80)], "id string, v long")
    upsert.create_collection(spark, root, "c", df=df, n_buckets=4)
    before = {r["id"]: r["v"]
              for r in upsert.read_collection(spark, root, "c").collect()}
    path = upsert.collection_path(root, "c")
    buckets = sorted(d for d in os.listdir(path)
                     if d.startswith(upsert.BUCKET_COL + "="))
    # crash shape 1: bucket renamed to __old, staged copy never swapped in
    os.rename(os.path.join(path, buckets[0]),
              os.path.join(path, buckets[0] + "__old"))
    # crash shape 2: swap completed but trash cleanup didn't run
    import shutil
    shutil.copytree(os.path.join(path, buckets[1]),
                    os.path.join(path, buckets[1] + "__old"))
    # crash shape 3: orphaned staging tree
    os.makedirs(path + "__staging/junk")
    assert "c__staging" not in [m["collection"]
                                for m in upsert.list_collections(root)]
    restored = upsert.recover_collection(root, "c")
    assert restored == [int(buckets[0].split("=")[1])]
    assert not os.path.exists(os.path.join(path, buckets[0] + "__old"))
    assert not os.path.exists(os.path.join(path, buckets[1] + "__old"))
    assert not os.path.exists(path + "__staging")
    after = {r["id"]: r["v"]
             for r in upsert.read_collection(spark, root, "c").collect()}
    assert after == before
    assert upsert.recover_collection(root, "c") == []  # clean store: no-op


def test_delta_log_records_every_mutation(spark, tmp_path):
    """Each mutation appends (version, op, id) rows: the incremental-index
    feed.  Ops classify correctly and versions line up with the meta
    counter; read_delta windows on (since, current].  An index artifact
    exists throughout — without one the log has no consumer and mutations
    skip the publish (covered by test_compaction_prunes_absorbed_delta)."""
    root = str(tmp_path / "store")
    _mk(spark, root, n=16, n_buckets=4)
    _fake_index(root, "c")
    upsert.upsert(spark, root, "c", spark.createDataFrame(
        [("id1", "rewritten", 9), ("idNEW", "fresh", 0)],
        "id string, document string, grp int"))          # v1
    upsert.delete_points(spark, root, "c", ["id2", "id3"])   # v2
    upsert.update_columns(spark, root, "c", spark.createDataFrame(
        [("id4", "patched")], "id string, document string"))  # v3
    upsert.delete_by_filter(spark, root, "c", F.col("grp") == 3)  # v4
    assert upsert.collection_version(root, "c") == 4

    delta = upsert.read_delta(spark, root, "c", 0)
    got = {(r["version"], r["op"], r["id"]) for r in delta.collect()}
    assert (1, "upsert", "id1") in got and (1, "upsert", "idNEW") in got
    assert (2, "delete", "id2") in got and (2, "delete", "id3") in got
    assert (3, "upsert", "id4") in got
    # grp==3 ids: id3, id7, id11, id15 — id3 was already deleted at v2, so
    # only the still-present ones are logged at v4
    v4 = {i for v, op, i in got if v == 4}
    assert v4 == {"id7", "id11", "id15"}
    # windowing
    assert {r["version"] for r in
            upsert.read_delta(spark, root, "c", 2).collect()} == {3, 4}


def test_compaction_prunes_absorbed_delta(spark, tmp_path):
    """With no index artifacts the log has no consumer: mutations skip the
    publish entirely (``delta_pruned_to`` advances in its place — byte-for-
    byte the state a prune-after-absorb leaves), read_delta refuses to
    answer across the gap (None → callers rebuild), and compaction has
    nothing to sweep.  Once an index artifact exists, mutations publish
    again and their windows are answerable."""
    root = str(tmp_path / "store")
    _mk(spark, root, n=16, n_buckets=4)
    upsert.delete_points(spark, root, "c", ["id1"])      # v1 — skipped
    path = upsert.collection_path(root, "c")
    assert upsert._published_delta_versions(path) == []  # no write job paid
    meta = upsert.collection_meta(root, "c")
    assert meta["delta_pruned_to"] == 1
    assert upsert.read_delta(spark, root, "c", 0) is None
    upsert.compact_collection(spark, root, "c")
    assert upsert.collection_version(root, "c") == 1  # compaction: no bump
    # an index artifact turns publishing back on
    _fake_index(root, "c", built_version=1)
    upsert.delete_points(spark, root, "c", ["id2"])      # v2 — published
    d = upsert.read_delta(spark, root, "c", 1)
    assert [(r["op"], r["id"]) for r in d.collect()] == [("delete", "id2")]


def test_compaction_keeps_delta_an_index_still_needs(spark, tmp_path):
    """An index built at version v pins deltas > v: compaction may prune
    only what EVERY live index has absorbed, so a later incremental
    refresh still has its feed."""
    from bob_vector_db_spark.operators import index

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0, 0.5]) for i in range(64)],
        "id int, embedding array<double>")
    upsert.create_collection(spark, root, "v", df=df, id_col="id",
                             n_buckets=4,
                             vector_config={"embedding": {
                                 "size": 4, "distance": "cosine"}})
    index.build_vector_index(spark, root, "v", kind="ivf",
                             n_lists=4, iters=2)      # built at v0
    upsert.delete_points(spark, root, "v", [1, 2])    # v1
    upsert.compact_collection(spark, root, "v")       # may prune <= 0 only
    assert upsert.collection_meta(root, "v").get("delta_pruned_to", 0) == 0
    # the refresh still works on the preserved delta
    index.refresh_vector_index(spark, root, "v")
    assert index.index_is_fresh(root, "v", "embedding")
    # now everything is absorbed — compaction can empty the log
    upsert.compact_collection(spark, root, "v")
    assert upsert.collection_meta(root, "v")["delta_pruned_to"] == 1


def test_snapshot_is_immune_to_later_mutations(spark, tmp_path):
    """Hardlink snapshots rely on the store's files being immutable: every
    mutation writes NEW files and unlinks old ones.  Mutate hard after the
    snapshot — delete, upsert, update, compact, delta prune — then restore:
    the exact pre-snapshot rows come back, including meta/version state."""
    root = str(tmp_path / "store")
    _mk(spark, root, n=32, n_buckets=4)
    before = sorted(map(tuple,
                        upsert.read_collection(spark, root, "c").collect()))
    v0 = upsert.collection_version(root, "c")
    path = upsert.snapshot_collection(root, "c", name="s1")
    assert upsert.list_snapshots(root) == ["s1"]

    upsert.delete_points(spark, root, "c", [f"id{i}" for i in range(10)])
    upsert.upsert(spark, root, "c", spark.createDataFrame(
        [("id3", "mutated", 0), ("idX", "new", 1)],
        "id string, document string, grp int"))
    upsert.update_columns(spark, root, "c", spark.createDataFrame(
        [("id20", "patched")], "id string, document string"))
    upsert.compact_collection(spark, root, "c")

    upsert.restore_collection(root, "c", "s1")
    after = sorted(map(tuple,
                       upsert.read_collection(spark, root, "c").collect()))
    assert after == before
    assert upsert.collection_version(root, "c") == v0
    # restoring again still works (snapshot survives restore)
    upsert.restore_collection(root, "c", "s1")
    assert os.path.isdir(path)
    assert upsert.drop_snapshot(root, "s1")
    assert upsert.list_snapshots(root) == []


def test_snapshot_captures_indexes_and_delta(spark, tmp_path):
    """The snapshot is the FULL point-in-time tree: a restored collection
    comes back with its index artifact fresh and searchable, and its delta
    log consistent with the meta version."""
    from bob_vector_db_spark.operators import index

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 13) for j in range(8)]) for i in range(64)],
        "id int, embedding array<double>")
    upsert.create_collection(
        spark, root, "v", df=df, id_col="id", n_buckets=4,
        vector_config={"embedding": {"size": 8, "distance": "cosine"}})
    index.build_vector_index(spark, root, "v", kind="ivf", n_lists=4, iters=2)
    upsert.snapshot_collection(root, "v", name="s1")
    # poison the live state: mutate and leave the index stale
    upsert.delete_points(spark, root, "v", list(range(20)))
    assert not index.index_is_fresh(root, "v", "embedding")
    upsert.restore_collection(root, "v", "s1")
    assert index.index_is_fresh(root, "v", "embedding")
    q = spark.createDataFrame(
        [(0, [float(j % 13) for j in range(8)])],
        "qid int, qvec array<double>")
    out = index.search_indexed(spark, root, "v", q, k=5, n_probe=4)
    assert out.count() == 5


def test_snapshot_refuses_overwrite_and_missing(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk(spark, root, n=8, n_buckets=2)
    upsert.snapshot_collection(root, "c", name="s1")
    with pytest.raises(ValueError, match="already exists"):
        upsert.snapshot_collection(root, "c", name="s1")
    with pytest.raises(ValueError, match="no snapshot"):
        upsert.restore_collection(root, "c", "nope")
    with pytest.raises(ValueError, match="does not exist"):
        upsert.snapshot_collection(root, "ghost")


def test_aliases_resolve_transparently_and_guard(spark, tmp_path):
    """Alias CRUD + the namespace guards: every store op goes through the
    alias to its target; creating/dropping THROUGH an alias is refused."""
    root = str(tmp_path / "store")
    _mk(spark, root, name="v1", n=16, n_buckets=2)
    upsert.create_alias(root, "live", "v1")
    assert upsert.list_aliases(root) == {"live": "v1"}
    # reads and mutations through the alias hit the target
    assert upsert.read_collection(spark, root, "live").count() == 16
    upsert.delete_points(spark, root, "live", ["id0"])
    assert upsert.read_collection(spark, root, "v1").count() == 15
    assert upsert.collection_version(root, "live") == \
        upsert.collection_version(root, "v1") == 1
    # guards
    with pytest.raises(ValueError, match="alias"):
        upsert.create_collection(spark, root, "live", n_buckets=2)
    with pytest.raises(ValueError, match="alias"):
        upsert.drop_collection(root, "live")
    with pytest.raises(ValueError, match="existing collection"):
        upsert.create_alias(root, "v1", "v1")
    with pytest.raises(ValueError, match="does not exist"):
        upsert.create_alias(root, "x", "ghost")
    # repoint + delete
    _mk(spark, root, name="v2", n=8, n_buckets=2)
    upsert.create_alias(root, "live", "v2")
    assert upsert.read_collection(spark, root, "live").count() == 8
    assert upsert.delete_alias(root, "live") is True
    assert upsert.delete_alias(root, "live") is False


def test_delta_publish_is_version_authority_after_crash(spark, tmp_path):
    """Crash matrix of the publish → swap → commit order: a delta that
    published without its meta bump still advances collection_version (the
    index can never look fresh across it), and a refresh over that adopted
    version converges instead of corrupting."""
    from bob_vector_db_spark.operators import index

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, [float((i * 3 + j) % 5) for j in range(4)]) for i in range(40)],
        "id int, embedding array<double>")
    upsert.create_collection(
        spark, root, "v", df=df, id_col="id", n_buckets=4,
        vector_config={"embedding": {"size": 4, "distance": "cosine"}})
    index.build_vector_index(spark, root, "v", kind="ivf", n_lists=4, iters=2)
    # simulate "published delta, crashed before swap+bump": publish a delta
    # for an upsert of ids that (still) hold their current rows
    path = upsert.collection_path(root, "v")
    ids_df = spark.createDataFrame([("1",), ("2",)], "id string")
    upsert._log_delta(path, 1, "upsert", ids_df)
    assert upsert.collection_version(root, "v") == 1  # adopted
    assert not index.index_is_fresh(root, "v", "embedding")
    # refresh absorbs the adopted delta: re-reads ids 1,2's CURRENT rows
    index.refresh_vector_index(spark, root, "v")
    assert index.index_is_fresh(root, "v", "embedding")
    q = spark.createDataFrame([(0, [1.0, 2.0, 1.0, 0.0])],
                              "qid int, qvec array<double>")
    from bob_vector_db_spark.operators import knn
    full = knn.search_collection(spark, root, "v", q, k=5, corpus_id="id",
                                 use_index="always")
    exact = knn.search_collection(spark, root, "v", q, k=5, corpus_id="id",
                                  use_index=False)
    assert sorted(map(tuple, full.collect())) == \
        sorted(map(tuple, exact.collect()))
    # the next real mutation does NOT collide with the adopted version
    upsert.delete_points(spark, root, "v", [3])
    assert upsert.collection_version(root, "v") == 2


def test_delta_log_hole_forces_rebuild_not_silent_fresh(spark, tmp_path):
    """A version counter that moved without its delta dir (externally
    damaged log) must make read_delta return None and refresh raise —
    never a silent nothing-changed refresh that reports fresh."""
    import shutil as _sh

    from bob_vector_db_spark.operators import index

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(20)],
        "id int, embedding array<double>")
    upsert.create_collection(
        spark, root, "v", df=df, id_col="id", n_buckets=2,
        vector_config={"embedding": {"size": 2, "distance": "cosine"}})
    index.build_vector_index(spark, root, "v", kind="ivf", n_lists=2, iters=2)
    upsert.delete_points(spark, root, "v", [1])
    # damage: remove the published delta dir but leave the version bump
    path = upsert.collection_path(root, "v")
    _sh.rmtree(os.path.join(path, upsert.DELTA_DIR, "v=1"))
    assert upsert.read_delta(spark, root, "v", 0) is None
    with pytest.raises(ValueError, match="delta log"):
        index.refresh_vector_index(spark, root, "v")


def test_recover_collection_repairs_crashed_restore(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk(spark, root, n=12, n_buckets=2)
    path = upsert.collection_path(root, "c")
    # simulate restore_collection dying between its two renames: live dir
    # moved to trash, staging never swung in
    os.rename(path, path + "__old")
    with pytest.raises(Exception):  # live dir is gone — reads must fail
        upsert.read_collection(spark, root, "c").count()
    assert "c__old" not in [m["collection"]
                            for m in upsert.list_collections(root)]
    upsert.recover_collection(root, "c")
    assert upsert.read_collection(spark, root, "c").count() == 12


def test_queue_append_claims_offsets_exclusively(tmp_path):
    from bob_vector_db_spark.streaming import queue_source as QS

    log = str(tmp_path / "log")
    o1 = QS.append_segment(log, [{"a": 1}])
    # squat the next offset the way a racing producer would
    with open(os.path.join(log, f"segment-{o1 + 1:08d}.jsonl"), "w") as fh:
        fh.write('{"value": "{}"}\n')
    o2 = QS.append_segment(log, [{"b": 2}])
    assert o2 == o1 + 2  # lost the race at o1+1, retried, never clobbered
    with open(os.path.join(log, f"segment-{o1 + 1:08d}.jsonl")) as fh:
        assert fh.read() == '{"value": "{}"}\n'  # squatter intact


def test_prune_never_regresses_an_adopted_version(spark, tmp_path):
    """Review regression: compaction pruning an adopted (published-but-
    never-committed) delta version must fold it into the meta counter
    first — otherwise the next mutation would REUSE the version number and
    a stale index would report fresh."""
    root = str(tmp_path / "store")
    _mk(spark, root, n=8, n_buckets=2)  # created at version 0
    _fake_index(root, "c")  # a consumer, so the publish actually happens
    path = upsert.collection_path(root, "c")
    # simulate a crash-adopted mutation: published delta, no meta bump
    upsert._log_delta(path, 1, "upsert",
                      spark.createDataFrame([("id1",)], "id string"))
    assert upsert.collection_version(root, "c") == 1
    upsert.prune_delta_log(spark, root, "c", 1)  # retire the delta dir
    assert upsert.collection_version(root, "c") == 1  # NOT back to 0
    upsert.delete_points(spark, root, "c", ["id2"])
    assert upsert.collection_version(root, "c") == 2  # fresh number


def test_reserved_collection_names_rejected(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk(spark, root, n=4, n_buckets=2)
    for bad in ("c__old", "x__staging", "y__restore_staging", "z__pending"):
        with pytest.raises(ValueError, match="reserved"):
            upsert.create_collection(spark, root, bad, n_buckets=2)
    with pytest.raises(ValueError, match="reserved"):
        upsert.create_alias(root, "a__old", "c")


def test_reserved_suffix_guard_covers_every_entry_point(spark, tmp_path):
    """The guard lives at collection_path — the choke point — so even
    upsert's implicit create (which bypasses create_collection) and
    snapshot names can never address a swap-trash/staging name."""
    root = str(tmp_path / "store")
    _mk(spark, root, n=4, n_buckets=2)
    rows = spark.createDataFrame([("a", "d", 0)],
                                 "id string, document string, grp int")
    with pytest.raises(ValueError, match="reserved"):
        upsert.upsert(spark, root, "c__old", rows)
    with pytest.raises(ValueError, match="reserved"):
        upsert.read_collection(spark, root, "c__pending")
    with pytest.raises(ValueError, match="reserved"):
        upsert.snapshot_collection(root, "c", name="x__staging")


def test_upsert_into_emptied_store_preserves_artifacts(spark, tmp_path):
    """A delete-all-points → upsert cycle lands in the empty-store branch;
    it must NOT overwrite the collection root — _delta/, _index/ and the
    meta sidecar survive, the version keeps advancing, and a later refresh
    absorbs the whole history."""
    from bob_vector_db_spark.operators import index

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(f"id{i}", [float(i % 5), 1.0, float(i % 3)]) for i in range(16)],
        "id string, embedding array<double>")
    upsert.create_collection(
        spark, root, "c", df=df, n_buckets=2,
        vector_config={"embedding": {"size": 3, "distance": "cosine"}})
    index.build_vector_index(spark, root, "c", n_lists=2)
    v0 = upsert.collection_version(root, "c")

    upsert.delete_by_filter(spark, root, "c", "id is not null")
    fresh = spark.createDataFrame(
        [(f"new{i}", [1.0, float(i), 0.0]) for i in range(6)],
        "id string, embedding array<double>")
    upsert.upsert(spark, root, "c", fresh)

    # artifacts survived the cycle
    path = upsert.collection_path(root, "c")
    assert os.path.isdir(os.path.join(path, "_index", "embedding"))
    assert os.path.isdir(os.path.join(path, "_delta"))
    meta = upsert.collection_meta(root, "c")
    assert meta is not None and meta["vectors"]  # vector_config intact
    assert upsert.collection_version(root, "c") == v0 + 2

    # the surviving delta log lets the index refresh instead of rebuild
    index.refresh_vector_index(spark, root, "c")
    q = spark.createDataFrame([(0, [1.0, 2.0, 0.0])],
                              "qid long, qvec array<double>")
    hits = {r["vec_id"] for r in
            index.search_indexed(spark, root, "c", q, k=20,
                                 n_probe=None).collect()}
    assert hits == {f"new{i}" for i in range(6)}


def test_recover_ignores_sidecar_trash(spark, tmp_path):
    """recover_collection repairs BUCKET swap trash only: an
    `_index/<name>__old` left by a crashed index swap belongs to the index
    machinery's own staged-replace and must survive recovery untouched
    (the old walk-everything version crashed parsing it as a bucket id)."""
    root = str(tmp_path / "store")
    _mk(spark, root, n=8, n_buckets=2)
    path = upsert.collection_path(root, "c")
    # crashed index swap: trash next to a live artifact
    idx = os.path.join(path, "_index", "vec_embedding")
    os.makedirs(idx)
    trash = idx + "__old"
    os.makedirs(trash)
    with open(os.path.join(trash, "meta.json"), "w") as fh:
        fh.write("{}")
    # plus real bucket trash with its live dir missing
    bucket = next(e for e in os.listdir(path)
                  if e.startswith(upsert.BUCKET_COL + "="))
    os.rename(os.path.join(path, bucket), os.path.join(path, bucket + "__old"))
    restored = upsert.recover_collection(root, "c")
    assert restored == [int(bucket.split("=")[1])]
    assert os.path.isdir(trash)  # index trash untouched
    assert os.path.isdir(os.path.join(path, bucket))
    assert upsert.read_collection(spark, root, "c").count() == 8


def test_batch_update_sequencing_and_errors(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk(spark, root, n=16, n_buckets=4)
    # upsert then delete THE SAME id in one batch: later op wins
    up = spark.createDataFrame([("id1", "fresh", 9)],
                               "id string, document string, grp int")
    versions = upsert.batch_update_points(spark, root, "c", [
        ("upsert", up), ("delete", ["id1"])])
    assert versions == [1, 2]
    ids = {r["id"] for r in upsert.read_collection(spark, root, "c").collect()}
    assert "id1" not in ids and len(ids) == 15
    with pytest.raises(ValueError, match="unknown kind"):
        upsert.batch_update_points(spark, root, "c", [("truncate", None)])
    with pytest.raises(ValueError, match="must be a .kind, arg. tuple"):
        upsert.batch_update_points(spark, root, "c", ["upsert"])


def test_collection_info_reports_freshness(spark, tmp_path):
    from bob_vector_db_spark.operators import index

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0, 0.5]) for i in range(64)],
        "id int, embedding array<double>")
    upsert.create_collection(spark, root, "v", df=df, id_col="id",
                             n_buckets=4,
                             vector_config={"embedding": {
                                 "size": 4, "distance": "cosine"}})
    index.build_vector_index(spark, root, "v", kind="ivf", n_lists=2,
                             iters=2)
    info = upsert.collection_info(spark, root, "v")
    assert info["points_count"] == 64 and info["version"] == 0
    assert info["tenant_col"] is None
    assert info["vectors"]["embedding"]["distance"] == "cosine"
    assert len(info["indexes"]) == 1 and info["indexes"][0]["fresh"]
    # a mutation makes the index stale in the report
    upsert.delete_points(spark, root, "v", [0])
    info2 = upsert.collection_info(spark, root, "v")
    assert info2["version"] == 1 and not info2["indexes"][0]["fresh"]
    assert info2["points_count"] == 63
    with pytest.raises(ValueError, match="does not exist"):
        upsert.collection_info(spark, root, "nope")


def test_dataframe_sized_delete_has_no_forced_broadcast(spark, tmp_path):
    """VERDICT r6 next #5: delete_points/update_columns must not FORCE a
    broadcast of a caller-sized frame — a huge doomed set degrades to an
    AQE-chosen shuffle join instead of OOMing.  Churn check: a 5k-id
    DataFrame delete (far above a tiny hint-worthy set) lands exactly,
    and a follow-up large patch does too."""
    root = str(tmp_path / "store")
    df = spark.range(0, 8000).select(
        F.col("id"), (F.col("id") % 10).alias("grp"))
    upsert.create_collection(spark, root, "big", df=df, id_col="id",
                             n_buckets=8)
    doomed = spark.range(0, 10000).filter(F.col("id") % 2 == 0)  # 5k live
    removed = upsert.delete_points(spark, root, "big", doomed)
    assert removed == 4000
    left = upsert.read_collection(spark, root, "big")
    assert left.count() == 4000
    assert left.filter(F.col("id") % 2 == 0).count() == 0
    patch = spark.range(0, 8000).filter(F.col("id") % 2 == 1).select(
        F.col("id"), F.lit(99).alias("grp"))
    upsert.update_columns(spark, root, "big", patch)
    got = upsert.read_collection(spark, root, "big")
    assert got.count() == 4000
    assert got.filter(F.col("grp") == 99).count() == 4000


def test_multivector_space_store_and_update(spark, tmp_path):
    """Declared multivector space (Qdrant MultiVectorConfig/MAX_SIM):
    search_collection dispatches to max-sim off the collection meta;
    update_vectors validates PER-TOKEN dims (each element of the list
    must be the declared size); use_index='always' without an ivf_mv
    artifact raises with the build hint (round 8 — an artifact kind for
    multivectors now exists, so the refusal names it)."""
    import pytest
    from bob_vector_db_spark.operators import knn

    root = str(tmp_path / "store")
    rows = [(i, [[float(i % 5), 1.0], [0.5, float(i % 3)]])
            for i in range(30)]
    df = spark.createDataFrame(
        rows, "id long, colbert array<array<double>>")
    upsert.create_collection(
        spark, root, "mv", df=df, id_col="id", n_buckets=4,
        vector_config={"colbert": {"size": 2, "distance": "dot",
                                   "multivector": "max_sim"}})
    q = spark.createDataFrame(
        [(100, [[1.0, 0.0], [0.0, 1.0]])],
        "qid long, qvecs array<array<double>>")
    out = knn.search_collection(spark, root, "mv", q, k=5,
                                corpus_id="id", query_vec="qvecs")
    assert out.count() == 5
    # brute-force the top hit: token [1,0] → max(i%5, 0.5); token [0,1]
    # → max(1, i%3); ties break on the smaller id
    best = out.orderBy("rank").first()
    want = max(range(30),
               key=lambda i: (max(float(i % 5), 0.5)
                              + max(1.0, float(i % 3)), -i))
    assert best["vec_id"] == want
    with pytest.raises(ValueError, match="ivf_mv"):
        knn.search_collection(spark, root, "mv", q, k=5, corpus_id="id",
                              query_vec="qvecs", use_index="always")
    # update_vectors: wrong per-token dim rejected; right one lands
    bad = spark.createDataFrame([(1, [[1.0, 2.0, 3.0]])],
                                "id long, colbert array<array<double>>")
    with pytest.raises(ValueError, match="null or not length"):
        upsert.update_vectors(spark, root, "mv", bad)
    good = spark.createDataFrame([(1, [[9.0, 9.0]])],
                                 "id long, colbert array<array<double>>")
    upsert.update_vectors(spark, root, "mv", good)
    got = (upsert.read_collection(spark, root, "mv")
           .filter(F.col("id") == 1).first())
    assert got["colbert"] == [[9.0, 9.0]]


def test_delete_vectors_payload_and_clear(spark, tmp_path):
    """Qdrant's point-mutation tail: delete_vectors nulls a named space
    (point survives, drops out of kNN, index refresh forgets it),
    delete_payload nulls keys (vector survives), clear_payload nulls
    every payload column; guards refuse the id/tenant column and
    vector/payload mixups."""
    import pytest
    from bob_vector_db_spark.operators import index, knn

    root = str(tmp_path / "store")
    rows = [(i, [float(i % 5) + 1.0, 1.0], f"cat{i % 3}", i * 10)
            for i in range(24)]
    df = spark.createDataFrame(
        rows, "id long, vec array<double>, category string, score long")
    upsert.create_collection(
        spark, root, "c", df=df, id_col="id", n_buckets=4,
        vector_config={"vec": {"size": 2, "distance": "cosine"}})
    index.build_vector_index(spark, root, "c", kind="ivf", n_lists=2,
                             iters=2)
    q = spark.createDataFrame([(0, [1.0, 1.0])],
                              "qid long, qvec array<double>")

    upsert.delete_vectors(spark, root, "c", [3, 7], ["vec"])
    got = upsert.read_collection(spark, root, "c") \
        .filter(F.col("id").isin(3, 7)).collect()
    assert len(got) == 2  # the points survive...
    assert all(r["vec"] is None for r in got)            # ...vector gone
    assert all(r["category"] is not None for r in got)   # payload intact
    hits = {r["vec_id"] for r in knn.search_collection(
        spark, root, "c", q, k=24, corpus_id="id",
        use_index=False).collect()}
    assert 3 not in hits and 7 not in hits
    # the refresh absorbs the removal: nulled ids are masked, nothing
    # re-appends, and the indexed search equals the exact scan
    index.refresh_vector_index(spark, root, "c")
    idx = {r["vec_id"] for r in knn.search_collection(
        spark, root, "c", q, k=24, corpus_id="id",
        use_index="always").collect()}
    assert idx == hits

    upsert.delete_payload(spark, root, "c", [1, 2], ["category"])
    got = upsert.read_collection(spark, root, "c") \
        .filter(F.col("id").isin(1, 2)).collect()
    assert all(r["category"] is None and r["vec"] is not None
               and r["score"] is not None for r in got)

    upsert.clear_payload(spark, root, "c", [5])
    r5 = upsert.read_collection(spark, root, "c") \
        .filter(F.col("id") == 5).first()
    assert r5["category"] is None and r5["score"] is None
    assert r5["vec"] is not None  # vector spaces survive clear_payload

    with pytest.raises(ValueError, match="declared vector spaces"):
        upsert.delete_payload(spark, root, "c", [1], ["vec"])
    with pytest.raises(ValueError, match="not declared vector spaces"):
        upsert.delete_vectors(spark, root, "c", [1], ["category"])
    with pytest.raises(ValueError, match="identity"):
        upsert.delete_payload(spark, root, "c", [1], ["id"])
    # and the batch sequencer dispatches the removal kinds
    versions = upsert.batch_update_points(spark, root, "c", [
        ("delete_vectors", ([9], ["vec"])),
        ("clear_payload", [10]),
    ])
    assert len(versions) == 2
    r9 = upsert.read_collection(spark, root, "c") \
        .filter(F.col("id") == 9).first()
    assert r9["vec"] is None and r9["category"] is not None


def test_removal_ops_protect_sparse_space_columns(spark, tmp_path):
    """A sparse space lives in physical indices/values columns, not a
    column named after the space: clear_payload must preserve them,
    delete_vectors('space') must null BOTH, and delete_payload must
    refuse the physical columns."""
    import pytest

    root = str(tmp_path / "store")
    rows = [(i, [i % 7, (i + 3) % 11], [1.0, 2.0], i % 3)
            for i in range(16)]
    df = spark.createDataFrame(
        rows, "id long, indices array<long>, values array<double>, "
              "parity long")
    upsert.create_collection(
        spark, root, "sp", df=df, id_col="id", n_buckets=4,
        vector_config={"text_sparse": {"kind": "sparse",
                                       "distance": "dot"}})
    upsert.clear_payload(spark, root, "sp", [1])
    r1 = upsert.read_collection(spark, root, "sp") \
        .filter(F.col("id") == 1).first()
    assert r1["parity"] is None                      # payload cleared
    assert r1["indices"] is not None and r1["values"] is not None
    upsert.delete_vectors(spark, root, "sp", [2], ["text_sparse"])
    r2 = upsert.read_collection(spark, root, "sp") \
        .filter(F.col("id") == 2).first()
    assert r2["indices"] is None and r2["values"] is None
    assert r2["parity"] is not None
    with pytest.raises(ValueError, match="physical columns"):
        upsert.delete_payload(spark, root, "sp", [3], ["indices"])
