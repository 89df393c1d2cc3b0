"""Persisted near-dup index (operators/neardup_index.py): build/refresh/
probe — the dedup family on the store's delta-log maintenance model
(round 15).  The core invariant: a REFRESHED artifact's pair set is
identical to a from-scratch REBUILD over the final corpus, and both equal
the in-memory ``dedup.minhash_lsh_pairs`` over the same rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bob_vector_db_spark.operators import dedup, neardup_index, upsert
from bob_vector_db_spark.plans.inspect import assert_partition_filters
from bob_vector_db_spark.sources import load_table


def _mk_docs_store(spark, sf_dir, root, hi=120):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < hi)
    upsert.create_collection(
        spark, root, "docs", n_buckets=8, id_col="id",
        df=docs.select(F.col("doc_id").alias("id"), "text"))
    return docs


def _pairs(df):
    return sorted(map(tuple,
                      df.select("id_a", "id_b", "n_bands_matched").collect()))


def test_indexed_pairs_equal_in_memory_finder(spark, sf_dir, tmp_path):
    root = str(tmp_path / "store")
    _mk_docs_store(spark, sf_dir, root)
    neardup_index.build_neardup_index(spark, root, "docs", text_col="text",
                                      n_band_buckets=8)
    got = neardup_index.neardup_pairs_indexed(spark, root, "docs",
                                              text_col="text")
    want = dedup.minhash_lsh_pairs(
        upsert.read_collection(spark, root, "docs"),
        text_col="text", id_col="id")
    assert _pairs(got) == _pairs(want)


def test_refresh_equals_rebuild_after_churn(spark, sf_dir, tmp_path):
    """Upsert new docs, overwrite one, delete some — ONE refresh must land
    the exact pair set a full rebuild over the final corpus produces."""
    root = str(tmp_path / "store")
    docs = load_table(spark, sf_dir, "documents")
    _mk_docs_store(spark, sf_dir, root, hi=100)
    neardup_index.build_neardup_index(spark, root, "docs", text_col="text",
                                      n_band_buckets=8)
    delta = (docs.filter(F.col("doc_id").between(100, 119))
             .select(F.col("doc_id").alias("id"), "text")
             .unionByName(
                 docs.filter(F.col("doc_id") == 50)
                 .select(F.lit(7).cast("long").alias("id"), "text")))
    upsert.upsert(spark, root, "docs", delta, id_col="id")
    upsert.delete_points(spark, root, "docs", list(range(20, 30)))
    neardup_index.refresh_neardup_index(spark, root, "docs",
                                        text_col="text")
    refreshed = _pairs(neardup_index.neardup_pairs_indexed(
        spark, root, "docs", text_col="text"))
    # rebuild from scratch over the same final corpus
    neardup_index.build_neardup_index(spark, root, "docs", text_col="text",
                                      n_band_buckets=8)
    rebuilt = _pairs(neardup_index.neardup_pairs_indexed(
        spark, root, "docs", text_col="text"))
    assert refreshed == rebuilt
    # the forced overwrite makes (7, 50) an exact-dup pair: all 4 bands
    assert (7, 50, 4) in refreshed


def test_refresh_equals_rebuild_with_mask_compaction(spark, sf_dir,
                                                     tmp_path):
    """threshold=0 forces the mask-fold path on every refresh; pairs must
    still tie the rebuild."""
    root = str(tmp_path / "store")
    docs = load_table(spark, sf_dir, "documents")
    _mk_docs_store(spark, sf_dir, root, hi=80)
    neardup_index.build_neardup_index(spark, root, "docs", text_col="text",
                                      n_band_buckets=8)
    upsert.upsert(spark, root, "docs",
                  docs.filter(F.col("doc_id").between(80, 99))
                  .select(F.col("doc_id").alias("id"), "text"),
                  id_col="id")
    neardup_index.refresh_neardup_index(spark, root, "docs",
                                        text_col="text",
                                        mask_compact_threshold=0)
    refreshed = _pairs(neardup_index.neardup_pairs_indexed(
        spark, root, "docs", text_col="text"))
    neardup_index.build_neardup_index(spark, root, "docs", text_col="text",
                                      n_band_buckets=8)
    assert refreshed == _pairs(neardup_index.neardup_pairs_indexed(
        spark, root, "docs", text_col="text"))


def test_stale_index_refuses(spark, sf_dir, tmp_path):
    root = str(tmp_path / "store")
    docs = _mk_docs_store(spark, sf_dir, root, hi=50)
    neardup_index.build_neardup_index(spark, root, "docs", text_col="text")
    upsert.delete_points(spark, root, "docs", [1, 2])
    with pytest.raises(ValueError, match="STALE"):
        neardup_index.neardup_pairs_indexed(spark, root, "docs",
                                            text_col="text")
    with pytest.raises(ValueError, match="STALE"):
        neardup_index.neardup_pairs_for_ids(spark, root, "docs", [3],
                                            text_col="text")
    # refresh clears the staleness gate
    neardup_index.refresh_neardup_index(spark, root, "docs",
                                        text_col="text")
    neardup_index.neardup_pairs_indexed(spark, root, "docs",
                                        text_col="text").count()
    del docs


def test_probe_matches_filtered_full_pairs(spark, sf_dir, tmp_path):
    """pairs_for_ids == the full pair set restricted to pairs touching the
    probe ids (including probe-vs-probe pairs exactly once)."""
    root = str(tmp_path / "store")
    _mk_docs_store(spark, sf_dir, root, hi=120)
    neardup_index.build_neardup_index(spark, root, "docs", text_col="text",
                                      n_band_buckets=8)
    probe = [5, 17, 40, 41, 99]
    got = _pairs(neardup_index.neardup_pairs_for_ids(
        spark, root, "docs", probe, text_col="text"))
    full = neardup_index.neardup_pairs_indexed(spark, root, "docs",
                                               text_col="text")
    want = _pairs(full.filter(F.col("id_a").isin(probe)
                              | F.col("id_b").isin(probe)))
    assert got == want


def test_probe_prunes_band_buckets(spark, sf_dir, tmp_path):
    """The posting scan under a probe must carry a static band_bucket
    partition filter — the O(|delta|) read contract."""
    root = str(tmp_path / "store")
    _mk_docs_store(spark, sf_dir, root, hi=120)
    # many buckets so a single-doc probe cannot touch them all
    neardup_index.build_neardup_index(spark, root, "docs", text_col="text",
                                      n_band_buckets=64)
    imeta = neardup_index.neardup_index_meta(root, "docs", "text")
    assert imeta["n_band_buckets"] == 64
    # the public wrapper checkpoints its result (cutting the visible
    # plan), so assert pruning on the internal probe plan: one doc's 4
    # bands touch ≤4 of the 64 buckets
    rows = upsert.read_rows_for_ids(
        spark, root, "docs",
        spark.range(5, 6).select(F.col("id")))
    pb = neardup_index._band_postings(rows, "id", "text", imeta, gen=0)
    touched = sorted(r[0] for r in
                     pb.select("band_bucket").distinct().collect())
    assert 0 < len(touched) <= 4
    plan_df = neardup_index._probe_pairs_plan(spark, root, "docs", "text",
                                              pb, touched)
    assert_partition_filters(plan_df, "band_bucket")
    # and the wrapper end-to-end still answers
    out = neardup_index.neardup_pairs_for_ids(spark, root, "docs", [5],
                                              text_col="text")
    out.count()


def test_empty_probe_and_missing_ids(spark, sf_dir, tmp_path):
    root = str(tmp_path / "store")
    _mk_docs_store(spark, sf_dir, root, hi=30)
    neardup_index.build_neardup_index(spark, root, "docs", text_col="text")
    none = neardup_index.neardup_pairs_for_ids(
        spark, root, "docs", [999999], text_col="text")
    assert none.count() == 0
    empty = neardup_index.neardup_pairs_for_ids(
        spark, root, "docs", [], text_col="text")
    assert empty.count() == 0


def test_pairs_for_frame_screens_incoming(spark, sf_dir, tmp_path):
    """Frame-vs-stored screening: an incoming frame carrying a stored
    doc's text must pair with it WITHOUT being committed; genuinely new
    text pairs with nothing; the collection is untouched."""
    root = str(tmp_path / "store")
    docs = _mk_docs_store(spark, sf_dir, root, hi=100)
    neardup_index.build_neardup_index(spark, root, "docs", text_col="text",
                                      n_band_buckets=8)
    n_before = upsert.read_collection(spark, root, "docs").count()
    incoming = (docs.filter(F.col("doc_id") == 42)
                .select(F.lit(9001).cast("long").alias("id"), "text")
                .unionByName(
                    spark.createDataFrame(
                        [(9002, "totally novel text that matches nothing "
                                "in the stored corpus at all")],
                        "id long, text string")))
    hits = neardup_index.neardup_pairs_for_frame(
        spark, root, "docs", incoming, text_col="text", id_col="id")
    rows = {(r["id"], r["stored_id"]): r["n_bands_matched"]
            for r in hits.collect()}
    assert rows[(9001, 42)] == 4          # exact dup -> all 4 bands
    assert all(i != 9002 for i, _ in rows)
    # screening committed nothing
    assert upsert.read_collection(spark, root, "docs").count() == n_before
    assert neardup_index.neardup_index_is_fresh(root, "docs", "text")


def test_refresh_all_indexes_dispatches_neardup(spark, sf_dir, tmp_path):
    """A collection carrying a near-dup artifact must refresh through the
    one-call refresh_all_indexes dispatcher like every other kind."""
    from bob_vector_db_spark.operators import index as index_ops

    root = str(tmp_path / "store")
    docs = load_table(spark, sf_dir, "documents")
    _mk_docs_store(spark, sf_dir, root, hi=60)
    neardup_index.build_neardup_index(spark, root, "docs", text_col="text")
    upsert.upsert(spark, root, "docs",
                  docs.filter(F.col("doc_id").between(60, 69))
                  .select(F.col("doc_id").alias("id"), "text"),
                  id_col="id")
    metas = index_ops.refresh_all_indexes(spark, root, "docs")
    assert [m["kind"] for m in metas] == ["neardup_minhash_lsh"]
    assert neardup_index.neardup_index_is_fresh(root, "docs", "text")
    # listed in the catalog too
    kinds = [m["kind"] for m in index_ops.list_indexes(root, "docs")]
    assert "neardup_minhash_lsh" in kinds


def test_build_rejects_non_dividing_bands(spark, sf_dir, tmp_path):
    root = str(tmp_path / "store")
    _mk_docs_store(spark, sf_dir, root, hi=30)
    with pytest.raises(ValueError, match="not divisible"):
        neardup_index.build_neardup_index(spark, root, "docs",
                                          text_col="text",
                                          num_hashes=16, bands=5)


def test_repeated_churn_refresh_property(spark, sf_dir, tmp_path):
    """Three rounds of randomized churn (inserts, overwrites, deletes),
    each absorbed by one refresh — after every round the indexed pair set
    must equal the in-memory finder over the collection's current rows.
    The multi-generation mask stack is what this exercises (generation 3
    postings over generation 1-2 masks over the build)."""
    import random

    rnd = random.Random(15)
    root = str(tmp_path / "store")
    docs = load_table(spark, sf_dir, "documents")
    _mk_docs_store(spark, sf_dir, root, hi=80)
    neardup_index.build_neardup_index(spark, root, "docs", text_col="text",
                                      n_band_buckets=8)
    next_new = 80
    for rnd_i in range(3):
        lo = next_new
        next_new += 10
        inserts = (docs.filter(F.col("doc_id").between(lo, next_new - 1))
                   .select(F.col("doc_id").alias("id"), "text"))
        # overwrite 3 random live ids with other docs' text
        src = rnd.sample(range(200, 260), 3)
        tgt = rnd.sample(range(0, 80), 3)
        over = None
        for s, t in zip(src, tgt):
            o = (docs.filter(F.col("doc_id") == s)
                 .select(F.lit(t).cast("long").alias("id"), "text"))
            over = o if over is None else over.unionByName(o)
        upsert.upsert(spark, root, "docs", inserts.unionByName(over),
                      id_col="id")
        upsert.delete_points(spark, root, "docs",
                             rnd.sample(range(0, 80), 4))
        neardup_index.refresh_neardup_index(spark, root, "docs",
                                            text_col="text")
        got = _pairs(neardup_index.neardup_pairs_indexed(
            spark, root, "docs", text_col="text"))
        want = _pairs(dedup.minhash_lsh_pairs(
            upsert.read_collection(spark, root, "docs"),
            text_col="text", id_col="id"))
        assert got == want, f"round {rnd_i}: indexed != in-memory"


def test_refresh_rerun_after_simulated_crash(spark, sf_dir, tmp_path):
    """A near-dup refresh that died after its posting append (built_version
    never committed) must re-run safely: the rerun claims a new generation
    and its masks hide the dead attempt's rows, so no (band, id) posting is
    ever live twice and pairs still tie the in-memory finder."""
    import json
    import os

    from bob_vector_db_spark.operators.index import (
        INDEX_META_FILE,
        index_path,
    )

    root = str(tmp_path / "store")
    docs = load_table(spark, sf_dir, "documents")
    _mk_docs_store(spark, sf_dir, root, hi=60)
    neardup_index.build_neardup_index(spark, root, "docs", text_col="text",
                                      n_band_buckets=8)
    built0 = neardup_index.neardup_index_meta(root, "docs", "text")[
        "built_version"]
    upsert.upsert(spark, root, "docs",
                  docs.filter(F.col("doc_id").between(60, 69))
                  .select(F.col("doc_id").alias("id"), "text"),
                  id_col="id")
    upsert.delete_points(spark, root, "docs", [5, 6])
    neardup_index.refresh_neardup_index(spark, root, "docs",
                                        text_col="text")
    # simulate the crash: roll built_version back as if commit never ran
    ipath = index_path(root, "docs", "text__neardup")
    mp = os.path.join(ipath, INDEX_META_FILE)
    with open(mp) as fh:
        imeta = json.load(fh)
    imeta["built_version"] = built0
    with open(mp, "w") as fh:
        json.dump(imeta, fh)
    imeta2 = neardup_index.refresh_neardup_index(spark, root, "docs",
                                                 text_col="text")
    assert imeta2["generation"] == 2  # rerun claimed a NEW generation
    # the double-appended postings are masked: per (id, band) exactly one
    # live row
    live = neardup_index._masked_postings(spark, root, "docs", "text")
    dup = (live.groupBy("id", "band").count()
           .filter(F.col("count") > 1).count())
    assert dup == 0
    got = _pairs(neardup_index.neardup_pairs_indexed(
        spark, root, "docs", text_col="text"))
    want = _pairs(dedup.minhash_lsh_pairs(
        upsert.read_collection(spark, root, "docs"),
        text_col="text", id_col="id"))
    assert got == want


# ---------------------------------------------------------------------------
# SimHash index kind (round 15b) — the family generalization
# ---------------------------------------------------------------------------

def _sh_pairs(df):
    return sorted(map(tuple, df.select("id_a", "id_b", "hamming").collect()))


def test_simhash_indexed_equals_in_memory(spark, sf_dir, tmp_path):
    root = str(tmp_path / "store")
    _mk_docs_store(spark, sf_dir, root, hi=120)
    neardup_index.build_simhash_index(spark, root, "docs", text_col="text",
                                      n_chunk_buckets=8)
    got = neardup_index.simhash_pairs_indexed(spark, root, "docs",
                                              text_col="text")
    want = dedup.simhash_pairs(
        upsert.read_collection(spark, root, "docs"),
        text_col="text", id_col="id")
    assert _sh_pairs(got) == _sh_pairs(want)
    # tightening the distance filters; loosening raises
    tight = neardup_index.simhash_pairs_indexed(spark, root, "docs",
                                                text_col="text",
                                                max_hamming=1)
    assert _sh_pairs(tight) == [p for p in _sh_pairs(got) if p[2] <= 1]
    with pytest.raises(ValueError, match="exceeds the built layout"):
        neardup_index.simhash_pairs_indexed(spark, root, "docs",
                                            text_col="text", max_hamming=5)


def test_simhash_refresh_equals_rebuild(spark, sf_dir, tmp_path):
    root = str(tmp_path / "store")
    docs = load_table(spark, sf_dir, "documents")
    _mk_docs_store(spark, sf_dir, root, hi=100)
    neardup_index.build_simhash_index(spark, root, "docs", text_col="text",
                                      n_chunk_buckets=8)
    delta = (docs.filter(F.col("doc_id").between(100, 119))
             .select(F.col("doc_id").alias("id"), "text")
             .unionByName(
                 docs.filter(F.col("doc_id") == 50)
                 .select(F.lit(7).cast("long").alias("id"), "text")))
    upsert.upsert(spark, root, "docs", delta, id_col="id")
    upsert.delete_points(spark, root, "docs", list(range(20, 30)))
    neardup_index.refresh_simhash_index(spark, root, "docs",
                                        text_col="text")
    refreshed = _sh_pairs(neardup_index.simhash_pairs_indexed(
        spark, root, "docs", text_col="text"))
    neardup_index.build_simhash_index(spark, root, "docs", text_col="text",
                                      n_chunk_buckets=8)
    rebuilt = _sh_pairs(neardup_index.simhash_pairs_indexed(
        spark, root, "docs", text_col="text"))
    assert refreshed == rebuilt
    assert (7, 50, 0) in refreshed      # forced overwrite: hamming 0


def test_simhash_stale_refuses_and_probe_matches(spark, sf_dir, tmp_path):
    root = str(tmp_path / "store")
    _mk_docs_store(spark, sf_dir, root, hi=120)
    neardup_index.build_simhash_index(spark, root, "docs", text_col="text",
                                      n_chunk_buckets=8)
    probe = [5, 17, 40, 99]
    got = _sh_pairs(neardup_index.simhash_pairs_for_ids(
        spark, root, "docs", probe, text_col="text"))
    full = neardup_index.simhash_pairs_indexed(spark, root, "docs",
                                               text_col="text")
    want = _sh_pairs(full.filter(F.col("id_a").isin(probe)
                                 | F.col("id_b").isin(probe)))
    assert got == want
    upsert.delete_points(spark, root, "docs", [1])
    with pytest.raises(ValueError, match="STALE"):
        neardup_index.simhash_pairs_indexed(spark, root, "docs",
                                            text_col="text")


def test_refresh_all_dispatches_both_dedup_kinds(spark, sf_dir, tmp_path):
    from bob_vector_db_spark.operators import index as index_ops

    root = str(tmp_path / "store")
    docs = load_table(spark, sf_dir, "documents")
    _mk_docs_store(spark, sf_dir, root, hi=50)
    neardup_index.build_neardup_index(spark, root, "docs", text_col="text")
    neardup_index.build_simhash_index(spark, root, "docs", text_col="text")
    upsert.upsert(spark, root, "docs",
                  docs.filter(F.col("doc_id").between(50, 59))
                  .select(F.col("doc_id").alias("id"), "text"),
                  id_col="id")
    metas = index_ops.refresh_all_indexes(spark, root, "docs")
    assert sorted(m["kind"] for m in metas) == [
        "neardup_minhash_lsh", "neardup_simhash"]
    assert neardup_index.neardup_index_is_fresh(root, "docs", "text")
    assert neardup_index.simhash_index_is_fresh(root, "docs", "text")


def test_simhash_build_rejects_non_dividing_bits(spark, sf_dir, tmp_path):
    root = str(tmp_path / "store")
    _mk_docs_store(spark, sf_dir, root, hi=30)
    with pytest.raises(ValueError, match="not divisible"):
        neardup_index.build_simhash_index(spark, root, "docs",
                                          text_col="text",
                                          bits=64, max_hamming=4)
