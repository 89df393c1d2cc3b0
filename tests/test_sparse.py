"""Sparse vector search (operators/sparse.py): posting-form encodings, the
pruned inverted-index dot product, and the array-pair wire format."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bob_vector_db_spark.operators.sparse import (
    postings_from_arrays,
    postings_from_text,
    sparse_dot_topk,
)
from bob_vector_db_spark.plans.inspect import assert_broadcast


def _dense_topk(points: dict[int, dict[int, float]], qid: int, k: int):
    """Driver-side reference: brute-force sparse dot against every point."""
    q = points[qid]
    scored = []
    for pid, vec in points.items():
        if pid == qid:
            continue
        s = sum(v * q.get(i, 0.0) for i, v in vec.items())
        if s > 0:
            scored.append((-s, pid))
    scored.sort()
    return [(pid, -negs) for negs, pid in scored[:k]]


def test_sparse_dot_matches_brute_force(spark):
    import random

    rnd = random.Random(11)
    points = {
        pid: {rnd.randrange(64): float(rnd.randint(1, 9))
              for _ in range(rnd.randint(3, 12))}
        for pid in range(40)
    }
    rows = [(pid, i, v) for pid, vec in points.items()
            for i, v in vec.items()]
    post = spark.createDataFrame(rows, "id int, idx int, val double")
    out = sparse_dot_topk(post.filter(F.col("id") < 4), post, k=5,
                          exclude_self=True, round_to=None)
    got: dict = {}
    for r in out.orderBy("qid", "rank").collect():
        got.setdefault(r["qid"], []).append((r["vec_id"], r["sim"]))
    for qid in range(4):
        want = _dense_topk(points, qid, 5)
        # rank ties (equal sim) break by vec_id in the engine; normalize
        # both sides to (sim, id)-sorted for comparison
        assert sorted(got[qid], key=lambda t: (-t[1], t[0])) == \
               sorted(want, key=lambda t: (-t[1], t[0])), qid


def test_text_and_array_forms_agree(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta{i % 3} gamma{' delta' * (i % 4)}")
         for i in range(30)], "doc_id long, text string")
    post = postings_from_text(docs, vocab_size=128)
    pts = (post.groupBy("id")
           .agg(F.array_sort(F.collect_list(F.struct("idx", "val")))
                .alias("z"))
           .select("id", F.col("z.idx").alias("indices"),
                   F.col("z.val").alias("values")))
    roundtrip = postings_from_arrays(pts)
    a = sorted(map(tuple, post.collect()))
    b = sorted(map(tuple, roundtrip.collect()))
    assert a == b


def test_no_shared_dimension_means_no_row(spark):
    """Sparse semantics: a doc sharing no active dim with the query never
    appears (no zero-sim padding) — the Qdrant sparse contract."""
    post = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 1.0),   # query
         (1, 1, 3.0),                # overlaps
         (2, 9, 5.0)],               # disjoint
        "id int, idx int, val double")
    out = sparse_dot_topk(post.filter(F.col("id") == 0), post, k=10,
                          exclude_self=True)
    rows = [(r["vec_id"], r["sim"]) for r in out.collect()]
    assert rows == [(1, 6.0)]


def test_query_side_broadcasts(spark):
    """Scale contract: the pairing join must broadcast the |Q|·nnz query
    postings — the corpus posting stream is pruned in place, never
    shuffled for the join."""
    docs = spark.createDataFrame(
        [(i, f"tok{i % 17} tok{i % 5} shared") for i in range(200)],
        "doc_id long, text string")
    post = postings_from_text(docs, vocab_size=256)
    out = sparse_dot_topk(post.filter(F.col("id") < 2), post, k=5,
                          exclude_self=True)
    assert_broadcast(out)


def test_ragged_array_pair_yields_null_free_postings(spark):
    pts = spark.createDataFrame(
        [(1, [1, 2, 3], [1.0, 2.0]),   # ragged: 3 indices, 2 values
         (2, [4], [4.0])],
        "id int, indices array<int>, values array<double>")
    post = postings_from_arrays(pts)
    rows = sorted(map(tuple, post.collect()))
    # arrays_zip pads the short side with NULL; the ragged tail surfaces
    # as a NULL val row rather than vanishing silently
    assert (1, 3, None) in rows
    assert (2, 4, 4.0) in rows


# ---------------------------------------------------------------------------
# Persisted sparse index: build / probe / staleness / incremental refresh
# ---------------------------------------------------------------------------

def _mk_sparse_store(spark, tmp_path, n=60):
    from bob_vector_db_spark.operators import upsert

    root = str(tmp_path / "store")
    docs = spark.createDataFrame(
        [(i, f"tok{i % 13} tok{i % 7} shared word{i % 3}") for i in range(n)],
        "doc_id long, text string")
    post = postings_from_text(docs, vocab_size=128)
    pts = (post.groupBy("id")
           .agg(F.array_sort(F.collect_list(F.struct("idx", "val")))
                .alias("z"))
           .select("id", F.col("z.idx").alias("indices"),
                   F.col("z.val").alias("values")))
    upsert.create_collection(spark, root, "sp", df=pts, id_col="id",
                             n_buckets=4)
    return root, post


def _ranked(df):
    return sorted(map(tuple,
                      df.select("qid", "vec_id", "sim", "rank").collect()))


def test_sparse_indexed_matches_in_memory(spark, tmp_path):
    from bob_vector_db_spark.operators.sparse import (
        build_sparse_index,
        sparse_search_indexed,
    )

    root, post = _mk_sparse_store(spark, tmp_path)
    build_sparse_index(spark, root, "sp", n_dim_buckets=8)
    q = post.filter(F.col("id") < 3)
    mem = sparse_dot_topk(q, post, k=5, exclude_self=True)
    idx = sparse_search_indexed(spark, root, "sp", q, k=5, exclude_self=True)
    assert _ranked(idx) == _ranked(mem)


def test_sparse_indexed_prunes_dim_buckets(spark, tmp_path):
    from bob_vector_db_spark.operators.sparse import (
        build_sparse_index,
        sparse_search_indexed,
    )
    from bob_vector_db_spark.plans.inspect import assert_partition_filters

    root, post = _mk_sparse_store(spark, tmp_path)
    build_sparse_index(spark, root, "sp", n_dim_buckets=16)
    out = sparse_search_indexed(spark, root, "sp",
                                post.filter(F.col("id") == 0), k=5)
    assert_partition_filters(out, "dim_bucket")


def test_sparse_refresh_absorbs_mutations(spark, tmp_path):
    """mutate (overwrite + add + delete) → ONE refresh → indexed search ==
    in-memory search over the FINAL collection state."""
    from bob_vector_db_spark.operators import upsert
    from bob_vector_db_spark.operators.sparse import (
        build_sparse_index,
        refresh_sparse_index,
        sparse_search_indexed,
    )

    root, post = _mk_sparse_store(spark, tmp_path)
    build_sparse_index(spark, root, "sp", n_dim_buckets=8)
    # overwrite id 1 and 2, add 3 new ids, delete ids 10..14
    newdocs = spark.createDataFrame(
        [(1, "tok1 tok1 tok1"), (2, "word0 word0")]
        + [(100 + i, f"tok{i} shared") for i in range(3)],
        "doc_id long, text string")
    newpost = postings_from_text(newdocs, vocab_size=128)
    newpts = (newpost.groupBy("id")
              .agg(F.array_sort(F.collect_list(F.struct("idx", "val")))
                   .alias("z"))
              .select("id", F.col("z.idx").alias("indices"),
                      F.col("z.val").alias("values")))
    upsert.upsert(spark, root, "sp", newpts, id_col="id")
    upsert.delete_points(spark, root, "sp", list(range(10, 15)))

    import pytest as _pt
    q = post.filter(F.col("id") == 0)
    with _pt.raises(ValueError, match="stale|refresh"):
        sparse_search_indexed(spark, root, "sp", q, k=5)
    imeta = refresh_sparse_index(spark, root, "sp")
    assert imeta["generation"] == 1

    from bob_vector_db_spark.operators.sparse import postings_from_arrays
    final = postings_from_arrays(
        upsert.read_collection(spark, root, "sp"), id_col="id")
    mem = sparse_dot_topk(q, final, k=5, exclude_self=True)
    idx = sparse_search_indexed(spark, root, "sp", q, k=5,
                                exclude_self=True)
    assert _ranked(idx) == _ranked(mem)
    # and the refreshed index sees the new ids / not the deleted ones
    all_hits = sparse_search_indexed(
        spark, root, "sp", final.filter(F.col("id") == 100), k=50)
    ids = {r["vec_id"] for r in all_hits.collect()}
    assert not ids & set(range(10, 15))


def test_sparse_indexed_int_typed_indices(spark, tmp_path):
    """Regression: collections storing ``indices array<int>`` (the Qdrant
    uint32 wire format) must probe the same dim buckets the build wrote.
    Spark's xxhash64 hashes int and long to DIFFERENT values, so unless
    both sides hash a canonical long, the partition filter prunes the
    correct buckets away and the search silently returns empty/wrong."""
    from bob_vector_db_spark.operators import upsert
    from bob_vector_db_spark.operators.sparse import (
        build_sparse_index,
        sparse_search_indexed,
    )

    root = str(tmp_path / "store")
    rows = [(i, [i % 7, 7 + i % 5, 50], [1.0, 2.0, float(1 + i % 3)])
            for i in range(40)]
    pts = spark.createDataFrame(
        rows, "id long, indices array<int>, values array<float>")
    upsert.create_collection(spark, root, "spi", df=pts, id_col="id",
                             n_buckets=4)
    build_sparse_index(spark, root, "spi", n_dim_buckets=8)
    post = postings_from_arrays(pts)
    q = post.filter(F.col("id") < 3)
    mem = sparse_dot_topk(q, post, k=5, exclude_self=True)
    idx = sparse_search_indexed(spark, root, "spi", q, k=5,
                                exclude_self=True)
    got, want = _ranked(idx), _ranked(mem)
    assert got == want
    assert len(got) > 0  # the failure mode was a silently empty result


def test_sparse_indexed_pushes_idx_predicate(spark, tmp_path):
    """Beyond partition pruning, the residual ``idx IN`` predicate must
    reach the parquet scan of the probed buckets."""
    from bob_vector_db_spark.operators.sparse import (
        build_sparse_index,
        sparse_search_indexed,
    )
    from bob_vector_db_spark.plans.inspect import assert_pushed_filters

    root, post = _mk_sparse_store(spark, tmp_path)
    build_sparse_index(spark, root, "sp", n_dim_buckets=8)
    out = sparse_search_indexed(spark, root, "sp",
                                post.filter(F.col("id") == 0), k=5)
    assert_pushed_filters(out, "idx")


def test_filtered_sparse_search_composes_and_falls_back(spark, tmp_path):
    """search_sparse_points: with a fresh payload index the filter's ids
    semi-join the probed posting lists; without one, 'auto' resolves the
    ids from a pushed-predicate scan — both equal the brute-force
    filtered sparse dot, and 'always' raises with no index."""
    import pytest
    from bob_vector_db_spark.operators import upsert
    from bob_vector_db_spark.operators.filters import Filter, MatchValue
    from bob_vector_db_spark.operators.payload_index import (
        build_payload_index)
    from bob_vector_db_spark.operators.query_api import search_sparse_points
    from bob_vector_db_spark.operators.sparse import build_sparse_index

    root = str(tmp_path / "store")
    rows = []
    for i in range(30):
        dims = sorted({(i * 7 + j) % 40 for j in range(4)})
        rows.append((i, dims, [float(1 + (i + d) % 5) for d in dims],
                     i % 3))
    pts = spark.createDataFrame(
        rows, "id long, indices array<long>, values array<double>, "
              "parity long")
    upsert.create_collection(
        spark, root, "sp", df=pts, id_col="id", n_buckets=4,
        vector_config={"s": {"kind": "sparse", "distance": "dot"}})
    build_sparse_index(spark, root, "sp", n_dim_buckets=8)
    stored = upsert.read_collection(spark, root, "sp")
    post = postings_from_arrays(stored, id_col="id")
    q = post.filter(F.col("id") < 2)
    flt = Filter(must=[MatchValue("parity", 1)])

    want = sorted(map(tuple, sparse_dot_topk(
        q, post.join(stored.filter("parity = 1").select("id"), "id",
                     "left_semi"),
        k=10, exclude_self=True).collect()))
    # scan fallback (no payload index yet)
    got_scan = sorted(map(tuple, search_sparse_points(
        spark, root, "sp", q, flt=flt, k=10, exclude_self=True).collect()))
    assert got_scan == want
    with pytest.raises(ValueError, match="always"):
        search_sparse_points(spark, root, "sp", q, flt=flt, k=10,
                             use_payload_index="always")
    # indexed candidate path
    build_payload_index(spark, root, "sp", "parity", n_val_buckets=4)
    got_idx = sorted(map(tuple, search_sparse_points(
        spark, root, "sp", q, flt=flt, k=10, use_payload_index="always",
        exclude_self=True).collect()))
    assert got_idx == want


def test_idf_modifier_declared_config_and_refresh(spark, tmp_path):
    """Qdrant Modifier.IDF: a sparse space declared with
    ``{"kind": "sparse", "modifier": "idf"}`` re-weights QUERY values by
    ``ln(1 + (N - n_t + 0.5)/(n_t + 0.5))`` at search time (stored
    values untouched); N survives churn through the masked docids
    sidecar; an explicit ``modifier=None`` disables it back to the
    plain dot product; a filter narrows candidates, not stats."""
    import math

    from bob_vector_db_spark.operators import upsert
    from bob_vector_db_spark.operators.sparse import (
        build_sparse_index,
        refresh_sparse_index,
        sparse_search_indexed,
    )

    root = str(tmp_path / "store")
    n = 40
    docs = spark.createDataFrame(
        [(i, f"tok{i % 13} tok{i % 7} shared word{i % 3}") for i in range(n)],
        "doc_id long, text string")
    post = postings_from_text(docs, vocab_size=128)
    pts = (post.groupBy("id")
           .agg(F.array_sort(F.collect_list(F.struct("idx", "val")))
                .alias("z"))
           .select("id", F.col("z.idx").alias("indices"),
                   F.col("z.val").alias("values"),
                   (F.col("id") % 2).alias("parity")))
    upsert.create_collection(
        spark, root, "sp", df=pts, id_col="id", n_buckets=4,
        vector_config={"text_sparse": {"kind": "sparse",
                                       "modifier": "idf",
                                       "indices_col": "indices",
                                       "values_col": "values"}})
    imeta = build_sparse_index(spark, root, "sp", n_dim_buckets=8)
    assert imeta["n_points"] == n
    q = post.filter(F.col("id") < 2)

    # driver-side reference: idf-weighted dot over the full corpus
    rows = post.collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r["id"], {})[r["idx"]] = r["val"]
    df_t: dict = {}
    for vec in by_id.values():
        for i in vec:
            df_t[i] = df_t.get(i, 0) + 1
    idf = {i: math.log(1.0 + (n - d + 0.5) / (d + 0.5))
           for i, d in df_t.items()}

    def ref_topk(qid, k=5, subset=None):
        qv = by_id[qid]
        scored = []
        for pid, vec in by_id.items():
            if pid == qid or (subset and pid not in subset):
                continue
            s = sum(v * qv.get(i, 0.0) * idf[i] for i, v in vec.items()
                    if i in qv)
            if s > 0:
                scored.append((round(s, 6), pid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        return [(qid, pid, s) for s, pid in scored[:k]]

    got = sparse_search_indexed(spark, root, "sp", q, k=5,
                                exclude_self=True)
    got_rows = sorted((r["qid"], r["vec_id"], r["sim"])
                      for r in got.collect())
    want = sorted(ref_topk(0) + ref_topk(1))
    assert got_rows == want
    # modifier=None turns it back into the plain dot product
    plain = sparse_search_indexed(spark, root, "sp", q, k=5,
                                  exclude_self=True, modifier=None)
    mem = sparse_dot_topk(q, post, k=5, exclude_self=True)
    assert _ranked(plain) == _ranked(mem)
    # churn: delete half the points -> refresh updates N from the masked
    # docids; the weighted search stays consistent with a fresh rebuild
    doomed = [i for i in range(n) if i % 4 == 3]
    upsert.delete_points(spark, root, "sp", doomed)
    im2 = refresh_sparse_index(spark, root, "sp")
    assert im2["n_points"] == n - len(doomed)
    after = _ranked(sparse_search_indexed(spark, root, "sp", q, k=5,
                                          exclude_self=True))
    build_sparse_index(spark, root, "sp", n_dim_buckets=8)  # full rebuild
    rebuilt = _ranked(sparse_search_indexed(spark, root, "sp", q, k=5,
                                            exclude_self=True))
    assert after == rebuilt


# ---------------------------------------------------------------------------
# Typed sparse query nodes (round 12): Qdrant's SparseVector as a
# serializable nearest leaf — terminal query= and prefetch branches —
# plus the dense-surface refusals that keep the two shapes apart.
# ---------------------------------------------------------------------------

def _mk_hybrid_store(spark, tmp_path, modifier=None):
    """A collection declaring BOTH a dense space ('vec') and a sparse
    space ('text_sparse'), sparse index built — the hybrid fixture."""
    from bob_vector_db_spark.operators import upsert
    from bob_vector_db_spark.operators.sparse import build_sparse_index

    root = str(tmp_path / "store")
    docs = spark.createDataFrame(
        [(i, f"tok{i % 13} tok{i % 7} shared word{i % 3}")
         for i in range(60)],
        "doc_id long, text string")
    post = postings_from_text(docs, vocab_size=128)
    pts = (post.groupBy("id")
           .agg(F.array_sort(F.collect_list(F.struct("idx", "val")))
                .alias("z"))
           .select("id", F.col("z.idx").alias("indices"),
                   F.col("z.val").alias("values"),
                   F.array(*[(F.col("id") % (3 + j)).cast("double")
                             for j in range(4)]).alias("vec")))
    cfg = {"kind": "sparse"}
    if modifier:
        cfg["modifier"] = modifier
    upsert.create_collection(
        spark, root, "sp", df=pts, id_col="id", n_buckets=4,
        vector_config={"vec": {"size": 4, "distance": "cosine"},
                       "text_sparse": cfg})
    build_sparse_index(spark, root, "sp", n_dim_buckets=8)
    return root, post


def _query_spec(post, qid=0):
    rows = (post.filter(F.col("id") == qid)
            .select("idx", "val").collect())
    return {"indices": [int(r["idx"]) for r in rows],
            "values": [float(r["val"]) for r in rows]}


def test_terminal_sparse_nearest_matches_direct(spark, tmp_path):
    from bob_vector_db_spark.operators.query_api import (
        query_points,
        search_sparse_points,
    )

    root, post = _mk_hybrid_store(spark, tmp_path)
    spec = _query_spec(post, qid=0)
    got = query_points(spark, root, "sp",
                       query={"nearest": spec},
                       vector_name="text_sparse", k=5)
    qpost = (post.filter(F.col("id") == 0)
             .select(F.lit(0).cast("long").alias("id"), "idx", "val"))
    want = search_sparse_points(spark, root, "sp", qpost, k=5)
    assert _ranked(got) == _ranked(want)


def test_typed_sparse_leaf_rides_the_prefetch_tree(spark, tmp_path):
    """The canonical hybrid payload: a sparse leaf and a dense leaf
    fused by RRF — one serializable tree, no caller DataFrames."""
    from bob_vector_db_spark.operators.query_api import (
        query_points,
        search_sparse_points,
    )

    root, post = _mk_hybrid_store(spark, tmp_path)
    spec = _query_spec(post, qid=0)
    out = query_points(
        spark, root, "sp",
        prefetch=[
            {"nearest": spec, "using": "text_sparse", "limit": 5},
            {"nearest": [1.0, 2.0, 0.0, 1.0], "using": "vec", "limit": 5},
        ],
        fusion="rrf", k=5).collect()
    assert len(out) == 5
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    # the sparse branch alone, through the tree, preserves the direct
    # search's ranking (score = sim, internal order, no negation)
    solo = query_points(
        spark, root, "sp",
        prefetch=[{"nearest": spec, "using": "text_sparse", "limit": 5},
                  {"nearest": spec, "using": "text_sparse", "limit": 5}],
        fusion="rrf", k=5)
    qpost = (post.filter(F.col("id") == 0)
             .select(F.lit(0).cast("long").alias("id"), "idx", "val"))
    want = search_sparse_points(spark, root, "sp", qpost, k=5)
    assert [r["id"] for r in solo.orderBy("rank").collect()] == \
           [r["vec_id"] for r in want.orderBy("rank").collect()]


def test_typed_sparse_leaf_honors_declared_idf(spark, tmp_path):
    from bob_vector_db_spark.operators.query_api import (
        query_points,
        search_sparse_points,
    )

    root, post = _mk_hybrid_store(spark, tmp_path, modifier="idf")
    spec = _query_spec(post, qid=0)
    got = query_points(spark, root, "sp", query={"nearest": spec},
                       vector_name="text_sparse", k=5)
    qpost = (post.filter(F.col("id") == 0)
             .select(F.lit(0).cast("long").alias("id"), "idx", "val"))
    with_idf = search_sparse_points(spark, root, "sp", qpost, k=5,
                                    modifier="idf")
    without = search_sparse_points(spark, root, "sp", qpost, k=5,
                                   modifier=None)
    assert _ranked(got) == _ranked(with_idf)
    # the modifier genuinely changed the scores (else this test is void)
    assert {t[2] for t in _ranked(got)} != {t[2] for t in _ranked(without)}


def test_sparse_leaf_score_threshold_is_suffix_cut(spark, tmp_path):
    from bob_vector_db_spark.operators.query_api import fuse_prefetch

    root, post = _mk_hybrid_store(spark, tmp_path)
    spec = _query_spec(post, qid=0)
    full = fuse_prefetch({"nearest": spec, "using": "text_sparse",
                          "limit": 10},
                         spark=spark, root=root, collection="sp"
                         ).orderBy("rank").collect()
    assert len(full) > 2
    thr = full[1]["score"]  # keep ranks 1..j where score >= thr
    cut = fuse_prefetch({"nearest": spec, "using": "text_sparse",
                         "limit": 10, "score_threshold": thr},
                        spark=spark, root=root, collection="sp"
                        ).orderBy("rank").collect()
    keep = [r for r in full if r["score"] >= thr]
    assert [(r["id"], r["score"], r["rank"]) for r in cut] == \
           [(r["id"], r["score"], r["rank"]) for r in keep]


def test_dense_surfaces_refuse_sparse_spaces(spark, tmp_path):
    from bob_vector_db_spark.operators.query_api import (
        query_points,
        search_points,
    )

    root, post = _mk_hybrid_store(spark, tmp_path)
    spec = _query_spec(post, qid=0)
    # recommend over the sparse space
    with pytest.raises(ValueError, match="SPARSE"):
        query_points(spark, root, "sp",
                     query={"recommend": {"positive": [0]}},
                     vector_name="text_sparse", k=5)
    # discover leaf in a tree over the sparse space
    with pytest.raises(ValueError, match="SPARSE"):
        query_points(spark, root, "sp",
                     prefetch=[{"discover": {"target": 0,
                                             "context": [(1, 2)]},
                                "using": "text_sparse"}],
                     fusion="rrf", k=5)
    # a dense query vector against the sparse space
    q = spark.createDataFrame([(0, [1.0, 0.0, 0.0, 0.0])],
                              "qid long, qvec array<double>")
    with pytest.raises(ValueError, match="SPARSE"):
        search_points(spark, root, "sp", q, k=5,
                      vector_name="text_sparse")
    # a sparse query against the dense space
    with pytest.raises(ValueError, match="sparse"):
        query_points(spark, root, "sp", query={"nearest": spec},
                     vector_name="vec", k=5)


def test_sparse_rescore_and_degenerate_shapes_raise(spark, tmp_path):
    from bob_vector_db_spark.operators.query_api import query_points

    root, post = _mk_hybrid_store(spark, tmp_path)
    spec = _query_spec(post, qid=0)
    with pytest.raises(ValueError, match="prefetch BRANCH"):
        query_points(spark, root, "sp",
                     prefetch=[{"nearest": spec, "using": "text_sparse"}],
                     query={"nearest": spec},
                     vector_name="text_sparse", k=5)
    with pytest.raises(ValueError, match="prefetch BRANCH"):
        query_points(spark, root, "sp",
                     prefetch=[{"nearest": spec, "using": "text_sparse",
                                "prefetch": [{"nearest": spec,
                                              "using": "text_sparse"}]}],
                     fusion="rrf", k=5)
    for bad, msg in [
        ({"indices": [1, 2], "values": [1.0]}, "ragged"),
        ({"indices": [], "values": []}, "empty"),
        ({"indices": [1, 1], "values": [1.0, 2.0]}, "repeats"),
        ({"indices": [1], "values": [float("nan")]}, "NaN"),
        ({"indices": [1], "values": [1.0], "vals": []}, "unknown keys"),
    ]:
        with pytest.raises(ValueError, match=msg):
            query_points(spark, root, "sp", query={"nearest": bad},
                         vector_name="text_sparse", k=5)
