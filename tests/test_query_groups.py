"""query_points_groups (round 12, VERDICT r11 #4): Qdrant's universal
grouped endpoint — any typed query node + group_by/group_size — routed
through the shared two-window cut, pinned exact against the dedicated
grouped operators it composes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bob_vector_db_spark.operators import upsert
from bob_vector_db_spark.operators import query_api
from bob_vector_db_spark.operators.query_tree import query_points_groups


def _mk_store(spark, tmp_path):
    root = str(tmp_path / "store")
    rows = [(1, [1.0, 0.0, 0.0], "g1"), (2, [0.0, 1.0, 0.0], "g2"),
            (10, [0.9, 0.1, 0.0], "g1"), (11, [0.8, 0.0, 0.2], "g1"),
            (12, [0.01, 0.99, 0.0], "g2"), (13, [0.0, 0.0, 1.0], "g3"),
            (14, [0.7, 0.3, 0.0], "g2"), (15, [0.6, 0.1, 0.3], None)]
    upsert.create_collection(
        spark, root, "c", id_col="id", n_buckets=4,
        df=spark.createDataFrame(
            rows, "id long, vec array<double>, grp string"),
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    return root


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_recommend_node_ties_to_recommend_groups(spark, tmp_path):
    """The VERDICT r11 #4 exactness tie: a typed recommend node through
    query_points_groups IS recommend_groups, for all three strategies."""
    root = _mk_store(spark, tmp_path)
    for strategy in ("average_vector", "best_score", "sum_scores"):
        got = query_points_groups(
            spark, root, "c", "grp",
            query={"recommend": {"positive": [1], "negative": [2],
                                 "strategy": strategy}},
            k_groups=2, group_size=2)
        want = query_api.recommend_groups(
            spark, root, "c", positive=[1], negative=[2],
            strategy=strategy, group_by="grp",
            k_groups=2, group_size=2)
        assert _rows(got) == _rows(want), strategy


def test_by_id_and_raw_vector_tie_to_search_groups(spark, tmp_path):
    root = _mk_store(spark, tmp_path)
    # by stored point id: self-excluded, like every by-id query
    got = query_points_groups(spark, root, "c", "grp", query=1,
                              k_groups=3, group_size=2)
    rows = got.collect()
    assert rows and all(r["vec_id"] != 1 for r in rows)
    # the NULL-group point never consumes a slot
    assert all(r["group"] is not None for r in rows)
    # raw vector ({'nearest': [...]} sugar) ties to search_groups
    q = spark.createDataFrame([(0, [1.0, 0.0, 0.0])],
                              "qid long, qvec array<double>")
    want = query_api.search_groups(spark, root, "c", q, "grp",
                                   k_groups=3, group_size=2)
    got2 = query_points_groups(spark, root, "c", "grp",
                               query={"nearest": [1.0, 0.0, 0.0]},
                               k_groups=3, group_size=2)
    assert _rows(got2) == _rows(want.select(
        "group", "group_rank", "vec_id",
        F.col("sim").alias("score"), "rank_in_group"))
    # a DataFrame query keeps its qid (multi-query grouped search)
    got3 = query_points_groups(spark, root, "c", "grp", query=q,
                               k_groups=3, group_size=2)
    assert got3.columns[0] == "qid"


def test_prefetch_tree_groups_candidate_bounded(spark, tmp_path):
    """Grouping a fusion tree: the pool is the fused top
    k_groups·group_size, group values fetch by id, the fused rank
    drives both windows, and the real scores ride along."""
    root = _mk_store(spark, tmp_path)
    out = query_points_groups(
        spark, root, "c", "grp",
        prefetch=[{"nearest": [1.0, 0.0, 0.0], "limit": 6},
                  {"recommend": {"positive": [1]}, "limit": 6}],
        fusion="rrf", k_groups=2, group_size=2).collect()
    assert out
    assert all(r["rank_in_group"] <= 2 and r["group_rank"] <= 2
               for r in out)
    assert all(r["group"] is not None for r in out)
    # group 1's best fused rank beats group 2's best fused rank: the
    # pool is rank-ordered, so group_rank follows first appearance
    pool = query_api.query_points(
        spark, root, "c",
        prefetch=[{"nearest": [1.0, 0.0, 0.0], "limit": 6},
                  {"recommend": {"positive": [1]}, "limit": 6}],
        fusion="rrf", k=4).orderBy("rank").collect()
    grp = {1: "g1", 2: "g2", 10: "g1", 11: "g1", 12: "g2",
           13: "g3", 14: "g2", 15: None}
    first_groups = []
    for r in pool:
        g = grp.get(r["id"])
        if g is not None and g not in first_groups:
            first_groups.append(g)
    by_rank = sorted({(r["group_rank"], r["group"]) for r in out})
    assert [g for _, g in by_rank] == first_groups[:len(by_rank)]


def test_with_lookup_and_score_threshold(spark, tmp_path):
    root = _mk_store(spark, tmp_path)
    upsert.create_collection(
        spark, root, "groups", id_col="gid", n_buckets=2,
        df=spark.createDataFrame(
            [("g1", "One"), ("g2", "Two"), ("g3", "Three")],
            "gid string, title string"))
    out = query_points_groups(spark, root, "c", "grp", query=1,
                              k_groups=2, group_size=2,
                              with_lookup="groups").collect()
    assert out and all(r["lookup_title"] is not None for r in out)
    # threshold: the cut is a suffix at both window levels
    full = query_points_groups(spark, root, "c", "grp", query=1,
                               k_groups=3, group_size=3).collect()
    thr = sorted(r["score"] for r in full)[len(full) // 2]
    cut = query_points_groups(spark, root, "c", "grp", query=1,
                              k_groups=3, group_size=3,
                              score_threshold=thr)
    want = [tuple(r) for r in full if r["score"] >= thr]
    assert sorted(map(tuple, cut.collect())) == sorted(want)


def test_groups_guards(spark, tmp_path):
    root = _mk_store(spark, tmp_path)
    with pytest.raises(ValueError, match="needs a query"):
        query_points_groups(spark, root, "c", "grp")
    with pytest.raises(ValueError, match="prefetch leaf"):
        query_points_groups(spark, root, "c", "grp",
                            query={"discover": {"target": 1,
                                                "context": [(1, 2)]}})
    # a sparse grouped query on a collection with no sparse space
    with pytest.raises(ValueError, match="sparse"):
        query_points_groups(
            spark, root, "c", "grp",
            query={"nearest": {"indices": [1], "values": [1.0]}})
    with pytest.raises(ValueError, match="unknown keys"):
        query_points_groups(
            spark, root, "c", "grp",
            query={"recommend": {"positve": [1]}})


# ---------------------------------------------------------------------------
# The MMR node (round 12, VERDICT r11 #5): Qdrant NearestQuery.mmr as a
# serialized payload — terminal and as a prefetch leaf.
# ---------------------------------------------------------------------------

def test_mmr_node_ties_to_search_points_mmr(spark, tmp_path):
    root = _mk_store(spark, tmp_path)
    got = query_api.query_points(
        spark, root, "c",
        query={"nearest": [1.0, 0.0, 0.0],
               "mmr": {"diversity": 0.4, "candidates_limit": 6}},
        k=3)
    q = spark.createDataFrame([(0, [1.0, 0.0, 0.0])],
                              "qid long, qvec array<double>")
    want = query_api.search_points_mmr(spark, root, "c", q, k=3,
                                       pool=6, lambda_=0.6)
    assert _rows(got) == _rows(want)
    # diversity 0 == the plain ranking over the pool
    plain = query_api.query_points(
        spark, root, "c",
        query={"nearest": [1.0, 0.0, 0.0],
               "mmr": {"diversity": 0.0, "candidates_limit": 8}}, k=3)
    base = query_api.query_points(
        spark, root, "c", query={"nearest": [1.0, 0.0, 0.0]}, k=3)
    assert [r["vec_id"] for r in plain.orderBy("rank").collect()] == \
           [r["vec_id"] for r in base.orderBy("rank").collect()]


def test_mmr_node_by_id_excludes_self_and_rides_tree(spark, tmp_path):
    root = _mk_store(spark, tmp_path)
    got = query_api.query_points(
        spark, root, "c",
        query={"nearest": 1,
               "mmr": {"diversity": 0.3, "candidates_limit": 6}}, k=3)
    rows = got.collect()
    assert rows and all(r["vec_id"] != 1 for r in rows)
    # as a typed prefetch leaf: branch contract (id, score=sim, rank)
    fused = query_api.query_points(
        spark, root, "c",
        prefetch=[
            {"nearest": [1.0, 0.0, 0.0],
             "mmr": {"diversity": 0.4, "candidates_limit": 6},
             "limit": 3},
            {"nearest": [0.0, 1.0, 0.0], "limit": 3},
        ],
        fusion="rrf", k=4)
    out = fused.orderBy("rank").collect()
    assert len(out) == 4
    assert [r["rank"] for r in out] == [1, 2, 3, 4]


def test_mmr_node_guards(spark, tmp_path):
    root = _mk_store(spark, tmp_path)
    with pytest.raises(ValueError, match="diversity"):
        query_api.query_points(
            spark, root, "c",
            query={"nearest": [1.0, 0, 0], "mmr": {"diversity": 2.0}})
    with pytest.raises(ValueError, match="unknown keys"):
        query_api.query_points(
            spark, root, "c",
            query={"nearest": [1.0, 0, 0], "mmr": {"lambda": 0.5}})
    with pytest.raises(ValueError, match="candidates_limit"):
        query_api.query_points(
            spark, root, "c",
            query={"nearest": [1.0, 0, 0],
                   "mmr": {"candidates_limit": 2}}, k=5)
    with pytest.raises(ValueError, match="sibling keys"):
        query_api.query_points(
            spark, root, "c",
            query={"recommend": {"positive": [1]},
                   "mmr": {"diversity": 0.5}})
    with pytest.raises(ValueError, match="rescore stage"):
        query_api.query_points(
            spark, root, "c",
            prefetch=[{"nearest": [1.0, 0, 0], "limit": 3}],
            query={"nearest": [1.0, 0, 0], "mmr": {"diversity": 0.5}})
    # a euclid space refuses (MMR needs one similarity scale)
    root2 = str(tmp_path / "store_e")
    upsert.create_collection(
        spark, root2, "e", id_col="id", n_buckets=2,
        df=spark.createDataFrame([(1, [0.0, 0.0])],
                                 "id long, vec array<double>"),
        vector_config={"vec": {"size": 2, "distance": "euclid"}})
    with pytest.raises(ValueError, match="similarity-ranked"):
        query_api.query_points(
            spark, root2, "e",
            query={"nearest": [1.0, 0.0], "mmr": {"diversity": 0.5}})


def test_rescore_then_group(spark, tmp_path):
    """query= + prefetch= together: the tree retrieves, the nearest
    query rescores the candidate union, the grouped cut shapes it."""
    root = _mk_store(spark, tmp_path)
    out = query_points_groups(
        spark, root, "c", "grp",
        prefetch=[{"nearest": [0.5, 0.5, 0.0], "limit": 6}],
        query={"nearest": [1.0, 0.0, 0.0]},
        k_groups=2, group_size=2).collect()
    assert out
    assert all(r["group_rank"] <= 2 and r["rank_in_group"] <= 2
               for r in out)
    # rescored candidates ⊆ the retrieval branch
    branch = query_api.query_points(
        spark, root, "c",
        prefetch=[{"nearest": [0.5, 0.5, 0.0], "limit": 6}],
        fusion="rrf", k=6)
    branch_ids = {r["id"] for r in branch.collect()}
    assert {r["vec_id"] for r in out} <= branch_ids


# ---------------------------------------------------------------------------
# query_batch_points (round 12): N universal-endpoint requests, one
# serialized payload, each pinned to exactly query_points(**request).
# ---------------------------------------------------------------------------

def test_batch_matches_individual_requests(spark, tmp_path):
    from bob_vector_db_spark.operators.query_tree import query_batch_points

    root = _mk_store(spark, tmp_path)
    reqs = [
        {"query": {"nearest": [1.0, 0.0, 0.0]}, "limit": 3},
        {"query": {"recommend": {"positive": [1], "negative": [2]}},
         "limit": 3},
        {"prefetch": [{"nearest": [0.0, 1.0, 0.0], "limit": 4},
                      {"recommend": {"positive": [2]}, "limit": 4}],
         "fusion": "rrf", "limit": 3},
    ]
    batch = query_batch_points(spark, root, "c", reqs)
    rows = batch.orderBy("req", "rank").collect()
    assert {r["req"] for r in rows} == {0, 1, 2}
    for i, req in enumerate(reqs):
        single = query_api.query_points(
            spark, root, "c", query=req.get("query"),
            prefetch=req.get("prefetch"),
            fusion=req.get("fusion", "rrf"),
            k=req["limit"]).orderBy("rank").collect()
        got = [r for r in rows if r["req"] == i]
        want = [(s["vec_id"] if "vec_id" in s.asDict() else s["id"],
                 s["rank"]) for s in single]
        assert [(g["id"], g["rank"]) for g in got] == want, i


def test_batch_guards(spark, tmp_path):
    from bob_vector_db_spark.operators.query_tree import query_batch_points

    root = _mk_store(spark, tmp_path)
    with pytest.raises(ValueError, match="at least one"):
        query_batch_points(spark, root, "c", [])
    with pytest.raises(ValueError, match="unknown keys"):
        query_batch_points(spark, root, "c",
                           [{"query": {"nearest": [1.0, 0, 0]},
                             "limt": 3}])
    with pytest.raises(ValueError, match="sample"):
        query_batch_points(spark, root, "c",
                           [{"query": {"sample": "random"}}])


def test_sparse_retrieve_dense_rescore_composes(spark, tmp_path):
    """The SPLADE pattern: a SPARSE prefetch branch retrieves, the dense
    nearest query rescores exactly those candidates — one payload."""
    from bob_vector_db_spark.operators.sparse import (
        build_sparse_index,
        postings_from_text,
    )

    root = str(tmp_path / "store")
    docs = spark.createDataFrame(
        [(i, f"tok{i % 13} tok{i % 7} shared word{i % 3}",
          [1.0 - 0.01 * i, 0.01 * i, (i % 3) * 0.1])
         for i in range(40)],
        "id long, text string, vec array<double>")
    post = postings_from_text(docs, id_col="id", text_col="text",
                              vocab_size=128)
    pts = (post.groupBy("id")
           .agg(F.array_sort(F.collect_list(F.struct("idx", "val")))
                .alias("z"))
           .select("id", F.col("z.idx").alias("indices"),
                   F.col("z.val").alias("values"))
           .join(docs.select("id", "vec"), "id"))
    upsert.create_collection(
        spark, root, "sp", df=pts, id_col="id", n_buckets=4,
        vector_config={"vec": {"size": 3, "distance": "cosine"},
                       "text_sparse": {"kind": "sparse"}})
    build_sparse_index(spark, root, "sp", n_dim_buckets=8)
    qrows = (post.filter(F.col("id") == 0)
             .select("idx", "val").collect())
    spec = {"indices": [int(r["idx"]) for r in qrows],
            "values": [float(r["val"]) for r in qrows]}
    out = query_api.query_points(
        spark, root, "sp",
        prefetch=[{"nearest": spec, "using": "text_sparse",
                   "limit": 8}],
        query={"nearest": [1.0, 0.0, 0.0]}, vector_name="vec",
        k=5).orderBy("rank").collect()
    assert out
    branch = query_api.query_points(
        spark, root, "sp",
        prefetch=[{"nearest": spec, "using": "text_sparse",
                   "limit": 8},
                  {"nearest": spec, "using": "text_sparse",
                   "limit": 8}],
        fusion="rrf", k=8)
    branch_ids = {r["id"] for r in branch.collect()}
    assert {r["vec_id"] for r in out} <= branch_ids
    # rescored scores are the dense cosine, ranked native descending
    assert all(out[i]["score"] >= out[i + 1]["score"]
               for i in range(len(out) - 1))


def test_grouped_text_and_sparse_exact(spark, tmp_path):
    """EXACT grouped posting-index searches (round 12): the BM25 and
    sparse grouped cuts are corpus-complete — the flat ranking's top hit
    leads group_rank 1, per-group hits are score-ordered suffix-free,
    NULL groups never consume slots."""
    from bob_vector_db_spark.operators.sparse import (
        build_sparse_index,
        postings_from_text,
    )
    from bob_vector_db_spark.operators.text_search import build_text_index
    from bob_vector_db_spark.operators.query_tree import (
        query_points_groups as qpg,
    )

    root = str(tmp_path / "store")
    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} tok{i % 3} shared",
          f"g{i % 4}" if i % 7 else None)
         for i in range(40)],
        "id long, text string, grp string")
    post = postings_from_text(docs, id_col="id", text_col="text",
                              vocab_size=64)
    pts = (post.groupBy("id")
           .agg(F.array_sort(F.collect_list(F.struct("idx", "val")))
                .alias("z"))
           .select("id", F.col("z.idx").alias("indices"),
                   F.col("z.val").alias("values"))
           .join(docs, "id"))
    upsert.create_collection(
        spark, root, "d", df=pts, id_col="id", n_buckets=4,
        vector_config={"text_sparse": {"kind": "sparse"}})
    build_text_index(spark, root, "d", text_col="text", n_term_buckets=8)
    build_sparse_index(spark, root, "d", n_dim_buckets=8)

    # grouped BM25
    gt = qpg(spark, root, "d", "grp",
             query={"text": {"column": "text",
                             "terms": ["tok1", "shared"]}},
             k_groups=3, group_size=2).collect()
    assert gt and all(r["group"] is not None for r in gt)
    flat = query_api.search_text_points(spark, root, "d",
                                        ["tok1", "shared"], k=40,
                                        text_col="text")
    top_by_group = {}
    for r in flat.orderBy("rank").collect():
        g = f"g{r['id'] % 4}" if r["id"] % 7 else None
        if g is not None and g not in top_by_group:
            top_by_group[g] = r["score"]
    best = {r["group"]: r["score"] for r in gt if r["rank_in_group"] == 1}
    assert best == {g: top_by_group[g]
                    for g in sorted(top_by_group,
                                    key=lambda x: (-top_by_group[x], x))[:3]}

    # grouped sparse
    qrows = post.filter(F.col("id") == 0).select("idx", "val").collect()
    spec = {"indices": [int(r["idx"]) for r in qrows],
            "values": [float(r["val"]) for r in qrows]}
    gs = qpg(spark, root, "d", "grp", query={"nearest": spec},
             k_groups=3, group_size=2).collect()
    assert gs and all(r["group"] is not None for r in gs)
    assert all(r["rank_in_group"] <= 2 and r["group_rank"] <= 3
               for r in gs)
    flat_s = query_api.search_sparse_points(
        spark, root, "d",
        post.filter(F.col("id") == 0), k=40)
    fs = {r["vec_id"]: r["sim"] for r in flat_s.collect()}
    # every grouped hit carries its flat sparse score
    assert all(abs(fs[r["vec_id"]] - r["score"]) < 1e-9 for r in gs)


def test_grouped_text_and_sparse_refuse_tenant(spark, tmp_path):
    """ADVICE r12: the grouped BM25 / sparse branches must REFUSE tenant=
    (like query_points' sparse terminal) instead of silently returning
    cross-tenant hits — tenant scoping composes through the filter DSL."""
    root = _mk_store(spark, tmp_path)
    with pytest.raises(ValueError, match="doesn't thread tenant="):
        query_points_groups(
            spark, root, "c", "grp",
            query={"text": {"column": "text", "terms": ["tok1"]}},
            k_groups=2, group_size=2, tenant="t1")
    with pytest.raises(ValueError, match="doesn't thread tenant="):
        query_points_groups(
            spark, root, "c", "grp",
            query={"nearest": {"indices": [1], "values": [1.0]}},
            k_groups=2, group_size=2, tenant="t1")
