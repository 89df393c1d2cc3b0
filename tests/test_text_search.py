"""BM25 retrieval (operators/text_search.py) vs a pure-Python reference."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bob_vector_db_spark.operators.text_search import bm25_topk


def _py_bm25(corpus: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {t: sum(1 for d in toks.values() if t in d) for t in terms}
    scores = {}
    for i, d in toks.items():
        s = 0.0
        for t in terms:
            tf = d.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(d) / avgdl))
        if s > 0:
            scores[i] = round(s, 6)
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


def test_bm25_matches_python_reference(spark):
    corpus = {
        1: "spark shuffles data across the cluster",
        2: "vector search over spark data frames",
        3: "the quick brown fox",
        4: "data data data everywhere and spark too",
        5: "spark spark spark spark",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = [(r["id"], r["score"]) for r in
           bm25_topk(df, ["spark", "data"], k=5).orderBy("rank").collect()]
    assert got == _py_bm25(corpus, ["spark", "data"])[:5]


def test_bm25_rare_term_outscores_common(spark):
    """A doc matching only the rare term must beat a doc matching only the
    ubiquitous one (the idf property that makes BM25 not-just-tf)."""
    rows = [(i, "common filler words") for i in range(20)]
    rows += [(100, "common plus nothing else"), (101, "rare gem here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["rank"] for r in
           bm25_topk(df, ["common", "rare"], k=30).collect()}
    assert got[101] == 1  # rare-term doc ranks first


def test_bm25_case_insensitive_and_k_bound(spark):
    df = spark.createDataFrame(
        [(1, "Spark SPARK spark"), (2, "no match at all")],
        "doc_id long, text string")
    out = bm25_topk(df, ["SPARK"], k=5).collect()
    assert len(out) == 1 and out[0]["id"] == 1


def test_rrf_fuse_properties(spark):
    from bob_vector_db_spark.operators.text_search import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id long, rank int")
    b = spark.createDataFrame([(3, 1), (4, 2)], "id long, rank int")
    out = {r["id"]: (r["rrf_score"], r["rank"]) for r in
           rrf_fuse([a, b], k=10).collect()}
    # doc 3: in both lists (ranks 3 and 1) -> 1/63 + 1/61
    assert out[3][0] == round(1 / 63 + 1 / 61, 6)
    assert out[3][1] == 1  # two sources beat any single source here
    # doc 4 only in list b -> 1/62, doc 1 only in a -> 1/61
    assert out[4][0] == round(1 / 62, 6)
    assert out[1][0] == round(1 / 61, 6)
    # deterministic ordering: score desc, id asc (docs 2 and 4 tie at 1/62)
    ranks = [i for i, _ in sorted(out.items(), key=lambda kv: kv[1][1])]
    assert ranks == [3, 1, 2, 4]


def test_dbsf_fuse_normalization(spark):
    import math

    from bob_vector_db_spark.operators.text_search import dbsf_fuse

    a = spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)],
                              "id long, score double")
    # degenerate list: every score equal -> sigma = 0 -> each member is 0.5
    b = spark.createDataFrame([(3, 5.0), (4, 5.0)], "id long, score double")
    out = {r["id"]: (r["dbsf_score"], r["rank"]) for r in
           dbsf_fuse([a, b], k=10).collect()}
    sd = math.sqrt(2.0 / 3.0)  # population stddev of [1, 2, 3]
    norm = {s: (s - (2.0 - 3 * sd)) / (6 * sd) for s in (1.0, 2.0, 3.0)}
    assert out[3][0] == round(norm[3.0] + 0.5, 6)
    assert out[3][1] == 1
    assert out[2][0] == round(norm[2.0], 6) == 0.5  # the list mean is 0.5
    assert out[4][0] == 0.5
    assert out[1][0] == round(norm[1.0], 6)
    # ties (2 and 4 both 0.5) break by id asc
    ranks = [i for i, _ in sorted(out.items(), key=lambda kv: kv[1][1])]
    assert ranks == [3, 2, 4, 1]


def test_fuse_prefetch_nested_equals_manual(spark):
    from pyspark.sql import functions as F

    from bob_vector_db_spark.operators.query_api import fuse_prefetch
    from bob_vector_db_spark.operators.text_search import dbsf_fuse, rrf_fuse

    a = spark.createDataFrame(
        [(1, 0.9, 1), (2, 0.5, 2), (3, 0.4, 3)],
        "id long, score double, rank int")
    b = spark.createDataFrame(
        [(3, 7.0, 1), (4, 6.0, 2)], "id long, score double, rank int")
    tree = {"fusion": "dbsf", "k": 10,
            "prefetch": [a, {"fusion": "rrf", "prefetch": [a, b]}]}
    got = {(r["id"], r["score"], r["rank"])
           for r in fuse_prefetch(tree).collect()}
    inner = rrf_fuse([a, b], k=10).select(
        "id", F.col("rrf_score").alias("score"), "rank")
    manual = {(r["id"], r["dbsf_score"], r["rank"])
              for r in dbsf_fuse([a, inner], k=10).collect()}
    assert got == manual


def test_fuse_prefetch_errors(spark):
    import pytest

    from bob_vector_db_spark.operators.query_api import fuse_prefetch

    a = spark.createDataFrame([(1, 1.0, 1)], "id long, score double, rank int")
    with pytest.raises(ValueError, match="at least one prefetch"):
        fuse_prefetch({"fusion": "rrf", "prefetch": []})
    with pytest.raises(ValueError, match="unknown fusion"):
        fuse_prefetch({"fusion": "borda", "prefetch": [a]})
    with pytest.raises(TypeError, match="DataFrame leaf"):
        fuse_prefetch(42)


def test_prefetch_typed_query_nodes(spark, tmp_path):
    """Round 11 (VERDICT r10 #1): typed dict nodes as prefetch LEAVES —
    the fully serializable Qdrant query tree.  The payload form must
    equal the manually-built branches, per-leaf filter/limit/using must
    apply, nearest works by raw vector and by stored id, formula nodes
    rescore their own typed children, and unknown node kinds / extra
    keys / missing store context raise."""
    import pytest
    from pyspark.sql import functions as F

    from bob_vector_db_spark.operators import query_api, upsert
    from bob_vector_db_spark.operators.filters import Filter, MatchValue
    from bob_vector_db_spark.operators.text_search import build_text_index

    root = str(tmp_path / "store")
    rows = [
        (1, [1.0, 0.0, 0.0], "alpha news today", "a"),
        (2, [0.9, 0.1, 0.0], "vector search engine", "a"),
        (3, [0.0, 1.0, 0.0], "vector stream join", "b"),
        (4, [0.0, 0.9, 0.1], "weather report sunny", "b"),
        (5, [0.5, 0.5, 0.0], "vector join stream vector", "a"),
    ]
    upsert.create_collection(
        spark, root, "c", id_col="id", n_buckets=4,
        df=spark.createDataFrame(
            rows, "id long, vec array<double>, text string, tag string"),
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    build_text_index(spark, root, "c", text_col="text", n_term_buckets=4)

    # the one-payload tree equals the manually-built branches
    got = query_api.query_points(
        spark, root, "c",
        prefetch=[{"recommend": {"positive": [1]}, "limit": 4},
                  {"text": {"column": "text", "terms": ["vector"]},
                   "limit": 4}],
        fusion="rrf", k=5).collect()
    reco = query_api.recommend_points(
        spark, root, "c", positive=[1], k=4).select(
        F.col("vec_id").alias("id"), "score", "rank")
    bm = query_api.search_text_points(spark, root, "c", ["vector"], k=4,
                                      text_col="text")
    manual = query_api.fuse_prefetch(
        {"fusion": "rrf", "k": 5, "prefetch": [reco, bm]}).collect()
    assert {(r["id"], r["score"], r["rank"]) for r in got} == \
           {(r["id"], r["score"], r["rank"]) for r in manual}
    # 1 is a recommend example (excluded there) and has no BM25 term hit
    assert got and all(r["id"] != 1 for r in got)

    # nearest by raw vector, scoped by a per-leaf filter + using
    near = query_api.fuse_prefetch(
        {"nearest": [1.0, 0.0, 0.0], "limit": 2, "using": "vec",
         "filter": Filter(must=[MatchValue("tag", "b")])},
        spark=spark, root=root, collection="c").collect()
    assert near and {r["id"] for r in near} <= {3, 4}
    # nearest by stored point id excludes the point itself, and honors
    # the tree's round_to like the raw-vector form (review r11 pass 2)
    byid = query_api.fuse_prefetch(
        {"nearest": 1, "limit": 3}, round_to=2, spark=spark, root=root,
        collection="c").collect()
    assert byid and all(r["id"] != 1 for r in byid)
    assert all(round(r["score"], 2) == r["score"] for r in byid)

    # discover/context leaves nest under a fusion parent
    nested = query_api.fuse_prefetch(
        {"fusion": "dbsf", "prefetch": [
            {"discover": {"target": 1, "context": [(2, 3)]}, "limit": 3},
            {"context": [(2, 3)], "limit": 3},
        ]}, spark=spark, root=root, collection="c").collect()
    # 2 and 3 are context examples in BOTH branches (excluded); 1 is the
    # discover target only, so the context branch may legitimately
    # surface it in the fusion
    assert nested and all(r["id"] not in (2, 3) for r in nested)

    # a formula node rescores its own typed children
    form = query_api.fuse_prefetch(
        {"formula": {"sum": ["$score", 10.0]}, "limit": 3,
         "prefetch": [{"text": {"column": "text", "terms": ["vector"]}}]},
        spark=spark, root=root, collection="c").collect()
    assert form and all(r["score"] > 10.0 for r in form)

    # internal score order (review r11): a nearest / average_vector leaf
    # on a DISTANCE-metric collection negates its raw distance so every
    # branch feeds a DBSF parent the same larger-is-better convention
    root_e = str(tmp_path / "s_euclid")
    upsert.create_collection(
        spark, root_e, "c", id_col="id", n_buckets=2,
        df=spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.5, 0.5])],
            "id long, vec array<double>"),
        vector_config={"vec": {"size": 2, "distance": "euclid"}})
    near_e = query_api.fuse_prefetch(
        {"nearest": [1.0, 0.0], "limit": 3}, spark=spark, root=root_e,
        collection="c").orderBy("rank").collect()
    assert near_e and all(r["score"] <= 0 for r in near_e)
    assert near_e[0]["id"] == 1  # closest ranks first, score = -distance
    assert near_e[0]["score"] >= near_e[-1]["score"]
    avg_e = query_api.fuse_prefetch(
        {"recommend": {"positive": [1], "strategy": "average_vector"},
         "limit": 2}, spark=spark, root=root_e,
        collection="c").collect()
    assert avg_e and all(r["score"] <= 0 for r in avg_e)

    # prefetch + NearestQuery (Qdrant's two-stage retrieval): the text
    # branch RETRIEVES {2,3,5} ('vector' docs), point 1's stored vector
    # RESCORES exactly them by cosine (self excluded, native order)
    two = query_api.query_points(
        spark, root, "c",
        prefetch=[{"text": {"column": "text", "terms": ["vector"]},
                   "limit": 4}],
        query={"nearest": 1}, k=3).orderBy("rank").collect()
    assert [r["vec_id"] for r in two] == [2, 5, 3]
    assert two[0]["score"] > two[1]["score"] > two[2]["score"]
    # the node without prefetch is sugar for a plain (by-id) search
    sugar = query_api.query_points(
        spark, root, "c", query={"nearest": [1.0, 0.0, 0.0]},
        k=2).collect()
    plain = query_api.search_points(
        spark, root, "c",
        spark.createDataFrame([(0, [1.0, 0.0, 0.0])],
                              "qid long, qvec array<double>"),
        k=2).collect()
    assert {(r["vec_id"], r["sim"]) for r in sugar} == \
           {(r["vec_id"], r["sim"]) for r in plain}
    with pytest.raises(ValueError, match="needs prefetch"):
        query_api.query_points(spark, root, "c", prefetch=[],
                               query={"nearest": 1})
    # multi-stage as a NESTED node: a nearest leaf with its OWN prefetch
    # (Qdrant Prefetch(prefetch=[...], query=NearestQuery)) — the text
    # stage retrieves, point 1's vector rescores, usable as a branch
    ms = query_api.fuse_prefetch(
        {"nearest": 1, "limit": 3,
         "prefetch": [{"text": {"column": "text", "terms": ["vector"]},
                       "limit": 4}]},
        spark=spark, root=root, collection="c").orderBy("rank").collect()
    assert [r["id"] for r in ms] == [2, 5, 3]
    assert [(r["id"], r["score"], r["rank"]) for r in ms] == \
           [(r["vec_id"], r["score"], r["rank"]) for r in two]

    # per-leaf score_threshold (Qdrant Prefetch.score_threshold): cut in
    # the kind's NATIVE convention — BM25 >=, euclid nearest <= —
    # and a rank-suffix cut, so surviving ranks stay contiguous
    t_all = query_api.fuse_prefetch(
        {"text": {"column": "text", "terms": ["vector"]}, "limit": 5},
        spark=spark, root=root, collection="c").collect()
    scores = sorted(r["score"] for r in t_all)
    assert len(t_all) >= 2 and scores[0] < scores[-1]
    mid = (scores[-1] + scores[-2]) / 2  # cuts everything but the top hit
    t_thr = query_api.fuse_prefetch(
        {"text": {"column": "text", "terms": ["vector"]},
         "score_threshold": mid, "limit": 5},
        spark=spark, root=root, collection="c").orderBy("rank").collect()
    assert len(t_thr) == 1 and t_thr[0]["score"] >= mid  # genuine cut
    assert [r["rank"] for r in t_thr] == [1]
    # recommend leaf on the euclid store: average_vector scores are
    # distances, the cut flips to <= (then negates to internal order)
    r_all = query_api.fuse_prefetch(
        {"recommend": {"positive": [1], "strategy": "average_vector"},
         "limit": 3}, spark=spark, root=root_e,
        collection="c").orderBy("rank").collect()
    d0 = -r_all[0]["score"]  # nearest candidate's distance
    r_thr = query_api.fuse_prefetch(
        {"recommend": {"positive": [1], "strategy": "average_vector"},
         "limit": 3, "score_threshold": d0 + 1e-6},
        spark=spark, root=root_e, collection="c").collect()
    assert len(r_thr) == 1 and r_thr[0]["id"] == r_all[0]["id"]
    # context leaf: >= on ctx_score (0 = inside the zone)
    c_thr = query_api.fuse_prefetch(
        {"context": [(2, 3)], "limit": 5, "score_threshold": -0.01},
        spark=spark, root=root, collection="c").collect()
    assert c_thr and all(r["score"] >= -0.01 for r in c_thr)
    n_thr = query_api.fuse_prefetch(
        {"nearest": [1.0, 0.0], "limit": 3, "score_threshold": 1.2},
        spark=spark, root=root_e, collection="c").collect()
    # euclid: the threshold is a MAX DISTANCE (native), applied before
    # the internal-order negation — scores return negated, so ≥ -1.2
    assert n_thr and all(r["score"] >= -1.2 for r in n_thr)
    assert {r["id"] for r in n_thr} == {1, 3}  # 2 is at distance √2
    with pytest.raises(ValueError, match="unknown keys"):
        query_api.fuse_prefetch(
            {"discover": {"target": 1, "context": [(2, 3)]},
             "score_threshold": 0.5},
            spark=spark, root=root, collection="c")

    # guards: unknown kind, two kinds, stray keys, missing context
    with pytest.raises(ValueError, match="exactly one of"):
        query_api.fuse_prefetch({"recommendz": {"positive": [1]}},
                                spark=spark, root=root, collection="c")
    with pytest.raises(ValueError, match="exactly one of"):
        query_api.fuse_prefetch({"recommend": {"positive": [1]},
                                 "context": [(2, 3)]},
                                spark=spark, root=root, collection="c")
    with pytest.raises(ValueError, match="unknown keys"):
        query_api.fuse_prefetch({"recommend": {"positive": [1]},
                                 "bogus": 1},
                                spark=spark, root=root, collection="c")
    with pytest.raises(ValueError, match="unknown keys"):
        query_api.fuse_prefetch(
            {"text": {"column": "text", "termz": ["vector"]}},
            spark=spark, root=root, collection="c")
    # typos INSIDE a recommend/discover spec raise too (review r11)
    with pytest.raises(ValueError, match="unknown keys"):
        query_api.fuse_prefetch(
            {"recommend": {"positive": [1], "negitive": [2]}},
            spark=spark, root=root, collection="c")
    with pytest.raises(ValueError, match="unknown keys"):
        query_api.fuse_prefetch(
            {"discover": {"target": 1, "contxt": [(2, 3)]}},
            spark=spark, root=root, collection="c")
    # a filter on a FUSION node would be silently dropped — refuse
    with pytest.raises(ValueError, match="unknown keys"):
        query_api.fuse_prefetch(
            {"fusion": "rrf", "prefetch": [reco], "filter": "x"},
            spark=spark, root=root, collection="c")
    with pytest.raises(ValueError, match="'terms'.*or.*'query'"):
        query_api.fuse_prefetch(
            {"text": {"column": "text"}},
            spark=spark, root=root, collection="c")
    with pytest.raises(ValueError, match="STORED collection"):
        query_api.fuse_prefetch({"recommend": {"positive": [1]}})


def test_normalize_text_masks_pii_and_collapses(spark):
    from bob_vector_db_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(1, "Contact Bob.Smith+x@Example.org  NOW!\tsee https://ex.com/a?b=1 \x07end")],
        "id long, text string")
    got = df.select(normalize_text(F.col("text")).alias("t")).first()["t"]
    assert got == "contact <email> now! see <url> end"


def test_chunk_tokens_windows_and_tail(spark):
    from bob_vector_db_spark.functions.text import chunk_tokens
    from bob_vector_db_spark.functions.text import ws_tokens

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "id long, text string")
    rows = (df.select(F.explode(chunk_tokens(
        ws_tokens(F.col("text")), chunk_size=4, overlap=2)).alias("c"))
        .select("c.chunk_idx", "c.chunk").collect())
    chunks = {r["chunk_idx"]: r["chunk"] for r in rows}
    # stride 2: 1 + ceil((10-4)/2) = 4 windows at starts 0,2,4,6; the last
    # one reaches the final token, so every token is covered
    assert chunks[0] == "t0 t1 t2 t3"
    assert chunks[1] == "t2 t3 t4 t5"
    assert chunks[3] == "t6 t7 t8 t9"
    assert len(chunks) == 4
    # a doc shorter than one chunk emits exactly one window
    short = spark.createDataFrame([(1, "a b")], "id long, text string")
    out = short.select(F.explode(chunk_tokens(
        ws_tokens(F.col("text")), chunk_size=4, overlap=2)).alias("c")).collect()
    assert len(out) == 1 and out[0]["c"]["chunk"] == "a b"


def test_chunk_tokens_rejects_bad_overlap():
    import pytest
    from pyspark.sql import functions as SF
    from bob_vector_db_spark.functions.text import chunk_tokens
    with pytest.raises(ValueError, match="overlap"):
        chunk_tokens(SF.col("x"), chunk_size=4, overlap=4)


def test_chunk_tokens_coverage_sweep(spark):
    """Invariants across configs and lengths: window starts advance by
    stride, every token appears in some window, the last window reaches the
    final token, and window count matches the closed-form formula."""
    import math as m
    from bob_vector_db_spark.functions.text import chunk_tokens, ws_tokens

    lengths = list(range(1, 41))
    df = spark.createDataFrame(
        [(n, " ".join(f"w{i}" for i in range(n))) for n in lengths],
        "n int, text string")
    for chunk, overlap in [(4, 2), (8, 3), (16, 4), (5, 0)]:
        stride = chunk - overlap
        rows = (df.select("n", F.explode(chunk_tokens(
                    ws_tokens(F.col("text")), chunk_size=chunk,
                    overlap=overlap)).alias("c"))
                .select("n", "c.chunk_idx", "c.chunk").collect())
        by_n: dict[int, dict[int, list[str]]] = {}
        for r in rows:
            by_n.setdefault(r["n"], {})[r["chunk_idx"]] = r["chunk"].split(" ")
        for n in lengths:
            chunks = by_n[n]
            want = 1 + m.ceil(max(0, n - chunk) / stride)
            assert len(chunks) == want, (n, chunk, overlap, len(chunks))
            seen = set()
            for i in sorted(chunks):
                toks = chunks[i]
                assert toks[0] == f"w{i * stride}"      # start = i·stride
                assert len(toks) <= chunk
                seen.update(toks)
            assert seen == {f"w{i}" for i in range(n)}  # total coverage
            assert chunks[max(chunks)][-1] == f"w{n-1}"  # tail reached


def test_bm25_empty_corpus_returns_empty(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    out = bm25_topk(df, ["anything"], k=5)
    assert out.count() == 0
    assert set(out.columns) == {"id", "score", "rank"}


def test_rrf_fuse_empty_list_raises(spark):
    import pytest

    from bob_vector_db_spark.operators.text_search import rrf_fuse
    with pytest.raises(ValueError, match="at least one ranked list"):
        rrf_fuse([])


def test_bm25_plan_has_no_corpus_side_merge_join(spark):
    """Doc length rides the token explode, so the scored stream must never
    shuffle-join back to a corpus-sized table: the only join in the plan is
    the broadcast of the per-term df aggregate."""
    docs = spark.createDataFrame(
        [(i, f"term{i % 5} filler text {i}") for i in range(200)],
        "doc_id long, text string")
    plan = bm25_topk(docs, ["term1", "term2"], k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


# --- round 5: persisted inverted index --------------------------------------

def _mk_doc_store(spark, tmp_path, rows):
    from bob_vector_db_spark.operators import upsert

    root = str(tmp_path / "store")
    df = spark.createDataFrame(rows, "id long, text string")
    upsert.create_collection(spark, root, "docs", df=df, n_buckets=4)
    return root, df


def test_bm25_indexed_matches_in_memory(spark, tmp_path):
    from bob_vector_db_spark.operators.text_search import (
        bm25_topk_indexed,
        build_text_index,
    )

    rows = [(i, f"alpha beta{' gamma' * (i % 4)} delta{i % 7} alpha")
            for i in range(120)]
    root, df = _mk_doc_store(spark, tmp_path, rows)
    build_text_index(spark, root, "docs", text_col="text", n_term_buckets=8)
    terms = ["alpha", "gamma", "delta3"]
    mem = sorted(map(tuple, bm25_topk(df, terms, k=10, id_col="id",
                                      text_col="text").collect()))
    idx = sorted(map(tuple, bm25_topk_indexed(
        spark, root, "docs", terms, k=10, text_col="text").collect()))
    assert idx == mem and len(idx) == 10


def test_bm25_indexed_prunes_term_buckets(spark, tmp_path):
    from bob_vector_db_spark.operators.text_search import (
        bm25_topk_indexed,
        build_text_index,
    )
    from bob_vector_db_spark.plans.inspect import assert_partition_filters

    rows = [(i, f"w{i % 50} common filler") for i in range(100)]
    root, _ = _mk_doc_store(spark, tmp_path, rows)
    build_text_index(spark, root, "docs", text_col="text", n_term_buckets=16)
    out = bm25_topk_indexed(spark, root, "docs", ["w3", "common"], k=5,
                            text_col="text")
    assert_partition_filters(out, "term_bucket")


def test_bm25_index_staleness_and_rebuild(spark, tmp_path):
    """Mutating the collection must invalidate the index (loud), and a
    rebuild must reflect the mutation in the results."""
    import pytest

    from bob_vector_db_spark.operators import upsert
    from bob_vector_db_spark.operators.text_search import (
        bm25_topk_indexed,
        build_text_index,
        text_index_is_fresh,
    )

    rows = [(i, "plain filler text") for i in range(50)]
    root, _ = _mk_doc_store(spark, tmp_path, rows)
    build_text_index(spark, root, "docs", text_col="text")
    assert text_index_is_fresh(root, "docs", "text")
    hit = spark.createDataFrame(
        [(999, ("needle " * 10).strip())], "id long, text string")
    upsert.upsert(spark, root, "docs", hit)
    assert not text_index_is_fresh(root, "docs", "text")
    with pytest.raises(ValueError, match="stale|rebuild"):
        bm25_topk_indexed(spark, root, "docs", ["needle"], k=5,
                          text_col="text")
    build_text_index(spark, root, "docs", text_col="text")
    got = bm25_topk_indexed(spark, root, "docs", ["needle"], k=5,
                            text_col="text").collect()
    assert [r["id"] for r in got] == [999]


def test_bm25_index_empty_collection(spark, tmp_path):
    from bob_vector_db_spark.operators.text_search import (
        bm25_topk_indexed,
        build_text_index,
    )

    root, _ = _mk_doc_store(spark, tmp_path, [])
    build_text_index(spark, root, "docs", text_col="text")
    out = bm25_topk_indexed(spark, root, "docs", ["anything"], k=5,
                            text_col="text")
    assert out.count() == 0
    assert out.columns == ["id", "score", "rank"]


def test_bm25_refresh_matches_fresh_build(spark, tmp_path):
    """Incremental refresh (delta log → append postings at gen g + masks)
    must answer EXACTLY like the in-memory BM25 on the final corpus:
    stats (n_docs, avgdl), df, tf all reflect upserts, overwrites and
    deletes absorbed without a rebuild."""
    from bob_vector_db_spark.operators import upsert
    from bob_vector_db_spark.operators.text_search import (
        bm25_topk_indexed,
        build_text_index,
        refresh_text_index,
        text_index_is_fresh,
    )

    rows = [(i, f"alpha beta{' gamma' * (i % 3)} delta{i % 5}")
            for i in range(100)]
    root, _ = _mk_doc_store(spark, tmp_path, rows)
    build_text_index(spark, root, "docs", text_col="text", n_term_buckets=8)
    # overwrite 5 docs, add 10, delete 7
    upsert.upsert(spark, root, "docs", spark.createDataFrame(
        [(i, "alpha alpha alpha rewritten") for i in range(5)]
        + [(i, "gamma fresh appended") for i in range(100, 110)],
        "id long, text string"))
    upsert.delete_points(spark, root, "docs", list(range(20, 27)))
    assert not text_index_is_fresh(root, "docs", "text")
    imeta = refresh_text_index(spark, root, "docs", text_col="text")
    assert text_index_is_fresh(root, "docs", "text")
    assert imeta["n_docs"] == 100 + 10 - 7 and imeta["generation"] == 1

    final = upsert.read_collection(spark, root, "docs")
    terms = ["alpha", "gamma", "delta3"]
    mem = sorted(map(tuple, bm25_topk(final, terms, k=10, id_col="id",
                                      text_col="text").collect()))
    idx = sorted(map(tuple, bm25_topk_indexed(
        spark, root, "docs", terms, k=10, text_col="text").collect()))
    assert idx == mem

    # second refresh round on top of the first
    upsert.upsert(spark, root, "docs", spark.createDataFrame(
        [(200, "delta3 delta3 delta3")], "id long, text string"))
    refresh_text_index(spark, root, "docs", text_col="text")
    final = upsert.read_collection(spark, root, "docs")
    mem = sorted(map(tuple, bm25_topk(final, terms, k=10, id_col="id",
                                      text_col="text").collect()))
    idx = sorted(map(tuple, bm25_topk_indexed(
        spark, root, "docs", terms, k=10, text_col="text").collect()))
    assert idx == mem


def test_match_text_requires_all_tokens_and_respects_refresh(spark, tmp_path):
    from bob_vector_db_spark.operators import upsert
    from bob_vector_db_spark.operators.text_search import (
        build_text_index,
        match_text_ids,
        refresh_text_index,
    )

    rows = [(1, "alpha beta gamma"), (2, "alpha beta"), (3, "beta gamma"),
            (4, "alpha beta gamma delta")]
    root, _ = _mk_doc_store(spark, tmp_path, rows)
    build_text_index(spark, root, "docs", text_col="text", n_term_buckets=8)
    got = {r["id"] for r in
           match_text_ids(spark, root, "docs", "Alpha  GAMMA",
                          text_col="text").collect()}
    assert got == {1, 4}  # every token must match, case-insensitive
    # mutation → stale raises; refresh → new doc found, deleted doc gone
    upsert.upsert(spark, root, "docs", spark.createDataFrame(
        [(9, "gamma alpha extra")], "id long, text string"))
    upsert.delete_points(spark, root, "docs", [1])
    import pytest as _pt
    with _pt.raises(ValueError, match="stale"):
        match_text_ids(spark, root, "docs", "alpha gamma", text_col="text")
    refresh_text_index(spark, root, "docs", text_col="text")
    got = {r["id"] for r in
           match_text_ids(spark, root, "docs", "alpha gamma",
                          text_col="text").collect()}
    assert got == {4, 9}


def test_bm25_mask_compaction_folds_both_artifacts(spark, tmp_path):
    """BM25 carries TWO masked artifacts (postings + doclens); compaction
    must fold masks into BOTH before clearing them, or stale doclens rows
    would resurface in the corpus stats.  With threshold 0 every refresh
    compacts — results and (n_docs, avgdl) must still equal the in-memory
    BM25 over the final corpus."""
    import os

    from bob_vector_db_spark.operators import upsert
    from bob_vector_db_spark.operators.index import (
        _mask_row_count,
        index_path,
    )
    from bob_vector_db_spark.operators.text_search import (
        bm25_topk_indexed,
        build_text_index,
        refresh_text_index,
    )

    rows = [(i, f"alpha beta{' gamma' * (i % 3)} delta{i % 5}")
            for i in range(80)]
    root, _ = _mk_doc_store(spark, tmp_path, rows)
    build_text_index(spark, root, "docs", text_col="text", n_term_buckets=8)
    upsert.upsert(spark, root, "docs", spark.createDataFrame(
        [(i, "alpha rewritten") for i in range(4)]
        + [(100 + i, "gamma fresh") for i in range(5)],
        "id long, text string"))
    upsert.delete_points(spark, root, "docs", [10, 11, 12])
    imeta = refresh_text_index(spark, root, "docs", text_col="text",
                               mask_compact_threshold=0)
    ipath = index_path(root, "docs", "text__bm25")
    assert _mask_row_count(spark, ipath) == 0
    assert not os.path.isdir(os.path.join(ipath, "masks"))
    assert imeta["n_docs"] == 80 + 5 - 3

    final = upsert.read_collection(spark, root, "docs")
    terms = ["alpha", "gamma", "delta3"]
    mem = sorted(map(tuple, bm25_topk(final, terms, k=10, id_col="id",
                                      text_col="text").collect()))
    idx = sorted(map(tuple, bm25_topk_indexed(
        spark, root, "docs", terms, k=10, text_col="text").collect()))
    assert idx == mem

    # a second mutate+compacting-refresh cycle on the folded layout
    upsert.upsert(spark, root, "docs", spark.createDataFrame(
        [(200, "delta3 delta3")], "id long, text string"))
    refresh_text_index(spark, root, "docs", text_col="text",
                       mask_compact_threshold=0)
    final = upsert.read_collection(spark, root, "docs")
    mem = sorted(map(tuple, bm25_topk(final, terms, k=10, id_col="id",
                                      text_col="text").collect()))
    idx = sorted(map(tuple, bm25_topk_indexed(
        spark, root, "docs", terms, k=10, text_col="text").collect()))
    assert idx == mem


def test_filtered_bm25_keeps_corpus_global_idf(spark, tmp_path):
    """bm25_topk_indexed(candidate_ids=...) narrows CANDIDATES, not term
    rarity: scores of surviving docs equal their unfiltered scores (IDF
    and avgdl stay corpus-global), and only filtered docs rank."""
    from bob_vector_db_spark.operators import upsert
    from bob_vector_db_spark.operators.text_search import (
        bm25_topk_indexed,
        build_text_index,
    )

    root = str(tmp_path / "store")
    rows = [(i, ("alpha beta " * (1 + i % 3)) +
             ("gamma " if i % 2 else "delta "), i % 2) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, text string, par long")
    upsert.create_collection(spark, root, "d", df=df, id_col="id",
                             n_buckets=4)
    build_text_index(spark, root, "d", text_col="text", n_term_buckets=8)
    base = {r["id"]: r["score"] for r in bm25_topk_indexed(
        spark, root, "d", ["alpha", "gamma"], k=20,
        text_col="text").collect()}
    cand = spark.createDataFrame([(i,) for i in range(20) if i % 2],
                                 "`i` long")
    filt = bm25_topk_indexed(spark, root, "d", ["alpha", "gamma"], k=20,
                             text_col="text", candidate_ids=cand).collect()
    assert {r["id"] for r in filt} == {i for i in range(20) if i % 2}
    # per-doc scores unchanged by the narrowing — global IDF held
    assert all(r["score"] == base[r["id"]] for r in filt)


def test_rescore_by_nearest_maxsim(spark, tmp_path):
    """Round 12 (VERDICT r11 #1): the multivector max-sim second stage of
    rescore_by_nearest — retrieve by BM25, rescore the candidates
    ColBERT-style.  Exactness vs a hand-computed max-sim over the
    candidate set, flat-vector coercion, by-id self-exclusion, NULL-
    token-list candidates skipped (the pinned degenerate-shape class),
    and the degenerate query inputs raise."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from bob_vector_db_spark.operators import query_api, upsert
    from bob_vector_db_spark.operators.text_search import (
        build_text_index,
        refresh_text_index,
    )

    root = str(tmp_path / "store")
    rows = [
        (1, [[1.0, 0.0], [0.0, 1.0]], "alpha news today"),
        (2, [[0.8, 0.2], [0.1, 0.9]], "vector search engine"),
        (3, [[0.0, 1.0], [1.0, 0.0]], "vector stream join"),
        (4, [[0.3, 0.3], [0.3, 0.3]], "weather report sunny"),
        (5, [[0.5, 0.5], [0.2, 0.8]], "vector join stream vector"),
    ]
    upsert.create_collection(
        spark, root, "c", id_col="id", n_buckets=4,
        df=spark.createDataFrame(
            rows, "id long, colbert array<array<double>>, text string"),
        vector_config={"colbert": {"size": 2, "distance": "dot",
                                   "multivector": "max_sim"}})
    build_text_index(spark, root, "c", text_col="text", n_term_buckets=4)

    qtoks = [[1.0, 0.0], [0.0, 2.0]]
    got = query_api.query_points(
        spark, root, "c",
        prefetch=[{"text": {"column": "text", "terms": ["vector"]},
                   "limit": 4}],
        query={"nearest": qtoks}, k=4,
        vector_name="colbert").orderBy("rank").collect()
    # candidates = {2, 3, 5} ('vector' docs); hand max-sim, dot metric
    stored = {r[0]: r[1] for r in rows}
    def ms(pid):
        return round(sum(
            max(sum(a * b for a, b in zip(t, pv)) for pv in stored[pid])
            for t in qtoks), 6)
    exp = sorted(((ms(i), i) for i in (2, 3, 5)),
                 key=lambda x: (-x[0], x[1]))
    assert [(r["score"], r["vec_id"]) for r in got] == exp

    # a FLAT dense list coerces to a single-token multivector
    flat = query_api.query_points(
        spark, root, "c",
        prefetch=[{"text": {"column": "text", "terms": ["vector"]},
                   "limit": 4}],
        query={"nearest": [1.0, 0.0]}, k=4,
        vector_name="colbert").collect()
    one = {r["vec_id"]: r["score"] for r in flat}
    assert one == {
        i: round(max(sum(a * b for a, b in zip([1.0, 0.0], pv))
                     for pv in stored[i]), 6) for i in (2, 3, 5)}

    # by stored id: point 3's own tokens rescore, 3 itself excluded
    byid = query_api.query_points(
        spark, root, "c",
        prefetch=[{"text": {"column": "text", "terms": ["vector"]},
                   "limit": 4}],
        query={"nearest": 3}, k=4, vector_name="colbert").collect()
    assert byid and all(r["vec_id"] != 3 for r in byid)
    assert {r["vec_id"] for r in byid} == {2, 5}

    # a candidate whose token list was removed is SKIPPED, not a crash
    upsert.batch_update_points(spark, root, "c", [
        ("delete_vectors", ([2], ["colbert"]))])
    refresh_text_index(spark, root, "c", text_col="text")
    after = query_api.query_points(
        spark, root, "c",
        prefetch=[{"text": {"column": "text", "terms": ["vector"]},
                   "limit": 4}],
        query={"nearest": qtoks}, k=4, vector_name="colbert").collect()
    assert {r["vec_id"] for r in after} == {3, 5}

    # degenerate query inputs raise up front
    pf = [{"text": {"column": "text", "terms": ["vector"]}}]
    with pytest.raises(ValueError, match="non-empty token"):
        query_api.query_points(spark, root, "c", prefetch=pf,
                               query={"nearest": []}, k=2,
                               vector_name="colbert")
    with pytest.raises(ValueError, match="non-empty token"):
        query_api.query_points(spark, root, "c", prefetch=pf,
                               query={"nearest": [[]]}, k=2,
                               vector_name="colbert")
    with pytest.raises(ValueError, match="NaN"):
        query_api.query_points(spark, root, "c", prefetch=pf,
                               query={"nearest": [[1.0, math.nan]]}, k=2,
                               vector_name="colbert")

    # cosine mv space: a zero-norm query token is refused
    root2 = str(tmp_path / "s_cos")
    upsert.create_collection(
        spark, root2, "c", id_col="id", n_buckets=2,
        df=spark.createDataFrame(
            [(1, [[1.0, 0.0]], "vector doc")],
            "id long, colbert array<array<double>>, text string"),
        vector_config={"colbert": {"size": 2, "distance": "cosine",
                                   "multivector": "max_sim"}})
    build_text_index(spark, root2, "c", text_col="text", n_term_buckets=2)
    with pytest.raises(ValueError, match="zero-norm"):
        query_api.query_points(
            spark, root2, "c",
            prefetch=[{"text": {"column": "text", "terms": ["vector"]}}],
            query={"nearest": [[0.0, 0.0]]}, k=2, vector_name="colbert")


def test_scrub_pii_masks_and_counts(spark):
    """PII scrub pins: each kind collapses to its placeholder; an e-mail
    inside a URL is part of the URL (fixed replacement order); counts
    audit the raw text per kind."""
    from bob_vector_db_spark.functions.text import pii_counts, scrub_pii

    rows = [
        (1, "mail me at a.b+c@ex-ample.org today"),
        (2, "see https://ex.com/p?who=x@y.org deep link"),
        (3, "host 192.168.001.7 port open"),
        (4, "call 555-012-3456 or 555 0123 4567"),
        (5, "clean text, no pii at all"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r["id"]: r for r in df.select(
        "id", scrub_pii(F.col("t")).alias("c"),
        *[c.alias(f"n_{n}") for n, c in pii_counts(F.col("t"))]
    ).collect()}
    assert got[1]["c"] == "mail me at <EMAIL> today"
    assert got[1]["n_email"] == 1 and got[1]["n_url"] == 0
    # URL wins: the embedded e-mail never surfaces as <EMAIL>
    assert got[2]["c"] == "see <URL> deep link"
    assert got[2]["n_url"] == 1
    assert got[3]["c"] == "host <IP> port open"
    assert got[3]["n_ipv4"] == 1
    assert got[4]["c"].startswith("call <PHONE> or")
    assert got[4]["n_phone"] >= 1
    assert got[5]["c"] == rows[4][1]
    assert all(got[5][f"n_{n}"] == 0
               for n in ("url", "email", "ipv4", "phone"))
