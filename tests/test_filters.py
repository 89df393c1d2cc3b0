"""Composable filter DSL (operators/filters.py) and the filtered Query API
(operators/query_api.py): cross-engine SQL compilation, pushed-predicate
plans, payload-index routing, geo filters, keyset scroll."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bob_vector_db_spark.operators import query_api, upsert
from bob_vector_db_spark.operators.filters import (
    Filter,
    GeoBoundingBox,
    GeoRadius,
    IsEmpty,
    IsNull,
    MatchAny,
    MatchExcept,
    MatchText,
    MatchValue,
    Range,
    ValuesCount,
    as_filter,
    filter_match_ids,
)
from bob_vector_db_spark.plans.inspect import assert_pushed_filters


# ---------------------------------------------------------------------------
# Compilation: the ONE compiled SQL string must mean the same thing to
# Spark (via F.expr) and DuckDB (the oracle side) — structural symmetry.
# ---------------------------------------------------------------------------

def _both_engines(spark, pdf, flt):
    import duckdb

    sdf = spark.createDataFrame(pdf)
    got_spark = [tuple(r) for r in sdf.filter(flt.to_column())
                 .toPandas().itertuples(index=False)]
    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = [tuple(r) for r in
                con.execute(f"SELECT * FROM t WHERE {flt.to_sql()}")
                .fetchdf().itertuples(index=False)]

    def norm(rows):
        return sorted(
            (tuple(None if (isinstance(x, float) and math.isnan(x))
                   else x for x in r) for r in rows),
            key=repr)
    return norm(got_spark), norm(got_duck)


def test_nested_filter_cross_engine_agreement(spark):
    import pandas as pd

    flt = Filter(
        must=[MatchAny("lang", ["en", "fr"]), Range("n", gte=10, lt=100)],
        should=[MatchValue("src", "web"), MatchText("txt", "Alpha beta")],
        must_not=[IsNull("score"), MatchValue("flag", True)],
    )
    rows = [
        ("en", 50, "web", "alpha\tbeta gamma", 1.0, False),  # match
        ("fr", 20, "api", "the alpha  beta", 2.0, False),    # match via text
        ("de", 50, "web", "alpha beta", 1.0, False),         # lang fails
        ("en", 5, "web", "alpha beta", 1.0, False),          # range fails
        ("en", 50, "api", "alpha only", 1.0, False),         # should fails
        ("en", 50, "web", "alpha beta", None, False),        # must_not null
        ("en", 50, "web", "alpha beta", 1.0, True),          # must_not flag
        ("en", 50, "web", "betaalpha x", 1.0, False),        # src rescues
    ]
    pdf = pd.DataFrame(rows, columns=["lang", "n", "src", "txt",
                                      "score", "flag"])
    a, b = _both_engines(spark, pdf, flt)
    assert a == b and len(a) == 3


def test_match_except_and_min_should(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        [("en", 1, 5.0), ("de", 2, 5.0), (None, 3, 5.0), ("fr", 9, None)],
        columns=["lang", "n", "v"])
    # MatchExcept is NULL-safe: a NULL lang is "not any of these"
    flt = Filter(must=[MatchExcept("lang", ["de", "fr"])])
    a, b = _both_engines(spark, pdf, flt)
    assert a == b and len(a) == 2  # en + NULL
    # min_should=2 of 3
    flt = Filter(should=[MatchValue("lang", "en"), Range("n", lte=2),
                         MatchValue("v", 5.0)], min_should=2)
    a, b = _both_engines(spark, pdf, flt)
    assert a == b and len(a) == 2  # (en,1,5.0) and (de,2,5.0)


def test_empty_filter_and_identifier_guard(spark):
    assert Filter().to_sql() == "TRUE"
    with pytest.raises(ValueError, match="identifier"):
        MatchValue("bad-name; drop", 1).to_sql()
    with pytest.raises(ValueError, match="bounds"):
        Range("x").to_sql()
    assert MatchAny("k", []).to_sql() == "FALSE"


def test_dsl_predicates_reach_parquet_scan(spark, sf_dir):
    """The compiled filter must push its leaf comparisons into the parquet
    scan exactly like a hand-written Column predicate."""
    from bob_vector_db_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    flt = Filter(must=[MatchAny("lang", ["en", "de"]),
                       Range("n_chars", gte=200)])
    out = docs.filter(flt.to_column()).select("doc_id")
    assert_pushed_filters(out, "lang", "n_chars")


# ---------------------------------------------------------------------------
# Geo
# ---------------------------------------------------------------------------

def _haversine(lat1, lon1, lat2, lon2):
    r = 6371000.0
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = (math.sin(dp / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2)
    return 2 * r * math.asin(math.sqrt(a))


def test_geo_radius_matches_brute_force(spark):
    import random

    rnd = random.Random(5)
    pts = [(i, rnd.uniform(40, 60), rnd.uniform(-10, 30))
           for i in range(400)]
    df = spark.createDataFrame(pts, "id int, lat double, lon double")
    center, radius = (48.85, 2.35), 300_000.0
    flt = Filter(must=[GeoRadius("lat", "lon", center[0], center[1],
                                 radius)])
    got = {r["id"] for r in df.filter(flt.to_column()).collect()}
    want = {i for i, la, lo in pts
            if _haversine(center[0], center[1], la, lo) <= radius}
    assert got == want and len(want) > 0


def test_geo_bbox_prefilter_is_pushed(spark, tmp_path):
    """GeoRadius's bounding box must reach the parquet scan as pushed
    comparisons — the exact haversine test runs only on box survivors."""
    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, 40.0 + i * 0.1, 2.0 + i * 0.05) for i in range(100)],
        "id int, lat double, lon double")
    upsert.create_collection(spark, root, "geo", df=df, n_buckets=2)
    flt = Filter(must=[GeoRadius("lat", "lon", 45.0, 4.0, 100_000.0)])
    out = (upsert.read_collection(spark, root, "geo")
           .filter(flt.to_column()))
    assert_pushed_filters(out, "lat", "lon")


def test_geo_bounding_box_with_wrap(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 179.0), (2, 10.0, -179.0), (3, 10.0, 0.0),
         (4, 50.0, 179.0)],
        "id int, lat double, lon double")
    wrap = Filter(must=[GeoBoundingBox("lat", "lon", top=20, left=170,
                                       bottom=0, right=-170)])
    got = {r["id"] for r in df.filter(wrap.to_column()).collect()}
    assert got == {1, 2}


# ---------------------------------------------------------------------------
# Payload-index routing + the Query API
# ---------------------------------------------------------------------------

def _mk_indexed(spark, tmp_path, n=120):
    from bob_vector_db_spark.operators.payload_index import (
        build_payload_index,
    )

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, f"cat{i % 6}", float(i % 10),
          [float((i * 3 + j) % 7) for j in range(6)])
         for i in range(n)],
        "id long, category string, score double, embedding array<double>")
    upsert.create_collection(
        spark, root, "c", df=df, id_col="id", n_buckets=4,
        vector_config={"embedding": {"size": 6, "distance": "cosine"}})
    build_payload_index(spark, root, "c", "category", n_val_buckets=8)
    return root, df


def test_filter_match_ids_splits_indexable_and_residual(spark, tmp_path):
    root, df = _mk_indexed(spark, tmp_path)
    flt = Filter(must=[MatchAny("category", ["cat1", "cat2"]),
                       Range("score", gte=5.0)])
    ids, residual = filter_match_ids(spark, root, "c", flt)
    assert ids is not None
    got = {r["id"] for r in ids.collect()}
    want = {str(r["id"]) for r in
            df.filter(F.col("category").isin("cat1", "cat2")).collect()}
    assert got == want
    assert residual == Filter(must=[Range("score", gte=5.0)])
    # stale index: mutate → auto routing declines, scan path remains
    upsert.delete_points(spark, root, "c", [0])
    ids2, res2 = filter_match_ids(spark, root, "c", flt)
    assert ids2 is None and res2 == flt


def test_search_points_index_and_scan_paths_agree(spark, tmp_path):
    root, df = _mk_indexed(spark, tmp_path)
    q = spark.createDataFrame([(0, [1.0, 2.0, 3.0, 1.0, 0.5, 2.0])],
                              "qid long, qvec array<double>")
    flt = Filter(must=[MatchAny("category", ["cat1", "cat3"]),
                       Range("score", gte=2.0)])
    via_index = query_api.search_points(
        spark, root, "c", q, flt=flt, k=30, use_payload_index="always")
    via_scan = query_api.search_points(
        spark, root, "c", q, flt=flt, k=30, use_payload_index=False)
    rows = lambda d: sorted(map(tuple,  # noqa: E731
                                d.select("qid", "vec_id", "sim", "rank")
                                .collect()))
    assert rows(via_index) == rows(via_scan)
    want_ids = {r["id"] for r in
                df.filter(F.col("category").isin("cat1", "cat3")
                          & (F.col("score") >= 2.0)).collect()}
    got_ids = {r["vec_id"] for r in via_index.collect()}
    assert got_ids <= want_ids and len(got_ids) == min(30, len(want_ids))


def test_count_and_facet_with_filter(spark, tmp_path):
    root, df = _mk_indexed(spark, tmp_path)
    flt = Filter(must=[MatchValue("category", "cat2")],
                 must_not=[Range("score", lt=3.0)])
    want = df.filter((F.col("category") == "cat2")
                     & ~(F.col("score") < 3.0)).count()
    assert query_api.count_points(spark, root, "c", flt) == want
    assert query_api.count_points(spark, root, "c", flt,
                                  use_payload_index=False) == want
    # facet under a filter
    fac = query_api.facet_values(
        spark, root, "c", "category",
        flt=Filter(must=[Range("score", gte=5.0)]), limit=10)
    got = {(r["value"], r["count"]) for r in fac.collect()}
    want_fac = {(r["category"], r["cnt"]) for r in
                df.filter(F.col("score") >= 5.0).groupBy("category")
                .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == want_fac


def test_scroll_keyset_pages_disjoint_and_complete(spark, tmp_path):
    root, df = _mk_indexed(spark, tmp_path, n=50)
    flt = Filter(must=[Range("score", gte=4.0)])
    seen, cursor = [], None
    while True:
        page = query_api.scroll_points(spark, root, "c", flt=flt,
                                       limit=7, cursor=cursor).collect()
        if not page:
            break
        seen.extend(r["id"] for r in page)
        cursor = (page[-1]["id"],)
    want = sorted(r["id"] for r in
                  df.filter(F.col("score") >= 4.0).collect())
    assert seen == want  # ordered, disjoint, complete
    # order_by scroll with composite cursor
    p1 = query_api.scroll_points(spark, root, "c", flt=flt, limit=5,
                                 order_by="score").collect()
    c = (p1[-1]["score"], p1[-1]["id"])
    p2 = query_api.scroll_points(spark, root, "c", flt=flt, limit=5,
                                 order_by="score", cursor=c).collect()
    ids1, ids2 = {r["id"] for r in p1}, {r["id"] for r in p2}
    assert not ids1 & ids2
    key = lambda r: (r["score"], r["id"])  # noqa: E731
    assert max(map(key, p1)) < min(map(key, p2))


def test_search_points_no_filter_defers_to_collection_search(spark,
                                                             tmp_path):
    root, df = _mk_indexed(spark, tmp_path, n=40)
    q = spark.createDataFrame([(0, [1.0, 0.0, 2.0, 0.0, 1.0, 0.0])],
                              "qid long, qvec array<double>")
    out = query_api.search_points(spark, root, "c", q, k=5)
    assert out.count() == 5


def test_is_empty_and_values_count_cross_engine(spark):
    """The array-cardinality leaves compile to the one expression both
    engines share; verify against DuckDB on the same rows."""
    import duckdb

    rows = [(1, ["a", "b"]), (2, []), (3, None), (4, ["x"]),
            (5, ["p", "q", "r", "s"])]
    df = spark.createDataFrame(rows, "id long, tags array<string>")
    for flt, want in [
        (Filter(must=[IsEmpty("tags")]), {2, 3}),
        (Filter(must_not=[IsEmpty("tags")]), {1, 4, 5}),
        (Filter(must=[ValuesCount("tags", gte=1, lte=2)]), {1, 4}),
        (Filter(must=[ValuesCount("tags", gt=2)]), {5}),
        # NULL counts 0 values (Qdrant: a missing field has none)
        (Filter(must=[ValuesCount("tags", lt=1)]), {2, 3}),
        (Filter(should=[IsEmpty("tags"), ValuesCount("tags", gt=3)]),
         {2, 3, 5}),
    ]:
        got = {r["id"] for r in df.filter(flt.to_column()).collect()}
        assert got == want, (flt.to_sql(), got)
        duck = duckdb.connect()
        duck.execute("CREATE TABLE t (id BIGINT, tags VARCHAR[])")
        for i, tags in rows:
            duck.execute("INSERT INTO t VALUES (?, ?)", [i, tags])
        oracle = {r[0] for r in duck.execute(
            f"SELECT id FROM t WHERE {flt.to_sql()}").fetchall()}
        assert oracle == want, (flt.to_sql(), oracle)
    with pytest.raises(ValueError, match="no bounds"):
        ValuesCount("tags").to_sql()


def test_search_groups_diversifies_and_ranks(spark, tmp_path):
    """Grouped kNN: exactly k_groups groups, each capped at group_size,
    groups ordered by their best hit, hits ordered within the group —
    and a plain top-k would have been dominated by one group."""
    root = str(tmp_path / "s")
    # group 0: three vectors nearly parallel to the query (dominant);
    # groups 1..3: progressively farther
    rows = []
    for g in range(4):
        for j in range(3):
            rows.append((g * 10 + j, g,
                         [1.0, 0.1 * g + 0.01 * j, 0.0]))
    df = spark.createDataFrame(rows, "id long, grp int, vec array<double>")
    upsert.create_collection(
        spark, root, "g", df=df, id_col="id", n_buckets=4,
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    q = spark.createDataFrame([(0, [1.0, 0.0, 0.0])],
                              "qid long, qvec array<double>")
    out = query_api.search_groups(spark, root, "g", q, group_by="grp",
                                  k_groups=3, group_size=2).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["group"], []).append(r)
    assert set(by_group) == {0, 1, 2}  # best 3 of 4 groups
    assert all(len(v) == 2 for v in by_group.values())
    # group 0 is nearest (rank 1); within it the j=0 vector is best
    assert {r["group_rank"] for r in by_group[0]} == {1}
    assert [r["vec_id"] for r in
            sorted(by_group[0], key=lambda r: r["rank_in_group"])] == [0, 1]
    # filtered + grouped compose
    flt = Filter(must=[Range("grp", gte=1)])
    out2 = query_api.search_groups(spark, root, "g", q, group_by="grp",
                                   k_groups=2, group_size=1, flt=flt)
    assert {r["group"] for r in out2.collect()} == {1, 2}


def test_datetime_range_compiles_and_validates(spark):
    from bob_vector_db_spark.operators.filters import DatetimeRange

    df = spark.createDataFrame(
        [(1, "2024-01-05 10:00:00"), (2, "2024-01-15 10:00:00"),
         (3, "2024-01-25 10:00:00"), (4, None)],
        "id long, s string").select(
        "id", F.to_timestamp("s").alias("ts"))
    flt = Filter(must=[DatetimeRange("ts", gte="2024-01-10 00:00:00",
                                     lt="2024-01-20 00:00:00")])
    assert {r["id"] for r in df.filter(flt.to_column()).collect()} == {2}
    # the T separator normalizes; malformed bounds fail at compile time
    assert "2024-01-10 00:00:00" in DatetimeRange(
        "ts", gte="2024-01-10T00:00:00").to_sql()
    with pytest.raises(ValueError, match="not 'YYYY"):
        DatetimeRange("ts", gte="Jan 10 2024").to_sql()
    with pytest.raises(ValueError, match="not 'YYYY"):
        DatetimeRange("ts", gte="2024-01-10 00:00:00' OR '1'='1").to_sql()
    with pytest.raises(ValueError, match="no bounds"):
        DatetimeRange("ts").to_sql()


def test_query_points_unified_dispatch(spark, tmp_path):
    """The unified query_points entry: DataFrame -> filtered kNN, point id
    -> query-by-stored-vector (self excluded, ranks closed up), prefetch
    -> fusion tree; exactly one input shape allowed."""
    root = str(tmp_path / "store")
    rows = [(i, [float(i % 5), float((i * 7) % 3), 1.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    upsert.create_collection(
        spark, root, "c", df=df, id_col="id", n_buckets=4,
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    by_id = query_api.query_points(spark, root, "c", query=7, k=5).collect()
    assert len(by_id) == 5
    assert all(r["vec_id"] != 7 for r in by_id)
    assert [r["rank"] for r in sorted(by_id, key=lambda r: r["rank"])] == \
        [1, 2, 3, 4, 5]
    # the id's own vector as an explicit DataFrame query ranks itself first;
    # dropping that self row must equal the by-id result
    q = spark.createDataFrame([(7, rows[7][1])], "qid long, qvec array<double>")
    manual = [r["vec_id"] for r in
              query_api.query_points(spark, root, "c", query=q, k=6)
              .filter(F.col("vec_id") != 7).orderBy("rank").limit(5).collect()]
    assert [r["vec_id"] for r in
            sorted(by_id, key=lambda r: r["rank"])] == manual
    with pytest.raises(ValueError, match="exactly one of"):
        query_api.query_points(spark, root, "c")
    with pytest.raises(ValueError, match="exactly one of"):
        query_api.query_points(spark, root, "c", query=7, prefetch=[q])
    with pytest.raises(ValueError, match="no point with id"):
        query_api.query_points(spark, root, "c", query=999)
    # prefetch path defers to fuse_prefetch
    a = spark.createDataFrame([(1, 0.5, 1), (2, 0.4, 2)],
                              "id long, score double, rank int")
    fused = query_api.query_points(spark, root, "c", prefetch=[a, a],
                                   fusion="rrf", k=2)
    assert fused.columns == ["id", "score", "rank"]
    assert fused.count() == 2


def test_match_phrase_requires_adjacency(spark):
    from bob_vector_db_spark.operators.filters import MatchPhrase

    df = spark.createDataFrame(
        [(1, "the data table is here"), (2, "data in the table"),
         (3, "DATA\tTABLE upper and tabbed"), (4, None)],
        "id long, text string")
    phrase = Filter(must=[MatchPhrase("text", "data table")])
    got = {r["id"] for r in df.filter(phrase.to_column()).collect()}
    assert got == {1, 3}  # 2 has both tokens but not adjacent; 4 is NULL
    anytok = Filter(must=[MatchText("text", "data table")])
    got2 = {r["id"] for r in df.filter(anytok.to_column()).collect()}
    assert got2 == {1, 2, 3}  # MatchText is any-order containment
    # an empty / all-whitespace phrase matches NOTHING (Qdrant's
    # empty-token semantics; also what a positional index probe returns)
    assert MatchPhrase("text", "  ").to_sql() == "FALSE"
    empty = Filter(must=[MatchPhrase("text", "  ")])
    assert df.filter(empty.to_column()).count() == 0


def test_sample_points_deterministic_and_filtered(spark, tmp_path):
    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd") for i in range(100)],
        "id long, parity string")
    upsert.create_collection(spark, root, "s", df=df, id_col="id",
                             n_buckets=4)
    a = {r["id"] for r in
         query_api.sample_points(spark, root, "s", n=10, seed="x").collect()}
    b = {r["id"] for r in
         query_api.sample_points(spark, root, "s", n=10, seed="x").collect()}
    c = {r["id"] for r in
         query_api.sample_points(spark, root, "s", n=10, seed="y").collect()}
    assert a == b and len(a) == 10
    assert a != c  # a redraw (2^-160-ish collision odds on 10 of 100)
    flt = Filter(must=[MatchValue("parity", "even")])
    ev = query_api.sample_points(spark, root, "s", n=7, seed="x",
                                 flt=flt).collect()
    assert len(ev) == 7 and all(r["parity"] == "even" for r in ev)


def test_match_contains_and_search_params(spark, tmp_path):
    from bob_vector_db_spark.operators.filters import MatchContains

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["b"]), (3, None), (4, [])],
        "id long, tags array<string>")
    flt = Filter(must=[MatchContains("tags", "a")])
    assert {r["id"] for r in df.filter(flt.to_column()).collect()} == {1}
    # must_not over a NULL array: not-positively-matching -> kept
    neg = Filter(must_not=[MatchContains("tags", "a")])
    assert {r["id"] for r in df.filter(neg.to_column()).collect()} == \
        {2, 3, 4}

    root = str(tmp_path / "store")
    rows = [(i, [float(i), 1.0]) for i in range(1, 21)]
    pts = spark.createDataFrame(rows, "id long, vec array<double>")
    upsert.create_collection(
        spark, root, "c", df=pts, id_col="id", n_buckets=4,
        vector_config={"vec": {"size": 2, "distance": "dot"}})
    q = spark.createDataFrame([(0, [1.0, 0.0])], "qid long, qvec array<double>")
    # dot with q=[1,0]: score = id; full order is 20,19,...; offset 5 ->
    # ranks renumber from 1 at id 15; threshold >= 12 trims below
    out = query_api.search_points(spark, root, "c", q, k=10, offset=5,
                                  score_threshold=12.0).orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == [15, 14, 13, 12]
    assert [r["rank"] for r in out] == [1, 2, 3, 4]


def test_recommend_points_strategies(spark, tmp_path):
    root = str(tmp_path / "store")
    # id 1 = positive exemplar axis; id 2 = negative axis; 10,11 near the
    # positive; 12 is a near-clone of the NEGATIVE; 13 neutral
    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]),
            (10, [0.9, 0.1, 0.0]), (11, [0.8, 0.0, 0.2]),
            (12, [0.01, 0.99, 0.0]), (13, [0.0, 0.0, 1.0])]
    upsert.create_collection(
        spark, root, "c", id_col="id", n_buckets=4,
        df=spark.createDataFrame(rows, "id long, vec array<double>"),
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    best = query_api.recommend_points(
        spark, root, "c", positive=[1], negative=[2],
        strategy="best_score", k=4).orderBy("rank").collect()
    ids = [r["vec_id"] for r in best]
    assert set(ids) == {10, 11, 12, 13} and 1 not in ids and 2 not in ids
    # the negative look-alike sinks to the bottom with a NEGATIVE score
    assert ids[-1] == 12 and best[-1]["score"] < 0
    assert ids[0] == 10  # closest to the positive
    avg = query_api.recommend_points(
        spark, root, "c", positive=[1], negative=[2],
        strategy="average_vector", k=4).collect()
    assert {r["vec_id"] for r in avg} == {10, 11, 12, 13}
    with pytest.raises(ValueError, match="not in 'c'"):
        query_api.recommend_points(spark, root, "c", positive=[999])
    with pytest.raises(ValueError, match="unknown strategy"):
        query_api.recommend_points(spark, root, "c", positive=[1],
                                   strategy="median")
    with pytest.raises(ValueError, match="at least one positive"):
        query_api.recommend_points(spark, root, "c", positive=[])


def test_recommend_sum_scores(spark, tmp_path):
    """sum_scores: ALL examples pull — score = Σ sim(c,p) − Σ sim(c,n),
    per-pair sims rounded to 6 before the sum (engine-stable fold)."""
    import math

    root = str(tmp_path / "store")
    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]),
            (10, [0.9, 0.1, 0.0]), (11, [0.8, 0.0, 0.2]),
            (12, [0.01, 0.99, 0.0]), (13, [0.0, 0.0, 1.0])]
    upsert.create_collection(
        spark, root, "c", id_col="id", n_buckets=4,
        df=spark.createDataFrame(rows, "id long, vec array<double>"),
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    got = query_api.recommend_points(
        spark, root, "c", positive=[1], negative=[2],
        strategy="sum_scores", k=4).orderBy("rank").collect()
    ids = [r["vec_id"] for r in got]
    assert set(ids) == {10, 11, 12, 13} and 1 not in ids and 2 not in ids

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a))
                    * math.sqrt(sum(y * y for y in b)))

    vecs = dict((i, v) for i, v in rows)
    for r in got:
        want = round(round(cos(vecs[r["vec_id"]], vecs[1]), 6)
                     - round(cos(vecs[r["vec_id"]], vecs[2]), 6), 6)
        assert r["score"] == pytest.approx(want, abs=1e-9)
    # the negative look-alike sinks below the neutral point
    assert ids.index(12) > ids.index(13)


def test_recommend_discover_distance_metrics(spark, tmp_path):
    """Metric-complete recommend/discover/context (round 11, VERDICT r10
    #2): euclid and manhattan collections are served by comparing
    NEGATED distances — Qdrant's internal score order — with the
    closed-form ranking checked per metric."""

    def l2(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    def l1(a, b):
        return sum(abs(x - y) for x, y in zip(a, b))

    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]),
            (10, [0.9, 0.1, 0.0]), (11, [0.8, 0.0, 0.2]),
            (12, [0.01, 0.99, 0.0]), (13, [0.0, 0.0, 1.0])]
    vecs = dict(rows)
    for metric, dist in (("euclid", l2), ("manhattan", l1)):
        root = str(tmp_path / f"s_{metric}")
        upsert.create_collection(
            spark, root, "c", id_col="id", n_buckets=4,
            df=spark.createDataFrame(rows, "id long, vec array<double>"),
            vector_config={"vec": {"size": 3, "distance": metric}})
        # best_score: closed-form RecoQuery over negated distances
        got = query_api.recommend_points(
            spark, root, "c", positive=[1], negative=[2],
            strategy="best_score", k=4).orderBy("rank").collect()
        want = []
        for cid in (10, 11, 12, 13):
            bp, bn = -dist(vecs[cid], vecs[1]), -dist(vecs[cid], vecs[2])
            want.append((cid, round(bp if bp > bn else -(bn * bn), 6)))
        want.sort(key=lambda t: (-t[1], t[0]))
        assert [(r["vec_id"], r["score"]) for r in got] == [
            (cid, pytest.approx(s, abs=1e-9)) for cid, s in want], metric
        assert all(r["score"] <= 0 for r in got)  # negated distances
        # sum_scores: per-pair negated distances round-6 then sum
        got2 = query_api.recommend_points(
            spark, root, "c", positive=[1], negative=[2],
            strategy="sum_scores", k=4).collect()
        for r in got2:
            w = round(round(-dist(vecs[r["vec_id"]], vecs[1]), 6)
                      - round(-dist(vecs[r["vec_id"]], vecs[2]), 6), 6)
            assert r["score"] == pytest.approx(w, abs=1e-9), metric
        # discover: wins on 'closer to the pair's positive', then
        # negated target distance — closed form [11, 10, 12]
        disc = query_api.discover_points(
            spark, root, "c", target=13, context=[(1, 2)],
            k=4).orderBy("rank").collect()
        assert [r["vec_id"] for r in disc] == [11, 10, 12], metric
        assert [r["ctx_wins"] for r in disc] == [1, 1, 0]
        for r in disc:
            assert r["sim"] == pytest.approx(
                round(-dist(vecs[r["vec_id"]], vecs[13]), 6), abs=1e-9)
        # context: inside-the-zone points score 0, violations subtract
        ctx = query_api.context_points(
            spark, root, "c", context=[(1, 2)], k=5).collect()
        by_id = {r["vec_id"]: r["ctx_score"] for r in ctx}
        assert by_id[10] == 0.0 and by_id[11] == 0.0 and by_id[13] == 0.0
        assert by_id[12] == pytest.approx(
            round(round(-dist(vecs[12], vecs[1]), 6)
                  - round(-dist(vecs[12], vecs[2]), 6), 6), abs=1e-9)


def test_recommend_node_threshold_distance_metric(spark, tmp_path):
    """ADVICE r10 (medium): query_points' recommend node must apply
    score_threshold in the metric's direction — average_vector on a
    euclid collection returns DISTANCES (ascending), so the threshold is
    an UPPER bound; >= would keep the worst hits."""
    root = str(tmp_path / "store")
    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]),
            (10, [0.9, 0.1, 0.0]), (11, [0.8, 0.0, 0.2]),
            (12, [0.01, 0.99, 0.0]), (13, [0.0, 0.0, 1.0])]
    upsert.create_collection(
        spark, root, "c", id_col="id", n_buckets=4,
        df=spark.createDataFrame(rows, "id long, vec array<double>"),
        vector_config={"vec": {"size": 3, "distance": "euclid"}})
    # synthetic query = v1 - v2 = [1,-1,0]; distances: 11≈1.039,
    # 10≈1.105, 13≈1.732, 12≈2.223 — threshold 1.5 keeps {10, 11}
    got = query_api.query_points(
        spark, root, "c",
        query={"recommend": {"positive": [1], "negative": [2],
                             "strategy": "average_vector"}},
        k=4, score_threshold=1.5).collect()
    assert {r["vec_id"] for r in got} == {10, 11}
    assert all(r["score"] <= 1.5 for r in got)
    # best_score folds NEGATED distances (descending) — >= stays right.
    # NOTE the faithful RecoQuery quirk: the negative look-alike 12 has
    # bn ≈ -0.014, so its −(bn²) ≈ -0.0002 beats the true positives'
    # −distance scores — on distance metrics the squaring fold ranks
    # negative clones HIGH (upstream behaves the same on its internal
    # negated scores); 13 (bp ≈ -1.73) is the one cut by the threshold
    got2 = query_api.query_points(
        spark, root, "c",
        query={"recommend": {"positive": [1], "negative": [2],
                             "strategy": "best_score"}},
        k=4, score_threshold=-1.0).collect()
    assert got2 and all(r["score"] >= -1.0 for r in got2)
    assert {r["vec_id"] for r in got2} == {10, 11, 12}
    # a NaN-component example is refused on EVERY metric (it poisons
    # every pair sim — all candidates would drop silently)
    root2 = str(tmp_path / "s_nan")
    upsert.create_collection(
        spark, root2, "c", id_col="id", n_buckets=2,
        df=spark.createDataFrame(
            [(1, [float("nan"), 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
            "id long, vec array<double>"),
        vector_config={"vec": {"size": 2, "distance": "euclid"}})
    with pytest.raises(ValueError, match="NaN components"):
        query_api.recommend_points(spark, root2, "c", positive=[1],
                                   strategy="best_score")


def test_recommend_groups(spark, tmp_path):
    """recommend_groups: grouped recommend shape — example ids excluded,
    NULL-group points never consume a slot, groups ranked by best hit,
    all three strategies dispatch."""
    root = str(tmp_path / "store")
    rows = [(1, [1.0, 0.0, 0.0], "a"), (2, [0.0, 1.0, 0.0], "b"),
            (10, [0.9, 0.1, 0.0], "a"), (11, [0.8, 0.0, 0.2], "a"),
            (12, [0.01, 0.99, 0.0], "b"), (13, [0.0, 0.0, 1.0], "c"),
            (15, [0.95, 0.05, 0.0], None)]
    upsert.create_collection(
        spark, root, "c", id_col="id", n_buckets=4,
        df=spark.createDataFrame(
            rows, "id long, vec array<double>, g string"),
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    # group a wins under every strategy, but its representative differs:
    # best_score keeps 10 (best positive sim, negative ignored while the
    # positive dominates); sum_scores and average_vector subtract the
    # negative pull, where 10's 0.1 on the negative axis sinks it below 11
    for strategy, best_vec in (("best_score", 10), ("sum_scores", 11),
                               ("average_vector", 11)):
        out = query_api.recommend_groups(
            spark, root, "c", positive=[1], negative=[2],
            strategy=strategy, group_by="g",
            k_groups=2, group_size=1).collect()
        by_rank = sorted(out, key=lambda r: r["group_rank"])
        # examples and the NULL-group point never appear
        assert all(r["vec_id"] not in (1, 2, 15) for r in out)
        assert by_rank[0]["group"] == "a"
        assert by_rank[0]["vec_id"] == best_vec, strategy
        assert len(out) == 2 and len({r["group"] for r in out}) == 2
        assert all(r["rank_in_group"] == 1 for r in out)
    # group_size widens the per-group cut
    wide = query_api.recommend_groups(
        spark, root, "c", positive=[1], negative=[2],
        strategy="best_score", group_by="g",
        k_groups=1, group_size=3).collect()
    assert {r["vec_id"] for r in wide} == {10, 11}  # all of group a
    with pytest.raises(ValueError, match="unknown strategy"):
        query_api.recommend_groups(spark, root, "c", positive=[1],
                                   strategy="median", group_by="g")


def test_recommend_groups_with_group_lookup(spark, tmp_path):
    """Contract pin (VERDICT r10 #7): recommend_groups composes with
    with_group_lookup — the grouped recommend result's ``group`` column
    drives the lookup fetch from ANOTHER collection, attaching the
    record behind each group id under the ``lookup_`` prefix."""
    root = str(tmp_path / "store")
    rows = [(1, [1.0, 0.0, 0.0], "g1"), (2, [0.0, 1.0, 0.0], "g2"),
            (10, [0.9, 0.1, 0.0], "g1"), (11, [0.8, 0.0, 0.2], "g1"),
            (12, [0.01, 0.99, 0.0], "g2"), (13, [0.0, 0.0, 1.0], "g3")]
    upsert.create_collection(
        spark, root, "c", id_col="id", n_buckets=4,
        df=spark.createDataFrame(
            rows, "id long, vec array<double>, grp string"),
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    upsert.create_collection(
        spark, root, "groups", id_col="gid", n_buckets=2,
        df=spark.createDataFrame(
            [("g1", "Group One"), ("g2", "Group Two"), ("g3", "Three")],
            "gid string, title string"))
    for strategy in ("best_score", "sum_scores", "average_vector"):
        out = query_api.recommend_groups(
            spark, root, "c", positive=[1], negative=[2],
            strategy=strategy, group_by="grp",
            k_groups=2, group_size=2)
        looked = query_api.with_group_lookup(
            spark, root, "groups", out).collect()
        assert looked, strategy
        titles = {r["group"]: r["lookup_title"] for r in looked}
        assert all(v is not None for v in titles.values()), strategy
        assert titles.get("g1") == "Group One"
        # lookup attaches columns without disturbing the group ranking
        assert {r["group_rank"] for r in looked} <= {1, 2}


def test_discover_and_context_points(spark, tmp_path):
    """Stored-collection discover/context: id-shaped examples fetch and
    are excluded; raw-vector examples pass through un-excluded; the
    query_points dict nodes dispatch with post-rank shaping."""
    root = str(tmp_path / "store")
    # id 20 carries a NaN component: it must never steal a rank slot
    # (desc ordering would otherwise put NaN first) in ANY scoring path
    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]),
            (10, [0.9, 0.1, 0.0]), (11, [0.8, 0.0, 0.2]),
            (12, [0.01, 0.99, 0.0]), (13, [0.0, 0.0, 1.0]),
            (20, [float("nan"), 0.0, 0.0])]
    upsert.create_collection(
        spark, root, "c", id_col="id", n_buckets=4,
        df=spark.createDataFrame(rows, "id long, vec array<double>"),
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    # discover: target id 1, one pair (positive id 1's axis vs id 2's) —
    # 10/11 sit on the positive side (1 win), 12 on the negative (0)
    out = query_api.discover_points(
        spark, root, "c", target=1, context=[(1, 2)], k=10).collect()
    ids = [r["vec_id"] for r in out]
    assert 1 not in ids and 2 not in ids  # id examples excluded
    assert 20 not in ids  # NaN vector dropped, not ranked first
    wins = {r["vec_id"]: r["ctx_wins"] for r in out}
    assert wins[10] == 1 and wins[11] == 1 and wins[12] == 0
    assert ids[0] == 10  # among winners, ranked by target sim
    # raw-vector examples are NOT excluded (no id to exclude)
    out2 = query_api.discover_points(
        spark, root, "c", target=[1.0, 0.0, 0.0],
        context=[([1.0, 0.0, 0.0], [0.0, 1.0, 0.0])], k=10).collect()
    assert {r["vec_id"] for r in out2} == {1, 2, 10, 11, 12, 13}
    # context-only: points aligned with the positive score 0 (the zone)
    ctx = query_api.context_points(
        spark, root, "c", context=[(1, 2)], k=10).collect()
    scores = {r["vec_id"]: r["ctx_score"] for r in ctx}
    assert 1 not in scores and 2 not in scores
    assert scores[10] == 0.0 and scores[11] == 0.0
    assert scores[12] < 0  # negative look-alike violates the pair
    # dict-node dispatch through the universal API, with offset shaping
    via = query_api.query_points(
        spark, root, "c", query={"context": [(1, 2)]}, k=2,
        offset=1).collect()
    full = sorted(ctx, key=lambda r: r["rank"])
    assert [r["vec_id"] for r in sorted(via, key=lambda r: r["rank"])] \
        == [r["vec_id"] for r in full[1:3]]
    assert [r["rank"] for r in sorted(via, key=lambda r: r["rank"])] \
        == [1, 2]
    rec = query_api.query_points(
        spark, root, "c",
        query={"recommend": {"positive": [1], "negative": [2],
                             "strategy": "best_score"}}, k=3).collect()
    assert [r["vec_id"] for r in sorted(rec, key=lambda r: r["rank"])][0] \
        == 10
    smp = query_api.query_points(
        spark, root, "c", query={"sample": "seed42"}, k=3).collect()
    assert len(smp) == 3
    assert 20 not in scores  # NaN-vector candidate can't score 0 as "in zone"
    # an id listed both positive and negative nets out in EVERY strategy
    both = query_api.recommend_points(
        spark, root, "c", positive=[1], negative=[1],
        strategy="sum_scores", k=4).collect()
    assert both and all(r["score"] == 0.0 for r in both)
    bs = query_api.recommend_points(
        spark, root, "c", positive=[1], negative=[1],
        strategy="best_score", k=4).collect()
    assert bs and all(r["score"] <= 0.0 for r in bs)  # -(best_neg)^2
    # zero-norm / NaN refs are refused up front, not silently NULLed
    with pytest.raises(ValueError, match="zero norm"):
        query_api.context_points(
            spark, root, "c",
            context=[([1.0, 0.0, 0.0], [0.0, 0.0, 0.0])])
    with pytest.raises(ValueError, match="zero norm"):
        query_api.discover_points(
            spark, root, "c", target=[0.0, 0.0, 0.0], context=[(1, 2)])
    with pytest.raises(ValueError, match="exactly one of"):
        query_api.query_points(spark, root, "c",
                               query={"context": [], "sample": True})
    with pytest.raises(ValueError, match="exactly one of"):
        query_api.query_points(spark, root, "c",
                               query={"formula": {}, "sample": True})


def test_recommend_fold_is_shuffle_free(spark, tmp_path):
    """The example-pairs fold is a broadcast-row PROJECTION — the only
    Exchange in a best_score/sum_scores recommend plan is the k-row rank
    window's single-partition hop, never a corpus-wide groupBy shuffle."""
    from bob_vector_db_spark.plans.inspect import count_exchanges

    root = str(tmp_path / "store")
    rows = [(i, [float(i % 7), 1.0, 0.5]) for i in range(1, 40)]
    upsert.create_collection(
        spark, root, "c", id_col="id", n_buckets=4,
        df=spark.createDataFrame(rows, "id long, vec array<double>"),
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    for strategy in ("best_score", "sum_scores"):
        out = query_api.recommend_points(
            spark, root, "c", positive=[1, 2], negative=[3],
            strategy=strategy, k=5)
        assert count_exchanges(out) <= 1, strategy
    with pytest.raises(ValueError, match="terminal"):
        query_api.query_points(spark, root, "c",
                               query={"context": [(1, 2)]},
                               prefetch=[None])
    with pytest.raises(ValueError, match="at least one"):
        query_api.context_points(spark, root, "c", context=[])


def test_match_phrase_collapses_space_runs(spark):
    """ADVICE r6: 'hello  world' (double space) must match the phrase
    'hello world' — adjacency is token-based, not single-space-based —
    and both engines agree on the collapsed form."""
    import duckdb
    import pandas as pd
    from bob_vector_db_spark.operators.filters import MatchPhrase

    flt = Filter(must=[MatchPhrase("txt", "hello world")])
    rows = [("say hello  world now",),   # run of spaces: matches
            ("hello\tworld",),           # tab separator: matches
            ("hello \t  world",),        # mixed run: matches
            ("world hello",),            # wrong order: no
            ("xhello world",),           # partial token: no
            ("hello",), (None,)]
    pdf = pd.DataFrame(rows, columns=["txt"])
    a, b = _both_engines(spark, pdf, flt)
    assert a == b and len(a) == 3


def test_dotted_path_and_nested_condition(spark):
    """Nested payload keys (meta.lang struct access) + Qdrant
    NestedCondition: SAME-element semantics over array<struct> — a doc
    whose 'src' element has num<2 must NOT match even though another
    element has num>=2 (a flat conjunction would wrongly accept it).
    Both engines run the identical compiled string."""
    import duckdb
    from bob_vector_db_spark.operators.filters import NestedCondition

    flt = Filter(must=[
        MatchValue("meta.lang", "en"),
        NestedCondition("props", Filter(
            must=[MatchValue("kind", "src"), Range("num", gte=2)]))])
    sql = flt.to_sql()
    spark_rows = """
      SELECT 1 AS id, named_struct('lang','en') AS meta,
             array(named_struct('kind','src','num',3),
                   named_struct('kind','len','num',0)) AS props
      UNION ALL
      SELECT 2, named_struct('lang','en'),
             array(named_struct('kind','src','num',1),
                   named_struct('kind','len','num',9))
      UNION ALL
      SELECT 3, named_struct('lang','de'),
             array(named_struct('kind','src','num',3))
      UNION ALL
      SELECT 4, named_struct('lang','en'),
             CAST(NULL AS array<struct<kind:string,num:int>>)
    """
    got = sorted(r["id"] for r in
                 spark.sql(f"SELECT id FROM ({spark_rows}) WHERE {sql}")
                 .collect())
    assert got == [1]
    duck_rows = """
      SELECT 1 AS id, {'lang':'en'} AS meta,
             [{'kind':'src','num':3},{'kind':'len','num':0}] AS props
      UNION ALL SELECT 2, {'lang':'en'},
             [{'kind':'src','num':1},{'kind':'len','num':9}]
      UNION ALL SELECT 3, {'lang':'de'}, [{'kind':'src','num':3}]
      UNION ALL SELECT 4, {'lang':'en'},
             CAST(NULL AS STRUCT(kind VARCHAR, num INT)[])
    """
    duck = [r[0] for r in duckdb.connect().execute(
        f"SELECT id FROM ({duck_rows}) WHERE {sql} ORDER BY id").fetchall()]
    assert duck == [1]
    # nesting a NestedCondition inside another is rejected loudly
    with pytest.raises(ValueError, match="cannot nest"):
        NestedCondition("a", Filter(must=[
            NestedCondition("b", MatchValue("x", 1))])).to_sql()


def test_geo_polygon_matches_brute_force(spark):
    """GeoPolygon vs a pure-Python ray cast over a grid of points — the
    exterior ring and the hole agree; the bbox pre-filter is pushed."""
    from bob_vector_db_spark.operators.filters import GeoPolygon

    exterior = [(0.0, -30.0), (35.0, -10.0), (45.0, 25.0),
                (10.0, 45.0), (-15.0, 10.0)]
    hole = [(5.0, -5.0), (20.0, -5.0), (20.0, 15.0), (5.0, 15.0)]
    gp = GeoPolygon("lat", "lon", exterior, interiors=[hole])

    def inside(ring, lat, lon):
        n, hit = len(ring), False
        for i in range(n):
            (y1, x1), (y2, x2) = ring[i], ring[(i + 1) % n]
            if y1 == y2:
                continue
            if (min(y1, y2) <= lat < max(y1, y2)) and \
                    lon < x1 + (x2 - x1) / (y2 - y1) * (lat - y1):
                hit = not hit
        return hit

    pts = [(float(la), float(lo))
           for la in range(-25, 56, 5) for lo in range(-45, 56, 5)]
    want = sorted((la, lo) for la, lo in pts
                  if inside(exterior, la, lo) and not inside(hole, la, lo))
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = sorted((r["lat"], r["lon"])
                 for r in df.filter(gp.to_sql()).collect())
    assert got == want and len(got) > 5
    with pytest.raises(ValueError, match="at least 3"):
        GeoPolygon("lat", "lon", [(0, 0), (1, 1)]).to_sql()
    with pytest.raises(ValueError, match="antimeridian"):
        GeoPolygon("lat", "lon",
                   [(0.0, -170.0), (5.0, 170.0), (10.0, -170.0)]).to_sql()


def test_geo_polygon_bbox_is_pushed(spark, tmp_path):
    from bob_vector_db_spark.operators.filters import GeoPolygon

    p = str(tmp_path / "pts")
    spark.createDataFrame(
        [(float(i % 90), float(i % 180)) for i in range(200)],
        "lat double, lon double").write.parquet(p)
    gp = GeoPolygon("lat", "lon", [(0.0, 0.0), (20.0, 10.0), (5.0, 30.0)])
    out = spark.read.parquet(p).filter(F.expr(gp.to_sql()))
    assert_pushed_filters(out, "lat", "lon")


def test_best_score_negative_dominated_stays_non_positive(spark, tmp_path):
    """ADVICE r6 (medium): Qdrant's RecoQuery scores a negative-dominated
    point -(best_neg)^2 — when both best sims are NEGATIVE, a bare sign
    flip would hand the point a POSITIVE score and let a dissimilar-to-
    everything point outrank genuine matches."""
    root = str(tmp_path / "store")
    rows = [
        (1, [1.0, 0.0, 0.0]),    # positive example
        (2, [0.0, 1.0, 0.0]),    # negative example
        (10, [0.9, 0.1, 0.0]),   # genuine positive match
        # dissimilar to BOTH examples: bp and bn both negative; with the
        # sign-flip bug its score becomes +0.7-ish and it wins
        (11, [-0.5, -0.7, 0.0]),
    ]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    upsert.create_collection(
        spark, root, "c", df=df, id_col="id", n_buckets=4,
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    got = query_api.recommend_points(
        spark, root, "c", positive=[1], negative=[2],
        strategy="best_score", k=2).orderBy("rank").collect()
    assert got[0]["vec_id"] == 10 and got[0]["score"] > 0
    assert got[1]["vec_id"] == 11 and got[1]["score"] <= 0


def test_search_groups_excludes_null_group(spark, tmp_path):
    """ADVICE r6: a point MISSING the group_by key is excluded (Qdrant
    semantics) — a NULL group must not consume a k_groups slot."""
    root = str(tmp_path / "store")
    rows = [(i, [1.0, float(i % 3), 0.0],
             None if i % 4 == 0 else f"g{i % 3}") for i in range(24)]
    df = spark.createDataFrame(rows, "id long, vec array<double>, grp string")
    upsert.create_collection(
        spark, root, "c", df=df, id_col="id", n_buckets=4,
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    q = spark.createDataFrame([(0, [1.0, 1.0, 0.0])],
                              "qid long, qvec array<double>")
    out = query_api.search_groups(spark, root, "c", q, group_by="grp",
                                  k_groups=5, group_size=2).collect()
    assert len(out) > 0
    assert all(r["group"] is not None for r in out)
    assert {r["group"] for r in out} <= {"g0", "g1", "g2"}


def test_scroll_descending_keyset(spark, tmp_path):
    """Qdrant OrderBy(direction=DESC): descending keyset pages are
    disjoint, complete, and ordered newest-first; the value leg of the
    cursor inequality flips while the id tiebreak stays ascending."""
    root = str(tmp_path / "store")
    rows = [(i, i % 5) for i in range(23)]
    df = spark.createDataFrame(rows, "id long, v long")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=4)
    seen, cursor = [], None
    while True:
        page = query_api.scroll_points(
            spark, root, "c", order_by="v", descending=True, limit=7,
            cursor=cursor).collect()
        if not page:
            break
        seen.extend((r["v"], r["id"]) for r in page)
        cursor = (page[-1]["v"], page[-1]["id"])
    want = sorted(((v, i) for i, v in rows), key=lambda t: (-t[0], t[1]))
    assert seen == want  # every row once, in (-v, id) order across pages


def test_with_payload_and_query_points_paging(spark, tmp_path):
    """Qdrant with_payload (True = every payload column, a list = exactly
    those; vectors never attach) and query-by-id paging: offset applies
    AFTER the self-exclusion so page boundaries never shift."""
    root = str(tmp_path / "store")
    rows = [(i, [float(i % 7) + 1.0, 1.0], f"g{i % 3}", i * 2)
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "id long, vec array<double>, grp string, n long")
    upsert.create_collection(
        spark, root, "c", df=df, id_col="id", n_buckets=4,
        vector_config={"vec": {"size": 2, "distance": "cosine"}})
    q = spark.createDataFrame([(0, [1.0, 1.0])],
                              "qid long, qvec array<double>")
    out = query_api.search_points(spark, root, "c", q, k=5,
                                  with_payload=True).collect()
    assert len(out) == 5
    assert set(out[0].asDict()) == {"qid", "vec_id", "sim", "rank",
                                    "grp", "n"}  # vec never attaches
    sel = query_api.search_points(spark, root, "c", q, k=5,
                                  with_payload=["grp"]).collect()
    assert set(sel[0].asDict()) == {"qid", "vec_id", "sim", "rank", "grp"}
    assert all(r["grp"] == f"g{r['vec_id'] % 3}" for r in sel)
    with pytest.raises(ValueError, match="not in the stored schema"):
        query_api.search_points(spark, root, "c", q, k=5,
                                with_payload=["nope"])
    # query-by-id: page 1 (offset 0) and page 2 (offset k) are disjoint,
    # contiguous, and never contain the looked-up point
    p1 = query_api.query_points(spark, root, "c", query=7, k=5)
    p2 = query_api.query_points(spark, root, "c", query=7, k=5, offset=5)
    ids1 = [r["vec_id"] for r in p1.orderBy("rank").collect()]
    ids2 = [r["vec_id"] for r in p2.orderBy("rank").collect()]
    assert 7 not in ids1 and 7 not in ids2
    assert not (set(ids1) & set(ids2)) and len(ids1) == len(ids2) == 5
    full = query_api.query_points(spark, root, "c", query=7, k=10)
    assert [r["vec_id"] for r in full.orderBy("rank").collect()] \
        == ids1 + ids2


def test_review_fixes_round7(spark, tmp_path):
    """Round-7 self-review regressions: prefetch-branch search params,
    use_index=True normalization, descending id scroll, multivector
    query-by-id, and facet parity (array/NULL) between index and scan."""
    from bob_vector_db_spark.operators import knn
    from bob_vector_db_spark.operators.payload_index import (
        build_payload_index)

    root = str(tmp_path / "store")
    rows = [(i, [float(i % 7) + 1.0, 1.0],
             None if i % 5 == 0 else f"g{i % 3}",
             ["a", "a", "b"] if i % 2 else []) for i in range(20)]
    df = spark.createDataFrame(
        rows, "id long, vec array<double>, grp string, tags array<string>")
    upsert.create_collection(
        spark, root, "c", df=df, id_col="id", n_buckets=4,
        vector_config={"vec": {"size": 2, "distance": "cosine"}})

    # use_index=True behaves as 'always' on the FILTERED branch too
    q = spark.createDataFrame([(0, [1.0, 1.0])],
                              "qid long, qvec array<double>")
    with pytest.raises(ValueError, match="absent|stale|payload"):
        query_api.search_points(spark, root, "c", q,
                                flt=MatchValue("grp", "g1"), k=3,
                                use_index=True)

    # facet: NULL never a group; arrays count per distinct element —
    # identical from the scan and from the index
    scan = [(r["value"], r["count"]) for r in query_api.facet_values(
        spark, root, "c", "grp", use_payload_index=False).collect()]
    assert all(v is not None for v, _ in scan)
    arr_scan = {r["value"]: r["count"] for r in query_api.facet_values(
        spark, root, "c", "tags", use_payload_index=False).collect()}
    assert arr_scan == {"a": 10, "b": 10}  # per distinct element, 10 odd ids
    build_payload_index(spark, root, "c", "grp", n_val_buckets=4)
    build_payload_index(spark, root, "c", "tags", n_val_buckets=4)
    idx = [(r["value"], r["count"]) for r in query_api.facet_values(
        spark, root, "c", "grp").collect()]
    assert idx == scan
    arr_idx = {r["value"]: r["count"] for r in query_api.facet_values(
        spark, root, "c", "tags").collect()}
    assert arr_idx == arr_scan

    # prefetch branch applies offset / threshold / with_payload
    leaf = knn.knn_join(q, df.select("id", "vec"), k=10, corpus_id="id",
                        corpus_vec="vec", exclude_self=False) \
        .withColumnRenamed("vec_id", "id")
    fused = query_api.query_points(
        spark, root, "c", prefetch=[leaf, leaf], fusion="rrf", k=4,
        offset=2, with_payload=["grp"]).orderBy("rank").collect()
    assert len(fused) == 4 and [r["rank"] for r in fused] == [1, 2, 3, 4]
    assert "grp" in fused[0].asDict()
    full = query_api.query_points(
        spark, root, "c", prefetch=[leaf, leaf], fusion="rrf",
        k=6).orderBy("rank").collect()
    assert [r["id"] for r in fused] == [r["id"] for r in full[2:6]]

    # descending id scroll pages newest-first and stays disjoint
    p1 = query_api.scroll_points(spark, root, "c", limit=8,
                                 descending=True).collect()
    ids1 = [r["id"] for r in p1]
    assert ids1 == sorted(ids1, reverse=True) and ids1[0] == 19
    p2 = query_api.scroll_points(spark, root, "c", limit=8,
                                 descending=True,
                                 cursor=(ids1[-1],)).collect()
    ids2 = [r["id"] for r in p2]
    assert ids2[0] == ids1[-1] - 1 and not set(ids1) & set(ids2)


def test_query_by_id_multivector(spark, tmp_path):
    """query_points(query=<id>) on a MULTIVECTOR collection builds the
    nested query shape and max-sim scores it — the by-id lookup works
    for every declared space kind."""
    root = str(tmp_path / "store")
    rows = [(i, [[float(i % 5), 1.0], [0.5, float(i % 3)]])
            for i in range(20)]
    df = spark.createDataFrame(rows, "id long, mv array<array<double>>")
    upsert.create_collection(
        spark, root, "c", df=df, id_col="id", n_buckets=4,
        vector_config={"mv": {"size": 2, "distance": "dot",
                              "multivector": "max_sim"}})
    out = query_api.query_points(spark, root, "c", query=3, k=5).collect()
    assert len(out) == 5
    assert all(r["vec_id"] != 3 for r in out)  # self excluded


def test_with_vectors_attach_dense_and_sparse(spark, tmp_path):
    """Qdrant with_vectors (VERDICT r7 missing #3): True attaches every
    declared space's stored data (a sparse space contributes its
    indices/values pair), a list attaches exactly those spaces, and an
    undeclared name raises.  The fetch is id-bucket pruned, same as
    with_payload."""
    from bob_vector_db_spark.operators import upsert as U

    root = str(tmp_path / "store")
    rows = [(i, [float((i + d) % 5) for d in range(4)],
             [i % 3, 3 + i % 2], [1.0, 2.0], f"g{i % 2}")
            for i in range(30)]
    pts = spark.createDataFrame(
        rows, "id long, dense array<double>, indices array<int>, "
              "values array<double>, grp string")
    U.create_collection(
        spark, root, "c", df=pts, id_col="id", n_buckets=4,
        vector_config={"dense": {"size": 4, "distance": "cosine"},
                       "text_sparse": {"kind": "sparse",
                                       "distance": "dot"}})
    q = spark.createDataFrame([(0, [1.0, 2.0, 0.5, 0.0])],
                              "qid long, qvec array<double>")
    out = query_api.search_points(spark, root, "c", q, k=5,
                                  vector_name="dense",
                                  with_vectors=True).collect()
    assert len(out) == 5
    by_id = {int(r["vec_id"]): r for r in out}
    for vid, r in by_id.items():
        assert list(r["dense"]) == [float((vid + d) % 5) for d in range(4)]
        assert list(r["indices"]) == [vid % 3, 3 + vid % 2]
        assert list(r["values"]) == [1.0, 2.0]
        assert "grp" not in r.asDict()  # payload stays with_payload's job
    # list form: only the sparse space's physical pair attaches
    sp = query_api.search_points(spark, root, "c", q, k=3,
                                 vector_name="dense",
                                 with_vectors=["text_sparse"]).collect()
    d = sp[0].asDict()
    assert "indices" in d and "values" in d and "dense" not in d
    # and together with with_payload
    both = query_api.search_points(spark, root, "c", q, k=3,
                                   vector_name="dense",
                                   with_payload=["grp"],
                                   with_vectors=["dense"]).collect()
    d = both[0].asDict()
    assert "grp" in d and "dense" in d and "indices" not in d
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not declared"):
        query_api.search_points(spark, root, "c", q, k=3,
                                vector_name="dense",
                                with_vectors=["nope"]).collect()


def test_scroll_cursor_return_and_attach_flags(spark, tmp_path):
    """The Qdrant (points, next_page_offset) pair: return_cursor walks 3
    pages hands-free — each next_cursor is the last row's key, None on
    the short final page — while with_payload/with_vectors shape the
    page columns (vectors only on request, id always present)."""
    from bob_vector_db_spark.operators import upsert as U

    root = str(tmp_path / "store")
    pts = spark.createDataFrame(
        [(i, [float(i), 1.0], f"g{i % 3}", i * 2) for i in range(20)],
        "id long, vec array<double>, grp string, v long")
    U.create_collection(
        spark, root, "c", df=pts, id_col="id", n_buckets=4,
        vector_config={"vec": {"size": 2, "distance": "cosine"}})
    seen, cursor, pages = [], None, 0
    while True:
        page, cursor = query_api.scroll_points(
            spark, root, "c", limit=8, cursor=cursor,
            with_payload=["grp"], with_vectors=True, return_cursor=True)
        rows = page.collect()
        if not rows:
            break
        pages += 1
        for r in rows:
            d = r.asDict()
            assert set(d) == {"id", "grp", "vec"}
            assert list(r["vec"]) == [float(r["id"]), 1.0]
        seen.extend(r["id"] for r in rows)
        if cursor is None:
            break
    assert pages == 3 and seen == list(range(20))
    # default flags: payload yes, vectors no
    page = query_api.scroll_points(spark, root, "c", limit=5)
    d = page.collect()[0].asDict()
    assert "vec" not in d and {"id", "grp", "v"} <= set(d)
    # order_by paging returns a composite cursor
    page, cur = query_api.scroll_points(
        spark, root, "c", limit=6, order_by="v", return_cursor=True)
    rows = page.collect()
    assert cur == (rows[-1]["v"], rows[-1]["id"])


def test_scroll_order_by_pages_through_nulls(spark, tmp_path):
    """Review r8 regression: NULL order_by values sort FIRST asc / LAST
    desc; a cursor landing on a NULL row made the next page's (v > NULL)
    predicate all-NULL and silently ended the scroll with rows missing.
    Both directions must walk EVERY id exactly once."""
    from bob_vector_db_spark.operators import upsert as U

    root = str(tmp_path / "store")
    pts = spark.createDataFrame(
        [(i, (None if i % 3 == 0 else i * 2)) for i in range(21)],
        "id long, v long")
    U.create_collection(spark, root, "c", df=pts, id_col="id", n_buckets=4)
    for descending in (False, True):
        seen, cursor = [], None
        for _ in range(10):  # bounded: 21 rows / limit 4 = 6 pages max
            page, cursor = query_api.scroll_points(
                spark, root, "c", limit=4, order_by="v", cursor=cursor,
                descending=descending, return_cursor=True)
            rows = page.collect()
            seen.extend(r["id"] for r in rows)
            if cursor is None:
                break
        assert sorted(seen) == list(range(21)), descending
        assert len(seen) == len(set(seen)), descending
        # the order itself: NULLs first asc, last desc, ids ascending
        # within equal/NULL values
        nulls = [i for i in seen if i % 3 == 0]
        vals = [i for i in seen if i % 3 != 0]
        if descending:
            assert seen == sorted(vals, reverse=True) + sorted(nulls)
        else:
            assert seen == sorted(nulls) + sorted(vals)


def test_scroll_order_by_start_from(spark, tmp_path):
    """Qdrant OrderBy.start_from: the scroll opens at the given value
    INCLUSIVE (>= asc / <= desc); rows with a NULL order value never
    match the pushed bound; paging with the keyset cursor continues from
    inside the bounded range."""
    from bob_vector_db_spark.operators import upsert as U

    root = str(tmp_path / "store")
    pts = spark.createDataFrame(
        [(i, (None if i % 5 == 0 else i * 10)) for i in range(20)],
        "id long, v long")
    U.create_collection(spark, root, "c", df=pts, id_col="id", n_buckets=4)
    page = query_api.scroll_points(spark, root, "c", limit=50,
                                   order_by="v", start_from=100)
    ids = [r["id"] for r in page.collect()]
    assert ids == [i for i in range(10, 20) if i % 5 != 0]
    desc = query_api.scroll_points(spark, root, "c", limit=50,
                                   order_by="v", start_from=100,
                                   descending=True)
    assert [r["id"] for r in desc.collect()] == \
        [i for i in range(10, -1, -1) if i % 5 != 0]
    # cursor paging stays inside the bound
    p1, cur = query_api.scroll_points(spark, root, "c", limit=3,
                                      order_by="v", start_from=100,
                                      return_cursor=True)
    p2 = query_api.scroll_points(spark, root, "c", limit=50, order_by="v",
                                 start_from=100, cursor=cur)
    walked = [r["id"] for r in p1.collect()] + [r["id"] for r in p2.collect()]
    assert walked == ids
    import pytest as _pytest
    with _pytest.raises(ValueError, match="start_from needs order_by"):
        query_api.scroll_points(spark, root, "c", start_from=5)


def test_query_points_lookup_from(spark, tmp_path):
    """Qdrant LookupLocation: a by-id query resolves its vector from
    ANOTHER collection (or another named space) — self-exclusion applies
    only when the lookup collection IS the searched one; dense/
    multivector shape mismatches are refused."""
    root = str(tmp_path / "store")
    corpus = spark.createDataFrame(
        [(i, [float(i % 5), float((i * 7) % 3), 1.0]) for i in range(30)],
        "id long, vec array<double>")
    upsert.create_collection(
        spark, root, "c", df=corpus, id_col="id", n_buckets=4,
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    # the lookup collection: SAME id values, different vectors
    lk = spark.createDataFrame(
        [(i, [float((i + 1) % 5), float(i % 3), 1.0]) for i in range(10)],
        "id long, emb array<double>")
    upsert.create_collection(
        spark, root, "lk", df=lk, id_col="id", n_buckets=4,
        vector_config={"emb": {"size": 3, "distance": "cosine"}})
    got = query_api.query_points(spark, root, "c", query=7, k=5,
                                 lookup_from_collection="lk",
                                 lookup_from_vector="emb")
    rows = got.collect()
    assert len(rows) == 5
    # id 7's vector in lk is [(8)%5, 7%3, 1] = [3.0, 1.0, 1.0]; querying
    # c with it explicitly must give the SAME ranking, WITHOUT dropping
    # corpus id 7 (different namespace -> no self-exclusion)
    q = spark.createDataFrame([(7, [3.0, 1.0, 1.0])],
                              "qid long, qvec array<double>")
    want = query_api.search_points(spark, root, "c", q, k=5)
    key = lambda df: sorted(
        (r["vec_id"], round(r["sim"], 6), r["rank"]) for r in df.collect())
    assert key(got) == key(want)
    # same-collection lookup (the default) still self-excludes
    same = query_api.query_points(spark, root, "c", query=7, k=5)
    assert all(r["vec_id"] != 7 for r in same.collect())
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not a declared space"):
        query_api.query_points(spark, root, "c", query=7, k=5,
                               lookup_from_collection="lk",
                               lookup_from_vector="nope")


def test_hasid_and_hasvector_conditions(spark, tmp_path):
    """Qdrant HasIdCondition / HasVectorCondition: HasId's literal ids
    resolve DIRECTLY to the candidate frame (no payload index, no scan
    for candidate generation) and compose with other leaves; HasVector
    matches exactly the points still carrying the named space after
    delete_vectors."""
    from bob_vector_db_spark.operators.filters import HasId, HasVector

    root = str(tmp_path / "store")
    rows = [(i, [float(i % 5), float((i * 7) % 3), 1.0], f"g{i % 3}")
            for i in range(30)]
    df = spark.createDataFrame(rows, "id long, vec array<double>, grp string")
    upsert.create_collection(
        spark, root, "c", df=df, id_col="id", n_buckets=4,
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    # HasId routes WITHOUT any payload index on the collection
    flt = Filter(must=[HasId([3, 5, 8, 11, 999])])
    ids, residual = filter_match_ids(spark, root, "c", flt)
    assert ids is not None and residual == Filter()
    got = {r["id"] for r in ids.collect()}
    assert got == {"3", "5", "8", "11", "999"}  # 999 absent: fetch drops it
    n = query_api.count_points(spark, root, "c", flt=flt,
                               use_payload_index="always")
    assert n == 4
    # composes: HasId candidates ∩ a residual grp leaf
    both = Filter(must=[HasId([3, 5, 8, 11]), MatchValue("grp", "g2")])
    n2 = query_api.count_points(spark, root, "c", flt=both,
                                use_payload_index="always")
    assert n2 == len([i for i in (3, 5, 8, 11) if i % 3 == 2])
    # scan path agrees (HasId compiles to id IN (...))
    assert query_api.count_points(spark, root, "c", flt=both,
                                  use_payload_index=False) == n2
    # HasVector: delete the space from two points; only carriers match
    upsert.delete_vectors(spark, root, "c", [4, 9], ["vec"])
    hv = Filter(must=[HasVector("vec")])
    assert query_api.count_points(spark, root, "c", flt=hv,
                                  use_payload_index=False) == 28
    assert query_api.count_points(
        spark, root, "c",
        flt=Filter(must_not=[HasVector("vec")]),
        use_payload_index=False) == 2


def test_hasid_cross_engine_sql(spark):
    import pandas as pd

    from bob_vector_db_spark.operators.filters import HasId, HasVector

    pdf = pd.DataFrame(
        [(1, [1.0]), (2, None), (3, [2.0])],
        columns=["id", "vec"])
    flt = Filter(must=[HasId([1, 3]), HasVector("vec")])
    a, b = _both_engines(spark, pdf, flt)
    assert a == b and len(a) == 2
    assert Filter(must=[HasId([])]).to_sql() == "(FALSE)"


def test_retrieve_points(spark, tmp_path):
    """Qdrant retrieve: points by id through ONE bucket-pruned fetch,
    shaped by the return flags (payload default on, vectors on request);
    ghost ids return no row; rows come back id-ordered."""
    from bob_vector_db_spark.plans.inspect import assert_partition_filters

    root = str(tmp_path / "store")
    pts = spark.createDataFrame(
        [(i, [float(i), 1.0], f"g{i % 3}", i * 2) for i in range(20)],
        "id long, vec array<double>, grp string, v long")
    upsert.create_collection(
        spark, root, "c", df=pts, id_col="id", n_buckets=4,
        vector_config={"vec": {"size": 2, "distance": "cosine"}})
    got = query_api.retrieve_points(spark, root, "c", [7, 3, 999, 12])
    rows = got.collect()
    assert [r["id"] for r in rows] == [3, 7, 12]
    assert set(rows[0].asDict()) == {"id", "grp", "v"}
    assert_partition_filters(got, "id_bucket")
    both = query_api.retrieve_points(spark, root, "c", [5],
                                     with_payload=["grp"],
                                     with_vectors=True).collect()
    d = both[0].asDict()
    assert set(d) == {"id", "grp", "vec"}
    assert list(d["vec"]) == [5.0, 1.0]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not declared"):
        query_api.retrieve_points(spark, root, "c", [5],
                                  with_vectors=["nope"])


def test_recommend_lookup_from(spark, tmp_path):
    """Qdrant RecommendRequest.lookup_from: example vectors fetch from
    ANOTHER collection — no example-id exclusion there (different
    namespace); explicit-vector equivalence pins the semantics."""
    root = str(tmp_path / "store")
    corpus = spark.createDataFrame(
        [(i, [float(i % 5), float((i * 7) % 3), 1.0]) for i in range(30)],
        "id long, vec array<double>")
    upsert.create_collection(
        spark, root, "c", df=corpus, id_col="id", n_buckets=4,
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    lk = spark.createDataFrame(
        [(i, [float(i + 1), 1.0, 0.5]) for i in range(5)],
        "id long, emb array<double>")
    upsert.create_collection(
        spark, root, "examples", df=lk, id_col="id", n_buckets=2,
        vector_config={"emb": {"size": 3, "distance": "cosine"}})
    got = query_api.recommend_points(
        spark, root, "c", positive=[2, 4], negative=[0], k=5,
        lookup_from_collection="examples", lookup_from_vector="emb")
    rows = got.collect()
    assert len(rows) == 5
    # the average strategy with the SAME vectors passed explicitly:
    # q = mean(lk[2], lk[4]) - lk[0]
    import numpy as np
    q = (np.array([3.0, 1.0, 0.5]) + np.array([5.0, 1.0, 0.5])) / 2 \
        - np.array([1.0, 1.0, 0.5])
    from bob_vector_db_spark.operators.knn import knn_join
    qdf = spark.createDataFrame([(0, [float(x) for x in q])],
                                "qid long, qvec array<double>")
    want = knn_join(qdf, corpus.select("id", "vec"), k=5, corpus_id="id",
                    corpus_vec="vec", metric="cosine")
    key = lambda rs: sorted((r["vec_id"], r["rank"]) for r in rs)
    assert key(rows) == key(want.collect())
    # corpus ids 0/2/4 stay eligible (different namespace — the
    # equivalence above already pins this: knn_join never excluded them)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not in 'examples'"):
        query_api.recommend_points(
            spark, root, "c", positive=[99], k=3,
            lookup_from_collection="examples")
