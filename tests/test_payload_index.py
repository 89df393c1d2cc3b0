"""Payload (secondary) index: value-bucketed inverted index, pruned filter
probe, indexed filtered search, incremental refresh."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bob_vector_db_spark.operators import index, upsert
from bob_vector_db_spark.operators.payload_index import (
    build_payload_index,
    filtered_search_indexed,
    payload_match_ids,
    refresh_payload_index,
)
from bob_vector_db_spark.plans.inspect import assert_partition_filters


def _mk(spark, tmp_path, n=80):
    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, f"cat{i % 5}", [float((i * 3 + j) % 7) for j in range(6)])
         for i in range(n)],
        "id long, category string, embedding array<double>")
    upsert.create_collection(
        spark, root, "c", df=df, id_col="id", n_buckets=4,
        vector_config={"embedding": {"size": 6, "distance": "cosine"}})
    return root, df


def test_match_ids_and_pruning(spark, tmp_path):
    root, df = _mk(spark, tmp_path)
    build_payload_index(spark, root, "c", "category", n_val_buckets=8)
    got = payload_match_ids(spark, root, "c", "category", ["cat2"])
    want = {str(r["id"]) for r in df.filter("category = 'cat2'").collect()}
    assert {r["id"] for r in got.collect()} == want
    assert_partition_filters(got, "val_bucket")


def test_filtered_search_matches_exact(spark, tmp_path):
    root, df = _mk(spark, tmp_path)
    build_payload_index(spark, root, "c", "category", n_val_buckets=8)
    q = spark.createDataFrame([(0, [1.0, 2.0, 3.0, 1.0, 0.5, 2.0])],
                              "qid long, qvec array<double>")
    out = filtered_search_indexed(spark, root, "c", q,
                                  column="category",
                                  values=["cat1", "cat3"], k=50)
    got_ids = {r["vec_id"] for r in out.collect()}
    want_ids = {r["id"] for r in
                df.filter(F.col("category").isin("cat1", "cat3")).collect()}
    assert got_ids <= want_ids and len(got_ids) == min(50, len(want_ids))
    # ranking equals a plain kNN over the filtered subset
    from bob_vector_db_spark.operators.knn import knn_join
    exact = knn_join(
        q, df.filter(F.col("category").isin("cat1", "cat3")),
        k=50, corpus_id="id", corpus_vec="embedding", exclude_self=False)
    assert sorted(map(tuple, out.select("qid", "vec_id", "sim", "rank")
                      .collect())) == \
        sorted(map(tuple, exact.select("qid", "vec_id", "sim", "rank")
                  .collect()))


def test_payload_refresh_and_refresh_all(spark, tmp_path):
    root, df = _mk(spark, tmp_path)
    build_payload_index(spark, root, "c", "category", n_val_buckets=8)
    # flip id 0 into cat4, add a new cat4 point, delete two cat4 points
    upsert.upsert(spark, root, "c", spark.createDataFrame(
        [(0, "cat4", [1.0] * 6), (500, "cat4", [2.0] * 6)],
        "id long, category string, embedding array<double>"))
    upsert.delete_points(spark, root, "c", [4, 9])
    with pytest.raises(ValueError, match="stale|refresh"):
        payload_match_ids(spark, root, "c", "category", ["cat4"])
    # refresh_all dispatches the payload kind too
    metas = index.refresh_all_indexes(spark, root, "c")
    assert any(m["kind"] == "payload" for m in metas)
    got = {r["id"] for r in
           payload_match_ids(spark, root, "c", "category", ["cat4"])
           .collect()}
    want = {str(r["id"]) for r in
            upsert.read_collection(spark, root, "c")
            .filter("category = 'cat4'").collect()}
    assert got == want and "0" in got and "500" in got
    assert "4" not in got and "9" not in got


def test_probe_literals_render_like_the_build(spark, tmp_path):
    """Python literals must stringify through Spark's cast, not str():
    booleans store as 'true'/'false', doubles as '2.0' — probing with
    True / 2 must still match."""
    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(1, True, 2.0), (2, False, 3.5), (3, True, 2.0)],
        "id long, flag boolean, score double")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=2)
    build_payload_index(spark, root, "c", "flag", n_val_buckets=4)
    build_payload_index(spark, root, "c", "score", n_val_buckets=4)
    got = {r["id"] for r in
           payload_match_ids(spark, root, "c", "flag", [True]).collect()}
    assert got == {"1", "3"}
    got = {r["id"] for r in
           payload_match_ids(spark, root, "c", "score", [2.0]).collect()}
    assert got == {"1", "3"}


def test_probe_literal_coerces_to_indexed_column_type(spark, tmp_path):
    """A probe literal whose PYTHON type differs from the indexed column's
    Spark type must still match: values=[2] against a double column has to
    render '2.0' (the string the build wrote), not '2'.  The index meta
    persists the column's dataType for exactly this cast."""
    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(1, 2.0, 7), (2, 3.5, 8), (3, 2.0, 7)],
        "id long, score double, n int")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=2)
    build_payload_index(spark, root, "c", "score", n_val_buckets=4)
    build_payload_index(spark, root, "c", "n", n_val_buckets=4)
    # int literal probing a double column
    got = {r["id"] for r in
           payload_match_ids(spark, root, "c", "score", [2]).collect()}
    assert got == {"1", "3"}
    # float literal probing an int column
    got = {r["id"] for r in
           payload_match_ids(spark, root, "c", "n", [7.0]).collect()}
    assert got == {"1", "3"}


def test_filtered_search_never_collects_candidate_ids(spark, tmp_path,
                                                      monkeypatch):
    """Scale contract: filtered_search_indexed's driver interactions are a
    count() selectivity guard and a <= n_buckets-row bucket-set aggregate —
    the candidate id list itself must never round-trip through the
    driver."""
    root, df = _mk(spark, tmp_path)          # 80 points, 4 id buckets
    build_payload_index(spark, root, "c", "category", n_val_buckets=8)
    q = spark.createDataFrame([(0, [1.0, 2.0, 3.0, 1.0, 0.5, 2.0])],
                              "qid long, qvec array<double>")

    # patch the CONCRETE DataFrame class (pyspark 4's classic subclass
    # overrides collect — patching the pyspark.sql.DataFrame base misses it)
    cls = type(q)
    collected_sizes: list[int] = []
    orig = cls.collect

    def counting_collect(self):
        rows = orig(self)
        collected_sizes.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", counting_collect)
    out = filtered_search_indexed(spark, root, "c", q, column="category",
                                  values=["cat1", "cat3"], k=50)
    monkeypatch.undo()
    # cat1+cat3 match 32 of 80 ids; any collect during planning must stay
    # far below that (1-row literal render, <=4 bucket rows, 1 query row)
    assert collected_sizes, "expected planning-time collects"
    assert max(collected_sizes) <= 8, collected_sizes
    assert out.count() == 32


def test_empty_collection_payload_index_probes_empty(spark, tmp_path):
    root = str(tmp_path / "store")
    upsert.create_collection(spark, root, "c", n_buckets=2)
    build_payload_index(spark, root, "c", "anything", n_val_buckets=4)
    assert payload_match_ids(spark, root, "c", "anything",
                             ["x"]).count() == 0


def test_payload_probe_pushes_val_predicate(spark, tmp_path):
    from bob_vector_db_spark.plans.inspect import assert_pushed_filters

    root, _ = _mk(spark, tmp_path)
    build_payload_index(spark, root, "c", "category", n_val_buckets=8)
    got = payload_match_ids(spark, root, "c", "category", ["cat2", "cat3"])
    assert_pushed_filters(got, "val")


def test_array_payload_index_probe_refresh_and_kind_guard(spark, tmp_path):
    """Element postings for an ARRAY column: MatchContains routes through
    the index (and follows mutations through refresh); a SCALAR-equality
    leaf over the array index must NOT route — membership and equality
    are different predicates."""
    from bob_vector_db_spark.operators import query_api
    from bob_vector_db_spark.operators.filters import (
        Filter,
        MatchContains,
        MatchValue,
        filter_match_ids,
    )
    from bob_vector_db_spark.operators.payload_index import (
        build_payload_index,
        refresh_payload_index,
    )

    root = str(tmp_path / "store")
    rows = [(i, [f"t{i % 3}", "all"], [float(i % 5), 1.0]) for i in range(30)]
    upsert.create_collection(
        spark, root, "c", id_col="id", n_buckets=4,
        df=spark.createDataFrame(
            rows, "id long, tags array<string>, vec array<double>"),
        vector_config={"vec": {"size": 2, "distance": "cosine"}})
    build_payload_index(spark, root, "c", "tags", n_val_buckets=8)

    flt = Filter(must=[MatchContains("tags", "t1")])
    ids, residual = filter_match_ids(spark, root, "c", flt)
    assert ids is not None  # routed
    assert {int(r["id"]) for r in ids.collect()} == \
        {i for i in range(30) if i % 3 == 1}
    assert residual == Filter()
    # every point carries 'all'
    assert query_api.count_points(spark, root, "c",
                                  flt=Filter(must=[MatchContains(
                                      "tags", "all")]),
                                  use_payload_index="always") == 30
    # scalar equality over the ARRAY index: not routed — 'always' raises,
    # 'auto' falls back to the pushed scan (where = compares full arrays
    # and matches nothing for a string literal)
    eq = Filter(must=[MatchValue("parity", 1)])
    ids2, _ = filter_match_ids(spark, root, "c", eq)
    assert ids2 is None
    # mutations flow through refresh: retag id 0, add id 99, delete id 3
    upsert.update_columns(spark, root, "c", spark.createDataFrame(
        [(0, ["t9"])], "id long, tags array<string>"))
    upsert.upsert(spark, root, "c", spark.createDataFrame(
        [(99, ["t1"], [0.5, 0.5])],
        "id long, tags array<string>, vec array<double>"))
    upsert.delete_points(spark, root, "c", [4])
    refresh_payload_index(spark, root, "c", "tags")
    ids3, _ = filter_match_ids(spark, root, "c", flt)
    got = {int(r["id"]) for r in ids3.collect()}
    assert 99 in got and 4 not in got
    assert got == ({i for i in range(30) if i % 3 == 1} - {4}) | {99}
    ids9, _ = filter_match_ids(
        spark, root, "c", Filter(must=[MatchContains("tags", "t9")]))
    assert {int(r["id"]) for r in ids9.collect()} == {0}


def test_nested_key_payload_index_routes_filter(spark, tmp_path):
    """A payload index over a DOTTED struct path (meta.lang): the build
    projects the subfield, the filter DSL's nested-key leaf routes
    through it (pruned posting probe + bucket-pruned fetch), and the
    result equals the pushed-scan path."""
    from bob_vector_db_spark.operators.filters import (
        Filter, MatchValue, Range, filter_match_ids)
    from bob_vector_db_spark.operators.query_api import count_points

    root = str(tmp_path / "store")
    rows = [(i, ("en" if i % 3 else "de"), i % 7) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, lang string, n int") \
        .select("id", F.struct("lang", "n").alias("meta"))
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=4)
    imeta = build_payload_index(spark, root, "c", "meta.lang",
                                n_val_buckets=8)
    assert imeta["column"] == "meta.lang" and not imeta["array"]
    flt = Filter(must=[MatchValue("meta.lang", "de"),
                       Range("meta.n", gte=2)])
    ids, residual = filter_match_ids(spark, root, "c", flt)
    assert ids is not None  # the dotted leaf routed through the index
    assert residual.must and residual.must[0].key == "meta.n"
    n_idx = count_points(spark, root, "c", flt=flt,
                         use_payload_index="always")
    n_scan = count_points(spark, root, "c", flt=flt,
                          use_payload_index=False)
    want = sum(1 for i in range(60) if i % 3 == 0 and i % 7 >= 2)
    assert n_idx == n_scan == want
    # refresh absorbs a struct patch through the same dotted projection
    patch = spark.createDataFrame(  # id 9: lang 'de', n 2 — in the set
        [(9, ("en", 5))], "id long, meta struct<lang:string,n:int>")
    upsert.update_columns(spark, root, "c", patch)
    refresh_payload_index(spark, root, "c", "meta.lang")
    assert count_points(spark, root, "c", flt=flt,
                        use_payload_index="always") == want - 1


def test_facet_answers_from_index_only(spark, tmp_path):
    """An unfiltered facet over an indexed key aggregates the POSTING
    table — the collection's id_bucket files never open — and agrees
    with the scan facet, including after a mutation+refresh."""
    from bob_vector_db_spark.operators.query_api import facet_values
    from bob_vector_db_spark.plans.inspect import formatted_plan

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, f"cat{i % 4}") for i in range(50)], "id long, category string")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=4)
    build_payload_index(spark, root, "c", "category", n_val_buckets=8)
    got = facet_values(spark, root, "c", "category", limit=10)
    plan = formatted_plan(got)
    assert "postings" in plan and "id_bucket" not in plan
    scan = facet_values(spark, root, "c", "category", limit=10,
                        use_payload_index=False)
    rows = lambda d: [(r["value"], r["count"]) for r in d.collect()]
    assert rows(got) == rows(scan)
    # stale index → silent scan fallback; refresh → index-only again
    upsert.delete_points(spark, root, "c", [0, 4, 8])
    stale = facet_values(spark, root, "c", "category", limit=10)
    assert "id_bucket" in formatted_plan(stale)
    refresh_payload_index(spark, root, "c", "category")
    fresh = facet_values(spark, root, "c", "category", limit=10)
    assert "postings" in formatted_plan(fresh) \
        and "id_bucket" not in formatted_plan(fresh)
    assert rows(fresh) == rows(facet_values(spark, root, "c", "category",
                                            limit=10,
                                            use_payload_index=False))


# ---------------------------------------------------------------------------
# Typed RANGE payload index (round 8) — the Qdrant integer/float/datetime
# payload index twin: Range / DatetimeRange must-leaves resolve to candidate
# ids from a value-ordered posting layout instead of forcing a full scan.
# ---------------------------------------------------------------------------

def _mk_scored(spark, tmp_path, n=120):
    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, float((i * 37) % 100) / 2.0, (i * 13) % 50) for i in range(n)],
        "id long, score double, n int")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=4)
    return root, df


def test_range_index_probe_prunes_and_matches(spark, tmp_path):
    from bob_vector_db_spark.operators.payload_index import (
        payload_range_match_ids)
    from bob_vector_db_spark.plans.inspect import formatted_plan

    root, df = _mk_scored(spark, tmp_path)
    build_payload_index(spark, root, "c", "score", n_val_buckets=8,
                        index_type="range")
    got = payload_range_match_ids(spark, root, "c", "score",
                                  gte=10.0, lt=20.0)
    want = {str(r["id"]) for r in
            df.filter("score >= 10.0 AND score < 20.0").collect()}
    assert {r["id"] for r in got.collect()} == want
    # the bounds' bucket window lands as a STATIC partition filter, and it
    # actually prunes: a ~20%-selective range must not list all 8 buckets
    assert_partition_filters(got, "val_bucket")
    plan = formatted_plan(got)
    probed = [ln for ln in plan.splitlines()
              if "val_bucket" in ln and "IN" in ln]
    assert probed, plan
    # open-ended ranges work too
    hi = payload_range_match_ids(spark, root, "c", "score", gt=45.0)
    want_hi = {str(r["id"]) for r in df.filter("score > 45.0").collect()}
    assert {r["id"] for r in hi.collect()} == want_hi


def test_range_index_equality_probe_and_int_column(spark, tmp_path):
    """The range layout answers EQUALITY leaves too (the Qdrant typed
    index answers MatchValue on an integer index), probing exactly the
    literal's own bucket with a typed comparison."""
    root, df = _mk_scored(spark, tmp_path)
    build_payload_index(spark, root, "c", "n", n_val_buckets=8,
                        index_type="range")
    got = {r["id"] for r in
           payload_match_ids(spark, root, "c", "n", [13, 26]).collect()}
    want = {str(r["id"]) for r in df.filter("n IN (13, 26)").collect()}
    assert got == want
    # a float literal probing the int column still matches
    got2 = {r["id"] for r in
            payload_match_ids(spark, root, "c", "n", [13.0]).collect()}
    assert got2 == {str(r["id"]) for r in df.filter("n = 13").collect()}


def test_range_probe_uncastable_literal_parity(spark, tmp_path):
    """A literal the column type can't parse raises CAST_INVALID_INPUT
    under Spark 4's default ANSI mode — on the PUSHED SCAN
    (``n = 'abc'`` on an int column) and on the range-index probe alike:
    rebuilding an index must never turn a raising query into a silently
    different answer (or vice versa)."""
    import pytest
    from pyspark.errors import PySparkException

    from bob_vector_db_spark.operators.payload_index import (
        payload_range_match_ids)

    root, df = _mk_scored(spark, tmp_path)
    build_payload_index(spark, root, "c", "n", n_val_buckets=8,
                        index_type="range")
    with pytest.raises(PySparkException, match="CAST_INVALID_INPUT"):
        df.filter(F.col("n") == F.lit("abc")).count()   # the scan's answer
    with pytest.raises(PySparkException, match="CAST_INVALID_INPUT"):
        payload_match_ids(spark, root, "c", "n", ["abc"]).count()
    with pytest.raises(PySparkException, match="CAST_INVALID_INPUT"):
        payload_range_match_ids(spark, root, "c", "n", gt="abc").count()


def test_range_index_nan_parity_with_scan(spark, tmp_path):
    """Review r8 regression: Spark orders NaN ABOVE every number, so the
    pushed scan matches NaN rows on gt/gte — the range index must agree
    (NaN postings live in the top bucket; build used to drop them and
    the two paths disagreed on NaN-bearing data)."""
    from bob_vector_db_spark.operators.filters import Filter, Range
    from bob_vector_db_spark.operators.query_api import count_points

    root = str(tmp_path / "store")
    rows = ([(i, float(i)) for i in range(20)]
            + [(100, float("nan")), (101, float("nan"))])
    df = spark.createDataFrame(rows, "id long, score double")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=4)
    build_payload_index(spark, root, "c", "score", n_val_buckets=4,
                        index_type="range")
    for flt, want in [
        (Filter(must=[Range("score", gt=5.0)]), 14 + 2),   # NaN > 5.0
        (Filter(must=[Range("score", gte=5.0)]), 15 + 2),
        (Filter(must=[Range("score", lt=5.0)]), 5),        # NaN not < 5.0
        (Filter(must=[Range("score", gte=3.0, lt=7.0)]), 4),
    ]:
        n_idx = count_points(spark, root, "c", flt=flt,
                             use_payload_index="always")
        n_scan = count_points(spark, root, "c", flt=flt,
                              use_payload_index=False)
        assert n_idx == n_scan == want, flt


def test_range_filter_routes_and_composes(spark, tmp_path):
    """A Range-only filter resolves through the range index: count /
    search agree with the pushed-scan path, and 'always' no longer
    raises."""
    from bob_vector_db_spark.operators import query_api
    from bob_vector_db_spark.operators.filters import (
        Filter, Range, filter_match_ids)

    root, df = _mk_scored(spark, tmp_path)
    build_payload_index(spark, root, "c", "score", n_val_buckets=8,
                        index_type="range")
    flt = Filter(must=[Range("score", gte=10.0, lt=30.0)])
    ids, residual = filter_match_ids(spark, root, "c", flt)
    assert ids is not None and residual == Filter()
    n_idx = query_api.count_points(spark, root, "c", flt=flt,
                                   use_payload_index="always")
    n_scan = query_api.count_points(spark, root, "c", flt=flt,
                                    use_payload_index=False)
    assert n_idx == n_scan == df.filter(
        "score >= 10.0 AND score < 30.0").count()
    # a Range leaf over a KEYWORD index must NOT route (hash buckets
    # scatter intervals); it stays residual
    build_payload_index(spark, root, "c", "n", n_val_buckets=8)
    flt_kw = Filter(must=[Range("n", gte=10)])
    ids2, residual2 = filter_match_ids(spark, root, "c", flt_kw)
    assert ids2 is None and residual2 == flt_kw


def test_datetime_range_routes_through_range_index(spark, tmp_path):
    from bob_vector_db_spark.operators.filters import (
        DatetimeRange, Filter, filter_match_ids)
    from bob_vector_db_spark.operators.query_api import count_points

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, f"2024-03-{(i % 28) + 1:02d} 12:00:00") for i in range(56)],
        "id long, ts_s string").select(
            "id", F.col("ts_s").cast("timestamp").alias("ts"))
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=4)
    build_payload_index(spark, root, "c", "ts", n_val_buckets=8,
                        index_type="range")
    flt = Filter(must=[DatetimeRange("ts", gte="2024-03-10 00:00:00",
                                     lt="2024-03-20 00:00:00")])
    ids, residual = filter_match_ids(spark, root, "c", flt)
    assert ids is not None and residual == Filter()
    want = df.filter("ts >= TIMESTAMP '2024-03-10 00:00:00' AND "
                     "ts < TIMESTAMP '2024-03-20 00:00:00'").count()
    assert count_points(spark, root, "c", flt=flt,
                        use_payload_index="always") == want
    assert ids.count() == want


def test_range_index_refresh_absorbs_mutations(spark, tmp_path):
    from bob_vector_db_spark.operators.filters import (
        Filter, Range, filter_match_ids)

    root, df = _mk_scored(spark, tmp_path)
    build_payload_index(spark, root, "c", "score", n_val_buckets=8,
                        index_type="range")
    # move id 0 into the band, add an OUT-OF-TRAINED-RANGE value (clamps
    # into the edge bucket), delete an in-band id
    upsert.update_columns(spark, root, "c", spark.createDataFrame(
        [(0, 15.0)], "id long, score double"))
    upsert.upsert(spark, root, "c", spark.createDataFrame(
        [(500, 999.0, 2), (501, 12.5, 1)],
        "id long, score double, n int"))
    in_band = [int(r["id"]) for r in df.filter(
        "score >= 10.0 AND score < 30.0 AND id > 0").limit(1).collect()]
    upsert.delete_points(spark, root, "c", in_band)
    refresh_payload_index(spark, root, "c", "score")
    flt = Filter(must=[Range("score", gte=10.0, lt=30.0)])
    ids, _ = filter_match_ids(spark, root, "c", flt)
    got = {r["id"] for r in ids.collect()}
    live = upsert.read_collection(spark, root, "c")
    want = {str(r["id"]) for r in
            live.filter("score >= 10.0 AND score < 30.0").collect()}
    assert got == want and "0" in got and "501" in got
    assert str(in_band[0]) not in got
    # the clamped out-of-range value answers an open upper range
    hi, _ = filter_match_ids(
        spark, root, "c", Filter(must=[Range("score", gte=100.0)]))
    assert {r["id"] for r in hi.collect()} == {"500"}


def test_range_index_rejects_non_numeric(spark, tmp_path):
    root, _ = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="numeric or timestamp"):
        build_payload_index(spark, root, "c", "category",
                            index_type="range")


# ---------------------------------------------------------------------------
# Element-level NESTED index (round 8) — NestedCondition resolves from
# postings keyed (id, elem_idx, field, val), intersected on the SAME element.
# ---------------------------------------------------------------------------

def _mk_nested(spark, tmp_path, n=60):
    root = str(tmp_path / "store")
    rows = [(i,
             [{"kind": "src", "num": i % 5},
              {"kind": "len", "num": i % 7}],
             f"g{i % 2}")
            for i in range(n)]
    df = spark.createDataFrame(
        rows, "id long, props array<struct<kind:string,num:bigint>>, "
              "grp string")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=4)
    return root, df


def test_nested_index_same_element_semantics(spark, tmp_path):
    from bob_vector_db_spark.operators.filters import (
        Filter, MatchValue, NestedCondition, Range, filter_match_ids)
    from bob_vector_db_spark.operators.payload_index import nested_match_ids
    from bob_vector_db_spark.plans.inspect import formatted_plan

    root, df = _mk_nested(spark, tmp_path)
    build_payload_index(spark, root, "c", "props", n_val_buckets=8,
                        index_type="nested", fields=["kind", "num"])
    # kind='src' AND num=3 must hold on the SAME element: only ids with
    # i % 5 == 3 — the cross-element pair (kind='src', num from the 'len'
    # element) must NOT leak through
    got = nested_match_ids(spark, root, "c", "props",
                           [("kind", ("src",)), ("num", (3,))])
    want = {str(i) for i in range(60) if i % 5 == 3}
    assert {r["id"] for r in got.collect()} == want
    # the probe opens only posting buckets, never collection data files
    plan = formatted_plan(got)
    assert "postings" in plan and "id_bucket" not in plan
    assert_partition_filters(got, "val_bucket")
    # the DSL routes through it, the residual keeps the rest, and the
    # result equals the pushed-scan path
    flt = Filter(must=[NestedCondition("props", Filter(
        must=[MatchValue("kind", "src"), MatchValue("num", 3)])),
        MatchValue("grp", "g1")])
    ids, residual = filter_match_ids(spark, root, "c", flt)
    assert ids is not None
    assert len(residual.must) == 1 and residual.must[0].key == "grp"
    from bob_vector_db_spark.operators.query_api import count_points
    n_idx = count_points(spark, root, "c", flt=flt,
                         use_payload_index="always")
    n_scan = count_points(spark, root, "c", flt=flt,
                          use_payload_index=False)
    assert n_idx == n_scan == len([i for i in range(60)
                                   if i % 5 == 3 and i % 2 == 1])
    # a NestedCondition the postings can't answer (Range inside) stays
    # residual — per-LEAF resolution, not per-key
    mixed = Filter(must=[
        NestedCondition("props", Filter(must=[MatchValue("kind", "src"),
                                              Range("num", gte=3)]))])
    ids2, residual2 = filter_match_ids(spark, root, "c", mixed)
    assert ids2 is None and residual2 == mixed


def test_nested_index_refresh_and_kind_guards(spark, tmp_path):
    import pytest as _pytest
    from bob_vector_db_spark.operators.filters import (
        Filter, MatchValue, NestedCondition, filter_match_ids)

    root, df = _mk_nested(spark, tmp_path)
    build_payload_index(spark, root, "c", "props", n_val_buckets=8,
                        index_type="nested", fields=["kind", "num"])
    # equality probe over the nested layout is refused loudly
    with _pytest.raises(ValueError, match="nested"):
        payload_match_ids(spark, root, "c", "props", ["x"])
    # mutate: id 0 gains a matching element, id 3 (i%5==3) is deleted,
    # id 100 arrives matching
    upsert.update_columns(spark, root, "c", spark.createDataFrame(
        [(0, [{"kind": "src", "num": 3}])],
        "id long, props array<struct<kind:string,num:bigint>>"))
    upsert.upsert(spark, root, "c", spark.createDataFrame(
        [(100, [{"kind": "src", "num": 3}], "g0")],
        "id long, props array<struct<kind:string,num:bigint>>, "
        "grp string"))
    upsert.delete_points(spark, root, "c", [3])
    refresh_payload_index(spark, root, "c", "props")
    flt = Filter(must=[NestedCondition("props", Filter(
        must=[MatchValue("kind", "src"), MatchValue("num", 3)]))])
    ids, _ = filter_match_ids(spark, root, "c", flt)
    got = {r["id"] for r in ids.collect()}
    want = ({str(i) for i in range(60) if i % 5 == 3} - {"3"}) \
        | {"0", "100"}
    assert got == want
    # an unindexed inner field keeps the leaf residual
    other = Filter(must=[NestedCondition("props", Filter(
        must=[MatchValue("missing", 1)]))])
    ids2, res2 = filter_match_ids(spark, root, "c", other)
    assert ids2 is None and res2 == other


def test_text_index_routes_match_text(spark, tmp_path):
    """Qdrant full-text payload index (word tokenizer + lowercase):
    token postings bucket by token hash; a MatchText must-leaf resolves
    to candidate ids by intersecting per-token id sets over ONLY the
    query tokens' buckets — same answers as the pushed-scan predicate,
    through churn, with whole-value equality refused (token postings
    would silently change its meaning)."""
    from bob_vector_db_spark.operators import query_api
    from bob_vector_db_spark.operators.filters import (
        Filter, MatchText, MatchValue, filter_match_ids)
    from bob_vector_db_spark.operators.payload_index import (
        refresh_payload_index, text_match_ids)

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, f"alpha tok{i % 7} Beta{'  gamma' if i % 3 == 0 else ''} "
             f"word{i % 5}") for i in range(90)],
        "id long, body string")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=4)
    build_payload_index(spark, root, "c", "body", n_val_buckets=16,
                        index_type="text")
    flt = Filter(must=[MatchText("body", "Alpha gamma")])
    ids, residual = filter_match_ids(spark, root, "c", flt)
    assert ids is not None and residual == Filter()
    want = {str(r["id"]) for r in df.filter(flt.to_column()).collect()}
    assert {r["id"] for r in ids.collect()} == want and want
    # the probe prunes token buckets
    probe = text_match_ids(spark, root, "c", "body", "alpha gamma")
    assert_partition_filters(probe, "val_bucket")
    # count via index == count via scan
    n_idx = query_api.count_points(spark, root, "c", flt=flt,
                                   use_payload_index="always")
    n_scan = query_api.count_points(spark, root, "c", flt=flt,
                                    use_payload_index=False)
    assert n_idx == n_scan == len(want)
    # churn: rewrite one matching doc to drop 'gamma', add a new match
    patch = spark.createDataFrame(
        [(0, "alpha nothing"), (200, "ALPHA gamma too")],
        "id long, body string")
    upsert.upsert(spark, root, "c", patch)
    refresh_payload_index(spark, root, "c", "body")
    flt2 = Filter(must=[MatchText("body", "alpha gamma")])
    got2 = {r["id"] for r in
            filter_match_ids(spark, root, "c", flt2)[0].collect()}
    want2 = (want - {"0"}) | {"200"}
    assert got2 == want2
    # whole-value equality never routes through token postings
    ids3, residual3 = filter_match_ids(
        spark, root, "c", Filter(must=[MatchValue("body", "alpha")]))
    assert ids3 is None and residual3 == Filter(
        must=[MatchValue("body", "alpha")])
    with pytest.raises(ValueError, match="TOKEN postings"):
        payload_match_ids(spark, root, "c", "body", ["alpha"])


def test_geo_index_routes_geo_leaves(spark, tmp_path):
    """Qdrant geo payload index: quantized lat/lon cell postings; a geo
    must-leaf resolves to a conservative candidate SUPERSET from the
    covering cells (only those cells' buckets read) while the leaf
    STAYS residual — so counts/search stay exactly equal to the pushed
    scan, through churn; a near-global box declines (no pruning to be
    had) and equality probes are refused."""
    from bob_vector_db_spark.operators import query_api
    from bob_vector_db_spark.operators.filters import (
        Filter, GeoBoundingBox, GeoRadius, filter_match_ids)
    from bob_vector_db_spark.operators.payload_index import (
        geo_match_ids, refresh_payload_index)

    root = str(tmp_path / "store")
    pts = [(i, 40.0 + (i % 50) * 0.4, -10.0 + (i * 7 % 80) * 0.5)
           for i in range(200)]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=4)
    build_payload_index(spark, root, "c", "lat", index_type="geo",
                        lon_column="lon", cell_deg=2.0, n_val_buckets=16)
    box = GeoBoundingBox("lat", "lon", top=50.0, left=0.0,
                         bottom=45.0, right=10.0)
    flt = Filter(must=[box])
    ids, residual = filter_match_ids(spark, root, "c", flt)
    assert ids is not None
    assert residual == flt, "geo leaf must STAY residual (superset cover)"
    want = {str(r["id"]) for r in df.filter(flt.to_column()).collect()}
    got = {r["id"] for r in ids.collect()}
    assert want and want <= got, "candidates must cover every true match"
    n_idx = query_api.count_points(spark, root, "c", flt=flt,
                                   use_payload_index="always")
    n_scan = query_api.count_points(spark, root, "c", flt=flt,
                                    use_payload_index=False)
    assert n_idx == n_scan == len(want)
    # the probe prunes cell buckets
    probe = geo_match_ids(spark, root, "c", "lat",
                          (50.0, 0.0, 45.0, 10.0))
    assert_partition_filters(probe, "val_bucket")
    # GeoRadius routes too (its bbox covers the disc)
    rad = Filter(must=[GeoRadius("lat", "lon", 47.0, 5.0, 300_000.0)])
    n_r = query_api.count_points(spark, root, "c", flt=rad,
                                 use_payload_index="always")
    assert n_r == query_api.count_points(spark, root, "c", flt=rad,
                                         use_payload_index=False) > 0
    # a near-global box finds no pruning and declines candidate routing
    assert geo_match_ids(spark, root, "c", "lat",
                         (90.0, -180.0, -90.0, 180.0),
                         max_cells=64) is None
    # churn: move one point into the box, delete one out of it
    inside = sorted(int(i) for i in want)[0]
    upsert.upsert(spark, root, "c", spark.createDataFrame(
        [(500, 47.0, 5.0)], "id long, lat double, lon double"))
    upsert.delete_points(spark, root, "c", [inside])
    refresh_payload_index(spark, root, "c", "lat")
    n2 = query_api.count_points(spark, root, "c", flt=flt,
                                use_payload_index="always")
    assert n2 == len(want)  # -1 deleted, +1 new inside
    with pytest.raises(ValueError, match="grid-CELL"):
        payload_match_ids(spark, root, "c", "lat", [47.0])


def test_facet_falls_back_to_scan_on_text_and_geo_indexes(spark, tmp_path):
    """r8 advice: facet_from_index over a TEXT index would aggregate
    TOKEN postings and over a GEO index grid-cell strings (cast to the
    column type → NULL) — both must return None so facet_values answers
    from the collection scan with the true (value, count) pairs."""
    from bob_vector_db_spark.operators import query_api
    from bob_vector_db_spark.operators.payload_index import facet_from_index

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, ["alpha beta", "beta gamma", "alpha beta"][i % 3],
          float(i % 2), float(i % 3)) for i in range(30)],
        "id long, body string, lat double, lon double")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=2)
    build_payload_index(spark, root, "c", "body", n_val_buckets=8,
                        index_type="text")
    build_payload_index(spark, root, "c", "lat", index_type="geo",
                        lon_column="lon", cell_deg=1.0, n_val_buckets=8)
    assert facet_from_index(spark, root, "c", "body") is None
    assert facet_from_index(spark, root, "c", "lat") is None
    got = {r["value"]: r["count"] for r in query_api.facet_values(
        spark, root, "c", "body").collect()}
    assert got == {"alpha beta": 20, "beta gamma": 10}
    got_lat = {r["value"]: r["count"] for r in query_api.facet_values(
        spark, root, "c", "lat").collect()}
    assert got_lat == {0.0: 15, 1.0: 15}


def test_text_index_agrees_with_scan_on_exotic_whitespace(spark, tmp_path):
    """r8 advice: the index tokenizes with \\s+ (which spans vertical-tab
    and form-feed) while MatchText's scan form normalized only
    tab/LF/CR — a value like 'alpha\\x0bgamma' used to match on the scan
    ('alpha\\x0bgamma' contains no token boundary there → no match ...)
    but tokenize as two tokens in the index.  Both sides now treat the
    full Java \\s class as delimiters, so indexed == scan."""
    from bob_vector_db_spark.operators import query_api
    from bob_vector_db_spark.operators.filters import Filter, MatchText

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(0, "alpha\x0bgamma beta"), (1, "alpha\fgamma"),
         (2, "alpha gamma"), (3, "alphagamma"), (4, "alpha\tbeta"),
         (5, "gamma\x0b\falpha")],
        "id long, body string")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=2)
    build_payload_index(spark, root, "c", "body", n_val_buckets=8,
                        index_type="text")
    for text in ("alpha gamma", "alpha", "gamma beta"):
        flt = Filter(must=[MatchText("body", text)])
        n_idx = query_api.count_points(spark, root, "c", flt=flt,
                                       use_payload_index="always")
        n_scan = query_api.count_points(spark, root, "c", flt=flt,
                                        use_payload_index=False)
        assert n_idx == n_scan, (text, n_idx, n_scan)
    # and the 'alpha gamma' case really does include the \x0b / \f docs
    flt = Filter(must=[MatchText("body", "alpha gamma")])
    assert query_api.count_points(spark, root, "c", flt=flt,
                                  use_payload_index=False) == 4


def test_text_index_tokenizer_param_matrix(spark, tmp_path):
    """Qdrant TextIndexParams honored by build, refresh AND probe:
    tokenizer word|whitespace|prefix, lowercase toggle, min/max token
    length.  For every routable config, indexed answers == scan answers
    (count via 'always' == count via False); configs the scan form
    cannot mirror (case-sensitive index, out-of-band tokens) refuse to
    route instead of answering differently."""
    from bob_vector_db_spark.operators import query_api
    from bob_vector_db_spark.operators.filters import (
        Filter, MatchText, MatchTextPrefix, filter_match_ids)

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(0, "Alpha-beta GAMMA!"), (1, "alphabet soup"),
         (2, "say alpha, then beta"), (3, "beta alpha"),
         (4, None), (5, "ab cd alpha"), (6, "verylongtokenindeed beta")],
        "id long, body string")

    def mk(name, **params):
        upsert.create_collection(spark, root, name, df=df, id_col="id",
                                 n_buckets=2)
        build_payload_index(spark, root, name, "body", n_val_buckets=8,
                            index_type="text", **params)

    # -- word tokenizer: punctuation delimits on both paths
    mk("w", tokenizer="word")
    flt = Filter(must=[MatchText("body", "alpha beta", tokenizer="word")])
    ids, residual = filter_match_ids(spark, root, "w", flt)
    assert ids is not None and residual == Filter()
    n_idx = query_api.count_points(spark, root, "w", flt=flt,
                                   use_payload_index="always")
    n_scan = query_api.count_points(spark, root, "w", flt=flt,
                                    use_payload_index=False)
    assert n_idx == n_scan == 3  # ids 0, 2, 3
    # a WHITESPACE-tokenized leaf must NOT route through the word index
    ws_leaf = Filter(must=[MatchText("body", "alpha beta")])
    ids2, res2 = filter_match_ids(spark, root, "w", ws_leaf)
    assert ids2 is None and res2 == ws_leaf
    assert query_api.count_points(spark, root, "w", flt=ws_leaf,
                                  use_payload_index="auto") == \
        query_api.count_points(spark, root, "w", flt=ws_leaf,
                               use_payload_index=False) == 1  # id 3

    # -- length band: in-band tokens route, out-of-band fall back
    mk("b", min_token_len=3, max_token_len=10)
    inband = Filter(must=[MatchText("body", "alpha")])
    ids3, res3 = filter_match_ids(spark, root, "b", inband)
    assert ids3 is not None and res3 == Filter()
    assert query_api.count_points(spark, root, "b", flt=inband,
                                  use_payload_index="always") == \
        query_api.count_points(spark, root, "b", flt=inband,
                               use_payload_index=False)
    for text in ("ab", "verylongtokenindeed", "alpha ab"):
        f = Filter(must=[MatchText("body", text)])
        got, res = filter_match_ids(spark, root, "b", f)
        assert got is None and res == f, text
        assert query_api.count_points(spark, root, "b", flt=f,
                                      use_payload_index="auto") == \
            query_api.count_points(spark, root, "b", flt=f,
                                   use_payload_index=False)

    # -- case-sensitive index never routes the (lowercasing) scan leaf,
    #    but the build honors the toggle: 'GAMMA' posts verbatim
    mk("c", lowercase=False)
    f = Filter(must=[MatchText("body", "alpha")])
    got, res = filter_match_ids(spark, root, "c", f)
    assert got is None and res == f
    from bob_vector_db_spark.operators.payload_index import (
        _pruned_token_postings, payload_index_meta)
    imeta = payload_index_meta(root, "c", "body")
    assert imeta["lowercase"] is False
    post = _pruned_token_postings(spark, root, "c", "body", imeta,
                                  ["GAMMA!", "gamma"])
    vals = {r["val"] for r in post.collect()}
    assert vals == {"GAMMA!"}

    # -- prefix tokenizer answers MatchTextPrefix (search-as-you-type)
    mk("p", tokenizer="prefix")
    pf = Filter(must=[MatchTextPrefix("body", "alp")])
    ids4, res4 = filter_match_ids(spark, root, "p", pf)
    assert ids4 is not None and res4 == Filter()
    n_idx = query_api.count_points(spark, root, "p", flt=pf,
                                   use_payload_index="always")
    n_scan = query_api.count_points(spark, root, "p", flt=pf,
                                    use_payload_index=False)
    assert n_idx == n_scan == 5  # 0, 1, 2 'alpha,', 3, 5
    # whole-token MatchText never routes through prefix postings
    f = Filter(must=[MatchText("body", "alpha")])
    got, res = filter_match_ids(spark, root, "p", f)
    assert got is None and res == f
    # beyond the stored prefix cap (default 20) falls back to the scan
    longleaf = Filter(must=[MatchTextPrefix("body", "x" * 25)])
    got, res = filter_match_ids(spark, root, "p", longleaf)
    assert got is None and res == longleaf

    # -- params survive refresh: delta rows tokenize the same way
    upsert.upsert(spark, root, "p", spark.createDataFrame(
        [(100, "ALPINE start")], "id long, body string"))
    refresh_payload_index(spark, root, "p", "body")
    n_idx = query_api.count_points(spark, root, "p", flt=pf,
                                   use_payload_index="always")
    n_scan = query_api.count_points(spark, root, "p", flt=pf,
                                    use_payload_index=False)
    assert n_idx == n_scan == 6


def test_phrase_index_routes_match_phrase(spark, tmp_path):
    """MatchPhrase resolves EXACTLY through positional postings
    (phrase_matching=True): shifted-position intersection over only the
    phrase tokens' buckets, leaf dropped from the residual, same answers
    as the scan through churn; an index without positions keeps the
    leaf residual."""
    from bob_vector_db_spark.operators import query_api
    from bob_vector_db_spark.operators.filters import (
        Filter, MatchPhrase, filter_match_ids)
    from bob_vector_db_spark.operators.payload_index import (
        phrase_match_ids)

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, ["hello world again", "world hello", "say hello  world now",
              "hello around the world", "world\thello world"][i % 5])
         for i in range(50)],
        "id long, body string")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=4)
    build_payload_index(spark, root, "c", "body", n_val_buckets=16,
                        index_type="text", phrase_matching=True)
    flt = Filter(must=[MatchPhrase("body", "hello world")])
    ids, residual = filter_match_ids(spark, root, "c", flt)
    assert ids is not None and residual == Filter(), \
        "positions make the phrase answer exact — the leaf must drop"
    want = {str(r["id"]) for r in df.filter(flt.to_column()).collect()}
    assert {r["id"] for r in ids.collect()} == want and want
    # the probe reads only the phrase tokens' buckets
    probe = phrase_match_ids(spark, root, "c", "body", "hello world")
    assert_partition_filters(probe, "val_bucket")
    # count/search parity
    n_idx = query_api.count_points(spark, root, "c", flt=flt,
                                   use_payload_index="always")
    n_scan = query_api.count_points(spark, root, "c", flt=flt,
                                    use_payload_index=False)
    assert n_idx == n_scan == len(want)
    # repeated-token phrase and order-sensitivity
    f2 = Filter(must=[MatchPhrase("body", "world hello world")])
    got2 = {r["id"] for r in filter_match_ids(spark, root, "c", f2)[0]
            .collect()}
    want2 = {str(r["id"]) for r in df.filter(f2.to_column()).collect()}
    assert got2 == want2 and want2  # only the 'world hello world' rows
    # churn: rewrite a matching doc, add a new match, delete one
    upsert.upsert(spark, root, "c", spark.createDataFrame(
        [(0, "nothing here"), (500, "HELLO  world wide")],
        "id long, body string"))
    upsert.delete_points(spark, root, "c", [5])
    refresh_payload_index(spark, root, "c", "body")
    got3 = {r["id"] for r in filter_match_ids(spark, root, "c", flt)[0]
            .collect()}
    want3 = (want - {"0", "5"}) | {"500"}
    assert got3 == want3
    # an index WITHOUT positions keeps the phrase leaf residual
    root2 = str(tmp_path / "store2")
    upsert.create_collection(spark, root2, "c", df=df, id_col="id",
                             n_buckets=4)
    build_payload_index(spark, root2, "c", "body", n_val_buckets=16,
                        index_type="text")
    got, res = filter_match_ids(spark, root2, "c", flt)
    assert got is None and res == flt
    with pytest.raises(ValueError, match="positional"):
        phrase_match_ids(spark, root2, "c", "body", "hello world")


def test_scroll_order_by_opens_from_range_index(spark, tmp_path):
    """Keyset-over-index (r9, VERDICT r8 next #6): an order_by scroll
    over a range-indexed column opens each page from the value-ordered
    postings — the cursor's bucket window, not a full sort — and the
    paged walk is IDENTICAL to the scan walk, including around NULL
    order values (which only the scan can see: the index path declines
    and falls back exactly there)."""
    from pyspark.sql import functions as F2
    from bob_vector_db_spark.operators import query_api
    from bob_vector_db_spark.operators.payload_index import (
        _range_window_frame, index_path, range_ordered_page)

    root = str(tmp_path / "store")
    rows = [(i, None if i % 11 == 10 else float((i * 37) % 100))
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, v double")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=4)
    build_payload_index(spark, root, "c", "v", n_val_buckets=8,
                        index_type="range")

    def walk(use_idx, start_from=None, descending=False):
        seen, cursor = [], None
        for _ in range(100):
            page, cursor = query_api.scroll_points(
                spark, root, "c", limit=7, order_by="v", cursor=cursor,
                start_from=start_from, descending=descending,
                return_cursor=True, use_payload_index=use_idx)
            seen.extend((r["v"], r["id"]) for r in page.collect())
            if cursor is None:
                break
        return seen

    for kwargs in ({"start_from": 30.0},
                   {"start_from": 55.0, "descending": True}):
        got = walk("auto", **kwargs)
        want = walk(False, **kwargs)
        assert got == want and got, kwargs

    # the page probe itself: ids come from the index, and the window
    # frame prunes val_bucket partitions
    ids = range_ordered_page(spark, root, "c", "v", 7,
                             start_from=30.0, id_type="long")
    assert ids is not None and ids.count() == 7
    direct = {r["id"] for r in ids.collect()}
    want_ids = {str(r["id"]) for r in
                df.filter("v >= 30.0").orderBy(F2.asc("v"), F2.asc("id"))
                .limit(7).collect()}
    assert direct == want_ids
    ipath = index_path(root, "c", "v__payload")
    import os
    frame = _range_window_frame(spark, ipath,
                                os.path.join(ipath, "postings"),
                                [0, 1], F2.lit(True))
    assert_partition_filters(frame, "val_bucket")
    # a cursor with a NULL value leg declines (the scan pages the run)
    assert range_ordered_page(spark, root, "c", "v", 7,
                              cursor=(None, 3), id_type="long") is None
    # staleness declines too
    upsert.delete_points(spark, root, "c", [0])
    assert range_ordered_page(spark, root, "c", "v", 7,
                              start_from=30.0, id_type="long") is None
    refresh_payload_index(spark, root, "c", "v")
    got = walk("auto", start_from=30.0)
    want = walk(False, start_from=30.0)
    assert got == want


def test_phrase_index_chr1_delimiter_parity(spark, tmp_path):
    """r9 review finding: chr(1) is MatchPhrase's run-collapse marker, so
    the scan form normalizes it to a delimiter — the index build and
    probe must tokenize identically or a chr(1)-bearing value silently
    diverges between the routed and scan paths.  chr(1) now delimits on
    EVERY path (MatchText included)."""
    from bob_vector_db_spark.operators import query_api
    from bob_vector_db_spark.operators.filters import (
        Filter, MatchPhrase, MatchText, filter_match_ids)

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(0, "data\x01table end"), (1, "data table"), (2, "datatable"),
         (3, "table\x01data"), (4, "data \x01 table")],
        "id long, body string")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=2)
    build_payload_index(spark, root, "c", "body", n_val_buckets=8,
                        index_type="text", phrase_matching=True)
    for leaf in (MatchPhrase("body", "data table"),
                 MatchText("body", "data table"),
                 MatchText("body", "table data")):
        flt = Filter(must=[leaf])
        ids, residual = filter_match_ids(spark, root, "c", flt)
        assert ids is not None and residual == Filter(), leaf
        got = {r["id"] for r in ids.collect()}
        want = {str(r["id"]) for r in df.filter(flt.to_column()).collect()}
        assert got == want, (leaf, got, want)
        n_scan = query_api.count_points(spark, root, "c", flt=flt,
                                        use_payload_index=False)
        assert len(want) == n_scan
    # the phrase really does match through the chr(1) boundary
    flt = Filter(must=[MatchPhrase("body", "data table")])
    assert {r["id"] for r in df.filter(flt.to_column()).collect()} \
        == {"0", "1", "4"} or \
        {r["id"] for r in df.filter(flt.to_column()).collect()} \
        == {0, 1, 4}


def test_build_rejects_nonpositive_token_lengths(spark, tmp_path):
    """r9 review finding: min_token_len=0 on a prefix index posted junk
    '' prefixes no probe could ever read."""
    root = str(tmp_path / "store")
    df = spark.createDataFrame([(0, "alpha")], "id long, body string")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=2)
    for bad in ({"min_token_len": 0}, {"max_token_len": -1},
                {"min_token_len": 5, "max_token_len": 2}):
        with pytest.raises(ValueError):
            build_payload_index(spark, root, "c", "body",
                                index_type="text", tokenizer="prefix",
                                **bad)


def test_filtered_scroll_composes_with_range_index(spark, tmp_path):
    """FILTERED ordered scroll through BOTH indexes (r9): the filter's
    candidate ids (keyword index, empty residual) semi-join inside the
    range index's bucket window — paged walk identical to the scan walk;
    a residual-bearing filter falls back to the scan."""
    from bob_vector_db_spark.operators import query_api
    from bob_vector_db_spark.operators.filters import (
        Filter, MatchPhrase, MatchValue)
    from bob_vector_db_spark.operators.payload_index import (
        range_ordered_page)

    root = str(tmp_path / "store")
    rows = [(i, f"g{i % 3}", float((i * 37) % 100), f"w{i % 7} body")
            for i in range(90)]
    df = spark.createDataFrame(rows, "id long, grp string, v double, "
                               "txt string")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=4)
    build_payload_index(spark, root, "c", "grp", n_val_buckets=8)
    build_payload_index(spark, root, "c", "v", n_val_buckets=8,
                        index_type="range")
    flt = Filter(must=[MatchValue("grp", "g1")])

    def walk(use_idx):
        seen, cursor = [], None
        for _ in range(40):
            page, cursor = query_api.scroll_points(
                spark, root, "c", flt=flt, limit=5, order_by="v",
                start_from=20.0, cursor=cursor, return_cursor=True,
                use_payload_index=use_idx)
            seen.extend((r["v"], r["id"]) for r in page.collect())
            if cursor is None:
                break
        return seen

    got = walk("auto")
    want = walk(False)
    assert got == want and got
    # the composed probe answers directly
    from bob_vector_db_spark.operators.filters import filter_match_ids
    cand, residual = filter_match_ids(spark, root, "c", flt)
    assert residual == Filter()
    ids = range_ordered_page(spark, root, "c", "v", 5, start_from=20.0,
                             id_type="long", candidate_ids=cand)
    assert ids is not None
    want_ids = {str(r["id"]) for r in
                df.filter("grp = 'g1' AND v >= 20.0")
                .orderBy("v", "id").limit(5).collect()}
    assert {r["id"] for r in ids.collect()} == want_ids
    # a filter with a residual leaf (un-indexed phrase) scans — and the
    # walk still agrees
    flt2 = Filter(must=[MatchValue("grp", "g1"),
                        MatchPhrase("txt", "w1 body")])

    def walk2(use_idx):
        page = query_api.scroll_points(
            spark, root, "c", flt=flt2, limit=50, order_by="v",
            start_from=0.0, use_payload_index=use_idx)
        return [(r["v"], r["id"]) for r in page.collect()]

    assert walk2("auto") == walk2(False)


def test_range_index_fractional_bounds_on_int_column(spark, tmp_path):
    """ADVICE r10: fractional literals over an INTEGER-typed indexed
    column must not truncate through the stored-type cast.  The routed
    probe and the keyset page now compare in PROMOTED double exactly
    like the scan — ``CAST(36.5 AS BIGINT) = 36`` used to include the
    val=36 boundary rows the scan's ``36.5e0`` comparison excludes."""
    from bob_vector_db_spark.operators import query_api
    from bob_vector_db_spark.operators.filters import (
        Filter, MatchValue, Range, filter_match_ids)
    from bob_vector_db_spark.operators.payload_index import (
        range_ordered_page)

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, int((i * 37) % 100)) for i in range(80)], "id long, n long")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=4)
    build_payload_index(spark, root, "c", "n", n_val_buckets=8,
                        index_type="range")
    # routed Range leaves with fractional bounds == scan (val=36 exists)
    for flt in (Filter(must=[Range("n", gte=36.5)]),
                Filter(must=[Range("n", lte=36.5)]),
                Filter(must=[Range("n", gt=10.5, lt=36.5)])):
        ids, residual = filter_match_ids(spark, root, "c", flt)
        assert ids is not None and residual == Filter(), flt
        got = {r["id"] for r in ids.collect()}
        want = {str(r["id"]) for r in df.filter(flt.to_column()).collect()}
        assert got == want and want, flt
    # fractional EQUALITY matches nothing on either path
    ids_eq, res_eq = filter_match_ids(
        spark, root, "c", Filter(must=[MatchValue("n", 36.5)]))
    assert ids_eq is not None and res_eq == Filter()
    assert ids_eq.count() == 0
    # keyset scroll with a fractional start_from: index walk == scan walk
    # (ascending exposes the old val>=36 inclusion; descending exposes
    # the truncated bisect pivot)

    def walk(use_idx, **kw):
        seen, cursor = [], None
        for _ in range(40):
            page, cursor = query_api.scroll_points(
                spark, root, "c", limit=7, order_by="n", cursor=cursor,
                return_cursor=True, use_payload_index=use_idx, **kw)
            seen.extend((r["n"], r["id"]) for r in page.collect())
            if cursor is None:
                break
        return seen

    for kwargs in ({"start_from": 36.5},
                   {"start_from": 36.5, "descending": True}):
        got = walk("auto", **kwargs)
        want = walk(False, **kwargs)
        assert got == want and got, kwargs
    # a hand-built fractional CURSOR leg takes the same promoted path
    ids = range_ordered_page(spark, root, "c", "n", 7,
                             cursor=(36.5, 5), id_type="long")
    assert ids is not None
    want_ids = {str(r["id"]) for r in
                df.filter("n > 36.5").orderBy("n", "id").limit(7)
                .collect()}
    assert {r["id"] for r in ids.collect()} == want_ids


def test_keyset_route_respects_max_candidates(spark, tmp_path,
                                              monkeypatch):
    """ADVICE r10: a filter resolving to more than ``max_candidates``
    ids skips the keyset-over-index route (where the huge id set would
    semi-join into every widening round) and settles on the
    pushed-predicate scan — same page, scan plan."""
    from bob_vector_db_spark.operators import payload_index, query_api
    from bob_vector_db_spark.operators.filters import Filter, MatchValue

    root = str(tmp_path / "store")
    rows = [(i, f"g{i % 3}", float((i * 37) % 100)) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=4)
    build_payload_index(spark, root, "c", "grp", n_val_buckets=8)
    build_payload_index(spark, root, "c", "v", n_val_buckets=8,
                        index_type="range")
    flt = Filter(must=[MatchValue("grp", "g1")])  # 30 of 90 rows

    calls = []
    real = payload_index.range_ordered_page

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(payload_index, "range_ordered_page", spy)
    page = query_api.scroll_points(spark, root, "c", flt=flt, limit=5,
                                   order_by="v", start_from=20.0)
    assert calls  # selective filter: routed through the index
    want = [(r["v"], r["id"]) for r in page.collect()]
    calls.clear()
    page2 = query_api.scroll_points(spark, root, "c", flt=flt, limit=5,
                                    order_by="v", start_from=20.0,
                                    max_candidates=10)
    assert not calls  # guard declined the keyset route
    assert [(r["v"], r["id"]) for r in page2.collect()] == want and want


def test_text_index_stopwords_and_stemmer(spark, tmp_path):
    """Round 10 (VERDICT r9 missing #2): TextIndexParams stopwords +
    stemmer.  Param matrix: routed answers == scan answers for every
    combo over a corpus with plurals, stopword runs, tabs and marker
    characters; refresh posts deltas through the same pipeline;
    mismatched leaf params stay residual; invalid combos are refused;
    an older text_format meta is refused by probe AND router."""
    import json
    import os

    from bob_vector_db_spark.operators.filters import (
        Filter, MatchPhrase, MatchText, MatchTextPrefix, filter_match_ids)
    from bob_vector_db_spark.operators.payload_index import (
        index_path, payload_index_meta, text_match_ids)

    rows = [
        (0, "The movies are showing tonight"),
        (1, "a movie is showing"),
        (2, "cities and towns"), (3, "city of lights"),
        (4, "these classes pass quickly"), (5, "this classe is for us"),
        (6, "united states of america"),
        (7, "united  states\tin  america"),
        (8, "the united, states. of! america"),
        (9, "status quo statuses"),
        (10, "mislead \x01tokens\x02 here"), (11, "s s s is was"),
    ]
    df = spark.createDataFrame(rows, "id long, body string")

    def parity(root, leaf, expect_route=True):
        flt = Filter(must=[leaf])
        ids, residual = filter_match_ids(spark, root, "c", flt)
        if not expect_route:
            assert ids is None or residual != Filter(), leaf
            return
        assert ids is not None and residual == Filter(), leaf
        got = sorted(r["id"] for r in ids.collect())
        want = sorted(str(r["id"])
                      for r in df.filter(flt.to_column()).collect())
        assert got == want, (leaf, got, want)

    # whitespace + stopwords + stemmer + positional
    root = str(tmp_path / "s1")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=2)
    build_payload_index(spark, root, "c", "body", n_val_buckets=8,
                        index_type="text", phrase_matching=True,
                        stopwords="english", stemmer="english")
    imeta = payload_index_meta(root, "c", "body")
    assert imeta["stemmer"] == "english" and "the" in imeta["stopwords"]
    both = {"stopwords": "english", "stemmer": "english"}
    parity(root, MatchText("body", "movies showing", **both))
    parity(root, MatchText("body", "the city", **both))
    parity(root, MatchText("body", "status", **both))
    parity(root, MatchText("body", "tokens here", **both))
    parity(root, MatchPhrase("body", "united states america", **both))
    parity(root, MatchPhrase("body", "the united states of america",
                             **both))
    # param mismatches stay residual (the scan settles them)
    parity(root, MatchText("body", "movies"), expect_route=False)
    parity(root, MatchText("body", "movies", stemmer="english"),
           expect_route=False)
    parity(root, MatchText("body", "movies", stopwords="english"),
           expect_route=False)
    # all-stopword query: scan says FALSE (matches nothing — Qdrant's
    # empty-token semantics), and the probe's empty id set agrees, so
    # the leaf ROUTES to an instant empty answer
    parity(root, MatchText("body", "the a is", **both))
    # refresh posts deltas through the same pipeline
    upsert.upsert(spark, root, "c", spark.createDataFrame(
        [(0, "nothing here"), (50, "many movies were showing")],
        "id long, body string"))
    refresh_payload_index(spark, root, "c", "body")
    # 'movies' stems to 'movy' (Harman ies→y), so doc 1's 'movie' does
    # NOT match — only the refreshed doc 50 carries the stem pair
    flt = Filter(must=[MatchText("body", "movies showing", **both)])
    ids, _ = filter_match_ids(spark, root, "c", flt)
    assert sorted(r["id"] for r in ids.collect()) == ["50"]
    df_r = spark.createDataFrame(
        [r for r in rows if r[0] != 0]
        + [(0, "nothing here"), (50, "many movies were showing")],
        "id long, body string")
    want = sorted(str(r["id"])
                  for r in df_r.filter(flt.to_column()).collect())
    assert want == ["50"]  # routed == scan over the mutated corpus

    # word tokenizer + custom stopword list (doc 8's punctuation strips)
    root2 = str(tmp_path / "s2")
    upsert.create_collection(spark, root2, "c", df=df, id_col="id",
                             n_buckets=2)
    build_payload_index(spark, root2, "c", "body", n_val_buckets=8,
                        index_type="text", tokenizer="word",
                        stopwords=("of", "the"), stemmer="english")
    parity(root2, MatchText("body", "the united states", tokenizer="word",
                            stopwords=("of", "the"), stemmer="english"))

    # prefix tokenizer + stopwords: stopworded tokens never post
    root3 = str(tmp_path / "s3")
    upsert.create_collection(spark, root3, "c", df=df, id_col="id",
                             n_buckets=2)
    build_payload_index(spark, root3, "c", "body", n_val_buckets=8,
                        index_type="text", tokenizer="prefix",
                        stopwords="english")
    parity(root3, MatchTextPrefix("body", "stat", stopwords="english"))
    parity(root3, MatchTextPrefix("body", "th", stopwords="english"))

    # invalid combos refused loudly
    with pytest.raises(ValueError, match="incoherent"):
        build_payload_index(spark, root3, "c", "body", index_type="text",
                            tokenizer="prefix", stemmer="english")
    with pytest.raises(ValueError, match="single token"):
        build_payload_index(spark, root3, "c", "body", index_type="text",
                            stopwords=["The"])
    with pytest.raises(ValueError, match="unknown stemmer"):
        build_payload_index(spark, root3, "c", "body", index_type="text",
                            stemmer="german")
    with pytest.raises(ValueError, match="text"):
        build_payload_index(spark, root3, "c", "other", stopwords=["x"])
    with pytest.raises(ValueError, match="unknown stemmer"):
        MatchText("body", "x", stemmer="german")
    with pytest.raises(ValueError, match="single token"):
        MatchPhrase("body", "x", stopwords=("two words",))
    with pytest.raises(ValueError, match="unknown stopword set"):
        MatchText("body", "x", stopwords="french")

    # an older text_format is refused: probe raises, router declines
    mpath = os.path.join(index_path(root3, "c", "body__payload"),
                         "meta.json")
    with open(mpath) as fh:
        m = json.load(fh)
    m["text_format"] = 1
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    with pytest.raises(ValueError, match="older text format"):
        text_match_ids(spark, root3, "c", "body", "stat", prefix=True)
    # ... and refresh refuses too (r10 review finding: it would append
    # current-format postings into the old artifact and mark it fresh)
    with pytest.raises(ValueError, match="older text format"):
        refresh_payload_index(spark, root3, "c", "body")
    ids, residual = filter_match_ids(
        spark, root3, "c",
        Filter(must=[MatchTextPrefix("body", "stat",
                                     stopwords="english")]))
    assert ids is None  # stays residual — the scan settles it


def test_stemmer_python_twin_matches_pipeline(spark):
    """The S-stemmer's three forms agree: Python (probe), the Spark
    build expression, and the compiled shared-dialect SQL — swept over
    suffix-heavy tokens including Harman's exception classes."""
    import duckdb

    from bob_vector_db_spark.functions.text import (
        stem_token_py, tokenize_text_py)
    from bob_vector_db_spark.operators.payload_index import _tokenize_expr

    words = ["cats", "cities", "movies", "classes", "classe", "passes",
             "status", "statuses", "us", "ss", "is", "was", "s", "toes",
             "trees", "aes", "eies", "aies", "babies", "dies", "goes",
             "bus", "miss", "analysis", "data", "x", "es", "ies"]
    text = " ".join(words)
    py = tokenize_text_py(text, "whitespace", True, stemmer="english")
    df = spark.createDataFrame([(text,)], "body string")
    spark_toks = df.select(_tokenize_expr(
        "body", "whitespace", True, stemmer="english").alias("t")
    ).first()["t"]
    assert py == spark_toks
    # per-token python twin
    assert [s for s in (stem_token_py(w) for w in words) if s] == py
    # the compiled SQL form agrees in DuckDB too (via a MatchText that
    # requires every stemmed token)
    from bob_vector_db_spark.operators.filters import MatchText
    leaf = MatchText("body", text, stemmer="english")
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT ? AS body", [text])
    assert con.execute(
        f"SELECT count(*) FROM t x WHERE {leaf.to_sql()}"
    ).fetchone()[0] == 1


def test_prefix_layout_posts_full_tokens(spark, tmp_path):
    """r10 growth control (VERDICT r9 next #6): the prefix index stores
    ONE row per distinct (id, token) — the same cardinality as a word
    index, ~6x fewer rows than exploding every prefix — bucketed by the
    token's first min_token_len chars; the probe still prunes
    val_bucket partitions and pushes startswith."""
    import os

    from bob_vector_db_spark.operators.filters import (
        Filter, MatchTextPrefix, filter_match_ids)
    from bob_vector_db_spark.operators.payload_index import (
        _prefix_match_ids, index_path, payload_index_meta)

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, f"alpha{i % 7} beta{i % 5} verylongtokennumber{i % 3}")
         for i in range(40)],
        "id long, body string")
    upsert.create_collection(spark, root, "c", df=df, id_col="id",
                             n_buckets=2)
    build_payload_index(spark, root, "c", "body", n_val_buckets=8,
                        index_type="text", tokenizer="prefix",
                        min_token_len=2)
    ipath = index_path(root, "c", "body__payload")
    post = spark.read.parquet(os.path.join(ipath, "postings"))
    n_tokens = (df.selectExpr(
        "explode(split(body, ' ')) AS t", "id").distinct().count())
    assert post.count() == n_tokens  # full tokens, not prefix explosion
    # parity + pruning
    flt = Filter(must=[MatchTextPrefix("body", "alpha1 verylongtoken")])
    ids, residual = filter_match_ids(spark, root, "c", flt)
    assert ids is not None and residual == Filter()
    got = sorted(r["id"] for r in ids.collect())
    want = sorted(str(r["id"]) for r in df.filter(flt.to_column()).collect())
    assert got == want and want
    imeta = payload_index_meta(root, "c", "body")
    frame = _prefix_match_ids(spark, root, "c", "body", imeta,
                              ["alpha1", "verylongtoken"])
    assert_partition_filters(frame, "val_bucket")
