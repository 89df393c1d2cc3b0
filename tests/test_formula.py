"""Formula rescoring (operators/formula.py — Qdrant FormulaQuery).

The registry queries (api_formula_boost / api_formula_decay) cover the
sum/mult/condition/field, decay-kernel, geo_distance and datetime paths
against the DuckDB oracle; this file covers the rest of the compiler
surface (div guard, pow, lin_decay, unary math, defaults, multi-branch
scores) and the dispatch/validation edges.
"""
from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from bob_vector_db_spark.operators import upsert
from bob_vector_db_spark.operators.filters import MatchValue, Range
from bob_vector_db_spark.operators.formula import (
    compile_formula,
    formula_rescore,
)
from bob_vector_db_spark.operators.query_api import query_points


def _base(tmp_path_factory) -> str:
    return os.path.join(str(tmp_path_factory.mktemp("formula")), "store")


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    """Payload-only collection: id 0..9, n = id·10, grp g0/g1, price."""
    base = _base(tmp_path_factory)
    pts = spark.range(10).select(
        F.col("id"),
        (F.col("id") * 10).cast("double").alias("n"),
        F.concat(F.lit("g"), (F.col("id") % 2).cast("string")).alias("grp"),
        (F.col("id") * 100 + 50).cast("double").alias("price"))
    upsert.create_collection(spark, base, "pts", df=pts, id_col="id",
                             n_buckets=4)
    return base


def _branch(spark, rows):
    return spark.createDataFrame(rows, "id string, score double")


def _scores(out):
    return {r["id"]: r["score"] for r in out.collect()}


class TestCompiler:
    def test_div_guard_and_default(self):
        sql, _ = compile_formula(
            {"div": {"left": 1.0, "right": 0.0, "by_zero_default": 7.0}}, 0)
        assert "CASE WHEN" in sql and "7.0" in sql
        sql2, _ = compile_formula({"div": {"left": 1.0, "right": 2.0}}, 0)
        assert "CAST(NULL AS DOUBLE)" in sql2

    def test_payload_key_collection(self):
        _, keys = compile_formula(
            {"sum": ["meta.depth", {"abs": "n"}, MatchValue("grp", "g1")]},
            0)
        assert keys == {"meta", "n", "grp"}

    def test_score_out_of_range_refused(self):
        with pytest.raises(ValueError, match=r"\$score\[2\]"):
            compile_formula("$score[2]", 2)

    def test_bare_boolean_refused(self):
        with pytest.raises(TypeError, match="filter condition"):
            compile_formula(True, 0)

    def test_unknown_op_refused(self):
        with pytest.raises(ValueError, match="unknown formula op"):
            compile_formula({"median": [1, 2]}, 0)

    def test_decay_param_validation(self):
        with pytest.raises(ValueError, match="scale must be positive"):
            compile_formula({"gauss_decay": {"x": 1.0, "scale": 0}}, 0)
        with pytest.raises(ValueError, match="midpoint"):
            compile_formula({"exp_decay": {"x": 1.0, "midpoint": 1.0}}, 0)

    def test_datetime_literal_validated(self):
        with pytest.raises(ValueError, match="datetime literal"):
            compile_formula({"datetime": "not-a-date"}, 0)


class TestRescore:
    def test_unary_math_and_pow(self, spark, store):
        # score = pow(n/10, 2) + ln(exp(1)) − log10(100) + |−price|/1000
        f = {"sum": [
            {"pow": {"base": {"div": {"left": "n", "right": 10.0}},
                     "exponent": 2.0}},
            {"ln": {"exp": 1.0}},
            {"neg": {"log10": 100.0}},
            {"div": {"left": {"abs": {"neg": "price"}}, "right": 1000.0}},
        ]}
        br = _branch(spark, [("2", 0.5), ("3", 0.4)])
        got = _scores(formula_rescore(spark, store, "pts", [br], f, k=5))
        # id 2: 4 + 1 − 2 + 0.25 = 3.25 ; id 3: 9 + 1 − 2 + 0.35 = 8.35
        assert got == {"2": 3.25, "3": 8.35}

    def test_lin_decay_clamps_at_zero(self, spark, store):
        f = {"lin_decay": {"x": "n", "target": 0.0, "scale": 10.0,
                           "midpoint": 0.5}}
        br = _branch(spark, [("0", 1.0), ("1", 1.0), ("5", 1.0)])
        got = _scores(formula_rescore(spark, store, "pts", [br], f, k=5))
        # 1 − 0.05·|n|: n=0 → 1, n=10 → 0.5, n=50 → clamped 0
        assert got == {"0": 1.0, "1": 0.5, "5": 0.0}

    def test_multi_branch_scores_and_defaults(self, spark, store):
        # candidate union: id 1 only in branch 0, id 2 in both, id 3 only
        # in branch 1; missing branch scores default per-branch
        b0 = _branch(spark, [("1", 0.9), ("2", 0.8)])
        b1 = _branch(spark, [("2", 0.6), ("3", 0.5)])
        f = {"sum": ["$score[0]", {"mult": [10.0, "$score[1]"]}]}
        got = _scores(formula_rescore(
            spark, store, "pts", [b0, b1], f,
            defaults={"$score[1]": 0.05}, k=5))
        assert got == {"1": pytest.approx(0.9 + 0.5),
                       "2": pytest.approx(0.8 + 6.0),
                       "3": pytest.approx(0.0 + 5.0)}

    def test_payload_default_vs_null(self, spark, store):
        # a missing STORED id keeps NULL payload → NULL score sorts last;
        # with a default, the same id scores the default
        br = _branch(spark, [("1", 1.0), ("99", 1.0)])
        out = formula_rescore(spark, store, "pts", [br], {"sum": ["n"]},
                              k=5)
        rows = {r["id"]: r["score"] for r in out.collect()}
        assert rows["1"] == 10.0 and rows["99"] is None
        out2 = formula_rescore(spark, store, "pts", [br],
                               {"sum": ["n"]}, defaults={"n": -1.0}, k=5)
        assert _scores(out2)["99"] == -1.0

    def test_condition_leaf_and_range(self, spark, store):
        f = {"sum": [{"mult": [100.0, Range("n", gte=50.0)]},
                     {"mult": [1.0, MatchValue("grp", "g0")]}]}
        br = _branch(spark, [("4", 0.1), ("5", 0.1), ("6", 0.1)])
        got = _scores(formula_rescore(spark, store, "pts", [br], f, k=5))
        # n>=50: ids 5,6 ; grp g0: ids 4,6
        assert got == {"4": 1.0, "5": 100.0, "6": 101.0}

    def test_composite_filter_condition_fetches_payload(self, spark,
                                                        store):
        """r8 advice: a COMPOSITE Filter as a condition (the documented
        grammar) must harvest every referenced root column into
        payload_keys — without the recursive walk, formula_rescore
        skipped the payload fetch and F.expr failed at analysis with an
        unresolved column."""
        from bob_vector_db_spark.operators.filters import (
            Filter, NestedCondition)
        cond = Filter(
            must=[Range("n", gte=50.0)],
            should=[MatchValue("grp", "g0")],
            must_not=[Filter(must=[Range("price", gte=10_000.0)])])
        f = {"sum": [{"mult": [100.0, cond]}]}
        _, keys = compile_formula(f, 1)
        assert keys == {"n", "grp", "price"}
        br = _branch(spark, [("4", 0.1), ("5", 0.1), ("6", 0.1)])
        got = _scores(formula_rescore(spark, store, "pts", [br], f, k=5))
        # n>=50 AND grp=g0 AND NOT price>=10000: only id 6
        assert got == {"4": 0.0, "5": 0.0, "6": 100.0}
        # a NestedCondition harvests only the array ROOT (inner keys
        # rewrite to the lambda variable)
        _, keys2 = compile_formula(
            Filter(must=[NestedCondition("props", Filter(
                must=[MatchValue("kind", "s")]))]), 0)
        assert keys2 == {"props"}

    def test_missing_payload_key_refused(self, spark, store):
        br = _branch(spark, [("1", 1.0)])
        with pytest.raises(ValueError, match="nonexistent"):
            formula_rescore(spark, store, "pts", [br],
                            {"sum": ["nonexistent"]}).collect()

    def test_gauss_decay_values(self, spark, store):
        f = {"gauss_decay": {"x": "n", "target": 50.0, "scale": 20.0,
                             "midpoint": 0.5}}
        br = _branch(spark, [("5", 1.0), ("7", 1.0)])
        got = _scores(formula_rescore(spark, store, "pts", [br], f, k=5))
        lam = math.log(0.5) / 400.0
        assert got["5"] == 1.0  # at the target
        assert got["7"] == pytest.approx(round(math.exp(lam * 400), 6))


class TestQueryPointsDispatch:
    def test_formula_via_query_points(self, spark, store):
        br = _branch(spark, [("1", 0.5), ("2", 0.9)])
        out = query_points(spark, store, "pts",
                           query={"formula": {"sum": ["$score", "n"]}},
                           prefetch=[br], k=2, with_payload=["grp"])
        rows = out.orderBy("rank").collect()
        assert [r["id"] for r in rows] == ["2", "1"]
        assert rows[0]["score"] == pytest.approx(20.9)
        assert rows[0]["grp"] == "g0"
        assert [r["rank"] for r in rows] == [1, 2]

    def test_formula_offset_pages(self, spark, store):
        br = _branch(spark, [(str(i), 1.0) for i in range(6)])
        f = {"sum": ["n"]}
        page = query_points(spark, store, "pts", query={"formula": f},
                            prefetch=[br], k=2, offset=2)
        got = page.orderBy("rank").collect()
        # n ranks ids 5,4,3,2,1,0 — offset 2 → ids 3,2 at ranks 1,2
        assert [(r["id"], r["rank"]) for r in got] == [("3", 1), ("2", 2)]

    def test_formula_needs_prefetch(self, spark, store):
        with pytest.raises(ValueError, match="needs prefetch"):
            query_points(spark, store, "pts",
                         query={"formula": {"sum": [1.0]}})

    def test_formula_rejects_outer_filter(self, spark, store):
        br = _branch(spark, [("1", 1.0)])
        with pytest.raises(ValueError, match="inside each branch"):
            query_points(spark, store, "pts",
                         query={"formula": {"sum": [1.0]}},
                         prefetch=[br],
                         flt=MatchValue("grp", "g0"))


def test_hasvector_hasid_conditions_fetch_columns(spark, store):
    """ADVICE r10: HasVector / HasId leaves inside a formula condition
    harvest their referenced columns (``column`` / ``id_col``) — the
    rescore used to fail analysis with an unresolved column instead of
    fetching them.  Keys the candidate frame already carries (the
    string-cast ``id``) are NOT re-fetched (no duplicate-column join)."""
    from bob_vector_db_spark.operators.filters import HasId, HasVector

    _, keys = compile_formula({"sum": [HasVector("emb"), HasId([1])]}, 0)
    assert keys == {"emb", "id"}

    br = _branch(spark, [("1", 0.0), ("2", 0.0), ("3", 0.0)])
    # price is a stored non-NULL column: the condition fetches it
    f = {"sum": [HasVector("price"), "$score[0]"]}
    got = _scores(formula_rescore(spark, store, "pts", [br], f, k=5))
    assert got == {"1": 1.0, "2": 1.0, "3": 1.0}
    # HasId on the default id column scores against the candidate ids
    f2 = {"sum": [HasId([1, 3]), HasId([2], id_col="id")]}
    got2 = _scores(formula_rescore(spark, store, "pts", [br], f2, k=5))
    assert got2 == {"1": 1.0, "2": 1.0, "3": 1.0}


def test_payload_key_colliding_with_frame_refused(spark, tmp_path):
    """r10 review finding: a stored payload field named 'id' while the
    collection's id_col is different (or one named like a branch-score
    column) would silently bind the condition to the candidate frame's
    column — refuse loudly instead."""
    from bob_vector_db_spark.operators import upsert

    base = str(tmp_path / "store")
    pts = spark.createDataFrame(
        [(1, "x1", 5.0), (2, "x2", 7.0)],
        "pid long, id string, n double")
    upsert.create_collection(spark, base, "pts", df=pts, id_col="pid",
                             n_buckets=2)
    br = _branch(spark, [("1", 1.0), ("2", 1.0)])
    with pytest.raises(ValueError, match="collide"):
        formula_rescore(spark, base, "pts", [br], {"sum": ["id"]}, k=2)
    # non-colliding keys on the same collection still fetch fine
    got = _scores(formula_rescore(spark, base, "pts", [br],
                                  {"sum": ["n"]}, k=2))
    assert got == {"1": 5.0, "2": 7.0}
