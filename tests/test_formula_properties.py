"""Property-based cross-engine check for the FORMULA compiler (the same
gate that caught the r8 ``_lit`` float-rendering bug in the filter DSL):
a RANDOM formula tree — constants (including 17-significant-digit
floats), branch scores, payload fields with and without defaults, filter
conditions, guarded division, unary math, pow, decay kernels,
geo_distance and datetime primitives — must evaluate to the same scalar
in Spark (``dialect='spark'``) and DuckDB (``dialect='duckdb'``) over
the same rows, including the NULL-propagation corners (missing payload
without a default, missed prefetch branches, NULL coordinates).

``formula.py`` inherits ``_lit`` and adds its own driver-side folded
constants (decay λ, slopes, epoch seconds), so adversarial literals
reach SQL through more paths than the filter DSL exercises."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bob_vector_db_spark.operators.filters import (
    Filter,
    IsNull,
    MatchValue,
    Range,
)
from bob_vector_db_spark.operators.formula import compile_formula

# Fixed edge-heavy table: NULL payloads (no-default → NULL score), NULL
# branch scores (missed branches), NULL coordinates, adversarial floats.
ROWS = [
    # id, n, price, grp, plat, plon, ts, _score_0, _score_1
    (0, 5.0, 100.0, "g0", 10.0, 20.0, "2021-01-01 00:00:00", 0.9, 0.1),
    (1, None, -3.5, "g1", -35.5, 170.0, "2021-06-15 12:30:00", None, 0.5),
    (2, 0.30000000000000004, 0.0, "g0", None, None, None, 0.2, None),
    (3, -7.25, 2.0000000000000004, None, 45.0, -120.0,
     "2024-02-29 23:59:59", None, None),
    (4, 1e6, 1e-7, "g1", 0.0, 0.0, "1970-01-01 00:00:01", 1.0, 1.0),
    (5, -0.0, None, "g2", 89.9, 179.9, "2021-01-01 00:00:00", 0.5, 0.25),
]
_SCHEMA = ("id long, n double, price double, grp string, plat double, "
           "plon double, ts timestamp, _score_0 double, _score_1 double")
_DUCK_ROWS = ", ".join(
    "({}, {}, {}, {}, {}, {}, {}, {}, {})".format(
        i,
        "NULL" if n is None else repr(n),
        "NULL" if p is None else repr(p),
        "NULL" if g is None else f"'{g}'",
        "NULL" if la is None else repr(la),
        "NULL" if lo is None else repr(lo),
        "CAST(NULL AS TIMESTAMP)" if ts is None else f"TIMESTAMP '{ts}'",
        "NULL" if s0 is None else repr(s0),
        "NULL" if s1 is None else repr(s1),
    ) for i, n, p, g, la, lo, ts, s0, s1 in ROWS)
_DUCK_TABLE = (f"(SELECT * FROM (VALUES {_DUCK_ROWS}) t(id, n, price, "
               f"grp, plat, plon, ts, _score_0, _score_1))")

_ADVERSARIAL = [0.30000000000000004, 2.0000000000000004, -0.0, 1e-7,
                123456.78901234567]
_const = st.one_of(
    st.sampled_from(_ADVERSARIAL),
    st.floats(min_value=-50.0, max_value=50.0,
              allow_nan=False, allow_infinity=False),
    st.integers(-20, 20),
)
_var = st.sampled_from(["$score", "$score[1]", "n", "price"])
_cond = st.one_of(
    st.builds(MatchValue, st.just("grp"), st.sampled_from(["g0", "g1"])),
    st.builds(lambda b: Range("n", gte=b), _const),
    st.builds(lambda b: Range("price", lt=b), _const),
    st.builds(IsNull, st.sampled_from(["n", "grp", "ts"])),
    st.builds(lambda v, b: Filter(must=[MatchValue("grp", v)],
                                  should=[Range("n", gt=b)]),
              st.sampled_from(["g0", "g1"]), _const),
)
_leaf = st.one_of(
    _const, _var, _cond,
    st.just({"datetime": "2021-03-04 05:06:07"}),
    st.just({"datetime_key": "ts"}),
    st.builds(lambda la, lo: {"geo_distance": {
        "origin": {"lat": la, "lon": lo},
        "to": {"lat_key": "plat", "lon_key": "plon"}}},
        st.floats(-80, 80), st.floats(-170, 170)),
)


def _node(children):
    return st.one_of(
        st.builds(lambda xs: {"sum": xs}, st.lists(children, min_size=1, max_size=3)),
        st.builds(lambda xs: {"mult": xs}, st.lists(children, min_size=1, max_size=3)),
        st.builds(lambda l, r, d: {"div": {
            "left": l, "right": r,
            **({"by_zero_default": d} if d is not None else {})}},
            children, children, st.one_of(st.none(), _const)),
        st.builds(lambda x: {"neg": x}, children),
        st.builds(lambda x: {"abs": x}, children),
        st.builds(lambda x: {"sqrt": {"abs": x}}, children),
        st.builds(lambda x: {"exp": {"neg": {"abs": x}}}, children),
        st.builds(lambda x: {"ln": {"sum": [{"abs": x}, 1.0]}}, children),
        st.builds(lambda x: {"log10": {"sum": [{"abs": x}, 1.0]}}, children),
        st.builds(lambda b: {"pow": {"base": {"abs": b}, "exponent": 2.0}},
                  children),
        st.builds(lambda x, t, s, m, k: {k: {
            "x": x, "target": t, "scale": s, "midpoint": m}},
            children, _const, st.floats(0.5, 20.0), st.floats(0.05, 0.95),
            st.sampled_from(["lin_decay", "exp_decay", "gauss_decay"])),
    )


_formula = st.recursive(_leaf, _node, max_leaves=6)
_defaults = st.one_of(
    st.none(),
    st.fixed_dictionaries({}, optional={
        "n": _const, "price": _const, "$score": _const, "$score[1]": _const}),
)


@pytest.fixture(scope="module")
def engines(spark):
    from datetime import datetime
    sdf = spark.createDataFrame(
        [(i, n, p, g, la, lo,
          None if ts is None else datetime.strptime(
              ts, "%Y-%m-%d %H:%M:%S"), s0, s1)
         for i, n, p, g, la, lo, ts, s0, s1 in ROWS], _SCHEMA)
    sdf.createOrReplaceTempView("_formula_prop")
    con = duckdb.connect()
    return spark, con


def _agree(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    a, b = float(a), float(b)
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    # library transcendentals (exp/pow/asin) differ by ulps between the
    # JVM and C runtimes; the registry oracle queries pin the rounded
    # exact contract, this sweep guards SEMANTIC agreement
    return math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-6)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(formula=_formula, defaults=_defaults)
def test_random_formulas_agree_across_engines(engines, formula, defaults):
    spark, con = engines
    s_sql, _ = compile_formula(formula, 2, defaults, dialect="spark")
    d_sql, _ = compile_formula(formula, 2, defaults, dialect="duckdb")
    got_spark = {r["id"]: r["v"] for r in spark.sql(
        f"SELECT id, ({s_sql}) AS v FROM _formula_prop t").collect()}
    got_duck = dict(con.execute(
        f"SELECT id, ({d_sql}) AS v FROM {_DUCK_TABLE}").fetchall())
    assert got_spark.keys() == got_duck.keys()
    for i in got_spark:
        assert _agree(got_spark[i], got_duck[i]), (
            i, got_spark[i], got_duck[i], s_sql, d_sql)


def test_formula_17_digit_literal_types_double(engines):
    """The r8 _lit falsifier class, through the FORMULA path: a folded
    constant with 17 significant digits must type DOUBLE in DuckDB (not
    DECIMAL, which poisons surrounding arithmetic with narrow casts)."""
    spark, con = engines
    f = {"mult": [2.0000000000000004, {"sum": ["n", 65.0]}]}
    s_sql, _ = compile_formula(f, 0, dialect="spark")
    d_sql, _ = compile_formula(f, 0, dialect="duckdb")
    got_s = {r["id"]: r["v"] for r in spark.sql(
        f"SELECT id, ({s_sql}) AS v FROM _formula_prop t").collect()}
    got_d = dict(con.execute(
        f"SELECT id, ({d_sql}) AS v FROM {_DUCK_TABLE}").fetchall())
    for i in got_s:
        assert _agree(got_s[i], got_d[i]), (i, got_s[i], got_d[i])
