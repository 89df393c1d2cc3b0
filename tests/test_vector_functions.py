"""Property tests for vector math (SURVEY.md §5.2 item 4)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bob_vector_db_spark.functions import vector


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(7)
    rows = [(i, rng.uniform(-1, 1, 8).tolist(), rng.uniform(-1, 1, 8).tolist())
            for i in range(20)]
    return spark.createDataFrame(rows, "id long, a array<double>, b array<double>").cache()


def test_dot_matches_numpy(vec_df):
    got = vec_df.select("id", vector.dot(F.col("a"), F.col("b")).alias("d")).collect()
    rows = {r["id"]: r["d"] for r in got}
    for row in vec_df.collect():
        assert math.isclose(rows[row["id"]], float(np.dot(row["a"], row["b"])), rel_tol=1e-12)


def test_cosine_self_is_one(vec_df):
    got = vec_df.select(vector.cosine_similarity(F.col("a"), F.col("a")).alias("c")).collect()
    assert all(math.isclose(r["c"], 1.0, abs_tol=1e-12) for r in got)


def test_cosine_symmetry_and_scale_invariance(spark, vec_df):
    ab = vec_df.select(vector.cosine_similarity(F.col("a"), F.col("b")).alias("c")).collect()
    ba = vec_df.select(vector.cosine_similarity(F.col("b"), F.col("a")).alias("c")).collect()
    for x, y in zip(ab, ba):
        assert math.isclose(x["c"], y["c"], rel_tol=1e-12)
    scaled = vec_df.select(
        vector.cosine_similarity(vector.scale(F.col("a"), F.lit(3.0)), F.col("b")).alias("c")
    ).collect()
    for x, y in zip(ab, scaled):
        assert math.isclose(x["c"], y["c"], rel_tol=1e-9)


def test_zero_vector_cosine_is_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>")
    assert df.select(vector.cosine_similarity(F.col("a"), F.col("b")).alias("c")).first()["c"] is None


def test_normalize_unit_norm(vec_df):
    got = vec_df.select(vector.l2_norm(vector.normalize(F.col("a"))).alias("n")).collect()
    assert all(math.isclose(r["n"], 1.0, rel_tol=1e-12) for r in got)


def test_l2_distance(spark):
    df = spark.createDataFrame([([0.0, 3.0], [4.0, 0.0])], "a array<double>, b array<double>")
    assert math.isclose(df.select(vector.l2_distance(F.col("a"), F.col("b")).alias("d")).first()["d"], 5.0)


def test_mean_pool_skips_null_tokens(spark):
    """Review r8 regression: a NULL token inside the list nulled the
    whole fold, silently dropping the point from the ivf_mv artifact
    while the exact max-sim scan (array_max skips NULLs) still scored
    it.  The pool must average the non-NULL tokens; empty / all-NULL
    lists stay NULL."""
    df = spark.createDataFrame(
        [(0, [[2.0, 0.0], None, [0.0, 4.0]]),
         (1, [[1.0, 1.0]]),
         (2, []),
         (3, [None]),
         (4, None)],
        "id long, vecs array<array<double>>")
    got = {r["id"]: r["p"] for r in df.select(
        "id", vector.mean_pool(F.col("vecs")).alias("p")).collect()}
    assert list(got[0]) == [1.0, 2.0]
    assert list(got[1]) == [1.0, 1.0]
    assert got[2] is None and got[3] is None and got[4] is None


def test_l1_distance(spark, vec_df):
    """Manhattan (round 10, VERDICT r9 missing #3): matches numpy's L1;
    degenerate shapes follow the fold conventions — NULL side → NULL,
    empty-vs-empty → 0.0, NULL element nulls the fold."""
    df = spark.createDataFrame([([0.0, 3.0], [4.0, 0.0])],
                               "a array<double>, b array<double>")
    assert math.isclose(df.select(
        vector.l1_distance(F.col("a"), F.col("b")).alias("d"))
        .first()["d"], 7.0)
    got = vec_df.select("id",
                        vector.l1_distance(F.col("a"), F.col("b"))
                        .alias("d")).collect()
    arrs = {r["id"]: (r["a"], r["b"]) for r in vec_df.collect()}
    for r in got:
        a, b = arrs[r["id"]]
        assert math.isclose(
            r["d"], float(np.abs(np.array(a) - np.array(b)).sum()),
            rel_tol=1e-12)
    deg = spark.createDataFrame(
        [(0, None, [1.0]), (1, [], []), (2, [1.0, None], [0.0, 0.0])],
        "id long, a array<double>, b array<double>")
    rows = {r["id"]: r["d"] for r in deg.select(
        "id", vector.l1_distance(F.col("a"), F.col("b")).alias("d"))
        .collect()}
    assert rows[0] is None and rows[1] == 0.0 and rows[2] is None
