"""X4 grouped-map centroid: exact scaled-int64 accumulation (VERDICT r3 #10
— the bit-identical claim must be true, not approximately true)."""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from bob_vector_db_spark.operators import centroid


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>")


def test_grouped_map_matches_exact_reference(spark):
    """Against an arbitrary-precision Fraction mean of the 10-decimal
    quantized inputs — the arithmetic the docstring promises."""
    rows = [(i, i % 2, [round(0.1 * i + d * 0.01, 10) for d in range(4)])
            for i in range(40)]
    got = {(r["label"], r["pos"]): r["centroid_val"]
           for r in centroid.centroids_grouped_map(_df(spark, rows)).collect()}
    for label in (0, 1):
        vecs = [v for i, lb, v in rows if lb == label]
        for pos in range(4):
            want = sum(Fraction(round(v[pos], 10)).limit_denominator(10**12)
                       for v in vecs) / len(vecs)
            assert got[(label, pos)] == pytest.approx(float(want), abs=5e-7)


def test_grouped_map_bit_identical_across_layouts(spark):
    """Same input, any partitioning, any salt fan-out → the same bits."""
    rows = [(i, 0, [1e6 + i * 1e-4, -1e6 + i * 1e-4, i * 1e-9])
            for i in range(100)]
    base = None
    for df, salts in ((_df(spark, rows), 8),
                      (_df(spark, rows).repartition(13), 8),
                      (_df(spark, rows).coalesce(1), 8),
                      (_df(spark, rows).repartition(3), 2),
                      (_df(spark, rows), 32)):
        got = sorted(
            (r["label"], r["pos"], r["centroid_val"])
            for r in centroid.centroids_grouped_map(
                df, n_salts=salts, q_decimals=8).collect())
        if base is None:
            base = got
        else:
            assert got == base  # == on floats: bit-identical, no tolerance


def test_grouped_map_overflow_guard_raises(spark):
    """Magnitudes that would wrap int64 at q_decimals=10 must fail loudly,
    not return silently-wrong centroids."""
    rows = [(i, 0, [1.0e8] * 2) for i in range(200)]  # Σ = 2e10 · 1e10 > 2^63
    with pytest.raises(Exception, match="int64"):
        centroid.centroids_grouped_map(_df(spark, rows)).collect()
    # the documented remedy — lower q_decimals — succeeds on the same data
    got = {r["pos"]: r["centroid_val"]
           for r in centroid.centroids_grouped_map(
               _df(spark, rows), q_decimals=4).collect()}
    assert got == {0: 1.0e8, 1: 1.0e8}
