"""Skew-mitigation helpers (SURVEY.md §4.3 scale notes).

Two tools for hot keys at 100 TB:

- :func:`salted_agg` — two-phase aggregation: partial aggregate on
  (key, salt) so a hot key's rows spread over ``n_salts`` reducers, then a
  tiny final combine per key.  Works for any associative measure (count,
  sum, min, max); Spark's own partial aggregation already does this for
  hash aggregates, but an EXPLICIT salt survives cases where map-side
  partials can't help (high-cardinality combiners, collect-ish payloads,
  grouped-map UDFs — see centroid.centroids_grouped_map).
- AQE skew-join splitting handles the join side of the same problem at
  runtime (`spark.sql.adaptive.skewJoin.*`, on in session.py); the test
  suite demonstrates it splitting a hot partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key: str, measures: dict[str, tuple[Column, Column]],
               n_salts: int = 16,
               salt_on: str | list[str] | None = None) -> DataFrame:
    """Two-phase aggregation over a possibly-skewed ``key``.

    ``measures`` maps output name → (partial aggregate over input rows,
    final aggregate over the partial column of the same name); e.g.::

        salted_agg(df, "user_id", {
            "n":     (F.count(F.lit(1)),  F.sum("n")),
            "total": (F.sum("value"),     F.sum("total")),
            "mx":    (F.max("value"),     F.max("mx")),
        })

    ``salt_on`` picks the column(s) whose hash spreads rows; the default is
    ``pmod(xxhash64(<every input column>), n_salts)`` — a pure function of
    row CONTENT, so the salt assignment (and with it the partial-agg group
    boundaries) is identical no matter how the input was partitioned.
    Never a partition-layout-dependent id: ``monotonically_increasing_id``
    would salt the same row differently after a ``repartition``, making
    runs irreproducible.  Pass a unique row id as ``salt_on`` when you have
    one — hashing one column is cheaper than hashing the full row.
    Caveat of the content-hash default: EXACT-duplicate rows share a salt,
    so a hot key whose rows are full duplicates still lands on one reducer
    — for duplicate-heavy data attach a distinct id first (or dedup
    upstream; duplicate floods are usually a data bug this makes visible).

    Reproducibility contract: count/min/max and exact-arithmetic sums
    (integer, decimal) are bit-identical across physical layouts.  Raw
    DOUBLE sums are layout-stable only to ulp-level drift — the salt fixes
    WHICH rows share a partial group, but within-group iteration still
    follows the scan order; route money/exact flows through
    ``cast("decimal(…)")`` as the oracle queries do.
    """
    if salt_on is None:
        salt_cols = [F.col(c) for c in df.columns]
    elif isinstance(salt_on, str):
        salt_cols = [F.col(salt_on)]
    else:
        salt_cols = [F.col(c) for c in salt_on]
    salt = F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(*[p.alias(name) for name, (p, _) in measures.items()])
    )
    return partial.groupBy(key).agg(
        *[f.alias(name) for name, (_, f) in measures.items()]
    )
