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
               n_salts: int = 16, salt_on: str | None = None) -> DataFrame:
    """Two-phase aggregation over a possibly-skewed ``key``.

    ``measures`` maps output name → (partial aggregate over input rows,
    final aggregate over the partial column of the same name); e.g.::

        salted_agg(df, "user_id", {
            "n":     (F.count(F.lit(1)),  F.sum("n")),
            "total": (F.sum("value"),     F.sum("total")),
            "mx":    (F.max("value"),     F.max("mx")),
        })

    ``salt_on`` picks the column whose hash spreads rows (defaults to a
    per-row deterministic spread of the whole row via monotonically
    increasing id — use a real column like an event id when available so
    the result is reproducible under re-partitioning).
    """
    salt = (
        F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts))
        if salt_on is not None
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(*[p.alias(name) for name, (p, _) in measures.items()])
    )
    return partial.groupBy(key).agg(
        *[f.alias(name) for name, (_, f) in measures.items()]
    )
