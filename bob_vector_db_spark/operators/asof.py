"""As-of and range joins (SURVEY.md §2.3 J6/J7).

J7 (as-of): for each left row, the single latest right row with
``right.ts <= left.ts`` per key — the "point version at a timestamp" query
that the reference's upsert-by-id + timestamp model implies
(qdrant_embedder.py:130-143 + embedder.py:283-287).

Implementation: union-tag + window, NOT a range join — one shuffle on the
key, linear state, no quadratic candidate explosion.  Right rows are tagged,
interleaved into the left's time order, and ``last(right_value, ignorenulls)``
over (key, ts) carries the most recent right row forward onto each left row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              value_cols: list[str], strict: bool = False) -> DataFrame:
    """For each ``left`` row: latest ``right`` row with same ``on`` key and
    ``right.ts <= left.ts`` (``< left.ts`` when strict).  Returns left columns
    + right ``value_cols`` (NULL when no match), plus ``right_ts``.
    """
    lcols = left.columns
    l_tag = left.select(
        *lcols, F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias("_r_ts"),
    )
    r_tag = right.select(
        F.col(on),
        F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (on, ts)],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(ts).alias("_r_ts"),
    ).select(*lcols, "_side", *[f"_r_{c}" for c in value_cols], "_r_ts")

    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts unless strict
    order = [F.col(ts).asc(), F.col("_side").asc() if not strict else F.col("_side").desc()]
    w = Window.partitionBy(on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    carried = unioned.select(
        *lcols, "_side",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"r_{c}") for c in value_cols],
        F.last("_r_ts", ignorenulls=True).over(w).alias("right_ts"),
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def range_join(left: DataFrame, right: DataFrame, cond: Column,
               broadcast_right: bool = True) -> DataFrame:
    """J6: inequality join.  The right side is typically a small band/bucket
    table — broadcast it so the theta-join is a map-side nested loop instead
    of a cartesian shuffle.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, cond)
