"""Vector centroids / IVF index build (SURVEY.md §2.4 A5; north star
"batch index build").

The explode form — posexplode(embedding) → groupBy(label, pos).avg →
re-collect ordered by pos — is pure built-in SQL: Spark plans it as a single
hash aggregate after one shuffle on (label, pos), map-side partials included.
That is the centroid table an IVF index needs (see knn.knn_join_blocked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def centroids_exploded(df: DataFrame, label_col: str = "label",
                       vec_col: str = "embedding",
                       round_to: int | None = 6,
                       exact: bool = False) -> DataFrame:
    """(label, pos, centroid_val): mean of each vector component per label.

    ``exact=True`` accumulates in DECIMAL(20,10) so the mean is bit-identical
    regardless of aggregation order — required when the centroid feeds an
    oracle-checked downstream comparison (e.g. IVF probe ranking).
    """
    if exact:
        val = (F.sum(F.col("val").cast("double").cast("decimal(20,10)"))
               .cast("double") / F.count(F.lit(1)))
    else:
        val = F.avg(F.col("val").cast("double"))
    if round_to is not None:
        val = F.round(val, round_to)
    return (
        df.select(F.col(label_col).alias("label"),
                  F.posexplode(F.col(vec_col)).alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(val.alias("centroid_val"))
    )


def centroids(df: DataFrame, label_col: str = "label",
              vec_col: str = "embedding", exact: bool = False) -> DataFrame:
    """(label, centroid ARRAY<DOUBLE>, n): the IVF centroid table.

    collect re-assembly is ordered by pos via array_sort on (pos, val)
    structs, so the result is deterministic regardless of shuffle order.
    """
    exploded = centroids_exploded(df, label_col, vec_col, round_to=None, exact=exact)
    counts = df.groupBy(F.col(label_col).alias("label")).agg(F.count("*").alias("n"))
    assembled = (
        exploded.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "centroid_val"))),
                lambda s: s["centroid_val"],
            ).alias("centroid")
        )
    )
    return assembled.join(F.broadcast(counts), "label")
