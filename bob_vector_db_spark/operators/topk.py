"""Top-k operators (SURVEY.md §2.6 O1-O3, §2.5 W1).

Global top-k uses ``orderBy().limit()`` which Spark plans as
``TakeOrderedAndProject`` — per-partition heaps + single merge, no global
sort shuffle.  Per-group top-k is the window + ``row_number() <= k`` pattern;
AQE handles skewed groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_topk(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    return df.orderBy(*order_by).limit(k)


def group_topk(df: DataFrame, partition_by: list[str],
               order_by: list[Column], k: int,
               rank_col: str = "rank") -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
