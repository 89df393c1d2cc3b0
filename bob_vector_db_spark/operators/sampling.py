"""Deterministic sampling & split assignment for training-data pipelines
(north-star extension of SURVEY.md §2.8 F4 content hashing).

A 100 TB corpus is sampled and split by CONTENT HASH, never by ``rand()``:
the assignment must be reproducible across runs, stable under re-partitioning,
and portable to the oracle.  Both helpers are pure JVM integer expressions on
the poly-hash (functions.hashing), so they pipeline into the scan with zero
shuffles and DuckDB reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SPLIT_BUCKETS = 10_000


def hash_bucket(key: Column, salt: str = "", buckets: int = SPLIT_BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): md5 of (salt ⊕ key), first 8 hex
    digits as an integer, mod buckets.

    md5, not the poly rolling hash: sequential keys under a linear hash land
    in locally-linear buckets (a sf0.01 5% sample came back 20%), while md5
    diffuses them uniformly.  ``salt`` decorrelates independent draws from
    the same corpus; cryptographic diffusion means prefix position is enough.
    Portable: DuckDB mirrors it as a hex fold over substr(md5(..), 1, 8).
    """
    keyed = F.concat(F.lit(salt), F.lit("\x1f"), key.cast("string"))
    return (F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10)
            .cast("long") % buckets)


def hash_sample(df: DataFrame, key_col: str, rate: float,
                salt: str = "sample") -> DataFrame:
    """Keep ~``rate`` of rows, chosen by content hash — same rows every run,
    on any cluster, at any partitioning."""
    threshold = int(rate * SPLIT_BUCKETS)
    return df.filter(hash_bucket(F.col(key_col), salt) < threshold)


def assign_split(key: Column, train: float = 0.8, val: float = 0.1,
                 salt: str = "split") -> Column:
    """'train' / 'val' / 'test' label from the key's hash bucket.

    Buckets [0, train) → train, [train, train+val) → val, rest → test;
    fractions are exact over SPLIT_BUCKETS so the oracle can mirror the
    integer thresholds.
    """
    b = hash_bucket(key, salt)
    t1 = int(train * SPLIT_BUCKETS)
    t2 = int((train + val) * SPLIT_BUCKETS)
    return (
        F.when(b < t1, F.lit("train"))
        .when(b < t2, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def stratified_sample(df: DataFrame, group_col: str, id_col: str,
                      n_per_group: int, salt: str = "strat") -> DataFrame:
    """EXACTLY ``n_per_group`` rows per group (fewer when the group is
    smaller), picked deterministically: rows rank by md5(salt ⊕ id) within
    their group (uniform, layout-independent — the same md5 rationale as
    :func:`hash_bucket`) and the first n win.  One shuffle on the group
    key; the rank window never sees more than a group's rows.  This is the
    per-stratum quota sampling a training-mix builder needs where
    ``df.sampleBy`` gives only approximate fractions."""
    order = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(order, F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n_per_group)
            .drop("_rn"))
