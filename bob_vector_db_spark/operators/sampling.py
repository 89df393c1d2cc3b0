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


def temperature_mix(df: DataFrame, stratum_col: str, id_col: str,
                    n_target: int, alpha: float = 0.5,
                    salt: str = "mix") -> DataFrame:
    """Temperature-based domain mixing (round 14): per-stratum quotas
    ∝ count^α — the standard multilingual/multi-source rebalancing
    (α=1 keeps the natural distribution, α→0 approaches uniform; the
    α≈0.3–0.7 range is the usual pretraining-mix temperature).  Each
    stratum contributes ``max(1, floor(n_target · count^α / Σ count^α))``
    rows (never more than it has), picked by the same deterministic
    md5(salt ⊕ id) rank as :func:`stratified_sample`.

    Scale shape: ONE tiny count aggregate (map-side combined) computes
    the quota table — |strata| rows, broadcast back onto the corpus —
    then one rank window per stratum cuts it; the corpus shuffles once
    on the stratum key.  The quota arithmetic rounds the ratio to 6
    decimals BEFORE the floor so engine-order float summation can't
    flip a boundary (the oracle-determinism rule every float surface
    here follows)."""
    counts = (df.groupBy(stratum_col)
              .agg(F.count(F.lit(1)).alias("_cnt")))
    tot = counts.agg(F.sum(F.pow(F.col("_cnt").cast("double"),
                                 F.lit(float(alpha)))).alias("_tot"))
    quota = (counts.crossJoin(F.broadcast(tot))
             .select(stratum_col,
                     F.greatest(
                         F.lit(1),
                         F.floor(F.round(
                             F.lit(float(n_target))
                             * F.pow(F.col("_cnt").cast("double"),
                                     F.lit(float(alpha)))
                             / F.col("_tot"), 6)).cast("int"))
                     .alias("_quota")))
    order = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(order, F.col(id_col))
    return (df.join(F.broadcast(quota), stratum_col)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= F.col("_quota"))
            .drop("_rn", "_quota"))


def pack_token_shards(df: DataFrame, id_col: str, tokens_col: str,
                      budget: int, n_ranges: int = 64) -> DataFrame:
    """Shard a corpus into contiguous training shards of ~``budget`` tokens
    each (the uniform-shard packing step before tokenizer/loader handoff):
    in id order, a document's shard is ``floor(tokens_before_it / budget)``
    — deterministic, gap-free, every shard except the last within one
    document of the budget.

    Scale shape — a DISTRIBUTED prefix sum, not a global window: a plain
    ``SUM() OVER (ORDER BY id)`` collapses the corpus onto one task.
    Instead ids split into ``n_ranges`` contiguous, DETERMINISTIC ranges
    (``floor(id / ceil((max_id+1)/n_ranges))`` — no sampled
    repartitionByRange boundaries, so reruns and the oracle agree); each
    range cumsums locally under a per-range window, and the n_ranges
    range-total offsets (one tiny aggregate, collected driver-side)
    broadcast back as a literal map.  Wall-clock scales with the widest
    range, not the corpus.

    Returns the input columns plus ``shard`` (long).  Requires a
    non-negative integer-ish id; NULL token counts count 0.
    """
    stats = df.agg(F.max(F.col(id_col)).alias("mx"),
                   F.min(F.col(id_col)).alias("mn")).first()
    if stats["mx"] is None:
        return df.withColumn("shard", F.lit(None).cast("long"))
    if int(stats["mn"]) < 0:
        raise ValueError("pack_token_shards needs non-negative ids")
    span = int(stats["mx"]) + 1
    width = max(1, -(-span // int(n_ranges)))  # ceil
    rng = (F.floor(F.col(id_col) / width)).cast("long")
    toks = F.coalesce(F.col(tokens_col), F.lit(0)).cast("long")
    ranged = df.withColumn("_rng", rng)
    # per-range totals: n_ranges rows to the driver — the only collect
    totals = {int(r["_rng"]): int(r["_t"]) for r in
              ranged.groupBy("_rng").agg(F.sum(toks).alias("_t")).collect()}
    offsets, acc = {}, 0
    for g in sorted(totals):
        offsets[g] = acc
        acc += totals[g]
    off_map = F.create_map(
        *[F.lit(x).cast("long") for kv in offsets.items() for x in kv])
    w = (Window.partitionBy("_rng").orderBy(F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    before = (F.element_at(off_map, F.col("_rng"))
              + F.sum(toks).over(w) - toks)
    return (ranged
            .withColumn("shard",
                        F.floor(before / int(budget)).cast("long"))
            .drop("_rng"))
