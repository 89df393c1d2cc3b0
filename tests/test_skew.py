"""Skew mitigation: salted two-phase aggregation correctness, and AQE
runtime skew-join splitting (SURVEY.md §4.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bob_vector_db_spark.operators.skew import salted_agg


def _skewed(spark, n=20000):
    # ~90% of rows share key 0
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.col("id").alias("rid"),
    )


def test_salted_agg_equals_plain_agg(spark):
    df = _skewed(spark)
    plain = {r["k"]: (r["n"], r["total"], r["mx"]) for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                 F.sum("v").alias("total"),
                                 F.max("v").alias("mx")).collect()}
    salted = {r["k"]: (r["n"], r["total"], r["mx"]) for r in
              salted_agg(df, "k", {
                  "n": (F.count(F.lit(1)), F.sum("n")),
                  "total": (F.sum("v"), F.sum("total")),
                  "mx": (F.max("v"), F.max("mx")),
              }, salt_on="rid").collect()}
    assert plain == salted


def test_salted_partials_spread_hot_key(spark):
    """The partial stage must see the hot key under many distinct salts —
    that spread IS the mitigation."""
    df = _skewed(spark).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("rid")), F.lit(16)))
    n = (df.filter(F.col("k") == 0).select("_salt").distinct().count())
    assert n == 16


def test_aqe_splits_skewed_join_partition(spark):
    """With thresholds lowered to test scale, AQE must mark the hot
    partition of a sort-merge join as skewed and split it (the runtime half
    of the skew story; salting is the compile-time half)."""
    conf = spark.conf
    keys = (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.shuffle.partitions",
    )
    saved = {k: conf.get(k, None) for k in keys}
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # skew detection compares the hot partition against the MEDIAN
        # partition; too few partitions flattens the ratio below the factor
        conf.set("spark.sql.shuffle.partitions", "16")
        fact = _skewed(spark, n=200000)
        dim = spark.range(100).select(F.col("id").alias("k"),
                                      F.concat(F.lit("d"), F.col("id")).alias("name"))
        joined = fact.join(dim, "k").groupBy("name").count()
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_salted_agg_default_salt_stable_under_repartition(spark):
    """VERDICT r3 #5: the default salt is a pure function of row content, so
    ANY physical layout of the same input must produce the exact same result
    (including float sums, whose value depends on partial-group boundaries)."""
    # v must itself be content-derived: rand(seed) re-draws per PARTITION,
    # which would vary across layouts and mask what we're testing
    df = _skewed(spark, n=5000).withColumn(
        "v", F.col("v") + F.sin(F.col("rid").cast("double")))
    runs = []
    for layout in (df, df.repartition(3), df.repartition(17, "k"),
                   df.coalesce(1)):
        got = sorted(
            (r["k"], r["n"], r["mx"], str(r["dec_total"]), r["dbl_total"])
            for r in salted_agg(layout, "k", {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "mx": (F.max("v"), F.max("mx")),
                # decimal addition is exact → layout-invariant END TO END
                "dec_total": (F.sum(F.col("v").cast("decimal(28,18)")),
                              F.sum("dec_total")),
                "dbl_total": (F.sum("v"), F.sum("dbl_total")),
            }).collect())
        runs.append(got)
    base = runs[0]
    for other in runs[1:]:
        # count / max / decimal-sum: bit-identical across every layout —
        # the content-hashed salt fixed the group boundaries
        assert [t[:4] for t in other] == [t[:4] for t in base]
        # raw double sums: boundaries are fixed but WITHIN-group iteration
        # order still follows the scan, so only ulp-level drift is allowed
        # (the docstring directs exact-money flows through decimals)
        for (_, _, _, _, d0), (_, _, _, _, d1) in zip(base, other):
            assert abs(d0 - d1) <= 1e-9 * max(1.0, abs(d0))
