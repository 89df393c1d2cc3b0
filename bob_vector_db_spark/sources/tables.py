"""Fixture/table loaders (SURVEY.md §2.1 S4: parquet scan).

All loads go through ``spark.read.parquet`` so Catalyst keeps predicate
pushdown / column pruning; callers filter+select on the returned DataFrame
and the parquet scan only reads what survives (verify with
``plans.assert_pushed_filters``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS); Spark rejects it unless the
        # legacy nanosAsLong conf is on. It is runtime-settable, so set it here
        # rather than only in our own session builder — callers (driver, tests)
        # may hand us a session built elsewhere.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read via nanosAsLong → truncate to µs exactly the
        # way DuckDB does (integer division, no float round-trip).
        from pyspark.sql import functions as F  # noqa: PLC0415

        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
