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


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime-settable confs query correctness depends on, applied here so
    externally-built sessions (the driver's, a user's) behave like ours:

    - nanosAsLong: events.parquet carries TIMESTAMP(NANOS), which Spark
      otherwise rejects at read time;
    - UTC session timezone: timestamp arithmetic must be reproducible
      against the DuckDB oracle regardless of host timezone;
    - Arrow: pandas-UDF paths degrade 10×+ without it.
    """
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 - a locked conf beats a crashed read
            pass


# Session-scoped DataFrame memo (round 16, guide §6/§7.3): every
# ``spark.read.parquet`` call pays 85-180 ms of driver-side work — py4j
# roundtrips, DataSource resolution, file listing, footer schema read —
# and a 222-query suite makes 500+ such calls over the SAME immutable
# fixture files.  Memoizing the LAZY DataFrame per (session, dir, table)
# removes that repeated metadata work exactly the way Spark's own
# filesourcePartitionFileCacheSize caches listings session-wide.  This is
# a PLAN handle, not data: every action on it still scans the parquet
# inputs (nothing is persisted or precomputed).  Entries hold a strong
# session ref and re-resolve when a different session asks — a restarted
# session never sees a stale handle.  Fixture dirs are immutable for the
# life of a session (deterministic generated test data), which is the
# one assumption the memo adds.
_DF_MEMO: dict[tuple[str, str], tuple[SparkSession, DataFrame]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    key = (os.path.abspath(sf_dir), name)
    hit = _DF_MEMO.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F  # noqa: PLC0415

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) read via nanosAsLong → truncate to µs exactly
            # the way DuckDB does (integer division, no float round-trip).
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # timestamp[us] with isAdjustedToUTC=false infers as NTZ, which
            # watermarks/windows reject.  Session tz is UTC, so this cast
            # reinterprets the same wall-clock value — numerically a no-op
            # and identical to DuckDB's naive reading.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _DF_MEMO[key] = (spark, df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
