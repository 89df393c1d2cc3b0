"""SparkSession factory tuned for the engine.

Local-mode settings mirror what we would set fleet-wide on a real cluster:
AQE on (runtime re-plan, skew-join splitting, partition coalescing), shuffle
partitions sized to the parallelism actually available instead of the 200
default, Arrow enabled for the pandas-UDF slow path, UTC session timezone so
timestamp arithmetic is reproducible against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "bob_vector_db_spark",
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None,
              cpus: int | str | None = None) -> SparkSession:
    """Build (or reuse) the tuned session.

    On a 1000-executor cluster the same knobs apply, with
    ``spark.sql.shuffle.partitions`` sized to ~2-3x total cores and
    ``spark.sql.files.maxPartitionBytes`` left at 128m so a 100 TB scan fans
    out to ~800k input splits; AQE coalesces the tail.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # Whole-stage codegen emits a fresh class per distinct plan; a long
        # many-query session overflows the JVM's default 240 MB CodeCache,
        # after which the JIT flushes hot methods and generated code runs
        # interpreted (10×+ tail slowdowns). 1 GiB + flushing keeps the JIT
        # alive for the whole suite — same flag Spark's tuning guide
        # recommends fleet-wide for codegen-heavy workloads.
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet carries TIMESTAMP(NANOS); read as long, convert in
        # sources.tables (Spark timestamps are µs — same truncation DuckDB does)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
