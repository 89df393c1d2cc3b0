"""Collection store: idempotent create + upsert-by-id (SURVEY.md §2.1 S5/S6).

The reference's sink is Qdrant ``upload_points`` — re-sending an id replaces
the point (qdrant_embedder.py:58-62,130-143), and collections are created
lazily iff absent (qdrant_embedder.py:92-103).  On plain parquet (no Delta
dependency) the same semantics are:

    create  — write iff path absent (idempotent DDL)
    upsert  — union(new, existing) → last-write-wins by (id) on a version
              ordering → overwrite

At scale the store is partitioned by ``collection`` so payload/collection
filters become partition pruning, and the last-write-wins window shuffles
only the touched partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def collection_path(root: str, collection: str) -> str:
    return os.path.join(root, f"collection={collection}")


def create_collection(spark: SparkSession, root: str, collection: str,
                      df: DataFrame | None = None) -> bool:
    """Idempotent create (S5): returns True if newly created.

    Mirrors the exists-check at qdrant_embedder.py:92 — existing collections
    are left untouched.
    """
    path = collection_path(root, collection)
    if os.path.exists(path):
        return False
    if df is not None:
        df.write.mode("overwrite").parquet(path)
    else:
        os.makedirs(path, exist_ok=True)
    return True


def last_write_wins(df: DataFrame, id_col: str = "id",
                    version_col: str = "_version",
                    tiebreak=None) -> DataFrame:
    """Dedup-last-wins: keep the highest-version row per id (W1 pattern).

    ``tiebreak`` (list of Columns) makes equal-version picks deterministic.
    """
    order = [F.desc_nulls_last(version_col), *(tiebreak or [])]
    w = Window.partitionBy(id_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert(spark: SparkSession, root: str, collection: str,
           new_rows: DataFrame, id_col: str = "id",
           version_col: str | None = None) -> DataFrame:
    """S6: merge ``new_rows`` into the collection, the newest version winning
    on id collision; returns the merged DataFrame after persisting it.

    Plain-parquet MERGE: read existing → last-write-wins → overwrite.  With
    Delta available this becomes a real ``MERGE INTO`` in foreachBatch;
    semantics identical.

    Without ``version_col`` the merge tags existing=0 / new=1, so any
    re-delivered id replaces the stored point — exactly Qdrant's
    ``upload_points`` upsert.  With ``version_col`` (e.g. an ingest timestamp
    from file metadata) the column is PERSISTED in the table, so versions
    survive restarts and ordering is correct even when one micro-batch
    re-reads several generations of the same id.
    """
    path = collection_path(root, collection)
    exists = os.path.exists(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )
    if version_col is None:
        new_tagged = new_rows.withColumn("_version", F.lit(1))
        if exists:
            existing = spark.read.parquet(path).withColumn("_version", F.lit(0))
            merged = last_write_wins(
                existing.unionByName(new_tagged, allowMissingColumns=True), id_col
            ).drop("_version")
        else:
            merged = last_write_wins(new_tagged, id_col).drop("_version")
    else:
        if exists:
            existing = spark.read.parquet(path)
            unioned = existing.unionByName(new_rows, allowMissingColumns=True)
        else:
            unioned = new_rows
        merged = last_write_wins(unioned, id_col, version_col)
    tmp = path + "__staging"
    merged.write.mode("overwrite").parquet(tmp)
    final = merged.sparkSession.read.parquet(tmp)
    final.write.mode("overwrite").parquet(path)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path)
