"""Qdrant search_matrix wire shapes (round 13): pairs/offsets over the
deterministic md5-ranked sample."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bob_vector_db_spark.operators import upsert
from bob_vector_db_spark.operators.matrix import (
    matrix_offsets,
    matrix_pairs,
    search_matrix_offsets,
    search_matrix_pairs,
)
from bob_vector_db_spark.sources import load_table


def test_offsets_flatten_the_pairs_row_major(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = matrix_pairs(emb, "vec_id", "embedding", sample=8, limit=3)
    offs = matrix_offsets(emb, "vec_id", "embedding",
                          sample=8, limit=3).first()
    ids = list(offs["ids"])
    assert ids == sorted(ids) and len(ids) == 8
    # reconstruct (a_id, b_id, score) from the offset arrays and compare
    rebuilt = sorted(
        (ids[r], ids[c], s)
        for r, c, s in zip(offs["offsets_row"], offs["offsets_col"],
                           offs["scores"]))
    want = sorted((p["a_id"], p["b_id"], p["score"])
                  for p in pairs.collect())
    assert rebuilt == want
    # row-major order: row offsets are non-decreasing
    rows = list(offs["offsets_row"])
    assert rows == sorted(rows)


def test_store_wrappers_scope_filter_and_refuse_sparse(spark, sf_dir,
                                                       tmp_path):
    root = str(tmp_path / "s")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, root, "vecs", n_buckets=4, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding",
                      (F.col("vec_id") % 2).alias("par")),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    from bob_vector_db_spark.operators.filters import Filter, MatchValue

    out = search_matrix_pairs(spark, root, "vecs", sample=6, limit=2,
                              flt=Filter(must=[MatchValue("par", 0)]))
    rows = out.collect()
    assert rows and all(r["a_id"] % 2 == 0 and r["b_id"] % 2 == 0
                        for r in rows)
    offs = search_matrix_offsets(spark, root, "vecs", sample=6,
                                 limit=2).first()
    assert len(offs["ids"]) == 6
    # sparse/multivector spaces refuse
    sp = emb.limit(5).select(
        F.col("vec_id").alias("id"),
        F.array(F.lit(1)).alias("indices"),
        F.array(F.lit(1.0)).alias("values"))
    upsert.create_collection(
        spark, root, "sp", n_buckets=2, id_col="id", df=sp,
        vector_config={"text_sparse": {"kind": "sparse"}})
    with pytest.raises(ValueError, match="DENSE space"):
        search_matrix_pairs(spark, root, "sp", sample=4)
