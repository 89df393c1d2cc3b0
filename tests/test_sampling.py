"""Deterministic sampling / split assignment (training-pipeline ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bob_vector_db_spark.operators import sampling
from bob_vector_db_spark.sources import load_table


def test_hash_sample_is_stable_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", 0.1).collect()}
    b = {r["doc_id"] for r in
         sampling.hash_sample(docs.repartition(7), "doc_id", 0.1).collect()}
    assert a == b and len(a) > 0


def test_salts_decorrelate_samples(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s1 = {r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", 0.2, "a").collect()}
    s2 = {r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", 0.2, "b").collect()}
    assert s1 != s2  # independent draws


def test_split_partitions_everything_once(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = docs.select("doc_id", sampling.assign_split(F.col("doc_id")).alias("split"))
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    # ~80/10/10 within generous tolerance at sf0.001 (500 docs)
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_stratified_sample_exact_quota_and_determinism(spark):
    from bob_vector_db_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(60)] + [(1000, "tiny")],
        "id long, grp string")
    out = stratified_sample(df, "grp", "id", 7)
    counts = {r["grp"]: r["n"] for r in
              out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"g0": 7, "g1": 7, "g2": 7, "tiny": 1}
    # deterministic across repartitioned layouts
    a = sorted(r["id"] for r in out.collect())
    b = sorted(r["id"] for r in
               stratified_sample(df.repartition(13), "grp", "id", 7).collect())
    assert a == b


def test_pack_token_shards_matches_global_cumsum(spark):
    import pytest

    from bob_vector_db_spark.operators.sampling import pack_token_shards

    rows = [(i, (i * 7) % 13 + 1) for i in range(200)]
    # sprinkle NULLs (count 0) and scramble partitioning
    rows[5] = (5, None)
    df = spark.createDataFrame(rows, "id long, n long").repartition(7)
    out = {r["id"]: r["shard"] for r in
           pack_token_shards(df, "id", "n", budget=25, n_ranges=9).collect()}
    cum = 0
    for i, n in sorted(rows):
        assert out[i] == cum // 25, (i, out[i], cum)
        cum += n or 0
    # shards are contiguous and gap-free
    shards = [out[i] for i, _ in sorted(rows)]
    assert shards == sorted(shards) and shards[0] == 0
    assert set(shards) == set(range(max(shards) + 1))
    with pytest.raises(ValueError, match="non-negative"):
        pack_token_shards(spark.createDataFrame([(-1, 5)], "id long, n long"),
                          "id", "n", budget=10)
    empty = pack_token_shards(
        spark.createDataFrame([], "id long, n long"), "id", "n", budget=10)
    assert empty.count() == 0 and "shard" in empty.columns
