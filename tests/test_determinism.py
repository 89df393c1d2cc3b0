"""Partition-count invariance: registry queries must return identical
results whatever `spark.sql.shuffle.partitions` is — the knob that changes
most between a laptop and a 1000-executor cluster.  Catches hidden
partition-layout dependence (the r2/r3 salted_agg bug class) across the
operator families most at risk: salted aggregation, grouped-map centroids,
LSH banding, kNN ranking, BM25 scoring, hash sampling.
"""

from __future__ import annotations

import pytest

from bob_vector_db_spark.queries import REGISTRY

SWEEP = [
    "a7_salted_event_stats",
    "x4_centroids_applyinpandas",
    "dedup_minhash_lsh",
    "knn_cosine_topk",
    "text_bm25_search",
    "pipe_hash_sample",
    "pipe_chunk_documents",
]


@pytest.mark.parametrize("name", SWEEP)
def test_result_invariant_under_shuffle_partitions(spark, sf_dir, name):
    conf = spark.conf
    saved = conf.get("spark.sql.shuffle.partitions")

    def run():
        df = REGISTRY[name].fn(spark, sf_dir)
        return sorted(tuple(r) for r in df.collect())

    try:
        conf.set("spark.sql.shuffle.partitions", "3")
        low = run()
        conf.set("spark.sql.shuffle.partitions", "29")
        high = run()
    finally:
        conf.set("spark.sql.shuffle.partitions", saved)
    assert low == high, f"{name} varies with shuffle partition count"
