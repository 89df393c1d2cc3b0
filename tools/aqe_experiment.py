"""A/B the AQE partition-coalescing knobs (guide §2.2/§9) on a query
subset: default (parallelismFirst=true, advisory 64m) vs the guide's
production baseline (parallelismFirst=false, advisory 256m).

One Spark session per variant (the knobs are session-wide), same warmup,
min-of-2 per query.  Usage: python tools/aqe_experiment.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SET = [
    "knn_cosine_topk", "a1_pricing_summary", "j1_customer_revenue",
    "x3_hash_embed_tf", "w1_top3_orders_per_priority",
    "dedup_exact_groups", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "a7_salted_event_stats", "text_bm25_search", "pipe_chunk_documents",
    "pipe_gopher_rules",
]


def run_variant(extra: dict, names: list[str]) -> dict:
    from bob_vector_db_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark("aqe_ab", extra_conf=extra)
    spark.range(1000).selectExpr("sum(id)").collect()
    from bob_vector_db_spark import queries as Q  # noqa: PLC0415

    out = {}
    for name in names:
        best = None
        for _ in range(2):
            t0 = time.time()
            df = Q.REGISTRY[name].fn(spark, os.environ.get(
                "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
            df.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
    spark.stop()
    return out


def main() -> int:
    names = sys.argv[1:] or DEFAULT_SET
    a = run_variant({}, names)
    b = run_variant({
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256m",
    }, names)
    print(f"{'query':40s} {'default':>9s} {'coalesce':>9s} {'ratio':>6s}")
    for n in names:
        ratio = b[n] / a[n] if a[n] else float("inf")
        print(f"{n:40s} {a[n]:9.3f} {b[n]:9.3f} {ratio:6.2f}")
    ta, tb = sum(a.values()), sum(b.values())
    print(f"{'TOTAL':40s} {ta:9.3f} {tb:9.3f} "
          f"{tb / ta if ta else float('inf'):6.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
