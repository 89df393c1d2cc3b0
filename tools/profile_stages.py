"""Per-stage wall-clock profile of fixture queries (guide §1: measure
first — know WHERE a multi-second fixture spends its time before touching
it).

Monkey-wraps the store/index/dedup entry points with timers, runs each
named query's fn() + count() once in a warm session, and prints the
per-call breakdown.

Usage: python tools/profile_stages.py <query> [query ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bob_vector_db_spark.session import get_spark  # noqa: E402
from bob_vector_db_spark import queries as Q  # noqa: E402

CALLS: list[tuple[str, float]] = []


def _wrap(mod, fn_name: str, label: str | None = None) -> None:
    fn = getattr(mod, fn_name, None)
    if fn is None or getattr(fn, "_profiled", False):
        return
    lab = label or fn_name

    @functools.wraps(fn)
    def timed(*a, **kw):
        t0 = time.time()
        try:
            return fn(*a, **kw)
        finally:
            CALLS.append((lab, time.time() - t0))

    timed._profiled = True
    setattr(mod, fn_name, timed)


def instrument() -> None:
    from bob_vector_db_spark.operators import (  # noqa: PLC0415
        dedup,
        index,
        knn,
        neardup_index,
        payload_index,
        sparse,
        text_search,
        upsert,
    )

    for m, names in (
        (upsert, ["create_collection", "upsert", "delete_points",
                  "delete_by_filter", "update_columns", "update_vectors",
                  "read_rows_for_ids", "compact_collection",
                  "batch_update_points"]),
        (index, ["build_vector_index", "refresh_vector_index",
                 "run_incremental_refresh", "compact_index_masks",
                 "refresh_all_indexes"]),
        (text_search, ["build_text_index", "refresh_text_index",
                       "bm25_topk_indexed"]),
        (sparse, ["build_sparse_index", "refresh_sparse_index",
                  "sparse_search_indexed"]),
        (payload_index, ["build_payload_index", "refresh_payload_index"]),
        (neardup_index, ["build_neardup_index", "refresh_neardup_index",
                         "neardup_pairs_indexed", "neardup_pairs_for_ids",
                         "neardup_pairs_for_frame", "build_simhash_index",
                         "refresh_simhash_index", "simhash_pairs_indexed",
                         "simhash_pairs_for_ids"]),
        (dedup, ["minhash_lsh_pairs", "connected_components",
                 "duplicate_clusters", "minhash_signatures",
                 "substring_dedup", "paragraph_dedup"]),
        (knn, ["search_collection", "knn_join", "knn_join_blocked"]),
    ):
        for n in names:
            _wrap(m, n)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_stages")
    spark.range(1000).selectExpr("sum(id)").collect()  # warmup
    instrument()
    for name in sys.argv[1:]:
        CALLS.clear()
        t0 = time.time()
        df = Q.REGISTRY[name].fn(spark, sf_dir)
        t1 = time.time()
        df.count()
        t2 = time.time()
        print(f"\n== {name}: total {t2 - t0:.3f}s "
              f"(build {t1 - t0:.3f}s / count {t2 - t1:.3f}s)")
        for lab, dt in CALLS:
            print(f"   {dt:7.3f}s  {lab}")
        accounted = sum(dt for _, dt in CALLS)
        print(f"   {accounted:7.3f}s  [sum of wrapped calls; "
              f"overlaps nest]")
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
