"""10× scale rehearsal (VERDICT r5 §next #9): generate a ~10× documents/
embeddings fixture locally and drive the store/index stack through one
full lifecycle, watching for driver-side ceilings — mask growth under
churn, candidate caps, probe-list collects, broadcast limits.

Usage: python tools/scale_rehearsal.py [base_sf_dir] [work_dir]
Defaults: /root/testdata/sf0.1 → /tmp/spark_graft_scale10x

Prints one timing line per stage and a final JSON summary; any cap or
guard that trips raises loudly (that is the point of the rehearsal).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bob_vector_db_spark.operators import index, knn, upsert  # noqa: E402
from bob_vector_db_spark.operators.payload_index import (  # noqa: E402
    build_payload_index,
)
from bob_vector_db_spark.operators.query_api import (  # noqa: E402
    count_points,
    search_points,
    search_points_mmr,
    search_text_points,
)
from bob_vector_db_spark.operators.filters import (  # noqa: E402
    Filter,
    MatchAny,
    Range,
)
from bob_vector_db_spark.operators.text_search import (  # noqa: E402
    bm25_topk_indexed,
    build_text_index,
)
from bob_vector_db_spark.session import get_spark  # noqa: E402

# 10x by default; round 10 (VERDICT r9 next #5) pushes to 100x via
# REHEARSAL_COPIES=100 (~500k docs / 600k vectors — fits the sandbox)
COPIES = int(os.environ.get("REHEARSAL_COPIES", "10"))


def _timed(label, timings, fn):
    t0 = time.time()
    out = fn()
    dt = round(time.time() - t0, 2)
    timings[label] = dt
    print(f"  {label:<32s} {dt:>8.2f} s", flush=True)
    return out


def make_fixture(spark, base_sf, work):
    """10 shifted copies of the sf0.1 tables: doc/vec ids offset per copy,
    embeddings perturbed deterministically so copies aren't exact dups."""
    docs = spark.read.parquet(os.path.join(base_sf, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(base_sf, "embeddings.parquet"))
    n_docs = docs.count()
    n_emb = emb.count()
    copies = spark.range(COPIES).select(F.col("id").alias("_k"))
    big_docs = (docs.crossJoin(copies)
                .select((F.col("doc_id") + F.col("_k") * n_docs)
                        .alias("doc_id"),
                        "text", "lang", "source", "n_chars"))
    big_emb = (emb.crossJoin(copies)
               .select((F.col("vec_id") + F.col("_k") * n_emb)
                       .alias("vec_id"),
                       F.transform(
                           "embedding",
                           lambda x, i: x + (F.col("_k") * 0.001)
                           * ((i % 3) - 1)).alias("embedding"),
                       "label"))
    big_docs.write.mode("overwrite").parquet(os.path.join(work, "documents"))
    big_emb.write.mode("overwrite").parquet(os.path.join(work, "embeddings"))
    return n_docs * COPIES, n_emb * COPIES


def main():
    base_sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = (sys.argv[2] if len(sys.argv) > 2
            else f"/tmp/spark_graft_scale{COPIES}x")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    spark = get_spark("scale10x")
    timings: dict[str, float] = {}
    t_all = time.time()

    n_docs, n_emb = _timed("fixture_generate", timings,
                           lambda: make_fixture(spark, base_sf, work))
    print(f"fixture: {n_docs} docs, {n_emb} embeddings")

    store = os.path.join(work, "store")
    emb = spark.read.parquet(os.path.join(work, "embeddings"))
    docs = spark.read.parquet(os.path.join(work, "documents"))

    _timed("create_collection_vecs", timings, lambda: upsert.create_collection(
        spark, store, "vecs", n_buckets=32, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding", "label"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}}))
    _timed("build_ivf_32lists", timings, lambda: index.build_vector_index(
        spark, store, "vecs", kind="ivf", n_lists=32, iters=4))

    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qvec")))
    full = _timed("search_full_probe", timings, lambda: sorted(
        map(tuple, knn.search_collection(
            spark, store, "vecs", q, k=10, corpus_id="id",
            exclude_self=True, use_index="always", n_probe=32).collect())))
    exact = _timed("search_exact_scan", timings, lambda: sorted(
        map(tuple, knn.search_collection(
            spark, store, "vecs", q, k=10, corpus_id="id",
            exclude_self=True, use_index=False).collect())))
    assert full == exact, "full-probe indexed search diverged from exact"
    probe = _timed("search_probe4", timings, lambda: index.search_indexed(
        spark, store, "vecs", q, k=10, n_probe=4, exclude_self=True).count())
    assert probe == 50, probe

    # churn: 3 cycles of upsert+delete+refresh — the mask path under load
    for cyc in range(3):
        lo = cyc * 700
        patch = (emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 500))
                 .select(F.col("vec_id").alias("id"),
                         F.transform("embedding", lambda x: x * 1.01)
                         .alias("embedding"), "label"))
        _timed(f"churn{cyc}_upsert500", timings,
               lambda p=patch: upsert.upsert(spark, store, "vecs", p))
        _timed(f"churn{cyc}_delete200", timings,
               lambda c=cyc: upsert.delete_points(
                   spark, store, "vecs",
                   list(range(15000 + c * 200, 15000 + (c + 1) * 200))))
        _timed(f"churn{cyc}_refresh", timings,
               lambda: index.refresh_all_indexes(spark, store, "vecs"))
    full2 = sorted(map(tuple, knn.search_collection(
        spark, store, "vecs", q, k=10, corpus_id="id",
        exclude_self=True, use_index="always", n_probe=32).collect()))
    exact2 = sorted(map(tuple, knn.search_collection(
        spark, store, "vecs", q, k=10, corpus_id="id",
        exclude_self=True, use_index=False).collect()))
    assert full2 == exact2, "post-churn indexed search diverged from exact"
    print("  post-churn indexed == exact   OK")

    _timed("build_payload_index", timings, lambda: build_payload_index(
        spark, store, "vecs", "label", n_val_buckets=16))
    flt = Filter(must=[MatchAny("label", [2, 5])])
    n_f = _timed("filtered_count_indexed", timings, lambda: count_points(
        spark, store, "vecs", flt=flt, use_payload_index="always"))
    n_s = _timed("filtered_search_indexed", timings, lambda: search_points(
        spark, store, "vecs", q, flt=flt, k=10,
        use_payload_index="always").count())
    print(f"  filtered: {n_f} candidates, {n_s} result rows")

    # round-7: the COMPOSED plan — payload-index candidate ids semi-joined
    # INSIDE the probed lists of the stored IVF artifact; at full probe the
    # composition must equal the exact filtered search even at 10x
    def _key(df):
        return sorted(map(tuple,
                          df.select("qid", "vec_id", "rank").collect()))
    comp = _timed("filtered_indexed_composed", timings, lambda: _key(
        search_points(spark, store, "vecs", q, flt=flt, k=10,
                      use_index="always", n_probe=None,
                      use_payload_index="always")))
    ex_f = _key(search_points(spark, store, "vecs", q, flt=flt, k=10,
                              use_index=False))
    assert comp == ex_f, "composed filtered search diverged from exact"
    print("  composed filtered == exact    OK")
    n_mmr = _timed("mmr_pool_bucket_fetch", timings, lambda: search_points_mmr(
        spark, store, "vecs", q, k=5, pool=30).count())
    assert n_mmr == 25, n_mmr

    # round-8: the typed RANGE index at 10x — a Range-ONLY filter resolves
    # to candidate ids (round 7 full-scanned here) and composes with the
    # IVF artifact; at full probe composed == exact even at 10x.  The
    # label index REBUILDS as a range layout (one index per column — a
    # type change is a rebuild, the Qdrant model).
    _timed("build_range_index", timings, lambda: build_payload_index(
        spark, store, "vecs", "label", n_val_buckets=32,
        index_type="range"))
    rflt = Filter(must=[Range("label", gte=2, lte=5)])
    n_r = _timed("range_count_indexed", timings, lambda: count_points(
        spark, store, "vecs", flt=rflt, use_payload_index="always"))
    n_rs = _timed("range_count_scan", timings, lambda: count_points(
        spark, store, "vecs", flt=rflt, use_payload_index=False))
    assert n_r == n_rs, (n_r, n_rs)
    comp_r = _timed("range_indexed_composed", timings, lambda: _key(
        search_points(spark, store, "vecs", q, flt=rflt, k=10,
                      use_index="always", n_probe=None,
                      use_payload_index="always")))
    ex_r = _key(search_points(spark, store, "vecs", q, flt=rflt, k=10,
                              use_index=False, use_payload_index=False))
    assert comp_r == ex_r, "composed range-driven search diverged from exact"
    print(f"  range index: {n_r} candidates, composed == exact OK")

    _timed("create_collection_docs", timings, lambda: upsert.create_collection(
        spark, store, "docs", n_buckets=32, id_col="id",
        df=docs.select(F.col("doc_id").alias("id"), "text", "lang")))
    _timed("build_bm25_50k_docs", timings, lambda: build_text_index(
        spark, store, "docs", text_col="text", n_term_buckets=32))
    top = _timed("bm25_query", timings, lambda: bm25_topk_indexed(
        spark, store, "docs", ["vector", "join", "stream"], k=10,
        text_col="text").count())
    assert top == 10, top
    # round-7: filtered BM25 at 10x — lang candidates from the payload
    # index semi-join the probed term buckets, IDF stays corpus-global
    _timed("build_docs_lang_index", timings, lambda: build_payload_index(
        spark, store, "docs", "lang", n_val_buckets=8))
    t_f = _timed("bm25_filtered_composed", timings,
                 lambda: search_text_points(
                     spark, store, "docs", ["vector", "join", "stream"],
                     flt=Filter(must=[MatchAny("lang", ["en", "de"])]),
                     k=10, text_col="text",
                     use_payload_index="always").count())
    assert t_f == 10, t_f

    # round-8: the sparse IDF modifier at 10x — a declared-idf sparse
    # space over hashed-TF postings of the 50k docs; N persists in the
    # index meta, per-dim df aggregates over the probed buckets only
    from bob_vector_db_spark.operators.sparse import (  # noqa: PLC0415
        build_sparse_index,
        postings_from_text,
        refresh_sparse_index,
        sparse_search_indexed,
    )

    spost = postings_from_text(docs, id_col="doc_id", text_col="text",
                               vocab_size=4096)
    spts = (spost.groupBy("id")
            .agg(F.array_sort(F.collect_list(F.struct("idx", "val")))
                 .alias("z"))
            .select("id", F.col("z.idx").alias("indices"),
                    F.col("z.val").alias("values")))
    _timed("create_sparse_idf_collection", timings,
           lambda: upsert.create_collection(
               spark, store, "sdocs", df=spts, id_col="id", n_buckets=32,
               vector_config={"text_sparse": {"kind": "sparse",
                                              "modifier": "idf"}}))
    im_s = _timed("build_sparse_idf_index", timings,
                  lambda: build_sparse_index(spark, store, "sdocs",
                                             n_dim_buckets=32))
    assert im_s["n_points"] == n_docs, im_s["n_points"]
    sq = spost.filter(F.col("id") < 3)
    n_idf = _timed("sparse_idf_search", timings, lambda: sparse_search_indexed(
        spark, store, "sdocs", sq, k=10, exclude_self=True).count())
    assert n_idf == 30, n_idf
    _timed("sparse_idf_churn_delete", timings, lambda: upsert.delete_points(
        spark, store, "sdocs",
        spark.range(0, n_docs, 7).select(F.col("id"))))
    im_s2 = _timed("sparse_idf_refresh", timings,
                   lambda: refresh_sparse_index(spark, store, "sdocs"))
    assert im_s2["n_points"] == n_docs - (n_docs + 6) // 7, im_s2["n_points"]

    # round-8: full-text + geo payload indexes at 10x — MatchText
    # resolves from token postings, a GeoRadius from cell postings (the
    # exact leaf residual on the pruned fetch)
    from bob_vector_db_spark.operators.filters import (  # noqa: PLC0415
        GeoRadius,
        MatchText,
    )

    _timed("build_text_payload_index", timings, lambda: build_payload_index(
        spark, store, "docs", "text", n_val_buckets=32, index_type="text"))
    mt = Filter(must=[MatchText("text", "vector stream")])
    n_mt = _timed("match_text_indexed_count", timings, lambda: count_points(
        spark, store, "docs", flt=mt, use_payload_index="always"))
    n_mts = count_points(spark, store, "docs", flt=mt,
                         use_payload_index=False)
    assert n_mt == n_mts, (n_mt, n_mts)
    geo = docs.select(F.col("doc_id").alias("id"),
                      ((F.col("doc_id") % 1000) / 10.0 - 40.0).alias("lat"),
                      (((F.col("doc_id") * 13) % 2000) / 10.0 - 100.0)
                      .alias("lon"))
    _timed("create_geo_collection", timings, lambda: upsert.create_collection(
        spark, store, "geo", df=geo, id_col="id", n_buckets=32))
    _timed("build_geo_index", timings, lambda: build_payload_index(
        spark, store, "geo", "lat", index_type="geo", lon_column="lon",
        cell_deg=2.0, n_val_buckets=32))
    gflt = Filter(must=[GeoRadius("lat", "lon", 10.0, 0.0, 800_000.0)])
    n_g = _timed("geo_indexed_count", timings, lambda: count_points(
        spark, store, "geo", flt=gflt, use_payload_index="always"))
    n_gs = count_points(spark, store, "geo", flt=gflt,
                        use_payload_index=False)
    assert n_g == n_gs and n_g > 0, (n_g, n_gs)

    # round-8: HasId candidate route + retrieve at 10x — literal ids,
    # no index, bucket-pruned fetch only
    from bob_vector_db_spark.operators.filters import HasId  # noqa: PLC0415
    from bob_vector_db_spark.operators.query_api import (  # noqa: PLC0415
        retrieve_points,
    )

    hid = list(range(0, n_docs, 50))
    n_h = _timed("hasid_count", timings, lambda: count_points(
        spark, store, "docs", flt=Filter(must=[HasId(hid)]),
        use_payload_index="always"))
    assert n_h == len(hid), n_h
    n_rt = _timed("retrieve_1k_points", timings, lambda: retrieve_points(
        spark, store, "docs", hid[:1000]).count())
    assert n_rt == min(1000, len(hid)), n_rt

    # round-10b surfaces: recommend strategies / groups and discover —
    # broadcast-example scans + group windows; nothing here may collect
    # more than |examples| rows driver-side at any corpus size
    from bob_vector_db_spark.operators.query_api import (  # noqa: PLC0415
        discover_points,
        recommend_groups,
        recommend_points,
    )
    rec = _timed("recommend_best_score", timings, lambda: recommend_points(
        spark, store, "vecs", positive=[100, 101], negative=[102],
        strategy="best_score", k=10).orderBy("rank").collect())
    assert len(rec) == 10 and rec[0]["score"] >= rec[-1]["score"]
    _timed("recommend_sum_scores", timings, lambda: recommend_points(
        spark, store, "vecs", positive=[100, 101], negative=[102],
        strategy="sum_scores", k=10).count())
    grp = _timed("recommend_groups_bestscore", timings,
                 lambda: recommend_groups(
                     spark, store, "vecs", positive=[100, 101],
                     negative=[102], strategy="best_score",
                     group_by="label", k_groups=10,
                     group_size=3).collect())
    # exactness tie between the grouped and flat surfaces: the flat
    # rank-1 point must lead its own group with the same score, and the
    # group_rank-1 group's best must equal the flat best (not asserting
    # WHICH group ranks 1 — two groups tying at the same round-6 best
    # legitimately order by group value)
    top = rec[0]
    g_top = [r for r in grp if r["vec_id"] == top["vec_id"]]
    assert g_top and g_top[0]["rank_in_group"] == 1 \
        and g_top[0]["score"] == top["score"], (top, g_top)
    best_r1 = max(r["score"] for r in grp if r["group_rank"] == 1)
    assert best_r1 == top["score"], (best_r1, top)
    # discover with an empty context IS the exact target kNN (ctx_wins 0
    # for every point) — tie it to the exact scan, excluding the target
    disc = _timed("discover_empty_context_exact", timings,
                  lambda: sorted((r["vec_id"], r["sim"])
                                 for r in discover_points(
                                     spark, store, "vecs", target=100,
                                     context=[], k=10).collect()))
    q1 = (emb.filter(F.col("vec_id") == 100)
          .select(F.col("vec_id").alias("qid"),
                  F.col("embedding").alias("qvec")))
    exact1 = sorted((r["vec_id"], r["sim"]) for r in knn.search_collection(
        spark, store, "vecs", q1, k=10, corpus_id="id",
        exclude_self=True, use_index=False).collect())
    assert disc == exact1, "discover(empty context) diverged from exact kNN"
    n_disc = _timed("discover_2pairs", timings, lambda: discover_points(
        spark, store, "vecs", target=100,
        context=[(100, 102), (101, 102)], k=10).count())
    assert n_disc == 10, n_disc
    # round-11: the remaining recommend strategy + context at scale —
    # average_vector is ONE plain kNN by the synthetic mean vector;
    # context is the same broadcast-pair scan as discover with the
    # min(0, ·) fold — neither may collect more than |examples| rows
    from bob_vector_db_spark.operators.query_api import (  # noqa: PLC0415
        context_points,
    )
    n_avg = _timed("recommend_average_vector", timings,
                   lambda: recommend_points(
                       spark, store, "vecs", positive=[100, 101],
                       negative=[102], strategy="average_vector",
                       k=10).count())
    assert n_avg == 10, n_avg
    n_ctx = _timed("context_2pairs", timings, lambda: context_points(
        spark, store, "vecs", context=[(100, 102), (101, 102)],
        k=10).count())
    assert n_ctx == 10, n_ctx

    _timed("compact_vecs", timings, lambda: upsert.compact_collection(
        spark, store, "vecs"))

    # round-6 paths at 10x: scalar-quantized index + multitenant layout
    _timed("build_ivf_sq_32lists", timings, lambda: index.build_vector_index(
        spark, store, "vecs", kind="ivf_sq", n_lists=32, iters=3))
    n_sq = _timed("search_sq_probe4", timings, lambda: index.search_indexed(
        spark, store, "vecs", q, k=10, n_probe=4, exclude_self=True).count())
    assert n_sq == 50, n_sq

    pts = (emb.select(F.col("vec_id").alias("id"), "embedding",
                      F.concat(F.lit("t"), (F.col("label") % 5)
                               .cast("string")).alias("tenant")))
    _timed("create_tenant_collection", timings, lambda: upsert.create_collection(
        spark, store, "mt", df=pts, id_col="id", n_buckets=16,
        tenant_col="tenant",
        vector_config={"embedding": {"size": 64, "distance": "cosine"}}))
    n_t = _timed("tenant_scoped_scan_search", timings, lambda: knn.search_collection(
        spark, store, "mt", q, k=10, corpus_id="id", exclude_self=True,
        tenant="t1").count())
    assert n_t == 50, n_t
    _timed("build_tenant_index", timings, lambda: index.build_vector_index(
        spark, store, "mt", kind="ivf", n_lists=8, iters=3, tenant="t1"))
    t_idx = _timed("tenant_indexed_search", timings, lambda: sorted(
        map(tuple, knn.search_collection(
            spark, store, "mt", q, k=10, corpus_id="id", exclude_self=True,
            tenant="t1", use_index="always", n_probe=8).collect())))
    t_exact = sorted(map(tuple, knn.search_collection(
        spark, store, "mt", q, k=10, corpus_id="id", exclude_self=True,
        tenant="t1", use_index=False).collect()))
    assert t_idx == t_exact, "tenant indexed search diverged from exact"
    print("  tenant indexed == exact       OK")

    # round-7: multivector max-sim scan and a bulk DataFrame-form delete
    # (the un-forced broadcast path — AQE must degrade to a shuffle join,
    # not OOM, when the doomed frame is 30k ids)
    mv_pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice("embedding", 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"))
    _timed("create_multivector_collection", timings,
           lambda: upsert.create_collection(
               spark, store, "mv", df=mv_pts, id_col="id", n_buckets=32,
               vector_config={"colbert": {"size": 16, "distance": "dot",
                                          "multivector": "max_sim"}}))
    q_mv = (mv_pts.filter(F.col("id") < 5)
            .select(F.col("id").alias("qid"),
                    F.col("colbert").alias("qvecs")))
    # the exact scan now BLAS-dispatches (vectorized='auto', integral
    # ids); time the expression form too — the ratio is the round-8
    # dispatch win (the r7 gap this closes)
    n_mv = _timed("maxsim_scan_blas_auto", timings,
                  lambda: knn.search_collection(
                      spark, store, "mv", q_mv, k=10, corpus_id="id",
                      query_vec="qvecs", exclude_self=True,
                      use_index=False).count())
    assert n_mv == 50, n_mv
    n_mv_e = _timed("maxsim_scan_expr_form", timings,
                    lambda: knn.search_collection(
                        spark, store, "mv", q_mv, k=10, corpus_id="id",
                        query_vec="qvecs", exclude_self=True,
                        use_index=False, vectorized=False).count())
    assert n_mv_e == 50, n_mv_e

    # round-8: the ivf_mv artifact at 10x — probed multivector search
    # (static list pruning + pooled candidate ranking + bucket-pruned
    # max-sim rescore), recall sanity vs the exact scan, and an
    # incremental refresh absorbing churn
    _timed("build_ivf_mv_32lists", timings, lambda: index.build_vector_index(
        spark, store, "mv", kind="ivf_mv", n_lists=32, iters=3))
    mv_probe = _timed("ivf_mv_probe4", timings, lambda: {
        (r["qid"], r["vec_id"])
        for r in index.search_indexed(spark, store, "mv", q_mv, k=10,
                                      n_probe=4, query_vec="qvecs",
                                      exclude_self=True).collect()})
    mv_exact = {(r["qid"], r["vec_id"]) for r in knn.search_collection(
        spark, store, "mv", q_mv, k=10, corpus_id="id",
        query_vec="qvecs", exclude_self=True, use_index=False).collect()}
    recall = len(mv_probe & mv_exact) / len(mv_exact)
    # the FIXED 4-of-32-lists probe legitimately recalls less as the
    # corpus multiplies into the same 32 lists (100x: ~600k points);
    # exactness lives in the full-probe covering stages — this assert
    # only guards a BROKEN probe, so the floor scales with COPIES
    min_recall = 0.4 if COPIES <= 10 else 0.05
    assert recall >= min_recall, recall
    print(f"  ivf_mv probe4 recall vs exact: {recall:.2f}")
    mv_patch = mv_pts.filter(F.col("id") < 300).select(
        (F.col("id") + 200_000).alias("id"), "colbert")
    _timed("ivf_mv_churn_upsert", timings,
           lambda: upsert.upsert(spark, store, "mv", mv_patch))
    _timed("ivf_mv_refresh", timings,
           lambda: index.refresh_all_indexes(spark, store, "mv"))
    n_mv2 = index.search_indexed(spark, store, "mv", q_mv, k=10,
                                 n_probe=32, query_vec="qvecs",
                                 exclude_self=True).count()
    assert n_mv2 == 50, n_mv2
    doomed = spark.range(0, n_docs, 2).select(F.col("id"))
    n_del = _timed("bulk_dataframe_delete", timings,
                   lambda: upsert.delete_points(spark, store, "docs", doomed))
    assert n_del == (n_docs + 1) // 2, n_del

    # round-9: the QUANTIZED multivector artifact at 10x — int8 pooled
    # codes, dequantized coarse stage, exact max-sim rescore; full probe
    # + covering rerank == the exact scan even on the churned store
    _timed("build_ivf_mv_sq_32lists", timings,
           lambda: index.build_vector_index(
               spark, store, "mv", kind="ivf_mv_sq", n_lists=32, iters=3))
    # rerank_factor*k ≥ the mv corpus (n_emb + the 300 churn adds) —
    # the exactness claim needs a genuinely COVERING rerank at scale,
    # not just a generous one
    rr_cover = -(-(n_emb + 300) // 10) + 10
    mvsq_full = _timed("ivf_mv_sq_full_probe_covering", timings,
                       lambda: sorted(map(tuple, index.search_indexed(
                           spark, store, "mv", q_mv, k=10, n_probe=None,
                           query_vec="qvecs", rerank_factor=rr_cover,
                           exclude_self=True)
                           .select("qid", "vec_id", "sim", "rank")
                           .collect())))
    mvsq_exact = sorted(map(tuple, knn.search_collection(
        spark, store, "mv", q_mv, k=10, corpus_id="id",
        query_vec="qvecs", exclude_self=True, use_index=False,
        vectorized=False).select("qid", "vec_id", "sim", "rank")
        .collect()))
    assert mvsq_full == mvsq_exact, \
        "ivf_mv_sq full probe diverged from exact"
    print("  ivf_mv_sq full probe == exact OK")
    _timed("build_ivf_mv_pq_32lists", timings,
           lambda: index.build_vector_index(
               spark, store, "mv", kind="ivf_mv_pq", n_lists=32, m=8,
               ksub=32, iters=3))
    # the exactness claim needs a genuinely COVERING rerank (ADC ranks
    # by euclid code-space, the metric is dot — only keeping EVERY
    # candidate makes code error unable to drop a true neighbor):
    # rerank_factor*k must exceed the churned mv corpus
    mvpq_full = _timed("ivf_mv_pq_full_probe_covering", timings,
                       lambda: sorted(map(tuple, index.search_indexed(
                           spark, store, "mv", q_mv, k=10, n_probe=None,
                           query_vec="qvecs", rerank_factor=rr_cover,
                           exclude_self=True)
                           .select("qid", "vec_id", "sim", "rank")
                           .collect())))
    assert mvpq_full == mvsq_exact, \
        "ivf_mv_pq covering rerank diverged from exact"
    print("  ivf_mv_pq covering == exact   OK")
    n_pq4 = _timed("ivf_mv_pq_probe4", timings, lambda: index.search_indexed(
        spark, store, "mv", q_mv, k=10, n_probe=4, query_vec="qvecs",
        exclude_self=True).count())
    assert n_pq4 == 50, n_pq4

    # round-9: formula rescoring over stored prefetch branches at 10x —
    # two k-row branches fused, payload fetched bucket-pruned, the
    # compiled scalar pure codegen; sanity = deterministic shape + the
    # boost actually reorders
    from bob_vector_db_spark.operators.formula import (  # noqa: PLC0415
        formula_rescore,
    )

    br1 = index.search_indexed(spark, store, "vecs", q, k=20, n_probe=4,
                               exclude_self=True).select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("sim").alias("score"), "qid")
    br1 = br1.filter(F.col("qid") == 0).drop("qid")
    br2 = br1.select("id", (F.col("score") * 0.5).alias("score"))
    fx = {"sum": ["$score[0]",
                  {"mult": [0.25, {"div": {"left": "label", "right": 10.0,
                                           "by_zero_default": 0.0}}]},
                  {"gauss_decay": {"x": "label", "target": 2.0,
                                   "scale": 3.0}}]}
    n_fx = _timed("formula_rescore_2branch", timings,
                  lambda: formula_rescore(
                      spark, store, "vecs", [br1, br2], fx, k=10).count())
    assert n_fx == 10, n_fx

    # round-9: MatchPhrase through POSITIONAL postings + prefix
    # tokenizer + word tokenizer at 10x, each indexed count == scan
    # count; then the keyset-over-range-index scroll opens a page from
    # the value-ordered postings.  The docs store churned (bulk delete)
    # since its text index was built — the rebuild doubles as the
    # phrase_matching upgrade.
    from bob_vector_db_spark.operators.filters import (  # noqa: PLC0415
        MatchPhrase,
        MatchTextPrefix,
    )
    from bob_vector_db_spark.operators.payload_index import (  # noqa: PLC0415
        range_ordered_page,
    )
    from bob_vector_db_spark.operators.query_api import (  # noqa: PLC0415
        scroll_points,
    )

    _timed("build_phrase_index", timings, lambda: build_payload_index(
        spark, store, "docs", "text", n_val_buckets=32, index_type="text",
        phrase_matching=True))
    ph = Filter(must=[MatchPhrase("text", "merge join")])
    n_ph = _timed("match_phrase_indexed_count", timings,
                  lambda: count_points(spark, store, "docs", flt=ph,
                                       use_payload_index="always"))
    n_phs = count_points(spark, store, "docs", flt=ph,
                         use_payload_index=False)
    assert n_ph == n_phs, (n_ph, n_phs)
    print(f"  phrase index: {n_ph} docs, indexed == scan OK")
    _timed("build_prefix_index", timings, lambda: build_payload_index(
        spark, store, "docs", "text", n_val_buckets=32, index_type="text",
        tokenizer="prefix", max_token_len=12))
    pf = Filter(must=[MatchTextPrefix("text", "vec str")])
    n_pf = _timed("prefix_indexed_count", timings,
                  lambda: count_points(spark, store, "docs", flt=pf,
                                       use_payload_index="always"))
    n_pfs = count_points(spark, store, "docs", flt=pf,
                         use_payload_index=False)
    assert n_pf == n_pfs, (n_pf, n_pfs)
    # round-10 growth control: the prefix layout stores FULL tokens (one
    # row per distinct (id, token)) — report the posting rows that used
    # to be the 6x explosion
    from bob_vector_db_spark.operators.payload_index import (  # noqa: PLC0415
        index_path as _pidx_path,
    )

    n_post = spark.read.parquet(os.path.join(
        _pidx_path(store, "docs", "text__payload"), "postings")).count()
    timings["prefix_posting_rows"] = n_post
    print(f"  prefix postings rows: {n_post} (full-token layout)")

    # round-10: stopwords + stemmer params at scale — indexed counts ==
    # scan counts for a stemmed MatchText and a stopworded+stemmed
    # phrase, through the one replace-chain pipeline on both paths
    _timed("build_stop_stem_index", timings, lambda: build_payload_index(
        spark, store, "docs", "text", n_val_buckets=32, index_type="text",
        phrase_matching=True, stopwords="english", stemmer="english"))
    ss = Filter(must=[MatchText("text", "queries tables",
                                stopwords="english", stemmer="english")])
    n_ss = _timed("stemmed_text_indexed_count", timings,
                  lambda: count_points(spark, store, "docs", flt=ss,
                                       use_payload_index="always"))
    n_sss = count_points(spark, store, "docs", flt=ss,
                         use_payload_index=False)
    assert n_ss == n_sss and n_ss > 0, (n_ss, n_sss)
    ph2 = Filter(must=[MatchPhrase("text", "the data table",
                                   stopwords="english",
                                   stemmer="english")])
    n_ph2 = _timed("stopword_phrase_indexed_count", timings,
                   lambda: count_points(spark, store, "docs", flt=ph2,
                                        use_payload_index="always"))
    n_ph2s = count_points(spark, store, "docs", flt=ph2,
                          use_payload_index=False)
    assert n_ph2 == n_ph2s, (n_ph2, n_ph2s)
    print(f"  stop/stem index: {n_ss} stemmed, {n_ph2} phrase — "
          f"indexed == scan OK")

    # keyset-over-range-index scroll: n_chars range index on the (big)
    # docs collection, a mid-collection page from the bucket window
    docs2 = docs.select(F.col("doc_id").alias("id"),
                        F.col("n_chars").cast("long").alias("n_chars"))
    _timed("create_scroll_collection", timings,
           lambda: upsert.create_collection(spark, store, "sdocs2",
                                            df=docs2, id_col="id",
                                            n_buckets=32))
    _timed("build_nchars_range_index", timings, lambda: build_payload_index(
        spark, store, "sdocs2", "n_chars", n_val_buckets=32,
        index_type="range"))
    probe_ids = _timed("range_ordered_page_probe", timings,
                       lambda: range_ordered_page(
                           spark, store, "sdocs2", "n_chars", 50,
                           start_from=300, id_type="long"))
    assert probe_ids is not None and probe_ids.count() == 50
    page = _timed("scroll_via_range_index", timings, lambda: scroll_points(
        spark, store, "sdocs2", order_by="n_chars", start_from=300,
        limit=50).collect())
    scan_page = scroll_points(spark, store, "sdocs2", order_by="n_chars",
                              start_from=300, limit=50,
                              use_payload_index=False).collect()
    assert [(r["n_chars"], r["id"]) for r in page] == \
        [(r["n_chars"], r["id"]) for r in scan_page]
    print("  range-ordered scroll page == scan page OK")

    # round-10: the BINARY-quantization artifacts at scale — packed sign
    # words clustered by list; full probe + covering rerank == exact on
    # the churned store, probe stays pruned, refresh packs deltas with
    # the STORED dim
    _timed("build_ivf_bq_32lists", timings, lambda: index.build_vector_index(
        spark, store, "vecs", kind="ivf_bq", n_lists=32, iters=3))
    bq_full = _timed("ivf_bq_full_probe_covering", timings, lambda: sorted(
        map(tuple, index.search_indexed(
            spark, store, "vecs", q, k=10, n_probe=None,
            rerank_factor=rr_cover, exclude_self=True)
            .select("qid", "vec_id", "sim", "rank").collect())))
    bq_exact = sorted(map(tuple, knn.search_collection(
        spark, store, "vecs", q, k=10, corpus_id="id", exclude_self=True,
        use_index=False).select("qid", "vec_id", "sim", "rank").collect()))
    assert bq_full == bq_exact, "ivf_bq full probe diverged from exact"
    print("  ivf_bq full probe == exact    OK")
    n_bq4 = _timed("ivf_bq_probe4", timings, lambda: index.search_indexed(
        spark, store, "vecs", q, k=10, n_probe=4, rerank_factor=20,
        exclude_self=True).count())
    assert n_bq4 == 50, n_bq4
    bq_patch = (emb.filter(F.col("vec_id") < 200)
                .select(F.col("vec_id").alias("id"),
                        F.transform("embedding", lambda x: -x)
                        .alias("embedding"), "label"))
    _timed("ivf_bq_churn_upsert", timings,
           lambda: upsert.upsert(spark, store, "vecs", bq_patch))
    _timed("ivf_bq_refresh", timings,
           lambda: index.refresh_all_indexes(spark, store, "vecs"))
    bq_full2 = sorted(map(tuple, index.search_indexed(
        spark, store, "vecs", q, k=10, n_probe=None,
        rerank_factor=rr_cover, exclude_self=True)
        .select("qid", "vec_id", "sim", "rank").collect()))
    bq_exact2 = sorted(map(tuple, knn.search_collection(
        spark, store, "vecs", q, k=10, corpus_id="id", exclude_self=True,
        use_index=False).select("qid", "vec_id", "sim", "rank").collect()))
    assert bq_full2 == bq_exact2, "post-refresh ivf_bq diverged from exact"
    print("  post-refresh ivf_bq == exact  OK")

    _timed("build_ivf_mv_bq_32lists", timings,
           lambda: index.build_vector_index(
               spark, store, "mv", kind="ivf_mv_bq", n_lists=32, iters=3))
    mvbq_full = _timed("ivf_mv_bq_full_probe_covering", timings,
                       lambda: sorted(map(tuple, index.search_indexed(
                           spark, store, "mv", q_mv, k=10, n_probe=None,
                           query_vec="qvecs", rerank_factor=rr_cover,
                           exclude_self=True)
                           .select("qid", "vec_id", "sim", "rank")
                           .collect())))
    assert mvbq_full == mvsq_exact, \
        "ivf_mv_bq covering rerank diverged from exact"
    print("  ivf_mv_bq covering == exact   OK")

    # round-10: the manhattan metric at scale — declared-space scan and
    # the ivf artifact at full probe both equal the L1 brute ranking
    _timed("create_manhattan_collection", timings,
           lambda: upsert.create_collection(
               spark, store, "l1", n_buckets=32, id_col="id",
               df=emb.select(F.col("vec_id").alias("id"), "embedding"),
               vector_config={"embedding": {"size": 64,
                                            "distance": "manhattan"}}))
    l1_exact = _timed("manhattan_scan_search", timings, lambda: sorted(
        map(tuple, knn.search_collection(
            spark, store, "l1", q, k=10, corpus_id="id",
            exclude_self=True, use_index=False).collect())))
    assert len(l1_exact) == 50, len(l1_exact)
    _timed("build_l1_ivf_32lists", timings, lambda: index.build_vector_index(
        spark, store, "l1", kind="ivf", n_lists=32, iters=3))
    l1_idx = _timed("manhattan_indexed_full_probe", timings, lambda: sorted(
        map(tuple, knn.search_collection(
            spark, store, "l1", q, k=10, corpus_id="id",
            exclude_self=True, use_index="always", n_probe=None)
            .collect())))
    assert l1_idx == l1_exact, "manhattan indexed diverged from exact"
    print("  manhattan indexed == exact    OK")

    # round-11: metric-complete recommend at scale — best_score on the
    # manhattan collection folds NEGATED L1 distances in the same
    # zero-shuffle broadcast projection; scores ≤ 0, ranked descending
    l1_rec = _timed("recommend_bestscore_manhattan", timings,
                    lambda: recommend_points(
                        spark, store, "l1", positive=[100, 101],
                        negative=[102], strategy="best_score",
                        k=10).orderBy("rank").collect())
    assert len(l1_rec) == 10 and all(r["score"] <= 0 for r in l1_rec)
    assert l1_rec[0]["score"] >= l1_rec[-1]["score"]

    # round-11: the serializable nested-prefetch tree at scale — a
    # recommend node fused with a stored-BM25 text node by RRF in ONE
    # query_points payload; both branches ride their pruned physical
    # plans (broadcast-example scan / term-bucket posting probe) and the
    # fusion joins 2·k rows regardless of corpus size.  The docs store
    # churned (bulk delete halved it) after its BM25 index was built, so
    # rebuild the text index first — the realistic "refresh before
    # serving" step.
    from bob_vector_db_spark.operators.query_api import (  # noqa: PLC0415
        query_points,
    )
    _timed("rebuild_bm25_post_churn", timings, lambda: build_text_index(
        spark, store, "docs", text_col="text", n_term_buckets=32))
    n_np = _timed("nested_prefetch_reco_bm25", timings, lambda: query_points(
        spark, store, "vecs",
        prefetch=[{"recommend": {"positive": [100, 101],
                                 "negative": [102],
                                 "strategy": "best_score"},
                   "limit": 20}],
        fusion="rrf", k=10).count())
    assert n_np == 10, n_np
    n_np2 = _timed("nested_prefetch_text_only", timings, lambda: query_points(
        spark, store, "docs",
        prefetch=[{"text": {"column": "text",
                            "terms": ["vector", "join", "stream"]},
                   "limit": 20}],
        fusion="rrf", k=10).count())
    assert n_np2 == 10, n_np2

    # round-12 (VERDICT r11 #3): the two-stage rescore, the hybrid
    # sparse+dense tree, per-leaf score_threshold, grouped + MMR nodes —
    # every surface that landed AFTER the round-11 rehearsal window.
    # One collection carries text + a dense space + a declared-IDF
    # sparse space (the Qdrant hybrid shape); the ids are the
    # docs ∩ embeddings domain.
    from bob_vector_db_spark.operators.query_api import (  # noqa: PLC0415
        fuse_prefetch,
        query_points_groups,
    )

    hyb_post = postings_from_text(docs, id_col="doc_id", text_col="text",
                                  vocab_size=4096)
    hyb_sparse = (hyb_post.groupBy("id")
                  .agg(F.array_sort(F.collect_list(F.struct("idx", "val")))
                       .alias("z"))
                  .select("id", F.col("z.idx").alias("indices"),
                          F.col("z.val").alias("values")))
    hyb_pts = (docs.select(F.col("doc_id").alias("id"), "text")
               .join(emb.select(F.col("vec_id").alias("id"), "embedding"),
                     "id")
               .join(hyb_sparse, "id"))
    _timed("create_hybrid_collection", timings,
           lambda: upsert.create_collection(
               spark, store, "hyb", df=hyb_pts, id_col="id", n_buckets=32,
               vector_config={
                   "embedding": {"size": 64, "distance": "cosine"},
                   "text_sparse": {"kind": "sparse", "modifier": "idf"}}))
    _timed("build_hybrid_bm25", timings, lambda: build_text_index(
        spark, store, "hyb", text_col="text", n_term_buckets=32))
    _timed("build_hybrid_sparse_idf", timings, lambda: build_sparse_index(
        spark, store, "hyb", n_dim_buckets=32))

    # two-stage rescore: BM25 retrieves 200 candidates, stored point 0's
    # dense vector rescores exactly them — candidate fetch via the
    # static id-bucket filter, broadcast 1-row ref, rank over ≤200 rows
    res = _timed("rescore_bm25_to_dense", timings, lambda: query_points(
        spark, store, "hyb",
        prefetch=[{"text": {"column": "text",
                            "terms": ["vector", "join", "stream"]},
                   "limit": 200}],
        query={"nearest": 0}, vector_name="embedding",
        k=10).orderBy("rank").collect())
    assert len(res) == 10 and 0 not in {r["vec_id"] for r in res}
    assert all(res[i]["score"] >= res[i + 1]["score"]
               for i in range(len(res) - 1))

    # per-leaf score_threshold (landed post-r11-rehearsal): the
    # thresholded leaf is the suffix cut of the unthresholded one
    base_leaf = fuse_prefetch(
        {"text": {"column": "text", "terms": ["vector", "join", "stream"]},
         "limit": 50},
        spark=spark, root=store, collection="hyb").orderBy("rank").collect()
    thr = base_leaf[9]["score"]
    cut_leaf = _timed("leaf_score_threshold_cut", timings,
                      lambda: fuse_prefetch(
                          {"text": {"column": "text",
                                    "terms": ["vector", "join", "stream"]},
                           "limit": 50, "score_threshold": thr},
                          spark=spark, root=store,
                          collection="hyb").orderBy("rank").collect())
    want_leaf = [(r["id"], r["score"], r["rank"]) for r in base_leaf
                 if r["score"] >= thr]
    assert [(r["id"], r["score"], r["rank"]) for r in cut_leaf] == want_leaf

    # the canonical hybrid payload as ONE serializable tree: sparse IDF
    # leaf + dense nearest leaf fused by RRF — both branches ride their
    # partition-pruned artifacts, the fusion joins 2·k rows
    sq_rows = (hyb_post.filter(F.col("id") == 0)
               .select("idx", "val").collect())
    qv0 = [float(x) for x in
           emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    n_hyb = _timed("hybrid_sparse_dense_tree", timings, lambda: query_points(
        spark, store, "hyb",
        prefetch=[
            {"nearest": {"indices": [int(r["idx"]) for r in sq_rows],
                         "values": [float(r["val"]) for r in sq_rows]},
             "using": "text_sparse", "limit": 20},
            {"nearest": qv0, "using": "embedding", "limit": 20},
        ],
        fusion="rrf", k=10).count())
    assert n_hyb == 10, n_hyb

    # max-sim rescore (ColBERT retrieve-then-rescore) on the mv store:
    # a coarse multivector leaf retrieves 100, stored point 5's token
    # list rescores exactly them
    n_maxsim = _timed("rescore_maxsim_candidates", timings,
                      lambda: query_points(
                          spark, store, "mv",
                          prefetch=[{"nearest": 3, "limit": 100}],
                          query={"nearest": 5}, k=10).count())
    assert n_maxsim == 10, n_maxsim

    # grouped universal endpoint: a typed recommend node through the
    # shared two-window cut (exactness ties are pytest-pinned; at scale
    # this watches the label-window shuffle and the slot bounds)
    grp12 = _timed("query_groups_recommend_node", timings,
                   lambda: query_points_groups(
                       spark, store, "vecs", "label",
                       query={"recommend": {"positive": [100, 101],
                                            "negative": [102],
                                            "strategy": "sum_scores"}},
                       k_groups=5, group_size=3).collect())
    assert grp12 and all(r["group_rank"] <= 5 and r["rank_in_group"] <= 3
                         for r in grp12)

    # MMR as a serialized node: by-id query, 100-candidate pool through
    # the bucket fetch, greedy rerank over pool-sized frames only
    n_mmr12 = _timed("mmr_node_by_id", timings, lambda: query_points(
        spark, store, "vecs",
        query={"nearest": 100,
               "mmr": {"diversity": 0.4, "candidates_limit": 100}},
        k=10).count())
    assert n_mmr12 == 10, n_mmr12

    # round-12b: EXACT grouped posting-index searches + the batch
    # endpoint at scale — the k=None scored set (every matching doc)
    # through the shared grouped tail, and two requests in one payload
    from bob_vector_db_spark.operators.query_api import (  # noqa: PLC0415
        query_batch_points,
    )

    gt = _timed("grouped_bm25_by_lang", timings,
                lambda: query_points_groups(
                    spark, store, "docs", "lang",
                    query={"text": {"column": "text",
                                    "terms": ["vector", "join",
                                              "stream"]}},
                    k_groups=3, group_size=2).collect())
    assert gt and all(r["group_rank"] <= 3 and r["rank_in_group"] <= 2
                      for r in gt)
    n_b = _timed("batch_two_requests", timings, lambda: query_batch_points(
        spark, store, "vecs",
        requests=[{"query": {"nearest": 100}, "limit": 10},
                  {"query": {"recommend": {"positive": [100, 101]}},
                   "limit": 10}]).count())
    assert n_b == 20, n_b

    # round-12b: paragraph dedup at corpus scale — one sha2 hash
    # aggregate over ~L exploded paragraphs, anti-join, reassembly
    from bob_vector_db_spark.operators.dedup import paragraph_dedup  # noqa: PLC0415

    para_docs = docs.select(
        "doc_id",
        F.concat_ws("\n", F.col("text"),
                    F.lit("SHARED BOILERPLATE FOOTER")).alias("text"))
    n_pd = _timed("paragraph_dedup_corpus", timings, lambda: (
        paragraph_dedup(para_docs).filter(
            F.col("text").contains("BOILERPLATE")).count()))
    assert n_pd == 0, n_pd  # the footer vanished from every doc

    # ---- round 13 stages (VERDICT r12 #3/#5/#6) -------------------------

    # hot-term materialize fallback: 'vector' matches a large share of
    # the corpus; with the cap forced tiny, _grouped_from_scored's
    # materialize_small takes the LAZY-fallback branch (the pruned
    # posting probe re-executes per consumer) — the grouped page must be
    # IDENTICAL to the materialized path's
    gq = {"text": {"column": "text", "terms": ["vector", "join"]}}
    base_gt = _timed("grouped_bm25_materialized", timings,
                     lambda: sorted(map(tuple, query_points_groups(
                         spark, store, "docs", "lang", query=gq,
                         k_groups=3, group_size=2).collect())))

    def _fallback_run():
        os.environ["BVDS_MATERIALIZE_CAP"] = "500"
        try:
            return sorted(map(tuple, query_points_groups(
                spark, store, "docs", "lang", query=gq,
                k_groups=3, group_size=2).collect()))
        finally:
            os.environ.pop("BVDS_MATERIALIZE_CAP", None)

    fb_gt = _timed("grouped_bm25_lazy_fallback", timings, _fallback_run)
    assert fb_gt == base_gt, "lazy-fallback grouped page diverged"

    # PII scrub at scale: pure JVM regexp chains over every document —
    # the last unrehearsed r12 surface (cheap by design; this pins it)
    from bob_vector_db_spark.functions.text import (  # noqa: PLC0415
        pii_counts,
        scrub_pii,
    )

    pii_src = docs.select(
        "doc_id",
        F.concat(F.substring("text", 1, 40),
                 F.lit(" mail a@b.co via http://x.io from 10.1.2.3 "
                       "tel 555-010-2233")).alias("_t"))
    n_pii = _timed("pii_scrub_corpus", timings, lambda: (
        pii_src.select(
            "doc_id", scrub_pii(F.col("_t")).alias("clean"),
            *[c.cast("int").alias(f"n_{n}")
              for n, c in pii_counts(F.col("_t"))])
        .filter(F.col("clean").contains("<EMAIL>")
                & F.col("clean").contains("<URL>")
                & F.col("clean").contains("<IP>")
                & F.col("clean").contains("<PHONE>")).count()))
    assert n_pii == n_docs, (n_pii, n_docs)

    # strict mode at scale: the refusals fire BEFORE any job — an
    # unindexed filter (here a would-be full corpus scan) and a full
    # probe over the freshly-quantized artifact both refuse driver-side
    from bob_vector_db_spark.operators.strict import StrictMode  # noqa: PLC0415

    def _strict_refusals():
        # vecs' last build was ivf_bq + churn + refresh; re-freshen so
        # the quantized-probe refusal provably sees a FRESH artifact
        index.refresh_all_indexes(spark, store, "vecs")
        try:
            # 'id' carries no payload index on vecs — the driving-leaf
            # refusal names it (the probe check is isolated away)
            from bob_vector_db_spark.operators.filters import (  # noqa: PLC0415
                MatchValue,
            )

            search_points(spark, store, "vecs", q, k=10,
                          flt=Filter(must=[MatchValue("id", 123)]),
                          strict=StrictMode(search_allow_exact=True))
            raise AssertionError("unindexed filter was not refused")
        except ValueError as e:
            assert "payload index" in str(e), e
        try:
            search_points(spark, store, "vecs", q, k=10, n_probe=None,
                          strict=True)
            raise AssertionError("quantized full probe was not refused")
        except ValueError as e:
            assert "full probe" in str(e), e
        return True

    _timed("strict_refusals_fire", timings, _strict_refusals)

    # QuantizationSearchParams at scale (vecs' current artifact:
    # ivf_bq, re-freshened above): the rescore=False page must carry the
    # SAME id set per query as the rescored path at n_cand == k (the
    # candidate stage IS the page; the rescore only reorders), with no
    # store fetch in its plan
    def _nores_tie():
        a, b = {}, {}
        for r in index.search_indexed(spark, store, "vecs", q, k=10,
                                      n_probe=4, exclude_self=True,
                                      rescore=False).collect():
            a.setdefault(r["qid"], set()).add(r["vec_id"])
        for r in index.search_indexed(spark, store, "vecs", q, k=10,
                                      n_probe=4, exclude_self=True,
                                      rerank_factor=1).collect():
            b.setdefault(r["qid"], set()).add(r["vec_id"])
        assert a == b, "no-rescore page diverged from candidate stage"
        return True

    _timed("bq_no_rescore_ties_candidates", timings, _nores_tie)

    # per-token multivector probing (mv's current artifact: ivf_mv_bq):
    # at equal n_probe the union probe's recall vs the exact max-sim
    # scan is >= the pooled probe's, and full probe + covering rerank
    # through the per-token path still equals the exact scan
    mvq = {(r["qid"], r["vec_id"]) for r in knn.search_collection(
        spark, store, "mv", q_mv, k=10, corpus_id="id",
        query_vec="qvecs", exclude_self=True, use_index=False).collect()}
    pooled = _timed("mv_pooled_probe2", timings, lambda: {
        (r["qid"], r["vec_id"])
        for r in index.search_indexed(
            spark, store, "mv", q_mv, k=10, n_probe=2,
            query_vec="qvecs", rerank_factor=50,
            exclude_self=True).collect()})
    per_tok = _timed("mv_per_token_probe2", timings, lambda: {
        (r["qid"], r["vec_id"])
        for r in index.search_indexed(
            spark, store, "mv", q_mv, k=10, n_probe=2,
            query_vec="qvecs", rerank_factor=50, exclude_self=True,
            probe_per_token=True).collect()})
    r_pool = len(pooled & mvq) / len(mvq)
    r_tok = len(per_tok & mvq) / len(mvq)
    print(f"  per-token recall {r_tok:.3f} vs pooled {r_pool:.3f}",
          flush=True)
    assert r_tok >= r_pool, (r_tok, r_pool)
    tok_full = _timed("mv_per_token_full_covering", timings, lambda: {
        (r["qid"], r["vec_id"])
        for r in index.search_indexed(
            spark, store, "mv", q_mv, k=10, n_probe=None,
            query_vec="qvecs", rerank_factor=rr_cover,
            exclude_self=True, probe_per_token=True).collect()})
    assert tok_full == mvq, "per-token full probe diverged from exact"

    # ---- round 14 stages (VERDICT r13 #1/#5/#7) -------------------------

    # duplicate-cluster resolution on a SKEWED cluster-size distribution:
    # one giant 5,000-member near-clique (the boilerplate-template shape
    # LSH banding actually emits: every member pairs with the exemplar,
    # plus chain drift) + a 10,000-cluster long tail.  Min-label must
    # converge in ≤6 rounds (near-clique: the min crosses in 1-2 hops —
    # a tight max_iterations PROVES the round count) and the lowest-id
    # keep must leave exactly one survivor per cluster.
    from bob_vector_db_spark.operators.dedup import (  # noqa: PLC0415
        connected_components,
        duplicate_clusters,
    )

    g0, t0 = 10_000_000, 20_000_000
    giant_star = spark.range(1, 5000).select(
        F.lit(g0).cast("long").alias("id_a"),
        (F.col("id") + g0).alias("id_b"))
    giant_ring = spark.range(1, 4999).select(
        (F.col("id") + g0).alias("id_a"),
        (F.col("id") + g0 + 1).alias("id_b"))
    tail = (spark.range(0, 40_000).filter(F.col("id") % 4 != 3)
            .select((t0 + F.col("id")).alias("id_a"),
                    (t0 + F.col("id") + 1).alias("id_b")))
    skew_pairs = giant_star.unionByName(giant_ring).unionByName(tail)
    clusters = _timed("cc_skewed_clusters", timings, lambda: {
        r["cluster"]: (r["n_members"], r["keep"])
        for r in duplicate_clusters(skew_pairs, max_iterations=6)
        .collect()})
    assert len(clusters) == 10_001, len(clusters)
    assert clusters[g0] == (5000, g0), clusters[g0]
    assert all(clusters[t0 + 4 * c] == (4, t0 + 4 * c)
               for c in range(0, 10_000, 997)), "tail cluster keep broke"

    # algorithm='star' on the ADVERSARIAL long-chain graph: a
    # 50,000-node path (diameter 49,999 — min-label would need ~25k
    # rounds) converges inside the default 25-alternation budget
    path = spark.range(0, 49_999).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    star_lab = _timed("cc_star_50k_path", timings, lambda:
                      connected_components(path, algorithm="star")
                      .agg(F.countDistinct("component").alias("nc"),
                           F.count(F.lit(1)).alias("nn")).first())
    assert (star_lab["nc"], star_lab["nn"]) == (1, 50_000), star_lab

    # LSH band-size cap at scale: the fixture gives every text COPIES
    # identical copies, so EVERY band bucket is a ≥COPIES-member
    # near-clique — the uncapped self-join would emit ~bn²/2 pairs per
    # bucket (~25M pairs at 100×); the cap's star edges stay LINEAR
    # (≤ bands·n_docs pair-band rows) and the downstream cluster step
    # still groups every copy set intact (the closure-preserving
    # property pinned in test_minhash_band_cap_preserves_clusters)
    from bob_vector_db_spark.operators.dedup import (  # noqa: PLC0415
        minhash_lsh_pairs,
    )

    capped_pairs = minhash_lsh_pairs(docs, num_hashes=16, bands=4,
                                     max_band_size=8)
    n_capped = _timed("lsh_band_cap_pairs", timings, capped_pairs.count)
    assert n_capped <= 16 * n_docs, (n_capped, n_docs)
    cl = _timed("lsh_band_cap_clusters", timings, lambda:
                duplicate_clusters(capped_pairs)
                .agg(F.min("n_members").alias("mn"),
                     F.count(F.lit(1)).alias("nc")).first())
    # every cluster contains at least one full copy set
    assert cl["mn"] >= COPIES, cl
    print(f"  lsh cap: {n_capped} pairs, {cl['nc']} clusters "
          f"(min size {cl['mn']})", flush=True)

    # strict refusals on the round-14 entry points: grouped and matrix
    # requests driving an unindexed filter refuse DRIVER-side (no job)
    def _strict_refusals_r14():
        from bob_vector_db_spark.operators.filters import (  # noqa: PLC0415
            MatchValue,
        )
        from bob_vector_db_spark.operators.matrix import (  # noqa: PLC0415
            search_matrix_pairs,
        )
        from bob_vector_db_spark.operators.query_tree import (  # noqa: PLC0415
            query_points_groups,
        )

        bad = Filter(must=[MatchValue("id", 123)])
        try:
            query_points_groups(spark, store, "vecs", "label", query=q,
                                flt=bad, strict=True)
            raise AssertionError("grouped unindexed filter not refused")
        except ValueError as e:
            assert "payload index" in str(e), e
        try:
            search_matrix_pairs(spark, store, "vecs", sample=5, flt=bad,
                                strict=True)
            raise AssertionError("matrix unindexed filter not refused")
        except ValueError as e:
            assert "payload index" in str(e), e
        return True

    _timed("strict_refusals_grouped_matrix", timings, _strict_refusals_r14)

    # round-15: persisted near-dup index — ONE full-corpus build, then a
    # 1% crawl snapshot (every snapshot doc duplicates a stored doc's
    # text) absorbed by ONE O(|delta|) refresh.  The incremental path
    # must come in well under the rebuild, and the snapshot probe answers
    # "which stored docs does this snapshot duplicate" off the pruned
    # posting table without banding anything but the delta.
    from bob_vector_db_spark.operators import neardup_index  # noqa: PLC0415

    _timed("neardup_create_collection", timings,
           lambda: upsert.create_collection(
               spark, store, "nd_docs", n_buckets=32, id_col="id",
               df=docs.select(F.col("doc_id").alias("id"), "text")))
    _timed("neardup_build_full", timings,
           lambda: neardup_index.build_neardup_index(
               spark, store, "nd_docs", text_col="text", n_band_buckets=32))
    n_nd_pairs = _timed("neardup_pairs_indexed_capped", timings, lambda:
                        neardup_index.neardup_pairs_indexed(
                            spark, store, "nd_docs", text_col="text",
                            max_band_size=8).count())
    # copy sets are exact dups → every band bucket is over-cap → star
    # edges keep the pair count LINEAR in the corpus
    assert n_nd_pairs <= 16 * n_docs, (n_nd_pairs, n_docs)
    snap = (docs.filter(F.col("doc_id") % 100 == 0)
            .select((F.col("doc_id") + 10_000_000).alias("id"), "text"))
    _timed("neardup_snapshot_upsert", timings,
           lambda: upsert.upsert(spark, store, "nd_docs", snap,
                                 id_col="id"))
    _timed("neardup_refresh_delta", timings,
           lambda: neardup_index.refresh_neardup_index(
               spark, store, "nd_docs", text_col="text"))
    assert (timings["neardup_refresh_delta"]
            < timings["neardup_build_full"]), (
        "O(|delta|) refresh should beat the full rebuild", timings)
    n_probe = _timed("neardup_probe_snapshot", timings, lambda:
                     neardup_index.neardup_pairs_for_ids(
                         spark, store, "nd_docs", snap.select("id"),
                         text_col="text").count())
    # every snapshot doc is an exact dup of its source copy set
    assert n_probe >= snap.count(), (n_probe,)
    print(f"  neardup index: {n_nd_pairs} capped pairs, "
          f"{n_probe} probe pairs", flush=True)

    # round-15b: the SECOND dedup-index kind — SimHash chunk postings on
    # the same collection; both kinds must absorb one more snapshot
    # through a single refresh_all_indexes call (the store's one-call
    # maintenance contract extended to the dedup family)
    from bob_vector_db_spark.operators.neardup_index import (  # noqa: PLC0415
        build_simhash_index,
        simhash_pairs_for_ids,
    )

    _timed("simhash_build_full", timings,
           lambda: build_simhash_index(spark, store, "nd_docs",
                                       text_col="text",
                                       n_chunk_buckets=32))
    snap2 = (docs.filter(F.col("doc_id") % 100 == 50)
             .select((F.col("doc_id") + 20_000_000).alias("id"), "text"))
    _timed("dedup_snapshot2_upsert", timings,
           lambda: upsert.upsert(spark, store, "nd_docs", snap2,
                                 id_col="id"))
    metas = _timed("refresh_all_both_dedup_kinds", timings,
                   lambda: index.refresh_all_indexes(spark, store,
                                                     "nd_docs"))
    assert sorted(m["kind"] for m in metas) == [
        "neardup_minhash_lsh", "neardup_simhash"], metas
    n_sh_probe = _timed("simhash_probe_snapshot2", timings, lambda:
                        simhash_pairs_for_ids(
                            spark, store, "nd_docs", snap2.select("id"),
                            text_col="text").count())
    assert n_sh_probe >= snap2.count(), (n_sh_probe,)
    print(f"  simhash index: {n_sh_probe} probe pairs", flush=True)

    # round-15: ExactSubstr span dedup on a 10% slice — the worst case
    # for this pass (EVERY window repeats across the fixture's copies,
    # so the ×width coverage explode fires on the whole slice); shuffles
    # stay digest/position-narrow and the output must keep every id
    from bob_vector_db_spark.operators.dedup import substring_dedup  # noqa: PLC0415

    sub_docs = (docs.filter(F.col("doc_id") % 10 == 0)
                .select("doc_id", "text"))
    n_sub_in = sub_docs.count()
    sub_out = _timed("substring_dedup_slice", timings, lambda:
                     substring_dedup(sub_docs, width=20)
                     .agg(F.count(F.lit(1)).alias("n"),
                          F.sum(F.when(F.col("text") == "", 1)
                                .otherwise(0)).alias("n_empty")).first())
    assert sub_out["n"] == n_sub_in, (sub_out, n_sub_in)
    # copies make every >=20-token doc pure boilerplate — most come back
    # empty; short docs (< width tokens) pass through
    print(f"  substring dedup: {n_sub_in} docs in, "
          f"{sub_out['n_empty']} emptied", flush=True)

    summary = {"n_docs": n_docs, "n_emb": n_emb,
               "total_s": round(time.time() - t_all, 2), "timings": timings}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
