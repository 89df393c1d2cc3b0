"""Qdrant QuantizationSearchParams (round 13, VERDICT r12 #1):
``rescore=False`` returns the quantized-score ranking without the
exact-rescore fetch; ``oversampling`` sizes the quantized candidate
stage at ceil(oversampling·k).  Pinned here: the no-rescore page IS the
candidate-stage ordering of the rescored path, for every quantized kind
that can serve it."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bob_vector_db_spark.operators import index, knn, quantize, upsert
from bob_vector_db_spark.operators.query_search import search_points
from bob_vector_db_spark.operators.query_tree import query_points
from bob_vector_db_spark.sources import load_table


def _mk_store(spark, sf_dir, root, kind, **build_kw):
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, root, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, root, "vecs", kind=kind, **build_kw)
    return emb


def _queries(emb, n=4):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))


def _rows(df):
    return sorted(map(tuple,
                      df.select("qid", "vec_id", "sim", "rank").collect()))


def test_bq_no_rescore_is_the_hamming_ranking(spark, sf_dir, tmp_path):
    """rescore=False on ivf_bq at full probe == Hamming over sign bits,
    computed independently with the raw pack/hamming expressions."""
    root = str(tmp_path / "s")
    emb = _mk_store(spark, sf_dir, root, "ivf_bq", n_lists=8, iters=3)
    q = _queries(emb)
    got = index.search_indexed(spark, root, "vecs", q, k=10, n_probe=None,
                               exclude_self=True, rescore=False)
    # independent oracle: pack both sides, popcount-of-XOR, rank asc
    qp = q.select("qid", quantize.binary_pack_expr(
        F.col("qvec"), 64).alias("_qp"))
    cp = emb.select(F.col("vec_id"), quantize.binary_pack_expr(
        F.col("embedding"), 64).alias("_cp"))
    pairs = (cp.crossJoin(F.broadcast(qp))
             .filter(F.col("qid") != F.col("vec_id"))
             .select("qid", "vec_id",
                     quantize.hamming_expr(F.col("_qp"), F.col("_cp"), 64)
                     .cast("double").alias("sim")))
    want = quantize._rank_topk(pairs, 10, ascending=True)
    assert _rows(got) == _rows(want)
    # the quantized page is integer-valued Hamming, never a similarity
    assert all(r["sim"] == int(r["sim"]) and r["sim"] >= 0
               for r in got.collect())


def test_no_rescore_ties_candidate_stage_of_rescored_path(
        spark, sf_dir, tmp_path):
    """The VERDICT r12 tie: the rescored path with rerank_factor=1 draws
    its candidates from EXACTLY the rescore=False page (n_cand == k), so
    the two id sets match per query — the rescore only reorders."""
    root = str(tmp_path / "s")
    emb = _mk_store(spark, sf_dir, root, "ivf_bq", n_lists=8, iters=3)
    q = _queries(emb)
    nores = index.search_indexed(spark, root, "vecs", q, k=10,
                                 n_probe=None, exclude_self=True,
                                 rescore=False)
    res = index.search_indexed(spark, root, "vecs", q, k=10, n_probe=None,
                               exclude_self=True, rerank_factor=1)

    def ids(df):
        byq = {}
        for r in df.collect():
            byq.setdefault(r["qid"], set()).add(r["vec_id"])
        return byq

    assert ids(nores) == ids(res)


def test_sq_no_rescore_is_the_dequantized_ranking(spark, sf_dir, tmp_path):
    """rescore=False on ivf_sq at full probe == exact kNN over the
    DEQUANTIZED stored codes (read straight from the artifact)."""
    root = str(tmp_path / "s")
    emb = _mk_store(spark, sf_dir, root, "ivf_sq", n_lists=8, iters=3)
    q = _queries(emb)
    got = index.search_indexed(spark, root, "vecs", q, k=10, n_probe=None,
                               exclude_self=True, rescore=False)
    imeta = index.vector_index_meta(root, "vecs", "embedding")
    ipath = index.index_path(root, "vecs", "embedding")
    art = spark.read.parquet(os.path.join(ipath, "data"))
    deq = art.select(
        F.col("id").alias("vec_id"),
        quantize.sq_decode_expr(F.col("codes"), imeta["sq_mins"],
                                imeta["sq_scales"]).alias("_deq"))
    want = knn.knn_join(q, deq, k=10, corpus_id="vec_id",
                        corpus_vec="_deq", exclude_self=True,
                        metric="cosine")
    assert _rows(got) == _rows(want)


def test_oversampling_equals_matching_rerank_factor(spark, sf_dir,
                                                    tmp_path):
    """oversampling=2.0 at k=10 sizes the candidate stage at 20 rows —
    identical to rerank_factor=2 (and the result pages tie exactly)."""
    root = str(tmp_path / "s")
    emb = _mk_store(spark, sf_dir, root, "ivf_sq", n_lists=8, iters=3)
    q = _queries(emb)
    over = index.search_indexed(spark, root, "vecs", q, k=10, n_probe=None,
                                exclude_self=True, oversampling=2.0)
    rf = index.search_indexed(spark, root, "vecs", q, k=10, n_probe=None,
                              exclude_self=True, rerank_factor=2)
    assert _rows(over) == _rows(rf)


def test_search_points_and_query_points_thread_params(spark, sf_dir,
                                                      tmp_path):
    """The store entry points carry the params end-to-end: the unfiltered
    search_points page equals search_indexed's, and the by-id
    query_points page drops self with Hamming scores intact."""
    root = str(tmp_path / "s")
    emb = _mk_store(spark, sf_dir, root, "ivf_bq", n_lists=8, iters=3)
    q = _queries(emb)
    via_sp = search_points(spark, root, "vecs", q, k=10, n_probe=None,
                           rescore=False)
    direct = index.search_indexed(spark, root, "vecs", q, k=10,
                                  n_probe=None, exclude_self=False,
                                  rescore=False)
    assert _rows(via_sp) == _rows(direct)
    by_id = query_points(spark, root, "vecs", query=1, k=5, n_probe=None,
                         rescore=False)
    rows = by_id.collect()
    assert rows and all(r["vec_id"] != 1 for r in rows)
    assert all(r["sim"] == int(r["sim"]) for r in rows)


def test_quantization_param_guards(spark, sf_dir, tmp_path):
    root = str(tmp_path / "s")
    emb = _mk_store(spark, sf_dir, root, "ivf", n_lists=4, iters=3)
    q = _queries(emb)
    # ivf: rescore=False is a no-op (stored floats ARE the originals)
    noop = index.search_indexed(spark, root, "vecs", q, k=5, n_probe=None,
                                exclude_self=True, rescore=False)
    exact = index.search_indexed(spark, root, "vecs", q, k=5, n_probe=None,
                                 exclude_self=True)
    assert _rows(noop) == _rows(exact)
    with pytest.raises(ValueError, match="oversampling must be >= 1"):
        index.search_indexed(spark, root, "vecs", q, k=5,
                             oversampling=0.5)
    with pytest.raises(ValueError, match="use_index=False"):
        search_points(spark, root, "vecs", q, k=5, rescore=False,
                      use_index=False)
    with pytest.raises(ValueError, match="dense quantized search"):
        query_points(spark, root, "vecs",
                     query={"recommend": {"positive": [1]}},
                     k=5, rescore=False)
    with pytest.raises(ValueError, match="dense quantized search"):
        query_points(spark, root, "vecs",
                     query={"nearest": {"indices": [1], "values": [1.0]}},
                     k=5, oversampling=2.0)


def test_mv_kind_refuses_no_rescore(spark, sf_dir, tmp_path):
    root = str(tmp_path / "s")
    emb = load_table(spark, sf_dir, "embeddings").limit(40)
    mv = emb.select(
        F.col("vec_id").alias("id"),
        F.array(F.col("embedding"),
                F.reverse(F.col("embedding"))).alias("toks"))
    upsert.create_collection(
        spark, root, "mv", n_buckets=4, id_col="id", df=mv,
        vector_config={"toks": {"size": 64, "distance": "cosine",
                                "multivector": "max_sim"}})
    index.build_vector_index(spark, root, "mv", kind="ivf_mv",
                             n_lists=4, iters=3)
    q = mv.filter(F.col("id") < 2).select(
        F.col("id").alias("qid"), F.col("toks").alias("qvec"))
    with pytest.raises(ValueError, match="SEMANTIC max-sim"):
        index.search_indexed(spark, root, "mv", q, k=5, n_probe=None,
                             rescore=False)
    # but oversampling DOES size the mv candidate pool
    out = index.search_indexed(spark, root, "mv", q, k=5, n_probe=None,
                               oversampling=50.0, exclude_self=True)
    assert out.count() > 0


def _mk_mv(spark, sf_dir, root):
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"))
    upsert.create_collection(
        spark, root, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"colbert": {"size": 16, "distance": "dot",
                                   "multivector": "max_sim"}})
    index.build_vector_index(spark, root, "vecs", kind="ivf_mv",
                             n_lists=8, iters=3)
    q = pts.filter(F.col("id") < 4).select(
        F.col("id").alias("qid"), F.col("colbert").alias("qvecs"))
    return pts, q


def test_probe_per_token_recall_superset(spark, sf_dir, tmp_path):
    """VERDICT r12 #5 ties: per-token probing covers a SUPERSET of the
    pooled probe's lists, so recall vs the exact max-sim scan can only
    rise at equal n_probe; at full probe both equal the exact scan."""
    root = str(tmp_path / "s")
    pts, q = _mk_mv(spark, sf_dir, root)
    from bob_vector_db_spark.operators.knn import knn_join_maxsim

    exact = knn_join_maxsim(q, pts, corpus_id="id", corpus_vec="colbert",
                            query_vec="qvecs", k=10, exclude_self=True)
    ex = {(r["qid"], r["vec_id"]) for r in exact.collect()}
    for n_probe in (1, 2):
        pooled = index.search_indexed(
            spark, root, "vecs", q, k=10, n_probe=n_probe,
            query_vec="qvecs", exclude_self=True)
        per_tok = index.search_indexed(
            spark, root, "vecs", q, k=10, n_probe=n_probe,
            query_vec="qvecs", exclude_self=True, probe_per_token=True)
        rp = len({(r["qid"], r["vec_id"])
                  for r in pooled.collect()} & ex) / len(ex)
        rt = len({(r["qid"], r["vec_id"])
                  for r in per_tok.collect()} & ex) / len(ex)
        assert rt >= rp, (n_probe, rt, rp)
    # full probe: per-token changes nothing (every list already probed)
    full_tok = index.search_indexed(
        spark, root, "vecs", q, k=10, n_probe=None, query_vec="qvecs",
        rerank_factor=100, exclude_self=True, probe_per_token=True)
    assert {(r["qid"], r["vec_id"], r["sim"])
            for r in full_tok.collect()} == \
           {(r["qid"], r["vec_id"], r["sim"]) for r in exact.collect()}


def _mk_scattered_mv(spark, root):
    """A corpus built so per-token probing PROVABLY adds hits at
    n_probe=1 (round 14, ADVICE r13 #1 — the old superset test passed
    with rt == rp, which a per-token no-op satisfies):

      - 10 'filler' points, tokens ≈ (4,4)      → pooled blob at (4,4)
      -  5 'spike A' points, tokens ≈ (10,0)    → pooled blob at (10,0)
      -  5 'spike B' points, tokens ≈ (0,10)    → pooled blob at (0,10)

    The query's tokens are [(10,0), (0,10)] → pooled (5,5), NEAREST THE
    FILLER BLOB, while its exact max-sim top-4 are all spike points
    (sim ≈ 100 each vs filler ≈ 80).  At n_probe=1 the pooled probe
    sees only the filler list; each query TOKEN's own nearest list is a
    spike blob, so the pooled∪per-token union reaches them."""
    def tok(x, y, j):
        return [[float(x) + 0.01 * j, float(y) + 0.01 * j]] * 2

    rows = ([(i, tok(4, 4, i)) for i in range(10)]
            + [(100 + i, tok(10, 0, i)) for i in range(5)]
            + [(200 + i, tok(0, 10, i)) for i in range(5)])
    pts = spark.createDataFrame(rows, "id long, colbert array<array<float>>")
    upsert.create_collection(
        spark, root, "vecs", df=pts, id_col="id", n_buckets=4,
        vector_config={"colbert": {"size": 2, "distance": "dot",
                                   "multivector": "max_sim"}})
    index.build_vector_index(spark, root, "vecs", kind="ivf_mv",
                             n_lists=3, iters=8)
    from bob_vector_db_spark.operators.localframe import local_frame

    q = local_frame(
        spark, [(1000, [[10.0, 0.0], [0.0, 10.0]])],
        "qid long, qvecs array<array<float>>")
    return pts, q


def test_probe_per_token_strictly_beats_pooled(spark, tmp_path):
    """The per-token probe must CONTRIBUTE candidates, not just widen
    the static partition filter: on the scattered-token corpus the
    pooled n_probe=1 recall is 0 and per-token recall is 1 — a strict
    inequality a pooled-only no-op cannot satisfy."""
    from bob_vector_db_spark.operators.knn import knn_join_maxsim

    root = str(tmp_path / "s")
    pts, q = _mk_scattered_mv(spark, root)
    exact = knn_join_maxsim(q, pts, corpus_id="id", corpus_vec="colbert",
                            query_vec="qvecs", k=4, exclude_self=False)
    ex = {(r["qid"], r["vec_id"]) for r in exact.collect()}
    assert all(v >= 100 for _, v in ex), "fixture: top-4 must be spikes"
    pooled = index.search_indexed(
        spark, root, "vecs", q, k=4, n_probe=1, query_vec="qvecs",
        rerank_factor=100)
    per_tok = index.search_indexed(
        spark, root, "vecs", q, k=4, n_probe=1, query_vec="qvecs",
        rerank_factor=100, probe_per_token=True)
    rp = len({(r["qid"], r["vec_id"]) for r in pooled.collect()} & ex)
    rt = len({(r["qid"], r["vec_id"]) for r in per_tok.collect()} & ex)
    assert rp == 0, f"fixture: pooled n_probe=1 must miss spikes, hit {rp}"
    assert rt == len(ex), f"per-token must recover all spikes, got {rt}"


def test_probe_per_token_plan_keeps_partition_pruning(spark, tmp_path):
    """The per-qid probe-frame rework must not cost the scale contract:
    the per-token search still reaches the artifact through a STATIC
    list_id partition filter (the widened union set), and the probe
    frame itself is an Arrow-form LocalTableScan — no pickled-rows
    ExistingRDD relation anywhere in the plan."""
    from bob_vector_db_spark.plans.inspect import (
        assert_partition_filters,
        formatted_plan,
    )

    root = str(tmp_path / "s")
    _, q = _mk_scattered_mv(spark, root)
    out = index.search_indexed(
        spark, root, "vecs", q, k=4, n_probe=1, query_vec="qvecs",
        rerank_factor=100, probe_per_token=True)
    assert_partition_filters(out, "list_id")
    plan = formatted_plan(out)
    assert "Scan ExistingRDD" not in plan, \
        "a rows-form local relation leaked into the per-token plan"
    assert "LocalTableScan" in plan  # the Arrow-form probe frame


def test_probe_per_token_refused_on_single_vector_kinds(spark, sf_dir,
                                                        tmp_path):
    root = str(tmp_path / "s")
    emb = _mk_store(spark, sf_dir, root, "ivf", n_lists=4, iters=3)
    with pytest.raises(ValueError, match="probe_per_token"):
        index.search_indexed(spark, root, "vecs", _queries(emb), k=5,
                             probe_per_token=True)


def test_probe_per_token_refused_on_mv_exact_fallback(spark, tmp_path):
    """ADVICE r13 #3: 'auto' with NO mv index resolves to the exact
    max-sim scan — probe_per_token must refuse there too (same
    silently-ignored-knob policy as the single-vector tail), not
    silently ignore the flag."""
    root = str(tmp_path / "s")
    pts = spark.createDataFrame(
        [(i, [[float(i), 0.0]] * 2) for i in range(6)],
        "id long, colbert array<array<float>>")
    upsert.create_collection(
        spark, root, "vecs", df=pts, id_col="id", n_buckets=2,
        vector_config={"colbert": {"size": 2, "distance": "dot",
                                   "multivector": "max_sim"}})
    q = pts.limit(1).select(F.col("id").alias("qid"),
                            F.col("colbert").alias("qvecs"))
    with pytest.raises(ValueError, match="probe_per_token"):
        knn.search_collection(spark, root, "vecs", q, k=3,
                              query_vec="qvecs", use_index="auto",
                              probe_per_token=True)


def test_no_rescore_plan_keeps_partition_pruning(spark, sf_dir, tmp_path):
    """The scale contract of the cheap-recall mode: rescore=False must
    still reach the artifact through the static list_id partition filter
    — and with NO rescore stage, the plan contains no id_bucket fetch at
    all (the quantized page is the only scan)."""
    from bob_vector_db_spark.plans.inspect import (
        assert_partition_filters,
        formatted_plan,
    )

    root = str(tmp_path / "s")
    _mk_store(spark, sf_dir, root, "ivf_bq", n_lists=8, iters=3)
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(emb)
    out = index.search_indexed(spark, root, "vecs", q, k=5, n_probe=2,
                               exclude_self=True, rescore=False)
    assert_partition_filters(out, "list_id")
    plan = formatted_plan(out)
    assert "id_bucket" not in plan, \
        "rescore=False must not fetch store buckets"
