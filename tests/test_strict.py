"""Strict mode (round 13, VERDICT r12 #3) — Qdrant StrictModeConfig:
every refusal class pinned, plus the pass-throughs that must NOT refuse.
All checks are driver-side metadata reads; a refusal costs no job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bob_vector_db_spark.operators import index, upsert
from bob_vector_db_spark.operators.filters import (
    Filter,
    MatchValue,
    Range,
)
from bob_vector_db_spark.operators.payload_index import build_payload_index
from bob_vector_db_spark.operators.query_search import (
    scroll_points,
    search_points,
)
from bob_vector_db_spark.operators.query_tree import (
    query_batch_points,
    query_points,
)
from bob_vector_db_spark.operators.strict import StrictMode
from bob_vector_db_spark.sources import load_table


@pytest.fixture(scope="module")
def store(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("strict") / "store")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, root, "vecs", n_buckets=4, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding",
                      (F.col("vec_id") % 3).alias("grp"),
                      (F.col("vec_id") % 100).alias("num")),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_payload_index(spark, root, "vecs", "grp", n_val_buckets=4)
    index.build_vector_index(spark, root, "vecs", kind="ivf_sq",
                             n_lists=8, iters=3)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    return root, q


def test_unindexed_filter_refused_naming_the_index(spark, store):
    root, q = store
    with pytest.raises(ValueError, match=r"Missing payload index.*num"):
        search_points(spark, root, "vecs", q, k=5, n_probe=4,
                      flt=Filter(must=[MatchValue("num", 7)]),
                      strict=True)
    # same refusal through scroll
    with pytest.raises(ValueError, match=r"Missing payload index.*num"):
        scroll_points(spark, root, "vecs",
                      flt=Filter(must=[Range("num", lt=10)]),
                      limit=5, strict=True)
    # indexed driving leaf: passes (the unindexed residual rides along)
    out = search_points(
        spark, root, "vecs", q, k=5, n_probe=4,
        flt=Filter(must=[MatchValue("grp", 1), MatchValue("num", 7)]),
        strict=True)
    assert out.count() >= 0
    # the relax knob admits the scan deliberately
    out2 = search_points(spark, root, "vecs", q, k=5, n_probe=4,
                         flt=Filter(must=[MatchValue("num", 7)]),
                         strict=StrictMode(unindexed_filtering=True))
    assert out2.count() >= 0


def test_limit_offset_and_batch_caps(spark, store):
    root, q = store
    with pytest.raises(ValueError, match="max_query_limit"):
        search_points(spark, root, "vecs", q, k=2000, n_probe=4,
                      strict=True)
    with pytest.raises(ValueError, match="max_offset"):
        search_points(spark, root, "vecs", q, k=5, offset=20_000,
                      n_probe=4, strict=True)
    with pytest.raises(ValueError, match="max_query_limit"):
        query_points(spark, root, "vecs", query=1, k=2000, n_probe=4,
                     strict=True)
    with pytest.raises(ValueError, match="max_batch"):
        query_batch_points(
            spark, root, "vecs",
            [{"query": 1}] * 5, strict=StrictMode(max_batch=4))
    # tuned caps admit
    out = search_points(spark, root, "vecs", q, k=2000, n_probe=4,
                        strict=StrictMode(max_query_limit=None))
    assert out.count() >= 0


def test_quantized_space_refuses_full_probe_and_exact_scan(spark, store):
    root, q = store
    with pytest.raises(ValueError, match="full probe"):
        search_points(spark, root, "vecs", q, k=5, n_probe=None,
                      strict=True)
    with pytest.raises(ValueError, match="exact full scan"):
        search_points(spark, root, "vecs", q, k=5, use_index=False,
                      strict=True)
    # narrowed probe passes; search_allow_exact overrides the refusal
    assert search_points(spark, root, "vecs", q, k=5, n_probe=2,
                         strict=True).count() > 0
    assert search_points(
        spark, root, "vecs", q, k=5, n_probe=None,
        strict=StrictMode(search_allow_exact=True)).count() > 0


def test_unquantized_space_never_trips_probe_check(spark, sf_dir,
                                                   tmp_path):
    root = str(tmp_path / "s")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, root, "vecs", n_buckets=4, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    # no artifact at all: strict full scan is fine (nothing declared)
    assert search_points(spark, root, "vecs", q, k=5,
                         strict=True).count() > 0
    # float ivf artifact: full probe == exact answer, not a bypass
    index.build_vector_index(spark, root, "vecs", kind="ivf",
                             n_lists=4, iters=3)
    assert search_points(spark, root, "vecs", q, k=5, n_probe=None,
                         strict=True).count() > 0


def test_strict_arg_validation(spark, store):
    root, q = store
    with pytest.raises(ValueError, match="StrictMode instance"):
        search_points(spark, root, "vecs", q, k=5, strict="yes")
    # strict=False / None are the no-check defaults
    assert search_points(spark, root, "vecs", q, k=5, n_probe=None,
                         strict=False).count() > 0


def test_collection_declared_strict_mode(spark, sf_dir, tmp_path):
    """Qdrant persists strict_mode_config ON the collection: declared at
    create (or via set_strict_mode), it gates the public entry points by
    DEFAULT; strict=False opts a single request out; set_strict_mode(None)
    clears it.  Internal fetches (prefetch leaves, pools, the by-id +1
    overfetch) never re-apply it."""
    root = str(tmp_path / "s")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, root, "vecs", n_buckets=4, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}},
        strict_mode={"max_query_limit": 50})
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    with pytest.raises(ValueError, match="max_query_limit"):
        search_points(spark, root, "vecs", q, k=60)
    # per-request opt-out
    assert search_points(spark, root, "vecs", q, k=60,
                         strict=False).count() > 0
    # the by-id +1 overfetch at exactly the cap must NOT trip it
    assert query_points(spark, root, "vecs", query=1, k=50).count() > 0
    # declared config + unindexed filter refusal through query_points
    from bob_vector_db_spark.operators.filters import MatchValue as MV
    with pytest.raises(ValueError, match="payload index"):
        query_points(spark, root, "vecs", query=1, k=5,
                     flt=Filter(must=[MV("nope", 1)]))
    # update_collection twin: clear, then re-declare
    upsert.set_strict_mode(root, "vecs", None)
    assert search_points(spark, root, "vecs", q, k=60).count() > 0
    upsert.set_strict_mode(root, "vecs", {"max_query_limit": 10})
    with pytest.raises(ValueError, match="max_query_limit"):
        search_points(spark, root, "vecs", q, k=11)
    with pytest.raises(ValueError, match="unknown strict_mode keys"):
        upsert.set_strict_mode(root, "vecs", {"max_limit": 1})


def test_strict_reaches_every_remaining_entry_point(spark, store):
    """Round 14 (VERDICT r13 #5 + ADVICE r13 #2): strict gates MMR,
    recommend / discover / context, grouped search, the grouped
    universal endpoint, and the matrix APIs — the unindexed-filter
    refusal and the caps fire per entry, and the relax knob admits."""
    from bob_vector_db_spark.operators.matrix import (
        search_matrix_offsets,
        search_matrix_pairs,
    )
    from bob_vector_db_spark.operators.query_recommend import (
        context_points,
        discover_points,
        recommend_points,
    )
    from bob_vector_db_spark.operators.query_search import (
        search_groups,
        search_points_mmr,
    )
    from bob_vector_db_spark.operators.query_tree import query_points_groups

    root, q = store
    bad = Filter(must=[MatchValue("num", 7)])
    ok = Filter(must=[MatchValue("grp", 1)])
    with pytest.raises(ValueError, match=r"Missing payload index.*num"):
        search_points_mmr(spark, root, "vecs", q, k=3, pool=10, flt=bad,
                          strict=True)
    with pytest.raises(ValueError, match=r"Missing payload index.*num"):
        recommend_points(spark, root, "vecs", positive=[0], flt=bad,
                         strict=True)
    with pytest.raises(ValueError, match=r"Missing payload index.*num"):
        discover_points(spark, root, "vecs", target=0, context=[(1, 2)],
                        flt=bad, strict=True)
    with pytest.raises(ValueError, match=r"Missing payload index.*num"):
        context_points(spark, root, "vecs", context=[(1, 2)], flt=bad,
                       strict=True)
    with pytest.raises(ValueError, match=r"Missing payload index.*num"):
        search_groups(spark, root, "vecs", q, "grp", flt=bad, strict=True)
    with pytest.raises(ValueError, match=r"Missing payload index.*num"):
        query_points_groups(spark, root, "vecs", "grp", query=q, flt=bad,
                            strict=True)
    with pytest.raises(ValueError, match=r"Missing payload index.*num"):
        search_matrix_pairs(spark, root, "vecs", sample=6, limit=2,
                            flt=bad, strict=True)
    with pytest.raises(ValueError, match=r"Missing payload index.*num"):
        search_matrix_offsets(spark, root, "vecs", sample=6, limit=2,
                              flt=bad, strict=True)
    # caps: MMR checks the POOL (the fetch it drives), matrix checks
    # the SAMPLE (the self-join cost driver), groups the page
    with pytest.raises(ValueError, match="max_query_limit"):
        search_points_mmr(spark, root, "vecs", q, k=3, pool=9,
                          strict=StrictMode(max_query_limit=8,
                                            search_allow_exact=True))
    with pytest.raises(ValueError, match="max_query_limit"):
        search_matrix_pairs(spark, root, "vecs", sample=9,
                            strict=StrictMode(max_query_limit=8))
    with pytest.raises(ValueError, match="max_query_limit"):
        search_groups(spark, root, "vecs", q, "grp", k_groups=3,
                      group_size=3,
                      strict=StrictMode(max_query_limit=8))
    with pytest.raises(ValueError, match="max_query_limit"):
        recommend_points(spark, root, "vecs", positive=[0], k=9,
                         strict=StrictMode(max_query_limit=8))
    # indexed driving filter + caps in range: every entry passes
    assert search_points_mmr(
        spark, root, "vecs", q, k=3, pool=10, flt=ok,
        strict=StrictMode(search_allow_exact=True)).count() > 0
    assert recommend_points(spark, root, "vecs", positive=[0], flt=ok,
                            strict=True).count() > 0
    assert search_groups(spark, root, "vecs", q, "grp", flt=ok,
                         strict=True).count() > 0
    assert search_matrix_pairs(spark, root, "vecs", sample=6, limit=2,
                               flt=ok, strict=True).count() > 0


def test_declared_strict_reaches_mmr_and_groups(spark, sf_dir, tmp_path):
    """The ADVICE r13 #2 scenario verbatim: a COLLECTION-DECLARED strict
    config must gate direct MMR (and grouped) calls by default — no
    per-request strict= needed — and strict=False opts out."""
    from bob_vector_db_spark.operators.query_search import (
        search_groups,
        search_points_mmr,
    )

    root = str(tmp_path / "s")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, root, "vecs", n_buckets=4, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding",
                      (F.col("vec_id") % 3).alias("grp")),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}},
        strict_mode={"max_query_limit": 20})
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    with pytest.raises(ValueError, match="max_query_limit"):
        search_points_mmr(spark, root, "vecs", q, k=5, pool=30)
    with pytest.raises(ValueError, match="max_query_limit"):
        search_groups(spark, root, "vecs", q, "grp", k_groups=7,
                      group_size=3)
    # in-cap requests pass; strict=False opts a single request out
    assert search_points_mmr(spark, root, "vecs", q, k=5,
                             pool=15).count() > 0
    assert search_points_mmr(spark, root, "vecs", q, k=5, pool=30,
                             strict=False).count() > 0


def test_strict_reaches_text_and_sparse_entries(spark, sf_dir, tmp_path):
    """Round 14: the posting-index entries (`search_text_points` /
    `search_sparse_points`) carry the same strict contract — filter and
    limit checks, and k=None (corpus-complete scoring) counts as an
    uncapped request under an active max_query_limit."""
    from bob_vector_db_spark.operators.query_search import (
        search_sparse_points,
        search_text_points,
    )
    from bob_vector_db_spark.operators.text_search import build_text_index

    root = str(tmp_path / "s")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, root, "docs", n_buckets=4, id_col="id",
        df=docs.limit(300).select(F.col("doc_id").alias("id"),
                                  F.col("text").alias("document"),
                                  "lang"))
    build_text_index(spark, root, "docs", text_col="document")
    with pytest.raises(ValueError, match=r"Missing payload index.*lang"):
        search_text_points(spark, root, "docs", ["the"], k=5,
                           flt=Filter(must=[MatchValue("lang", "en")]),
                           strict=True)
    with pytest.raises(ValueError, match="max_query_limit"):
        search_text_points(spark, root, "docs", ["the"], k=5000,
                           strict=True)
    with pytest.raises(ValueError, match="k=None"):
        search_text_points(spark, root, "docs", ["the"], k=None,
                           strict=True)
    with pytest.raises(ValueError, match="k=None"):
        search_sparse_points(
            spark, root, "docs",
            spark.createDataFrame([(0, 1, 1.0)],
                                  "id long, idx long, val double"),
            k=None, strict=True)
    # in-cap unfiltered request passes; the uncapped config admits k=None
    assert search_text_points(spark, root, "docs", ["the"], k=5,
                              strict=True).count() > 0
    assert search_text_points(
        spark, root, "docs", ["the"], k=None,
        strict=StrictMode(max_query_limit=None)).count() > 0


def test_count_and_facet_respect_strict(spark, store):
    """count/facet are entry points too (Qdrant strict applies to
    count_filter): the unindexed-filter refusal gates them, indexed
    filters pass, and the declared-config default reaches them."""
    from bob_vector_db_spark.operators.query_search import (
        count_points,
        facet_values,
    )

    root, _q = store
    with pytest.raises(ValueError, match=r"Missing payload index.*num"):
        count_points(spark, root, "vecs",
                     flt=Filter(must=[MatchValue("num", 7)]), strict=True)
    assert count_points(spark, root, "vecs",
                        flt=Filter(must=[MatchValue("grp", 1)]),
                        strict=True) > 0
    with pytest.raises(ValueError, match=r"Missing payload index.*num"):
        facet_values(spark, root, "vecs", "grp",
                     flt=Filter(must=[MatchValue("num", 7)]), strict=True)
    assert facet_values(spark, root, "vecs", "grp",
                        strict=True).count() > 0
