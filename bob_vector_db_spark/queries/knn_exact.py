"""Exact kNN similarity search and its algorithmic twins (SURVEY J5/O3)."""


from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vector
from ..operators import centroid, knn, quantize, upsert
from ..sources import load_table

from ._registry import register
from ._shared import *  # noqa: F403 — shared oracle/fixture helpers


# ---------------------------------------------------------------------------
# Flagship: kNN similarity search (J5 + F7 + W1/O3) — the reference's
# delegated query surface (README.md:13, cosine per qdrant_embedder.py:96-102)
# ---------------------------------------------------------------------------

@register(
    "knn_cosine_topk",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
pairs AS (
  SELECT q.qid, e.vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(e.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(e.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, embeddings e
  WHERE q.qid <> e.vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = knn.knn_join(queries, emb, k=10)
    return out.select("qid", "vec_id", "sim", F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# J5 at bench scale: 100-query exact kNN on the vectorized partial-top-k
# physical path (BLAS matmul per partition + local top-k + tiny global merge)
# ---------------------------------------------------------------------------

@register(
    "knn_cosine_topk100",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 100
),
pairs AS (
  SELECT q.qid, e.vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(e.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(e.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, embeddings e
  WHERE q.qid <> e.vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_knn_topk100(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = knn.knn_join_vectorized(queries, emb, k=10)
    return out.select("qid", "vec_id", "sim", F.col("rank").cast("long").alias("rank"))


@register("knn_lsh_brp", oracle=None)  # probabilistic recall, rows-only
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-projection LSH buckets (rows-only; knn_cosine_topk is
    the exact twin on the same query set)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = knn.knn_join_lsh(queries, emb, k=10)
    return out.select("qid", "vec_id", "sim", F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# Flagship composite: FILTERED vector search — payload predicate + kNN + the
# matched point's payload in the result.  This is Qdrant's filtered search
# (the query surface README.md:13 delegates, with payload filters built at
# qdrant_embedder.py:119-128); in Spark the payload predicate is pushed into
# the parquet scan, so at 100 TB the filter prunes before any vector math.
# ---------------------------------------------------------------------------

@register(
    "knn_filtered_search",
    oracle="""
WITH corpus AS (
  SELECT vec_id, embedding, label FROM embeddings WHERE label IN (1, 3, 5, 7)
),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 8
),
pairs AS (
  SELECT q.qid, c.vec_id, c.label,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, corpus c
  WHERE q.qid <> c.vec_id
)
SELECT qid, vec_id, CAST(label AS BIGINT) AS label, sim,
       CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM pairs)
WHERE rank <= 5
""",
)
def q_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("label").isin([1, 3, 5, 7]))
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = knn.knn_join(queries, corpus, k=5)
    payload = emb.select("vec_id", F.col("label").cast("long").alias("label"))
    return (
        out.join(F.broadcast(payload), "vec_id")
        .select("qid", "vec_id", "label", "sim",
                F.col("rank").cast("long").alias("rank"))
    )


@register(
    "knn_ivf_blocked",
    oracle=f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
cent AS (
  SELECT label, list(cv ORDER BY pos) AS cvec FROM (
    SELECT label, pos,
           CAST(SUM(CAST(val AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS cv
    FROM (SELECT label, unnest(embedding)::DOUBLE AS val,
                 unnest(range(len(embedding))) AS pos
          FROM embeddings)
    GROUP BY label, pos) GROUP BY label
),
probes AS (
  SELECT qid, qvec, label FROM (
    SELECT q.qid, q.qvec, c.label,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {_DUCK_COS.format(a='q.qvec', b='c.cvec')} DESC,
                                       c.label) AS rk
    FROM q, cent c) WHERE rk <= 2
),
pairs AS (
  SELECT p.qid, e.vec_id, {_DUCK_COS.format(a='p.qvec', b='e.embedding')} AS sim
  FROM probes p JOIN embeddings e ON e.label = p.label AND e.vec_id <> p.qid
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cent = centroid.centroids(emb, exact=True)
    out = knn.knn_join_blocked(qs, emb, cent, k=10, n_probe=2)
    return out.select("qid", "vec_id", "sim", F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# Metric-aware kNN (round 4): the collection meta sidecar declares each
# vector space's distance (the vectors_config model, qdrant_embedder.py:95-102
# — there always COSINE); search_collection reads the DECLARED metric, so a
# collection created with "dot" or "euclid" is searched correctly without the
# caller restating it.
# ---------------------------------------------------------------------------

@register(
    "knn_dot_metric",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
pairs AS (
  SELECT q.qid, e.vec_id,
         round((SELECT SUM(a*b)
                FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                             unnest(e.embedding)::DOUBLE AS b)), 6) AS sim
  FROM q, embeddings e
  WHERE q.qid <> e.vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank FROM pairs)
WHERE rank <= 10
""",
)
def q_knn_dot_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-aware search: the collection declares distance=dot in its meta
    sidecar (vectors_config model, qdrant_embedder.py:95-102) and
    search_collection honors it without the caller restating."""
    base = _tmp_base(sf_dir, "knndot")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "dot"}})
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = knn.search_collection(spark, base, "vecs", qdf, k=10,
                                corpus_id="id", exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "knn_euclidean_metric",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
pairs AS (
  SELECT q.qid, e.vec_id,
         round(sqrt((SELECT SUM((a-b)*(a-b))
                     FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                  unnest(e.embedding)::DOUBLE AS b))), 6) AS sim
  FROM q, embeddings e
  WHERE q.qid <> e.vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim ASC, vec_id)
             AS rank FROM pairs)
WHERE rank <= 10
""",
)
def q_knn_euclidean_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-aware search, euclidean: declared distance ranks ASCENDING
    (smaller = nearer) through the same search_collection dispatch."""
    base = _tmp_base(sf_dir, "knneuc")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "euclid"}})
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = knn.search_collection(spark, base, "vecs", qdf, k=10,
                                corpus_id="id", exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "knn_manhattan_metric",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
pairs AS (
  SELECT q.qid, e.vec_id,
         round((SELECT SUM(abs(a-b))
                FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                             unnest(e.embedding)::DOUBLE AS b)), 6) AS sim
  FROM q, embeddings e
  WHERE q.qid <> e.vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim ASC, vec_id)
             AS rank FROM pairs)
WHERE rank <= 10
""",
)
def q_knn_manhattan_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-aware search, manhattan (round 10, VERDICT r9 missing #3 —
    Qdrant Distance.MANHATTAN, the fourth declared metric): L1 distance
    ranks ASCENDING through the same declared-space dispatch."""
    base = _tmp_base(sf_dir, "knnman")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "manhattan"}})
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = knn.search_collection(spark, base, "vecs", qdf, k=10,
                                corpus_id="id", exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# Quantized search (round 4): the Qdrant quantization_config surface —
# scalar int8 (4× memory, same plan shape) and binary sign-bit + exact
# rerank (32× memory on the candidate metric).  Both fully declarative and
# oracle-exact: the quantization arithmetic is integer/deterministic, so
# DuckDB reproduces codes, Hamming candidates, and the reranked top-k
# bit-for-bit (sim rounded to 6 like every kNN twin).
# ---------------------------------------------------------------------------

@register(
    "knn_sq_int8",
    oracle="""
WITH ex AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS val,
         unnest(range(0, len(embedding))) AS pos
  FROM embeddings
),
dims AS (
  SELECT pos, min(val) AS mn,
         CASE WHEN max(val) = min(val) THEN 1.0
              ELSE (max(val) - min(val)) / 255.0 END AS sc
  FROM ex GROUP BY pos
),
deq AS (
  SELECT vec_id, ex.pos, mn + round((val - mn) / sc) * sc AS dval
  FROM ex JOIN dims ON ex.pos = dims.pos
),
qex AS (
  SELECT vec_id AS qid, val AS qval, pos FROM ex WHERE vec_id < 5
),
qn AS (SELECT qid, sqrt(SUM(qval*qval)) AS qn FROM qex GROUP BY qid),
pairs AS (
  SELECT qex.qid, deq.vec_id, SUM(qex.qval * deq.dval) AS dot,
         sqrt(SUM(deq.dval * deq.dval)) AS cn
  FROM qex JOIN deq ON qex.pos = deq.pos
  WHERE qex.qid <> deq.vec_id
  GROUP BY qex.qid, deq.vec_id
),
scored AS (
  SELECT pairs.qid, vec_id, round(dot / (qn.qn * cn), 6) AS sim
  FROM pairs JOIN qn ON pairs.qid = qn.qid
  WHERE qn.qn * cn <> 0
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank FROM scored)
WHERE rank <= 10
""",
)
def q_knn_sq_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-int8 quantized top-k: per-dim min/max learned in one 64-row
    aggregate, search runs on dequantized codes with exact kNN's plan
    shape — DuckDB reproduces the quantization arithmetic exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = quantize.sq_knn(qdf, emb, k=10)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "knn_binary_rerank",
    oracle="""
WITH ex AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS val,
         unnest(range(0, len(embedding))) AS pos
  FROM embeddings
),
packed AS (
  SELECT vec_id,
         SUM(CASE WHEN pos < 32 AND val > 0
                  THEN CAST(1 AS BIGINT) << pos ELSE 0 END) AS w0,
         SUM(CASE WHEN pos >= 32 AND val > 0
                  THEN CAST(1 AS BIGINT) << (pos - 32) ELSE 0 END) AS w1
  FROM ex GROUP BY vec_id
),
q AS (SELECT vec_id AS qid, w0 AS qw0, w1 AS qw1 FROM packed WHERE vec_id < 5),
cand AS (
  SELECT qid, vec_id,
         row_number() OVER (
           PARTITION BY qid
           ORDER BY bit_count(xor(qw0, w0)) + bit_count(xor(qw1, w1)), vec_id
         ) AS crank
  FROM q, packed WHERE qid <> vec_id
),
qex AS (
  SELECT vec_id AS qid, val AS qval, pos FROM ex WHERE vec_id < 5
),
qn AS (SELECT qid, sqrt(SUM(qval*qval)) AS qn FROM qex GROUP BY qid),
rerank AS (
  SELECT c.qid, c.vec_id, SUM(qex.qval * ex.val) AS dot,
         sqrt(SUM(ex.val * ex.val)) AS cn
  FROM cand c
  JOIN ex ON ex.vec_id = c.vec_id
  JOIN qex ON qex.qid = c.qid AND qex.pos = ex.pos
  WHERE c.crank <= 50
  GROUP BY c.qid, c.vec_id
),
scored AS (
  SELECT rerank.qid, vec_id, round(dot / (qn.qn * cn), 6) AS sim
  FROM rerank JOIN qn ON rerank.qid = qn.qid
  WHERE qn.qn * cn <> 0
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank FROM scored)
WHERE rank <= 10
""",
)
def q_knn_binary_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary quantization + rescore: Hamming candidates over packed sign
    bits (float-free pair stream), exact cosine rerank of rerank_factor*k
    candidates — the Qdrant binary-quantization pattern, oracle-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = quantize.binary_knn_rerank(qdf, emb, k=10, dim=64, rerank_factor=5)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register("knn_ivf_kmeans", oracle=None)
def q_knn_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsupervised IVF (rows-only: k-means is iterative, off SQL): coarse
    centroids trained on a capped sample, corpus assigned to inverted lists
    by BLAS argmin, search probes only the n_probe nearest lists per query
    via an exploded equi-join on list_id — at scale the corpus is laid out
    by list and the probe reads ~n_probe/n_lists of it.  Recall vs exact is
    pinned in tests/test_quantize.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = quantize.ivf_train(emb, n_lists=16, iters=5)
    assigned = quantize.ivf_assign(emb, cents)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = quantize.ivf_knn(qdf, assigned, cents, k=10, n_probe=4)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register("knn_pq_adc", oracle=None)
def q_knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ADC top-k (rows-only: the k-means codebooks are an
    iterative algorithm outside SQL; recall vs exact kNN is pinned by
    tests/test_quantize.py).  8 subspaces × 64 centroids → each 64-dim
    float vector searches as 8 bytes of codes; distances come from a
    per-query LUT summed by pure JVM expressions."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = quantize.pq_train(emb, m=8, ksub=64, iters=5)
    enc = quantize.pq_encode(emb, books)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = quantize.pq_search(qdf, enc, books, k=10)
    return out.select("qid", "vec_id", "dist",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "knn_named_spaces",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
cos_pairs AS (
  SELECT q.qid, e.vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(e.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(e.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, embeddings e WHERE q.qid <> e.vec_id
),
euc_pairs AS (
  SELECT q.qid, e.vec_id,
         round(sqrt((SELECT SUM((a-b)*(a-b))
                     FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                  unnest(e.embedding)::DOUBLE AS b))), 6) AS sim
  FROM q, embeddings e WHERE q.qid <> e.vec_id
)
SELECT 'text' AS space, qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank FROM cos_pairs) WHERE rank <= 5
UNION ALL
SELECT 'profile' AS space, qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim ASC, vec_id)
             AS rank FROM euc_pairs) WHERE rank <= 5
""",
)
def q_knn_named_spaces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One collection, two NAMED vector spaces with different declared
    metrics (the multi-space vectors_config model, qdrant_embedder.py:95-102
    — e.g. a text space and an image space per point); search dispatches on
    (vector_name → declared distance) without the caller restating either."""
    base = _tmp_base(sf_dir, "named")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "mv", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"),
                      F.col("embedding").alias("text_vec"),
                      F.col("embedding").alias("profile_vec")),
        vector_config={"text_vec": {"size": 64, "distance": "cosine"},
                       "profile_vec": {"size": 64, "distance": "euclid"}})
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    by_text = knn.search_collection(
        spark, base, "mv", qdf, k=5, vector_name="text_vec",
        corpus_id="id", exclude_self=True)
    by_profile = knn.search_collection(
        spark, base, "mv", qdf, k=5, vector_name="profile_vec",
        corpus_id="id", exclude_self=True)
    return (
        by_text.select(F.lit("text").alias("space"), "qid", "vec_id", "sim",
                       F.col("rank").cast("long").alias("rank"))
        .unionByName(
            by_profile.select(F.lit("profile").alias("space"), "qid",
                              "vec_id", "sim",
                              F.col("rank").cast("long").alias("rank")))
    )


@register("knn_mmr_rerank", oracle=None)
def q_knn_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified search (Carbonell & Goldstein 1998 — the RAG
    diversity pass): a pool-sized filtered kNN feeds a greedy maximal-
    marginal-relevance pick so near-duplicate hits don't crowd the top-k.
    Rows-only by design: the greedy recursion has no closed SQL form; its
    determinism and agreement with a pure-python reference are pinned in
    tests/test_knn.py.  Only pool-sized per-query frames enter the greedy
    pass — the corpus pays one ordinary search."""
    from ..operators.query_api import search_points_mmr  # noqa: PLC0415

    base = _tmp_base(sf_dir, "mmr")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 300)
        .select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = search_points_mmr(spark, base, "vecs", qdf, k=10, pool=40,
                            lambda_=0.6)
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", "mmr_score",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "knn_mmr_k2",
    # round 10 (VERDICT r9 nit #2): at k=2 the MMR greedy IS closed-form
    # — pick1 = argmax sim (tie: min id), pick2 = argmax over the rest
    # of λ·sim − (1−λ)·cos(c, pick1) — so the applyInPandas greedy gets
    # a real SQL oracle and the rows-only set shrinks to pure-ML paths.
    # The pool is the plain top-20 cosine search (self included, sims
    # rounded 6), exactly search_points_mmr's candidate contract.
    oracle="""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
scored AS (
  SELECT q.qid, c.vec_id, c.embedding,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, corpus c
),
pool AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                              ORDER BY sim DESC, vec_id) AS rnk
                 FROM scored WHERE sim IS NOT NULL)
  WHERE rnk <= 20
),
p1 AS (SELECT qid, vec_id, sim, embedding FROM pool WHERE rnk = 1),
rest AS (
  -- greatest(0, cos): mmr_rerank zero-initializes max_div and only
  -- raises it, so a candidate NEGATIVELY correlated with pick1 pays no
  -- penalty (pinned in test_mmr_negative_cosine_clamps_at_zero) — the
  -- closed form must clamp identically
  SELECT p.qid, p.vec_id, p.sim,
         0.6 * p.sim - 0.4 * greatest(0.0,
           (SELECT SUM(a*b) FROM (SELECT unnest(p.embedding)::DOUBLE AS a,
                                         unnest(s.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(p.embedding)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(s.embedding)::DOUBLE AS b)))))
         AS m2
  FROM pool p JOIN p1 s ON p.qid = s.qid AND p.vec_id <> s.vec_id
),
p2 AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                              ORDER BY m2 DESC, vec_id) AS rnk2
                 FROM rest)
  WHERE rnk2 = 1
)
SELECT qid, vec_id, sim, round(0.6 * sim, 6) AS mmr_score,
       CAST(1 AS BIGINT) AS rank
FROM p1
UNION ALL
SELECT qid, vec_id, sim, round(m2, 6) AS mmr_score,
       CAST(2 AS BIGINT) AS rank
FROM p2
""",
)
def q_knn_mmr_k2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR at k=2 — the closed-form slice of the greedy: the first pick
    is the plain top hit, the second maximizes λ·sim − (1−λ)·cos(c,
    pick1) over the rest of the pool; the same applyInPandas greedy that
    serves knn_mmr_rerank runs here, hash-checked against the SQL
    closed form (its recursion for k>2 stays pytest-pinned)."""
    from ..operators.query_api import search_points_mmr  # noqa: PLC0415

    base = _tmp_base(sf_dir, "mmr2")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 300)
        .select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = search_points_mmr(spark, base, "vecs", qdf, k=2, pool=20,
                            lambda_=0.6)
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", "mmr_score",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "knn_multivector_maxsim",
    # ColBERT late interaction: per (query, point), each of the query's 4
    # token vectors takes its best match over the point's 4 vectors, the
    # maxima sum.  Tokens derive by slicing the 64-d fixture embedding
    # into 4 × 16-d, so both engines score identical multivectors.
    oracle="""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3),
qtok AS (
  SELECT vec_id AS qid, 1 AS ti, embedding[1:16] AS qv FROM q
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM q
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM q
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM q
),
ptok AS (
  SELECT vec_id, 1 AS pj, embedding[1:16] AS pv FROM embeddings
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM embeddings
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM embeddings
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM embeddings
),
best AS (
  SELECT qt.qid, pt.vec_id, qt.ti,
         MAX((SELECT SUM(a*b)
              FROM (SELECT unnest(qt.qv)::DOUBLE AS a,
                           unnest(pt.pv)::DOUBLE AS b))) AS m
  FROM qtok qt, ptok pt
  WHERE qt.qid <> pt.vec_id
  GROUP BY qt.qid, pt.vec_id, qt.ti
),
scored AS (
  SELECT qid, vec_id, round(SUM(m), 6) AS sim
  FROM best GROUP BY qid, vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM scored)
WHERE rank <= 10
""",
)
def q_knn_multivector_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivector spaces with MaxSim scoring (the modern Qdrant
    multivector collection config; ColBERT late interaction): every
    point carries a LIST of vectors, and score = Σ over query tokens of
    the best match among the point's vectors — computed entirely in
    nested higher-order array expressions (JVM codegen, broadcast
    queries, no corpus shuffle: the exact-kNN plan shape with a
    two-level fold)."""
    emb = load_table(spark, sf_dir, "embeddings")

    def mv(df):
        return df.select(
            F.col("vec_id"),
            F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                      for i in range(4)]).alias("vectors"))

    q = mv(emb.filter(F.col("vec_id") < 3)).withColumnRenamed(
        "vec_id", "qid").withColumnRenamed("vectors", "qvecs")
    out = knn.knn_join_maxsim(q, mv(emb), k=10, metric="dot",
                              exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))
