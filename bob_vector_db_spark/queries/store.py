"""Stored-collection lifecycle and searches: create/upsert/delete,
snapshots, tenants, persisted vector-index probes (SURVEY S5/S6/J5)."""


from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vector
from ..operators import index, knn, quantize, upsert
from ..operators.localframe import local_frame
from ..sources import load_table

from ._registry import register
from ._shared import *  # noqa: F403 — shared oracle/fixture helpers


@register(
    "store_delete_points",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS id, text AS document, lang
FROM documents WHERE doc_id % 7 <> 0
""",
)
def q_store_delete_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-delete by a DISTRIBUTED doomed-id set (Qdrant delete twin of
    upload_points, qdrant_embedder.py:58-62): ids hash to their buckets,
    only those rewrite; oracle checks the persisted readback."""
    base = _tmp_base(sf_dir, "del")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8,
        df=docs.select(F.col("doc_id").cast("string").alias("id"),
                       F.col("text").alias("document"), "lang"))
    # DataFrame-form doomed set: the id list never collects to the driver
    doomed = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").cast("string"))
    upsert.delete_points(spark, base, "docs", doomed, count_removed=False)
    return upsert.read_collection(spark, base, "docs").select(
        "id", "document", "lang")


@register(
    "store_delete_by_filter",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS id, text AS document, lang
FROM documents WHERE lang <> 'de'
""",
)
def q_store_delete_by_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload-filter delete: one pruned scan finds the buckets holding
    matches, survivors rewrite in place; oracle checks the readback."""
    base = _tmp_base(sf_dir, "delf")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8,
        df=docs.select(F.col("doc_id").cast("string").alias("id"),
                       F.col("text").alias("document"), "lang"))
    upsert.delete_by_filter(spark, base, "docs", "lang = 'de'",
                            count_removed=False)
    return upsert.read_collection(spark, base, "docs").select(
        "id", "document", "lang")


@register(
    "store_compaction",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS id, text AS document FROM documents
""",
)
def q_store_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket compaction after micro-batch upserts: rewrite each bucket to
    target file counts with byte-identical readback (oracle-checked)."""
    base = _tmp_base(sf_dir, "compact")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(spark, base, "docs", n_buckets=4)
    # four micro-batch upserts — the file-per-batch-per-bucket growth pattern
    # of streaming/ingest.py's foreachBatch sink
    for i in range(4):
        upsert.upsert(
            spark, base, "docs",
            docs.filter(F.col("doc_id") % 4 == i).select(
                F.col("doc_id").cast("string").alias("id"),
                F.col("text").alias("document")))
    stats = upsert.compact_collection(spark, base, "docs")
    assert stats["files_after"] <= stats["files_before"], stats
    return upsert.read_collection(spark, base, "docs").select("id", "document")


@register(
    "store_update_payload",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS id, text AS document,
       CASE WHEN doc_id % 5 = 0 THEN 'xx' ELSE lang END AS lang,
       CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS flagged
FROM documents
""",
)
def q_store_update_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant set_payload twin: patch only the carried columns of the
    targeted ids; everything else (document text, other payload keys,
    untouched buckets) stays byte-identical."""
    base = _tmp_base(sf_dir, "updpay")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8,
        df=docs.select(F.col("doc_id").cast("string").alias("id"),
                       F.col("text").alias("document"), "lang",
                       F.lit(0).alias("flagged")))
    patch = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").cast("string").alias("id"),
        F.lit("xx").alias("lang"), F.lit(1).alias("flagged"))
    upsert.update_columns(spark, base, "docs", patch)
    return upsert.read_collection(spark, base, "docs").select(
        "id", "document", "lang", "flagged")


@register(
    "store_catalog",
    oracle="""
SELECT * FROM (VALUES ('cat_alpha', CAST(4 AS BIGINT), CAST(1 AS BIGINT)),
                      ('cat_gamma', CAST(8 AS BIGINT), CAST(2 AS BIGINT)))
       AS t(collection, n_buckets, n_vectors)
""",
)
def q_store_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog half of the store API: create / list / drop collections with
    persisted layout + vector-config meta; idempotent re-create must not
    clobber (chroma_embedder.py:30-32 get_or_create model)."""
    base = _tmp_base(sf_dir, "cat")
    upsert.create_collection(spark, base, "cat_alpha", n_buckets=4,
                             vector_config={"text": {"size": 64, "distance": "cosine"}})
    upsert.create_collection(spark, base, "cat_beta")
    upsert.create_collection(spark, base, "cat_gamma", n_buckets=8,
                             vector_config={"text": {"size": 64, "distance": "dot"},
                                            "image": {"size": 64, "distance": "euclid"}})
    # idempotent re-create must NOT clobber the stored layout
    upsert.create_collection(spark, base, "cat_beta", n_buckets=99)
    upsert.drop_collection(base, "cat_beta")
    rows = [(m["collection"], int(m["n_buckets"]), len(m.get("vectors", {})))
            for m in upsert.list_collections(base)]
    return local_frame(
        spark, rows, "collection string, n_buckets long, n_vectors long")


# ---------------------------------------------------------------------------
# Persisted vector index (round 5): the index is built ONCE into the
# collection store (the Qdrant model — the reference's collection indexes at
# upsert time, qdrant_embedder.py:95-103) and searches probe the stored,
# list-partitioned artifact through static partition pruning instead of
# retraining per query.  Staleness is version-gated: a mutation bumps the
# collection's data version and auto-dispatch falls back to the exact scan.
# ---------------------------------------------------------------------------

@register(
    "store_indexed_search",
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
def q_store_indexed_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search through the PERSISTED IVF index: build_vector_index lays the
    stored vectors out by inverted list once; the search probes the stored
    artifact (static list_id partition pruning, tests/test_index.py).  With
    n_probe = n_lists the probe covers every list, so the result is exactly
    the exact-scan kNN — which is what the oracle checks; the n_probe <
    n_lists ANN path is store_indexed_probe."""
    base = _tmp_base(sf_dir, "sidx")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf",
                             n_lists=8, iters=4)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = knn.search_collection(
        spark, base, "vecs", qdf, k=10, corpus_id="id", exclude_self=True,
        use_index="always", n_probe=8)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "store_indexed_probe",
    # full probe (n_probe=None → every list) over the 16-list layout: the
    # stored artifact is exercised end-to-end and the answer EQUALS the
    # exact kNN — so the probe path gets a real hash-matched oracle.  The
    # n_probe < n_lists ANN behavior (probabilistic by k-means design)
    # stays pinned by tests/test_index.py's recall + pruning tests.
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
def q_store_indexed_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search_indexed over the stored 16-list IVF artifact at FULL probe
    (n_probe=None probes every list): the partition-pruned probe plan
    runs end-to-end and the result provably equals the exact kNN — the
    oracle hash-checks it.  The accuracy-trading n_probe < n_lists case
    is the same plan with a shorter list_id IN (...) set (pruning +
    recall pinned in tests/test_index.py)."""
    base = _tmp_base(sf_dir, "sidxp")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf",
                             n_lists=16, iters=5)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = index.search_indexed(spark, base, "vecs", qdf, k=10, n_probe=None,
                               exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "store_indexed_sq",
    # full probe + corpus-covering rerank: the int8 artifact is searched
    # end-to-end (dequantized ADC inside every list, bucket-pruned exact
    # rescore) and the answer provably equals the exact kNN — hash-matched
    # against the exact-cosine oracle.  The ANN trade (n_probe < n_lists,
    # small rerank) is the same plan with shorter static filters; recall
    # is pinned in tests/test_index.py.
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
def q_store_indexed_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored IVF-SQ (the Qdrant scalar-quantization collection config):
    int8 codes clustered by inverted list — a 4-8× smaller searchable
    artifact than the float copy; search scores the DEQUANTIZED codes
    inside the probed lists (pure codegen) and exact-rescores the
    candidates fetched back through the store's id-bucket filter.  Run
    at FULL probe with a corpus-covering rerank window, the result
    equals the exact kNN — which the oracle hash-checks, proving the
    quantize → store → probe → rescore loop loses nothing."""
    base = _tmp_base(sf_dir, "sidxsq")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_sq",
                             n_lists=16, iters=4)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = index.search_indexed(spark, base, "vecs", qdf, k=10, n_probe=None,
                               rerank_factor=1000, exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "store_indexed_bq",
    # round 10 (VERDICT r9 missing #1): the BINARY-quantization artifact
    # — Qdrant's cheapest advertised memory path (32x compression).  The
    # stored layout is packed sign bits clustered by IVF list; search
    # ranks popcount-of-XOR Hamming inside the probed list_id partitions
    # (integer-only, pure codegen) and exact-rescores the candidates
    # fetched back through the store's id-bucket filter.  Full probe +
    # corpus-covering rerank (1000·k >= both gate corpora) equals the
    # exact kNN — hash-matched, so the pack → store → Hamming → rescore
    # loop provably loses nothing.
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
def q_store_indexed_bq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored IVF-BQ (the Qdrant binary-quantization collection config):
    1 sign bit per dimension packed into 32-bit words, clustered by
    inverted list — a 32x smaller searchable artifact; search ranks
    Hamming (popcount of xor, integer codegen) inside the probed lists
    and exact-rescores candidates fetched back through the store's
    id-bucket filter.  At FULL probe with a corpus-covering rerank the
    result equals the exact kNN, which the oracle hash-checks."""
    base = _tmp_base(sf_dir, "sidxbq")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_bq",
                             n_lists=16, iters=4)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = index.search_indexed(spark, base, "vecs", qdf, k=10, n_probe=None,
                               rerank_factor=1000, exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "api_quantized_no_rescore",
    # round 13 (VERDICT r12 #1): Qdrant QuantizationSearchParams
    # rescore=False — the cheap-recall mode every quantized deployment
    # uses: return the QUANTIZED-score ranking, skipping the
    # exact-rescore fetch entirely.  On the BQ artifact the quantized
    # score is DETERMINISTIC (sign bits + integer Hamming — no k-means
    # in the scoring path), so the oracle recomputes it directly:
    # hamming(q, c) = #dims where (q_i > 0) != (c_i > 0), ranked
    # ascending with id tie-break.  Full probe makes the page
    # corpus-complete.
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
pairs AS (
  SELECT q.qid, e.vec_id,
         CAST((SELECT SUM(CASE WHEN (a > 0) <> (b > 0) THEN 1 ELSE 0 END)
               FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                            unnest(e.embedding)::DOUBLE AS b)) AS DOUBLE)
           AS sim
  FROM q, embeddings e
  WHERE q.qid <> e.vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim ASC, vec_id) AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_api_quantized_no_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QuantizationSearchParams(rescore=False) through search_points over
    the stored IVF-BQ artifact at FULL probe: the returned page is the
    Hamming ranking itself (sim = integer Hamming distance, ascending) —
    no exact-rescore fetch, no float-vector IO at query time.  The
    oracle recomputes the sign-bit Hamming distance from the raw
    embeddings, so the quantized scores themselves are hash-matched —
    proving the pack → store → probe → rank loop bit-exact."""
    base = _tmp_base(sf_dir, "qnores")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_bq",
                             n_lists=16, iters=4)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = index.search_indexed(spark, base, "vecs", qdf, k=10, n_probe=None,
                               exclude_self=True, rescore=False)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "api_quantized_oversampling",
    # round 13: the oversampling half of QuantizationSearchParams — the
    # candidate stage sized at ceil(oversampling*k) instead of
    # rerank_factor*k.  At full probe with a corpus-covering
    # oversampling the rescored answer equals the exact kNN, which the
    # oracle hash-checks (the store_indexed_sq exactness pattern, now
    # driven by the Qdrant knob).
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
def q_api_quantized_oversampling(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """QuantizationSearchParams(oversampling=N) through the stored IVF-SQ
    artifact: the dequantized candidate stage fetches ceil(N·k) rows per
    query (the Qdrant oversampling contract — rerank_factor expressed as
    a float multiple of k), then the exact rescore.  A corpus-covering N
    at full probe provably equals the exact kNN."""
    base = _tmp_base(sf_dir, "qover")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_sq",
                             n_lists=16, iters=4)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = knn.search_collection(
        spark, base, "vecs", qdf, k=10, corpus_id="id", exclude_self=True,
        n_probe=None, oversampling=10000.0)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "store_indexed_pq",
    # full probe + corpus-covering rerank: the 8-byte-code artifact runs
    # its whole ADC + bucket-pruned exact-rescore loop and the answer
    # equals the exact kNN — hash-matched, so every stored index kind
    # (ivf / ivf_sq / ivf_pq) now carries a real oracle.  The ANN trade
    # (narrow probe, small rerank) keeps its recall pins in
    # tests/test_index.py / tests/test_quantize.py.
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
def q_store_indexed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored IVF-PQ: the searchable artifact holds m-byte codes clustered
    by list (32× smaller than the floats); search = probed-list ADC over
    the stored codes + exact cosine rescore of candidates fetched back
    through the store's id-bucket filter.  At full probe with a
    corpus-covering rerank window the result equals the exact kNN — the
    oracle hash-checks the whole encode → store → ADC → rescore loop."""
    base = _tmp_base(sf_dir, "sidxpq")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_pq",
                             n_lists=8, m=8, ksub=32, iters=3)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = index.search_indexed(spark, base, "vecs", qdf, k=10, n_probe=None,
                               rerank_factor=1000, exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "store_index_refresh",
    oracle="""
WITH corpus AS (
  SELECT e.vec_id AS vid, e2.embedding AS emb
  FROM embeddings e JOIN embeddings e2 ON e2.vec_id = e.vec_id + 300
  WHERE e.vec_id < 10
  UNION ALL
  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 20
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings
  WHERE vec_id BETWEEN 50 AND 59
),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
pairs AS (
  SELECT q.qid, c.vid AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.emb)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.emb)::DOUBLE AS b)))),
           6) AS sim
  FROM q, corpus c
  WHERE q.qid <> c.vid
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_index_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance end-to-end: build the stored IVF index,
    then overwrite 10 points, insert 10 new ones and delete 10 — and absorb
    it all with ONE refresh_vector_index call (delta log → assign with the
    STORED centroids → append at generation 1 + masks), no retrain, no
    rewrite.  use_index='always' proves the index is fresh again, and the
    full-probe result must equal the exact scan over the FINAL corpus —
    which is what the oracle recomputes."""
    base = _tmp_base(sf_dir, "sidxr")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf",
                             n_lists=8, iters=4)
    overwrite = (emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 310))
                 .select((F.col("vec_id") - 300).alias("id"), "embedding"))
    fresh_pts = (emb.filter(F.col("vec_id").between(50, 59))
                 .select((F.col("vec_id") + 100000).alias("id"), "embedding"))
    upsert.upsert(spark, base, "vecs", overwrite.unionByName(fresh_pts),
                  id_col="id")
    upsert.delete_points(spark, base, "vecs", list(range(10, 20)),
                         count_removed=False)
    index.refresh_vector_index(spark, base, "vecs")
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = knn.search_collection(
        spark, base, "vecs", qdf, k=10, corpus_id="id", exclude_self=True,
        use_index="always", n_probe=8)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register("store_sparse_indexed", oracle=_SPARSE_ORACLE)
def q_store_sparse_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse search over the PERSISTED sparse index: the posting table is
    materialized once into the collection store partitioned by dimension
    hash bucket; the query's active dims arrive as a static ``dim_bucket
    IN (...)`` partition filter plus an ``idx IN (...)`` pushed predicate —
    only the probed posting lists are read, zero corpus passes at query
    time.  Same oracle as the in-memory sparse_knn_text, proving
    stored-index parity."""
    from ..operators.sparse import (  # noqa: PLC0415
        build_sparse_index,
        postings_from_text,
        sparse_search_indexed,
    )

    base = _tmp_base(sf_dir, "sparseidx")
    docs = load_table(spark, sf_dir, "documents")
    post = postings_from_text(docs, id_col="doc_id", text_col="text",
                              vocab_size=512)
    pts = (post.groupBy("id")
           .agg(F.array_sort(F.collect_list(F.struct("idx", "val")))
                .alias("z"))
           .select("id",
                   F.col("z.idx").alias("indices"),
                   F.col("z.val").alias("values")))
    upsert.create_collection(
        spark, base, "sp", df=pts, id_col="id", n_buckets=8,
        vector_config={"text_sparse": {"kind": "sparse", "distance": "dot"}})
    build_sparse_index(spark, base, "sp", n_dim_buckets=16)
    qpost = post.filter(F.col("id") < 3)
    out = sparse_search_indexed(spark, base, "sp", qpost, k=10,
                                exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "store_payload_search",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
cand AS (
  SELECT vec_id, embedding FROM embeddings WHERE label IN (2, 5)
),
pairs AS (
  SELECT q.qid, c.vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, cand c
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_payload_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered search through a PERSISTED payload index (Qdrant
    create_payload_index): the filter resolves to its id set from the
    value-hash-bucketed inverted index (static val_bucket partition filter),
    those ids fetch through a static id_bucket filter + broadcast semi-join,
    and only the matching points are scored — two pruned probes, zero full
    scans.  Results must equal the exact filtered kNN (the oracle)."""
    from ..operators.payload_index import (  # noqa: PLC0415
        build_payload_index,
        filtered_search_indexed,
    )

    base = _tmp_base(sf_dir, "pidx")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding", "label"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_payload_index(spark, base, "vecs", "label", n_val_buckets=16)
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = filtered_search_indexed(spark, base, "vecs", qdf,
                                  column="label", values=[2, 5], k=10)
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_alias_switch",
    oracle="""
SELECT doc_id AS id, upper(text) AS text FROM documents WHERE doc_id < 150
""",
)
def q_store_alias_switch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aliases (Qdrant update_collection_aliases): readers go
    through the alias, reindexes build a NEW collection under a fresh name
    and atomically swing the pointer — the zero-downtime reindex pattern.
    Here 'prod' starts on the green copy, a transformed blue copy is built
    beside it, the alias repoints, and the read through 'prod' must show
    blue (the oracle recomputes blue's content)."""
    base = _tmp_base(sf_dir, "alias")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    upsert.create_collection(
        spark, base, "green", n_buckets=4, id_col="id",
        df=docs.select(F.col("doc_id").alias("id"), "text"))
    upsert.create_alias(base, "prod", "green")
    upsert.create_collection(
        spark, base, "blue", n_buckets=4, id_col="id",
        df=docs.select(F.col("doc_id").alias("id"),
                       F.upper("text").alias("text")))
    upsert.create_alias(base, "prod", "blue")  # atomic repoint
    return upsert.read_collection(spark, base, "prod").select("id", "text")


@register(
    "store_snapshot_restore",
    oracle="""
SELECT doc_id AS id, text FROM documents WHERE doc_id < 200
""",
)
def q_store_snapshot_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant snapshot API twin: snapshot the collection, mutate it hard
    (delete a third, overwrite, insert junk), then restore — the readback
    must be the exact pre-snapshot state (the oracle recomputes it from the
    source table).  Snapshots hardlink the immutable parquet files (O(file
    count), not O(bytes) — the local twin of an object store's server-side
    copy), and the restore is one atomic directory swap."""
    base = _tmp_base(sf_dir, "snap")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.filter(F.col("doc_id") < 200)
        .select(F.col("doc_id").alias("id"), "text"))
    upsert.snapshot_collection(base, "docs", name="before")
    upsert.delete_points(spark, base, "docs", list(range(0, 200, 3)),
                         count_removed=False)
    upsert.upsert(spark, base, "docs", local_frame(
        spark, [(5, "overwritten"), (9999, "junk row")],
        "id long, text string"))
    upsert.restore_collection(base, "docs", "before")
    return upsert.read_collection(spark, base, "docs").select("id", "text")


@register(
    "store_filter_dsl_indexed",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
cand AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE label IN (2, 5) AND (vec_id % 3) <= 1
),
pairs AS (
  SELECT q.qid, c.vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, cand c
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_filter_dsl_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same Filter object routed through the PAYLOAD INDEX: the
    indexable must leaf (MatchAny on the indexed ``label``) resolves to a
    pruned posting probe, the candidates fetch via the static id-bucket
    filter, and only the residual (Range on the unindexed ``parity``)
    evaluates on the fetched rows — the Qdrant selective-filter plan,
    dispatched by operators.filters.filter_match_ids.  Results equal the
    exact filtered kNN (the oracle)."""
    from ..operators import query_api  # noqa: PLC0415
    from ..operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "fdsl")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding", "label",
                      (F.col("vec_id") % 3).alias("parity")),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_payload_index(spark, base, "vecs", "label", n_val_buckets=16)
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    flt = Filter(must=[MatchAny("label", [2, 5]), Range("parity", lte=1)])
    out = query_api.search_points(spark, base, "vecs", qdf, flt=flt, k=10,
                                  use_payload_index="always")
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_update_vectors",
    # corpus = vec_id < 200, with ids < 20 re-pointed at the embedding of
    # vec_id + 300 (the update_vectors patch); exact cosine top-10 for three
    # query vectors drawn from rows 400-402 (outside the collection).
    oracle="""
WITH corpus AS (
  SELECT e.vec_id AS id,
         CASE WHEN e.vec_id < 20
              THEN (SELECT p.embedding FROM embeddings p
                    WHERE p.vec_id = e.vec_id + 300)
              ELSE e.embedding END AS embedding
  FROM embeddings e WHERE e.vec_id < 200
),
q AS (
  SELECT vec_id - 400 AS qid, embedding AS qvec FROM embeddings
  WHERE vec_id >= 400 AND vec_id < 403
),
pairs AS (
  SELECT q.qid, c.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, corpus c
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_update_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``update_vectors`` twin: patch 20 points' vectors in place
    (payloads untouched), refresh_all_indexes absorbs the patch through the
    delta log — O(|patch|), re-assigning each patched id to its NEW IVF
    list — and the search through the stored index (full probe) returns
    exactly the post-patch kNN the oracle recomputes from the source
    table."""
    base = _tmp_base(sf_dir, "updvec")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 200)
        .select(F.col("vec_id").alias("id"), "embedding", "label"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf",
                             n_lists=8, iters=3)
    patch = (emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 320))
             .select((F.col("vec_id") - 300).alias("id"), "embedding"))
    upsert.update_vectors(spark, base, "vecs", patch)
    index.refresh_all_indexes(spark, base, "vecs")
    qdf = (emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 403))
           .select((F.col("vec_id") - 400).alias("qid"),
                   F.col("embedding").alias("qvec")))
    out = knn.search_collection(
        spark, base, "vecs", qdf, k=10, corpus_id="id", exclude_self=False,
        use_index="always", n_probe=8)
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_tenant_search",
    # tenant = 't' || (label % 3); the scoped search sees ONLY tenant t1's
    # points — the oracle recomputes that tenant's exact cosine top-10.
    oracle="""
WITH corpus AS (
  SELECT vec_id AS id, embedding FROM embeddings WHERE (label % 3) = 1
),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings
  WHERE vec_id >= 490 AND vec_id < 493
),
pairs AS (
  SELECT q.qid, c.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, corpus c
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_tenant_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multitenant search (Qdrant shard-key / group_id pattern): the
    collection partitions ``tenant=<v>/id_bucket=<n>`` — one level ABOVE
    the id bucket — so the tenant-scoped search prunes to tenant t1's
    subtree (a static partition filter on the outermost level,
    plan-asserted in tests/test_tenant.py) and never lists another
    tenant's data.  At 100 TB a tenant's slice is the prunable unit: the
    scoped exact scan reads |tenant| rows, not |collection|."""
    base = _tmp_base(sf_dir, "mtsearch")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        F.concat(F.lit("t"), (F.col("label") % 3).cast("string"))
        .alias("tenant"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        tenant_col="tenant",
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    qdf = (emb.filter((F.col("vec_id") >= 490) & (F.col("vec_id") < 493))
           .select(F.col("vec_id").alias("qid"),
                   F.col("embedding").alias("qvec")))
    out = knn.search_collection(spark, base, "vecs", qdf, k=10,
                                corpus_id="id", exclude_self=False,
                                tenant="t1")
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_batch_update",
    # the batch: upsert (5 overwrites + 10 new rows) -> delete ids 5-9 ->
    # set_payload flagged=1 on multiples of 20 -> delete_by_filter lang='fr';
    # the oracle composes the same four steps over the source table.
    oracle="""
WITH kept AS (
  SELECT CAST(doc_id AS VARCHAR) AS id,
         CASE WHEN doc_id < 5 THEN 'rewritten ' || CAST(doc_id AS VARCHAR)
              ELSE text END AS document,
         CASE WHEN doc_id < 5 THEN 'en' ELSE lang END AS lang,
         doc_id AS key
  FROM documents
  WHERE doc_id < 300 AND doc_id NOT BETWEEN 5 AND 9
),
newrows AS (
  SELECT CAST(300 + i AS VARCHAR) AS id,
         'new doc ' || CAST(i AS VARCHAR) AS document, 'xx' AS lang,
         300 + i AS key
  FROM range(10) t(i)
),
unioned AS (SELECT * FROM kept UNION ALL SELECT * FROM newrows)
SELECT id, document, lang,
       CAST(CASE WHEN key % 20 = 0 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM unioned WHERE lang <> 'fr'
""",
)
def q_store_batch_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``batch_update_points``: four mutations applied IN ORDER in
    one call — upsert (overwrites + inserts), delete-by-id, set_payload,
    delete-by-filter — each publishing its own delta and version, later
    ops seeing earlier ops' effects.  The readback equals the oracle's
    composition of the same four steps."""
    base = _tmp_base(sf_dir, "batchup")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.filter(F.col("doc_id") < 300)
        .select(F.col("doc_id").cast("string").alias("id"),
                F.col("text").alias("document"), "lang",
                F.lit(0).alias("flagged")))
    up = local_frame(
        spark,
        [(str(i), f"rewritten {i}", "en", 0) for i in range(5)]
        + [(str(300 + i), f"new doc {i}", "xx", 0) for i in range(10)],
        "id string, document string, lang string, flagged int")
    patch = local_frame(
        spark, [(str(k), 1) for k in range(0, 310, 20)],
        "id string, flagged int")
    versions = upsert.batch_update_points(spark, base, "docs", [
        ("upsert", up),
        ("delete", [str(i) for i in range(5, 10)]),
        ("set_payload", patch),
        ("delete_by_filter", "lang = 'fr'"),
    ])
    assert versions == [1, 2, 3, 4], versions
    info = upsert.collection_info(spark, base, "docs")
    assert info["version"] == 4 and info["points_count"] > 0, info
    return (upsert.read_collection(spark, base, "docs")
            .select("id", "document", "lang",
                    F.col("flagged").cast("long").alias("flagged")))


@register(
    "store_tenant_indexed",
    # tenant t1's OWN trained index, full probe -> exactly tenant t1's kNN
    oracle="""
WITH corpus AS (
  SELECT vec_id AS id, embedding FROM embeddings WHERE (label % 3) = 1
),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings
  WHERE vec_id >= 480 AND vec_id < 483
),
pairs AS (
  SELECT q.qid, c.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, corpus c
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_tenant_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tenant index (the scale path for a BIG tenant): tenant t1 gets
    its OWN trained IVF artifact over its partition subtree; the scoped
    search dispatches to it (use_index='always') and at full probe equals
    exactly that tenant's kNN — which is what the oracle recomputes.
    Other tenants' data never enters the artifact, and refresh keeps it
    scoped (tests/test_tenant.py)."""
    base = _tmp_base(sf_dir, "mtidx")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        F.concat(F.lit("t"), (F.col("label") % 3).cast("string"))
        .alias("tenant"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        tenant_col="tenant",
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf", n_lists=4,
                             iters=4, tenant="t1")
    qdf = (emb.filter((F.col("vec_id") >= 480) & (F.col("vec_id") < 483))
           .select(F.col("vec_id").alias("qid"),
                   F.col("embedding").alias("qvec")))
    out = knn.search_collection(spark, base, "vecs", qdf, k=10,
                                corpus_id="id", exclude_self=False,
                                tenant="t1", use_index="always", n_probe=4)
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_discover",
    # discover over a STORED collection through the universal query API's
    # {'discover': ...} node: target + context ids fetch their stored
    # vectors (id-bucket pruned) and are excluded from the results.
    oracle=f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id < 300 AND vec_id NOT IN (0, 10, 11, 12, 13)
),
ref AS (
  SELECT (SELECT embedding FROM embeddings WHERE vec_id = 0)  AS tgt,
         (SELECT embedding FROM embeddings WHERE vec_id = 10) AS p1,
         (SELECT embedding FROM embeddings WHERE vec_id = 11) AS n1,
         (SELECT embedding FROM embeddings WHERE vec_id = 12) AS p2,
         (SELECT embedding FROM embeddings WHERE vec_id = 13) AS n2
),
scored AS (
  SELECT c.vec_id,
         {_duck_cos('c.embedding', 'r.tgt')} AS sim,
         (CASE WHEN {_duck_cos('c.embedding', 'r.p1')}
                  > {_duck_cos('c.embedding', 'r.n1')} THEN 1 ELSE 0 END
        + CASE WHEN {_duck_cos('c.embedding', 'r.p2')}
                  > {_duck_cos('c.embedding', 'r.n2')} THEN 1 ELSE 0 END)
         AS ctx_wins
  FROM corpus c, ref r
)
SELECT vec_id, CAST(ctx_wins AS BIGINT) AS ctx_wins, sim,
       CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number()
             OVER (ORDER BY ctx_wins DESC, sim DESC, vec_id) AS rank
      FROM scored)
WHERE rank <= 10
""",
)
def q_store_discover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``discover`` through the STORE and the universal
    ``query_points`` API: ``query={'discover': {'target': 0, 'context':
    [(10, 11), (12, 13)]}}`` — the target and context POINT IDS resolve
    to their stored vectors via the id-bucket fetch, fold into ONE
    broadcast row, and the collection scans once with per-row JVM
    expressions (|pairs|+1 cosines per point, no shuffle).  Example ids
    never appear as hits."""
    from ..operators.query_api import query_points  # noqa: PLC0415

    base = _tmp_base(sf_dir, "discstore")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 300)
        .select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    out = query_points(
        spark, base, "vecs",
        query={"discover": {"target": 0,
                            "context": [(10, 11), (12, 13)]}}, k=10)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      F.col("ctx_wins").cast("long").alias("ctx_wins"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_context",
    # context-only search over a STORED collection through the
    # {'context': ...} query node: score = sum of min(0, cos(c,p)-cos(c,n))
    # per pair; pair ids excluded from the results.
    oracle="""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id < 300 AND vec_id NOT IN (10, 11, 12, 13)
),
refs AS (
  SELECT
    (SELECT embedding FROM embeddings WHERE vec_id = 10) AS p1,
    (SELECT embedding FROM embeddings WHERE vec_id = 11) AS n1,
    (SELECT embedding FROM embeddings WHERE vec_id = 12) AS p2,
    (SELECT embedding FROM embeddings WHERE vec_id = 13) AS n2
),
cosines AS (
  SELECT c.vec_id,
    round((SELECT SUM(a*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                                        unnest(r.p1)::DOUBLE AS b))
      / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(c.embedding)::DOUBLE AS a)))
        * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(r.p1)::DOUBLE AS b)))), 6) AS cp1,
    round((SELECT SUM(a*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                                        unnest(r.n1)::DOUBLE AS b))
      / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(c.embedding)::DOUBLE AS a)))
        * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(r.n1)::DOUBLE AS b)))), 6) AS cn1,
    round((SELECT SUM(a*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                                        unnest(r.p2)::DOUBLE AS b))
      / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(c.embedding)::DOUBLE AS a)))
        * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(r.p2)::DOUBLE AS b)))), 6) AS cp2,
    round((SELECT SUM(a*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                                        unnest(r.n2)::DOUBLE AS b))
      / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(c.embedding)::DOUBLE AS a)))
        * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(r.n2)::DOUBLE AS b)))), 6) AS cn2
  FROM corpus c, refs r
)
SELECT vec_id, ctx_score, CAST(rank AS BIGINT) AS rank
FROM (SELECT vec_id,
             round(least(0, cp1 - cn1) + least(0, cp2 - cn2), 6)
               AS ctx_score,
             row_number() OVER (
               ORDER BY round(least(0, cp1 - cn1) + least(0, cp2 - cn2), 6)
                        DESC, vec_id) AS rank
      FROM cosines)
WHERE rank <= 10
""",
)
def q_store_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant CONTEXT search through the STORE and the universal
    ``query_points`` API: ``query={'context': [(10, 11), (12, 13)]}`` —
    pair ids resolve to stored vectors, one broadcast row, one corpus
    scan; each pair contributes ``min(0, cos(c,p) − cos(c,n))`` and the
    top-k are the points deepest inside the context zone (0 = fully
    inside).  Pair ids never appear as hits."""
    from ..operators.query_api import query_points  # noqa: PLC0415

    base = _tmp_base(sf_dir, "ctxstore")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 300)
        .select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    out = query_points(
        spark, base, "vecs",
        query={"context": [(10, 11), (12, 13)]}, k=10)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      "ctx_score", F.col("rank").cast("long").alias("rank"))


@register(
    "store_array_payload_search",
    # tags indexed per ELEMENT; MatchContains routes through the array
    # payload index, the Range on the unindexed parity stays residual.
    oracle=f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding,
         ['p' || CAST(vec_id % 2 AS VARCHAR),
          'l' || CAST(label % 3 AS VARCHAR)] AS tags,
         vec_id % 3 AS parity
  FROM embeddings
),
flt AS (SELECT * FROM corpus WHERE {_ARR_FLT.to_sql()}),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT q.qid, f.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(f.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(f.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, flt f
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_array_payload_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload index over an ARRAY column (the Qdrant keyword-index-on-
    array model): the index stores one posting per ELEMENT, so a
    MatchContains leaf resolves to a pruned element probe —
    use_payload_index='always' proves the routing — while the Range on
    the unindexed column evaluates residually on the fetched candidates.
    Results equal the exact filtered kNN (the oracle)."""
    from ..operators import query_api  # noqa: PLC0415
    from ..operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "arrpay")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        F.array(F.concat(F.lit("p"), (F.col("vec_id") % 2).cast("string")),
                F.concat(F.lit("l"), (F.col("label") % 3).cast("string")))
        .alias("tags"),
        (F.col("vec_id") % 3).alias("parity"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_payload_index(spark, base, "vecs", "tags", n_val_buckets=16)
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = query_api.search_points(spark, base, "vecs", qdf, flt=_ARR_FLT,
                                  k=10, use_payload_index="always")
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_filtered_indexed_search",
    # the composed plan at full probe is oracle-able: payload-index ids
    # (grp indexed; parity residual on the bucket-pruned fetch) semi-join
    # INSIDE the probed list partitions of the stored IVF artifact, and
    # with every list probed the answer equals the exact filtered kNN.
    oracle=f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding,
         'g' || CAST(label % 4 AS VARCHAR) AS grp,
         vec_id % 3 AS parity
  FROM embeddings
),
flt AS (SELECT * FROM corpus WHERE {_FIS_FLT.to_sql()}),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT q.qid, f.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(f.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(f.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, flt f
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_filtered_indexed_search(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Filtered search COMPOSED with the persisted ANN index — the
    Qdrant filtered-HNSW twin for this store (filters evaluated inside
    the index walk; here: inside the probed partitions).  The filter
    resolves through the payload index (``grp`` posting probe; the
    unindexed ``parity`` range evaluates residually on the id-bucket-
    pruned fetch), and the surviving ids semi-join INSIDE the probed
    ``list_id`` partitions of the stored IVF artifact — payload pruning
    AND list pruning in ONE plan (plan-asserted in tests/test_index.py).
    At full probe the composition is exact, which the oracle
    hash-checks."""
    from ..operators import query_api  # noqa: PLC0415
    from ..operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "fidx")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        F.concat(F.lit("g"), (F.col("label") % 4).cast("string")).alias("grp"),
        (F.col("vec_id") % 3).alias("parity"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_concurrently(  # independent artifacts — overlap (guide §2.6)
        lambda: build_payload_index(spark, base, "vecs", "grp",
                                    n_val_buckets=16),
        lambda: index.build_vector_index(spark, base, "vecs", kind="ivf",
                                         n_lists=8, iters=4))
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = query_api.search_points(spark, base, "vecs", qdf, flt=_FIS_FLT,
                                  k=10, use_index="always", n_probe=None,
                                  use_payload_index="always")
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_bq_filtered_indexed",
    # round 10: the composed filtered search THROUGH the binary-
    # quantization artifact — payload-index candidate ids semi-join
    # inside the probed list partitions of the packed-sign-bit layout,
    # the Hamming coarse stage ranks only the survivors, and the exact
    # rescore recovers the metric; at full probe with a covering rerank
    # the composition equals the exact filtered kNN (hash-checked).
    oracle=f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding,
         'g' || CAST(label % 4 AS VARCHAR) AS grp,
         vec_id % 3 AS parity
  FROM embeddings
),
flt AS (SELECT * FROM corpus WHERE {_FIS_FLT.to_sql()}),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT q.qid, f.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(f.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(f.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, flt f
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_bq_filtered_indexed(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Filtered search composed with the BINARY-quantization artifact
    (round 10): the filter's candidates semi-join INSIDE the probed
    list partitions of the packed sign-word layout, Hamming ranks only
    the survivors (integer codegen over 32x-compressed codes), and the
    bucket-pruned exact rescore recovers cosine — payload pruning, list
    pruning and the 32x artifact compression in ONE plan.  Full probe +
    covering rerank == the exact filtered kNN."""
    from ..operators import query_api  # noqa: PLC0415
    from ..operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "bqfidx")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        F.concat(F.lit("g"), (F.col("label") % 4).cast("string")).alias("grp"),
        (F.col("vec_id") % 3).alias("parity"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_concurrently(  # independent artifacts — overlap (guide §2.6)
        lambda: build_payload_index(spark, base, "vecs", "grp",
                                    n_val_buckets=16),
        lambda: index.build_vector_index(spark, base, "vecs", kind="ivf_bq",
                                         n_lists=8, iters=4))
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = query_api.search_points(spark, base, "vecs", qdf, flt=_FIS_FLT,
                                  k=10, use_index="always", n_probe=None,
                                  use_payload_index="always",
                                  rerank_factor=1000)
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_multivector_search",
    # identical scoring contract to knn_multivector_maxsim, but through
    # the STORED collection: the space is DECLARED multivector in the
    # collection meta and search_collection dispatches to max-sim off
    # that declaration — the Qdrant multivector collection config.
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
def q_store_multivector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A MULTIVECTOR space declared in the collection config (the Qdrant
    ``vectors_config={"colbert": VectorParams(..., multivector_config=
    MultiVectorConfig(comparator=MAX_SIM))}`` model): points store a
    LIST of 16-d vectors, and ``search_collection`` dispatches to
    max-sim late interaction off the declaration — the caller never
    names the comparator.  update_vectors validates per-token dims on
    such spaces (tests/test_store_lifecycle.py)."""
    base = _tmp_base(sf_dir, "mvstore")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"colbert": {"size": 16, "distance": "dot",
                                   "multivector": "max_sim"}})
    q = pts.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("colbert").alias("qvecs"))
    out = knn.search_collection(spark, base, "vecs", q, k=10,
                                corpus_id="id", query_vec="qvecs",
                                exclude_self=True)
    return out.select(F.col("qid").cast("long").alias("qid"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_delete_vectors",
    # final state after the three removal ops (run through the batch
    # sequencer): ids 5-9 lose the vector, 10-14 lose the grp payload,
    # 20-21 clear every payload; everything else intact.
    oracle="""
SELECT vec_id AS id,
       (vec_id < 5 OR vec_id > 9) AS has_vec,
       CASE WHEN vec_id BETWEEN 10 AND 14 OR vec_id IN (20, 21)
            THEN NULL ELSE CAST(label AS BIGINT) END AS grp
FROM embeddings WHERE vec_id < 30
ORDER BY id
""",
)
def q_store_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant's point-mutation removal ops — ``delete_vectors`` (null a
    named space; the point survives and drops out of kNN),
    ``delete_payload`` (null payload keys; vectors survive) and
    ``clear_payload`` — applied IN ORDER through ``batch_update_points``
    (the Qdrant batch op kinds).  Each is a bucket-pruned typed-NULL
    patch through the same update_columns path as set_payload, feeding
    the delta log so index refreshes mask the removed entries."""
    base = _tmp_base(sf_dir, "delvec")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 30).select(
            F.col("vec_id").alias("id"), "embedding",
            F.col("label").cast("long").alias("grp")),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    upsert.batch_update_points(spark, base, "vecs", [
        ("delete_vectors", (list(range(5, 10)), ["embedding"])),
        ("delete_payload", (list(range(10, 15)), ["grp"])),
        ("clear_payload", [20, 21]),
    ])
    return (upsert.read_collection(spark, base, "vecs")
            .select(F.col("id").cast("long").alias("id"),
                    F.col("embedding").isNotNull().alias("has_vec"),
                    F.col("grp"))
            .orderBy("id"))


@register(
    "store_range_indexed_search",
    # the composed filtered-indexed search with a RANGE driving leaf:
    # range-index candidate ids semi-join INSIDE the probed list
    # partitions of the IVF artifact; at full probe the answer equals the
    # exact filtered kNN (hash-checked).
    oracle=f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding,
         CAST(vec_id % 100 AS DOUBLE) AS score
  FROM embeddings
),
flt AS (SELECT * FROM corpus WHERE {_RIX_FLT.to_sql()}),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT q.qid, f.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(f.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(f.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, flt f
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_range_indexed_search(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """``store_filtered_indexed_search`` with a Range (not equality)
    DRIVING leaf: round 7's composed search declined Range-only filters
    entirely (``filter_match_ids`` returned None); the typed range index
    gives them the same two-prunings-one-plan path."""
    from ..operators import query_api  # noqa: PLC0415
    from ..operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "ridx")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        (F.col("vec_id") % 100).cast("double").alias("score"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_concurrently(  # independent artifacts — overlap (guide §2.6)
        lambda: build_payload_index(spark, base, "vecs", "score",
                                    n_val_buckets=16, index_type="range"),
        lambda: index.build_vector_index(spark, base, "vecs", kind="ivf",
                                         n_lists=8, iters=4))
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = query_api.search_points(spark, base, "vecs", qdf, flt=_RIX_FLT,
                                  k=10, use_index="always", n_probe=None,
                                  use_payload_index="always")
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_multivector_indexed",
    # the ivf_mv artifact at full probe + covering rerank: coarse IVF over
    # mean-pooled tokens generates candidates, exact max-sim rescores —
    # with every list probed and the rerank covering the corpus the answer
    # equals the exact late-interaction scan (hash-checked).
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
def q_store_multivector_indexed(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The MULTIVECTOR ANN artifact (VERDICT r7 missing #2 — Qdrant
    builds HNSW over multivectors; round 7's max-sim was always a full
    scan): ``build_vector_index(kind='ivf_mv')`` clusters the MEAN-POOLED
    token vectors into IVF lists, a search probes lists by the pooled
    query (static ``list_id`` pruning), ranks candidates on the stored
    pooled vectors, and max-sim-rescores ``rerank_factor*k`` of them
    through the bucket-pruned collection fetch — the same
    artifact/refresh/mask scaffold as every other kind.  rerank 1000·k
    covers both gate corpora, so full probe is EXACT here."""
    base = _tmp_base(sf_dir, "mvidx")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"colbert": {"size": 16, "distance": "dot",
                                   "multivector": "max_sim"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_mv",
                             n_lists=8, iters=4)
    q = pts.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("colbert").alias("qvecs"))
    out = index.search_indexed(spark, base, "vecs", q, k=10, n_probe=None,
                               query_vec="qvecs", rerank_factor=1000,
                               exclude_self=True)
    return out.select(F.col("qid").cast("long").alias("qid"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_mv_probe_per_token",
    # round 13 (VERDICT r12 #5): the per-token probe knob on the SAME
    # ivf_mv artifact — every query token assigns its own lists and the
    # probe covers the union (pooled ∪ per-token).  At full probe with a
    # covering rerank the answer still equals the exact late-interaction
    # scan (the union can't exceed "all lists"), so the widened-probe
    # code path gets a real hash-matched oracle; the recall-vs-pooled
    # inequality at narrow probe is pinned in tests/test_quant_params.py
    # and the 100x rehearsal.
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
def q_store_mv_probe_per_token(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Token-level multivector probing (``probe_per_token=True``): the
    ivf_mv artifact clusters MEAN-POOLED tokens, so a query whose tokens
    scatter semantically can miss lists at low n_probe; per-token
    probing assigns EACH query token its own lists and probes the union
    — a recall knob on the existing artifact, no new index kind.  Run
    at full probe + covering rerank the result equals the exact max-sim
    scan, hash-matched here end-to-end through the per-token path."""
    base = _tmp_base(sf_dir, "mvtok")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"colbert": {"size": 16, "distance": "dot",
                                   "multivector": "max_sim"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_mv",
                             n_lists=8, iters=4)
    q = pts.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("colbert").alias("qvecs"))
    out = index.search_indexed(spark, base, "vecs", q, k=10, n_probe=None,
                               query_vec="qvecs", rerank_factor=1000,
                               exclude_self=True, probe_per_token=True)
    return out.select(F.col("qid").cast("long").alias("qid"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_mv_indexed_sq",
    # round 9 (VERDICT r8 missing #3): the QUANTIZED multivector artifact
    # — ivf_mv_sq stores int8 scalar-quantized POOLED codes (4-8x smaller
    # than the pooled floats; the memory path a 100 TB ColBERT corpus
    # needs).  The coarse stage scores the DEQUANTIZED codes, the max-sim
    # rescore stays exact on the collection's token lists — so full probe
    # + covering rerank equals the exact late-interaction scan even
    # though the artifact never held a float: quantization error can
    # only reorder CANDIDATES, and a covering rerank keeps them all.
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
def q_store_mv_indexed_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized multivector ANN: ``kind='ivf_mv_sq'`` clusters the
    mean-pooled tokens AND scalar-quantizes them to int8 codes; a search
    probes lists by the pooled query, ranks candidates on dequantized
    codes (pure codegen) and max-sim-rescores through the bucket-pruned
    fetch — same artifact/refresh/mask scaffold, 4-8x less artifact IO.
    rerank 1000·k covers both gate corpora, so full probe is EXACT."""
    base = _tmp_base(sf_dir, "mvsq")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"colbert": {"size": 16, "distance": "dot",
                                   "multivector": "max_sim"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_mv_sq",
                             n_lists=8, iters=4)
    q = pts.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("colbert").alias("qvecs"))
    out = index.search_indexed(spark, base, "vecs", q, k=10, n_probe=None,
                               query_vec="qvecs", rerank_factor=1000,
                               exclude_self=True)
    return out.select(F.col("qid").cast("long").alias("qid"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_mv_indexed_bq",
    # round 10: the BINARY multivector artifact — ivf_mv_bq packs the
    # POOLED tokens' sign bits (32x smaller than the pooled floats, the
    # cheapest mv artifact); the coarse stage ranks Hamming over the
    # packed pooled query, the max-sim rescore stays exact on the
    # collection's token lists — full probe + covering rerank equals the
    # exact late-interaction scan (sign error can only reorder
    # CANDIDATES, and a covering rerank keeps them all).
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
def q_store_mv_indexed_bq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary multivector ANN: ``kind='ivf_mv_bq'`` clusters the
    mean-pooled tokens and packs their SIGN BITS (32x smaller artifact);
    a search probes lists by the pooled query, ranks candidates by
    packed-word Hamming (integer codegen) and max-sim-rescores through
    the bucket-pruned fetch — same artifact/refresh/mask scaffold.
    rerank 1000·k covers both gate corpora, so full probe is EXACT."""
    base = _tmp_base(sf_dir, "mvbq")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"colbert": {"size": 16, "distance": "dot",
                                   "multivector": "max_sim"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_mv_bq",
                             n_lists=8, iters=4)
    q = pts.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("colbert").alias("qvecs"))
    out = index.search_indexed(spark, base, "vecs", q, k=10, n_probe=None,
                               query_vec="qvecs", rerank_factor=1000,
                               exclude_self=True)
    return out.select(F.col("qid").cast("long").alias("qid"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_mv_indexed_pq",
    # round 9: the PQ multivector artifact — pooled PQ codes (m bytes a
    # point, the smallest mv artifact), ADC coarse stage, exact max-sim
    # rescore; full probe + covering rerank == the exact scan (the
    # covering rerank keeps every ADC candidate, so code error cannot
    # drop a true neighbor).
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
def q_store_mv_indexed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-coded multivector ANN: ``kind='ivf_mv_pq'`` clusters the
    mean-pooled tokens and product-quantizes them (codebooks persisted
    like the dense ivf_pq); a search probes lists by the pooled query,
    ranks candidates by ADC over the codes and max-sim-rescores through
    the bucket-pruned fetch.  rerank 1000*k covers both gate corpora, so
    full probe is EXACT."""
    base = _tmp_base(sf_dir, "mvpq")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"colbert": {"size": 16, "distance": "dot",
                                   "multivector": "max_sim"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_mv_pq",
                             n_lists=8, m=8, ksub=16, iters=4)
    q = pts.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("colbert").alias("qvecs"))
    out = index.search_indexed(spark, base, "vecs", q, k=10, n_probe=None,
                               query_vec="qvecs", rerank_factor=1000,
                               exclude_self=True)
    return out.select(F.col("qid").cast("long").alias("qid"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_tenant_mv_indexed",
    # round 9 (VERDICT r8 missing #3, tenant half): tenant t1's OWN
    # multivector artifact over its partition subtree — the scoped search
    # dispatches to it and at full probe + covering rerank equals exactly
    # that tenant's late-interaction kNN.
    oracle="""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings WHERE (label % 3) = 1
),
q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3),
qtok AS (
  SELECT vec_id AS qid, 1 AS ti, embedding[1:16] AS qv FROM q
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM q
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM q
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM q
),
ptok AS (
  SELECT vec_id, 1 AS pj, embedding[1:16] AS pv FROM corpus
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM corpus
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM corpus
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM corpus
),
best AS (
  SELECT qt.qid, pt.vec_id, qt.ti,
         MAX((SELECT SUM(a*b)
              FROM (SELECT unnest(qt.qv)::DOUBLE AS a,
                           unnest(pt.pv)::DOUBLE AS b))) AS m
  FROM qtok qt, ptok pt
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
def q_store_tenant_mv_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tenant MULTIVECTOR index: tenant t1's ColBERT corpus gets its
    own pooled-IVF artifact (build_vector_index(kind='ivf_mv',
    tenant='t1')); search_collection(tenant='t1', use_index='always')
    dispatches to it, the rescore fetch prunes the tenant subtree, and
    other tenants' token lists never enter the artifact."""
    base = _tmp_base(sf_dir, "mvtenant")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"),
        F.concat(F.lit("t"), (F.col("label") % 3).cast("string"))
        .alias("tenant"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        tenant_col="tenant",
        vector_config={"colbert": {"size": 16, "distance": "dot",
                                   "multivector": "max_sim"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_mv",
                             n_lists=4, iters=4, tenant="t1")
    q = pts.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("colbert").alias("qvecs"))
    out = knn.search_collection(spark, base, "vecs", q, k=10,
                                corpus_id="id", query_vec="qvecs",
                                exclude_self=False, tenant="t1",
                                use_index="always", n_probe=None,
                                rerank_factor=1000)
    return out.select(F.col("qid").cast("long").alias("qid"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_mv_filtered_indexed",
    # the LAST cell of the composition matrix: a payload filter composed
    # with the MULTIVECTOR artifact — candidate ids semi-join inside the
    # probed pooled lists, max-sim rescores only survivors; full probe +
    # covering rerank == the exact filtered late-interaction scan.
    oracle="""
WITH corpus AS (
  SELECT vec_id, embedding,
         'g' || CAST(vec_id % 4 AS VARCHAR) AS grp
  FROM embeddings
),
flt AS (SELECT * FROM corpus WHERE grp IN ('g0', 'g1')),
q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3),
qtok AS (
  SELECT vec_id AS qid, 1 AS ti, embedding[1:16] AS qv FROM q
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM q
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM q
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM q
),
ptok AS (
  SELECT vec_id, 1 AS pj, embedding[1:16] AS pv FROM flt
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM flt
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM flt
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM flt
),
best AS (
  SELECT qt.qid, pt.vec_id, qt.ti,
         MAX((SELECT SUM(a*b)
              FROM (SELECT unnest(qt.qv)::DOUBLE AS a,
                           unnest(pt.pv)::DOUBLE AS b))) AS m
  FROM qtok qt, ptok pt
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
def q_store_mv_filtered_indexed(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Filtered MULTIVECTOR search composed with the ivf_mv artifact —
    the Qdrant filtered-HNSW-over-multivectors twin, closing the
    composition matrix (dense/sparse/BM25/multivector × filtered, all
    index-composed): the payload index resolves the grp filter to
    candidate ids, they semi-join INSIDE the probed pooled lists, and
    the exact max-sim rescore fetches only surviving candidates
    bucket-pruned.  Full probe + rerank 1000·k ⇒ exact vs the filtered
    late-interaction scan (both prunings plan-asserted in
    tests/test_index.py::test_ivf_mv_filtered_search_composes)."""
    from ..operators import query_api  # noqa: PLC0415
    from ..operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "mvfidx")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"),
        F.concat(F.lit("g"), (F.col("vec_id") % 4).cast("string"))
        .alias("grp"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"colbert": {"size": 16, "distance": "dot",
                                   "multivector": "max_sim"}})
    build_concurrently(  # independent artifacts — overlap (guide §2.6)
        lambda: build_payload_index(spark, base, "vecs", "grp",
                                    n_val_buckets=16),
        lambda: index.build_vector_index(spark, base, "vecs", kind="ivf_mv",
                                         n_lists=8, iters=4))
    q = pts.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("colbert").alias("qvecs"))
    out = query_api.search_points(
        spark, base, "vecs", q,
        flt=Filter(must=[MatchAny("grp", ["g0", "g1"])]),
        k=10, query_vec="qvecs", use_index="always", n_probe=None,
        rerank_factor=1000, use_payload_index="always")
    return out.select(F.col("qid").cast("long").alias("qid"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_nested_filter_indexed",
    # a NestedCondition-ONLY filter resolved from the ELEMENT-LEVEL index
    # (VERDICT r7 missing #4 — round 7 left it residual, pushed-scan
    # only): per-leaf (id, elem_idx) posting sets intersect on the SAME
    # elem_idx, candidates fetch bucket-pruned, kNN scores only them.
    # The oracle applies the LITERAL compiled same-element filter.
    oracle=f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding,
         [{{'kind': 'src', 'num': vec_id % 5}},
          {{'kind': 'len', 'num': vec_id % 7}}] AS props
  FROM embeddings
),
flt AS (SELECT * FROM corpus WHERE {_NIX_FLT.to_sql()}),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT q.qid, f.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(f.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(f.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, flt f
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_nested_filter_indexed(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """NestedCondition through the ELEMENT-LEVEL payload index (the
    Qdrant nested index): postings keyed ``(id, elem_idx, field, val)``,
    the inner equality leaves' sets intersect on the SAME elem_idx —
    same-element semantics FROM THE INDEX, no collection scan for
    candidate generation (plan-asserted in tests/test_payload_index.py).
    kind='src' AND num∈{{1,3}} must hold on one element: the 'len'
    element's num values must not leak through."""
    from ..operators import query_api  # noqa: PLC0415
    from ..operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "nestidx")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        F.array(
            F.struct(F.lit("src").alias("kind"),
                     (F.col("vec_id") % 5).alias("num")),
            F.struct(F.lit("len").alias("kind"),
                     (F.col("vec_id") % 7).alias("num"))).alias("props"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_payload_index(spark, base, "vecs", "props", n_val_buckets=16,
                        index_type="nested", fields=["kind", "num"])
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = query_api.search_points(spark, base, "vecs", qdf, flt=_NIX_FLT,
                                  k=10, use_payload_index="always")
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


_MATRIX_SAMPLE_SQL = """
sample AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id < 500
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 10
),
mpairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         round(
           (SELECT SUM(x*y) FROM (SELECT unnest(a.embedding)::DOUBLE AS x,
                                         unnest(b.embedding)::DOUBLE AS y))
           / ( sqrt((SELECT SUM(x*x) FROM (SELECT unnest(a.embedding)::DOUBLE AS x)))
             * sqrt((SELECT SUM(y*y) FROM (SELECT unnest(b.embedding)::DOUBLE AS y)))),
           6) AS score
  FROM sample a, sample b
  WHERE a.vec_id <> b.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY a_id ORDER BY score DESC, b_id)
           AS rank
  FROM mpairs
)
"""


@register(
    "api_search_matrix_pairs",
    # round 13 (VERDICT r12 #2): Qdrant search_matrix_pairs — the
    # distance-matrix API's flat-pairs wire shape.  The sample is the
    # DETERMINISTIC md5 rank over the id (random in Qdrant; md5 computes
    # the same hex in both engines), the pairing a broadcast self-join
    # of the 10 sampled rows — the corpus is touched only by the pushed
    # sample filter.
    oracle=f"""
WITH {_MATRIX_SAMPLE_SQL}
SELECT a_id, b_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
""",
)
def q_api_search_matrix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``search_matrix_pairs`` over a stored collection with a
    filter: filter → md5-deterministic 10-point sample → each sample's
    top-3 neighbours within the sample, flat (a_id, b_id, score) rows
    in the collection's declared metric."""
    from ..operators.filters import Filter, Range
    from ..operators.matrix import search_matrix_pairs

    base = _tmp_base(sf_dir, "mtxp")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    out = search_matrix_pairs(
        spark, base, "vecs", sample=10, limit=3,
        flt=Filter(must=[Range("id", lt=500)]))
    return out.select(F.col("a_id").cast("long").alias("a_id"),
                      F.col("b_id").cast("long").alias("b_id"), "score",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "api_search_matrix_offsets",
    # the offsets wire shape: ONE row of parallel arrays — ids (sample,
    # ascending), offsets_row/offsets_col positions into ids, flat
    # scores — ordered row-major (row position, then neighbour rank),
    # assembled with array_sort(collect_list(struct)) so the order is
    # deterministic without a single-partition sort.
    oracle=f"""
WITH {_MATRIX_SAMPLE_SQL},
pos AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
           AS pos
  FROM sample
),
flat AS (
  SELECT pa.pos AS r, pb.pos AS c, p.score, p.rank
  FROM (SELECT * FROM ranked WHERE rank <= 3) p
  JOIN pos pa ON p.a_id = pa.vec_id
  JOIN pos pb ON p.b_id = pb.vec_id
)
SELECT (SELECT list(vec_id ORDER BY vec_id) FROM sample) AS ids,
       (SELECT list(r ORDER BY r, rank) FROM flat) AS offsets_row,
       (SELECT list(c ORDER BY r, rank) FROM flat) AS offsets_col,
       (SELECT list(score ORDER BY r, rank) FROM flat) AS scores
""",
)
def q_api_search_matrix_offsets(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Qdrant ``search_matrix_offsets``: the same sampled matrix as one
    row of parallel arrays (ids / offsets_row / offsets_col / scores) —
    the sparse-matrix form clients hand to clustering libraries."""
    from ..operators.filters import Filter, Range
    from ..operators.matrix import search_matrix_offsets

    base = _tmp_base(sf_dir, "mtxo")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    return search_matrix_offsets(
        spark, base, "vecs", sample=10, limit=3,
        flt=Filter(must=[Range("id", lt=500)]))


# ---------------------------------------------------------------------------
# J8 / round 15: persisted near-dup (MinHash-LSH) index + incremental
# refresh — the dedup family on the store's delta-log maintenance model
# (the Qdrant index-at-upsert shape, reference qdrant_embedder.py:95-103).
# ---------------------------------------------------------------------------

@register(
    "store_neardup_index",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
),
{duck_shingles_from("corpus")},
{_minhash_ctes()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_bands_matched
FROM banded a
JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
GROUP BY 1, 2
""",
)
def q_store_neardup_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the persisted banded-MinHash posting table for a stored
    collection, then read candidate pairs straight off it — zero
    shingling at query time; must equal ``dedup.minhash_lsh_pairs`` over
    the same corpus (which is what the oracle recomputes)."""
    from ..operators import neardup_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "ndidx")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.select(F.col("doc_id").alias("id"), "text"))
    neardup_index.build_neardup_index(spark, base, "docs", text_col="text",
                                      n_band_buckets=16)
    return neardup_index.neardup_pairs_indexed(spark, base, "docs",
                                               text_col="text")


@register(
    "store_neardup_refresh",
    # final corpus = (initial 0..149 minus deletes 10..19, with doc 3's
    # text overwritten by doc 77's — a guaranteed exact-dup pair) plus
    # the 150..179 snapshot delta; the oracle re-bands that FINAL state
    # from scratch, the Spark side absorbs it with ONE O(|delta|) refresh
    oracle=f"""
WITH corpus AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id = 3
              THEN (SELECT text FROM documents WHERE doc_id = 77)
              ELSE d.text END AS text
  FROM documents d
  WHERE (d.doc_id < 150 AND d.doc_id NOT BETWEEN 10 AND 19)
     OR d.doc_id BETWEEN 150 AND 179
),
{duck_shingles_from("corpus")},
{_minhash_ctes()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_bands_matched
FROM banded a
JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
GROUP BY 1, 2
""",
)
def q_store_neardup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup maintenance end-to-end: build the posting
    table over the initial corpus, then upsert a crawl-snapshot delta
    (30 new docs + 1 overwrite that MAKES a duplicate) and delete 10 —
    and absorb it all with ONE refresh_neardup_index call (delta log →
    O(|delta|) re-shingle → band-posting append at generation 1 + masks).
    No full-corpus re-shingle happens; the pair set must equal a from-
    scratch rebuild over the final corpus (the oracle's recomputation)."""
    from ..operators import neardup_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "ndref")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.filter(F.col("doc_id") < 150)
               .select(F.col("doc_id").alias("id"), "text"))
    neardup_index.build_neardup_index(spark, base, "docs", text_col="text",
                                      n_band_buckets=16)
    snapshot = (docs.filter(F.col("doc_id").between(150, 179))
                .select(F.col("doc_id").alias("id"), "text"))
    overwrite = (docs.filter(F.col("doc_id") == 77)
                 .select(F.lit(3).cast("long").alias("id"), "text"))
    upsert.upsert(spark, base, "docs", snapshot.unionByName(overwrite),
                  id_col="id")
    upsert.delete_points(spark, base, "docs", list(range(10, 20)),
                         count_removed=False)
    neardup_index.refresh_neardup_index(spark, base, "docs",
                                        text_col="text")
    return neardup_index.neardup_pairs_indexed(spark, base, "docs",
                                               text_col="text")


@register(
    "store_neardup_probe",
    # pairs involving the snapshot's ids ONLY — the O(|delta|) question a
    # real ingest loop asks ("which stored docs does this snapshot
    # duplicate"); the oracle filters the full re-banded pair set to the
    # probe ids, the Spark side never bands anything but the delta and
    # reads only the delta bands' hash buckets of the posting table
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 150
  UNION ALL
  SELECT doc_id, text FROM documents WHERE doc_id BETWEEN 150 AND 179
  UNION ALL
  SELECT 100077, text FROM documents WHERE doc_id = 77
),
{duck_shingles_from("corpus")},
{_minhash_ctes()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_bands_matched
FROM banded a
JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
WHERE a.doc_id BETWEEN 150 AND 179 OR b.doc_id BETWEEN 150 AND 179
   OR a.doc_id = 100077 OR b.doc_id = 100077
GROUP BY 1, 2
""",
)
def q_store_neardup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental probe: after a snapshot upsert + refresh, ask for
    near-dup pairs INVOLVING the snapshot ids only.  The probe re-bands
    just those ids (O(|delta|)) and hits the posting table through a
    static band_bucket IN (...) partition filter — doc 100077 carries doc
    77's text, so the probe must surface the cross-generation duplicate
    against the stored corpus."""
    from ..operators import neardup_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "ndprb")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.filter(F.col("doc_id") < 150)
               .select(F.col("doc_id").alias("id"), "text"))
    neardup_index.build_neardup_index(spark, base, "docs", text_col="text",
                                      n_band_buckets=16)
    snapshot = (docs.filter(F.col("doc_id").between(150, 179))
                .select(F.col("doc_id").alias("id"), "text")
                .unionByName(
                    docs.filter(F.col("doc_id") == 77)
                    .select(F.lit(100077).cast("long").alias("id"), "text")))
    upsert.upsert(spark, base, "docs", snapshot, id_col="id")
    neardup_index.refresh_neardup_index(spark, base, "docs",
                                        text_col="text")
    probe_ids = list(range(150, 180)) + [100077]
    return neardup_index.neardup_pairs_for_ids(spark, base, "docs",
                                               probe_ids, text_col="text")


@register(
    "store_snapshot_screen_ingest",
    # round 15: the full incremental-ingest loop — screen an incoming
    # crawl snapshot against the indexed corpus BEFORE committing it,
    # ingest only the survivors, refresh, and read the final corpus
    # back.  The incoming batch = 50 genuinely-new docs (+10000 ids)
    # plus 10 planted duplicates (+20000 ids carrying stored docs'
    # text); a screened id is any incoming id sharing >=1 full
    # signature band with a STORED doc.  The oracle re-bands everything
    # from scratch and recomputes the admission set.
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 150
  UNION ALL
  SELECT doc_id + 10000, text FROM documents WHERE doc_id BETWEEN 150 AND 199
  UNION ALL
  SELECT doc_id + 20000, text FROM documents WHERE doc_id < 10
),
{duck_shingles_from("corpus")},
{_minhash_ctes()},
dup_inc AS (
  SELECT DISTINCT i.doc_id
  FROM banded i
  JOIN banded s ON i.band = s.band AND i.band_key = s.band_key
  WHERE i.doc_id >= 10000 AND s.doc_id < 150
)
SELECT doc_id AS id FROM corpus
WHERE doc_id < 150
   OR (doc_id >= 10000 AND doc_id NOT IN (SELECT doc_id FROM dup_inc))
""",
)
def q_store_snapshot_screen_ingest(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Incremental crawl ingest end-to-end: stored corpus + near-dup
    index -> an incoming snapshot screens against the posting table
    (neardup_pairs_for_frame — the frame bands locally, the corpus side
    is a pruned posting probe, nothing is committed yet) -> only the
    non-duplicate survivors upsert -> one O(|delta|) refresh keeps the
    index fresh for the next snapshot.  The planted duplicates (+20000
    ids carrying stored text) must be rejected; the final corpus equals
    the oracle's recomputed admission set."""
    from ..operators import neardup_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "ndscr")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.filter(F.col("doc_id") < 150)
               .select(F.col("doc_id").alias("id"), "text"))
    neardup_index.build_neardup_index(spark, base, "docs", text_col="text",
                                      n_band_buckets=16)
    incoming = (docs.filter(F.col("doc_id").between(150, 199))
                .select((F.col("doc_id") + 10000).alias("id"), "text")
                .unionByName(
                    docs.filter(F.col("doc_id") < 10)
                    .select((F.col("doc_id") + 20000).alias("id"), "text")))
    hits = neardup_index.neardup_pairs_for_frame(
        spark, base, "docs", incoming, text_col="text", id_col="id")
    survivors = incoming.join(hits.select("id").distinct(), "id",
                              "left_anti")
    upsert.upsert(spark, base, "docs", survivors, id_col="id")
    neardup_index.refresh_neardup_index(spark, base, "docs",
                                        text_col="text")
    return upsert.read_collection(spark, base, "docs").select("id")


# ---------------------------------------------------------------------------
# Round 15b: the SECOND persisted dedup-index kind — SimHash chunk
# postings (Hamming near-dup), same delta-log maintenance scaffold,
# chunk-bucket pruning.  The dedup-index model is a family, not a
# one-off.
# ---------------------------------------------------------------------------

@register(
    "store_simhash_index",
    oracle=_simhash_oracle(
        src="corpus",
        prelude="corpus AS (SELECT doc_id, text FROM documents "
                "WHERE doc_id < 200),\n"),
)
def q_store_simhash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the persisted SimHash chunk-posting table, read Hamming
    near-dup pairs straight off it — must equal ``dedup.simhash_pairs``
    over the same corpus (the oracle's from-scratch recomputation)."""
    from ..operators import neardup_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "shidx")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.select(F.col("doc_id").alias("id"), "text"))
    neardup_index.build_simhash_index(spark, base, "docs", text_col="text",
                                      n_chunk_buckets=16)
    out = neardup_index.simhash_pairs_indexed(spark, base, "docs",
                                              text_col="text")
    return out.select("id_a", "id_b",
                      F.col("hamming").cast("long").alias("hamming"))


@register(
    "store_simhash_refresh",
    # same churn shape as store_neardup_refresh: overwrite doc 3 with doc
    # 77's text (a guaranteed hamming-0 pair), 30 new docs, 10 deletes —
    # ONE O(|delta|) refresh must land the from-scratch pair set
    oracle=_simhash_oracle(
        src="corpus",
        prelude="""corpus AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id = 3
              THEN (SELECT text FROM documents WHERE doc_id = 77)
              ELSE d.text END AS text
  FROM documents d
  WHERE (d.doc_id < 150 AND d.doc_id NOT BETWEEN 10 AND 19)
     OR d.doc_id BETWEEN 150 AND 179
),
"""),
)
def q_store_simhash_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import neardup_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "shref")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.filter(F.col("doc_id") < 150)
               .select(F.col("doc_id").alias("id"), "text"))
    neardup_index.build_simhash_index(spark, base, "docs", text_col="text",
                                      n_chunk_buckets=16)
    snapshot = (docs.filter(F.col("doc_id").between(150, 179))
                .select(F.col("doc_id").alias("id"), "text")
                .unionByName(
                    docs.filter(F.col("doc_id") == 77)
                    .select(F.lit(3).cast("long").alias("id"), "text")))
    upsert.upsert(spark, base, "docs", snapshot, id_col="id")
    upsert.delete_points(spark, base, "docs", list(range(10, 20)),
                         count_removed=False)
    neardup_index.refresh_simhash_index(spark, base, "docs",
                                        text_col="text")
    out = neardup_index.simhash_pairs_indexed(spark, base, "docs",
                                              text_col="text")
    return out.select("id_a", "id_b",
                      F.col("hamming").cast("long").alias("hamming"))
