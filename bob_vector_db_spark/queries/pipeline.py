"""LLM-data-pipeline capstones: dedup family, decontamination,
sampling/splits/shards, corpus cleaning."""


from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vector
from ..functions.text import ws_tokens
from ..operators import dedup, knn, upsert
from ..sources import load_table

from ._registry import register
from ._shared import *  # noqa: F403 — shared oracle/fixture helpers


# ---------------------------------------------------------------------------
# F4 / dedup-exact: content-hash duplicate groups
# ---------------------------------------------------------------------------

@register(
    "dedup_exact_groups",
    oracle="""
SELECT md5(text) AS content_hash, COUNT(*) AS n_dups,
       string_agg(doc_id, ',' ORDER BY doc_id) AS ids
FROM documents GROUP BY md5(text)
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list("doc_id")),
                            lambda x: x.cast("string")),
                ",",
            ).alias("ids"),
        )
    )


@register(
    "dedup_ngram_jaccard",
    # max_df=50 drops ubiquitous shingles BEFORE the self-join: the fixture's
    # tiny vocabulary makes common 3-grams appear in hundreds of docs, and a
    # shingle with df=d contributes d² candidate pairs — the classic skew
    # blowup this cap exists for (same cap applied in the oracle).
    oracle=f"""
WITH {DUCK_SHINGLES},
keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 50),
sh2 AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh2 GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS n_inter
  FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT ia AS id_a, ib AS id_b,
       round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = ia
JOIN sizes sb ON sb.doc_id = ib
WHERE round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.5
""",
)
def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_df=50)


@register("dedup_minhash_lsh", oracle=_minhash_oracle())
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4)


@register(
    "dedup_minhash_lsh_capped",
    # round 14: the band-size skew cap — the LSH twin of the n-gram
    # path's max_df.  Over-cap buckets (the boilerplate-template shape:
    # ONE band bucket holding a giant near-clique, n² pairs at 100 TB)
    # emit STAR edges to the bucket's minimum id instead — n−1 rows,
    # identical transitive closure for the downstream cluster step.
    # Cap=2 on this fixture exercises BOTH branches (buckets of size 3
    # go star, size 2 stay all-pairs).
    oracle=f"""
WITH {DUCK_SHINGLES},
{_minhash_ctes()},
bsz AS (SELECT band, band_key, COUNT(*) AS bn, MIN(doc_id) AS anchor
        FROM banded GROUP BY band, band_key),
tagged AS (SELECT b.doc_id, b.band, b.band_key, s.bn, s.anchor
           FROM banded b JOIN bsz s USING (band, band_key)),
ps AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       FROM tagged a
       JOIN tagged b ON a.band = b.band AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id
       WHERE a.bn <= 2),
pb AS (SELECT anchor AS id_a, doc_id AS id_b FROM tagged
       WHERE bn > 2 AND doc_id <> anchor)
SELECT id_a, id_b, COUNT(*) AS n_bands_matched
FROM (SELECT * FROM ps UNION ALL SELECT * FROM pb)
GROUP BY 1, 2
""",
)
def q_dedup_minhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4,
                                   max_band_size=2)


@register("dedup_minhash_ml", oracle=None)  # probabilistic recall, rows-only
def q_dedup_minhash_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs_ml(docs, threshold=0.5)


@register("dedup_simhash", oracle=_simhash_oracle())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = dedup.simhash_pairs(docs, bits=64, max_hamming=3)
    return out.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


@register(
    "dedup_embedding_blocked",
    oracle="""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(
         (SELECT SUM(x*y) FROM (SELECT unnest(a.embedding)::DOUBLE AS x,
                                       unnest(b.embedding)::DOUBLE AS y))
         / ( sqrt((SELECT SUM(x*x) FROM (SELECT unnest(a.embedding)::DOUBLE AS x)))
           * sqrt((SELECT SUM(y*y) FROM (SELECT unnest(b.embedding)::DOUBLE AS y)))),
         6) AS sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(
         (SELECT SUM(x*y) FROM (SELECT unnest(a.embedding)::DOUBLE AS x,
                                       unnest(b.embedding)::DOUBLE AS y))
         / ( sqrt((SELECT SUM(x*x) FROM (SELECT unnest(a.embedding)::DOUBLE AS x)))
           * sqrt((SELECT SUM(y*y) FROM (SELECT unnest(b.embedding)::DOUBLE AS y)))),
         6) >= 0.35
""",
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_neardup_pairs_vectorized(emb, threshold=0.35)


# ---------------------------------------------------------------------------
# Corpus-clean composite: quality filter (length / alpha-ratio / langid) +
# exact dedup (keep lowest doc_id per content hash) in ONE declarative plan —
# the shape a real pretraining-data job takes; Catalyst pipelines all three
# predicates into the scan and the only shuffle is the dedup group-by.
# ---------------------------------------------------------------------------

@register(
    "pipe_corpus_clean",
    oracle=r"""
WITH t AS (
  SELECT doc_id, source, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> length(x) > 0) AS tk
  FROM documents
),
m AS (
  SELECT doc_id, source, text, len(tk) AS n_tok,
         len(list_filter(tk, x -> list_contains(
             ['the','a','of','and','is','to','in'], lower(x)))) AS n_sw,
         length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct
  FROM t
),
q AS (
  SELECT doc_id, source, text,
         (CASE WHEN n_tok >= 10 AND n_tok <= 1000 THEN 0.4 ELSE 0.0 END)
       + (CASE WHEN n_tok > 0 AND n_sw::DOUBLE / n_tok >= 0.05 THEN 0.3 ELSE 0.0 END)
       + (CASE WHEN length(text) > 0 AND n_punct::DOUBLE / length(text) <= 0.2
               THEN 0.3 ELSE 0.0 END) AS quality
  FROM m
),
kept AS (
  SELECT doc_id, source, md5(text) AS h,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM q WHERE quality >= 0.7
)
SELECT source, COUNT(*) AS n_docs
FROM kept WHERE rn = 1
GROUP BY source
""",
)
def q_pipe_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as TX  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    survivors = docs.filter(TX.quality_score(F.col("text")) >= 0.7)
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy(F.asc("doc_id"))
    deduped = (
        survivors.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return deduped.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "pipe_split_counts",
    oracle=f"""
WITH b AS (SELECT doc_id, ({_DUCK_BUCKET.format(salt='split')}) AS bkt FROM documents)
SELECT CASE WHEN bkt < 8000 THEN 'train'
            WHEN bkt < 9000 THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM b GROUP BY 1
""",
)
def q_pipe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sampling  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(sampling.assign_split(F.col("doc_id")).alias("split"))
        .groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "pipe_hash_sample",
    oracle=f"""
SELECT doc_id, lang FROM documents
WHERE ({_DUCK_BUCKET.format(salt='sample')}) < 500
""",
)
def q_pipe_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sampling  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    return sampling.hash_sample(docs, "doc_id", 0.05).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# RAG-ingest preprocessing (round 4): chunking + normalization — the steps
# that precede every embed/upsert in a real vector-DB pipeline (the
# reference embeds caller-provided documents wholesale; a corpus pipeline
# chunks and scrubs them first).
# ---------------------------------------------------------------------------

@register(
    "pipe_chunk_documents",
    oracle=r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> length(x) > 0) AS tk
  FROM documents
),
sized AS (
  SELECT doc_id, tk,
         1 + CAST(ceil(greatest(len(tk) - 16, 0) / 12.0) AS INT) AS n_chunks
  FROM toks
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(tk, i*12 + 1, i*12 + 16), ' ') AS chunk
FROM sized, unnest(range(0, n_chunks)) AS t(i)
""",
)
def q_pipe_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (chunk 16, overlap 4): one output
    row per chunk per document — what a vector collection ingests as
    points.  Pure sequence/slice expressions + one explode, no Python."""
    from ..functions.text import chunk_tokens  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.explode(chunk_tokens(ws_tokens(F.col("text")),
                                   chunk_size=16, overlap=4)).alias("c"))
        .select("doc_id", F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
                F.col("c.chunk").alias("chunk"))
    )


@register(
    "pipe_text_normalize",
    oracle=r"""
SELECT doc_id,
       lower(trim(regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', ' ', 'g'),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           'https?://[^\s]+', '<URL>', 'g'),
         '\s+', ' ', 'g'))) AS norm_text
FROM documents
""",
)
def q_pipe_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus text normalization (control-char strip, e-mail/URL masking,
    whitespace collapse, casefold) — the PII-scrub stage of a pretraining
    pipeline, all JVM regex expressions; masking behavior is pinned on
    synthetic rows in tests/test_text_search.py."""
    from ..functions.text import normalize_text  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", normalize_text(F.col("text")).alias("norm_text"))


@register(
    "pipe_rag_end_to_end",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> length(x) > 0) AS tk
  FROM documents
),
sized AS (
  SELECT doc_id, tk,
         1 + CAST(ceil(greatest(len(tk) - 16, 0) / 12.0) AS INT) AS n_chunks
  FROM toks
),
chunks AS (
  SELECT CAST(doc_id AS VARCHAR) || '_' || CAST(i AS VARCHAR) AS id,
         doc_id, i, list_slice(tk, i*12 + 1, i*12 + 16) AS ctk
  FROM sized, unnest(range(0, n_chunks)) AS t(i)
),
ctoks AS (SELECT id, unnest(ctk) AS tok FROM chunks),
tfs AS (
  SELECT id, ({DUCK_POLY_HASH.format(t='tok')}) % 32 AS bucket,
         COUNT(*) AS tf
  FROM ctoks GROUP BY id, bucket
),
norms AS (SELECT id, sqrt(SUM(tf*tf)) AS nrm FROM tfs GROUP BY id),
qids AS (SELECT id FROM chunks WHERE doc_id < 3 AND i = 0),
dots AS (
  SELECT a.id AS qid, b.id AS vec_id, SUM(a.tf * b.tf) AS dot
  FROM tfs a JOIN tfs b ON a.bucket = b.bucket
  WHERE a.id IN (SELECT id FROM qids) AND a.id <> b.id
  GROUP BY a.id, b.id
),
pairs AS (
  SELECT q.id AS qid, c.id AS vec_id,
         round(coalesce(d.dot, 0) / (nq.nrm * nc.nrm), 6) AS sim
  FROM qids q
  CROSS JOIN chunks c
  LEFT JOIN dots d ON d.qid = q.id AND d.vec_id = c.id
  JOIN norms nq ON nq.id = q.id
  JOIN norms nc ON nc.id = c.id
  WHERE q.id <> c.id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank FROM pairs)
WHERE rank <= 5
""",
)
def q_pipe_rag_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's WHOLE lifecycle as one pipeline: chunk documents →
    deterministic hash-embed each chunk → upsert the chunks into a REAL
    bucketed collection (vector config declares cosine) → search the stored
    collection with three query chunks.  Every stage is the scale-path
    implementation (codegen chunking, one-shuffle embedding, bucketed
    store, broadcast-query search); the oracle recomputes it all in sparse
    integer arithmetic."""
    from ..functions.text import chunk_tokens  # noqa: PLC0415
    from ..operators.embed import hash_embed_df  # noqa: PLC0415

    base = _tmp_base(sf_dir, "rag")
    docs = load_table(spark, sf_dir, "documents")
    chunks = (
        docs.select(
            "doc_id",
            F.explode(chunk_tokens(ws_tokens(F.col("text")),
                                   chunk_size=16, overlap=4)).alias("c"))
        .select(
            F.concat(F.col("doc_id").cast("string"), F.lit("_"),
                     F.col("c.chunk_idx").cast("string")).alias("id"),
            F.col("c.chunk").alias("chunk"),
            F.col("doc_id"), F.col("c.chunk_idx").alias("chunk_idx"))
    )
    embedded = hash_embed_df(chunks, text_col="chunk", id_col="id",
                             dim=32, out_col="embedding")
    upsert.create_collection(
        spark, base, "rag_chunks", n_buckets=8,
        df=embedded.select("id", "embedding"),
        vector_config={"embedding": {"size": 32, "distance": "cosine"}})
    q_ids = [f"{d}_0" for d in range(3)]
    stored = upsert.read_collection(spark, base, "rag_chunks")
    qdf = stored.filter(F.col("id").isin(q_ids)).select(
        F.col("id").alias("qid"), F.col("embedding").alias("qvec"))
    out = knn.search_collection(spark, base, "rag_chunks", qdf, k=5,
                                corpus_id="id", exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "pipe_decontaminate",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> length(x) > 0) AS tk
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(greatest(len(tk)-2, 0)),
                                 i -> array_to_string(tk[i+1:i+3], ' '))) AS shingle
    FROM toks)
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20),
hits AS (
  SELECT s.doc_id AS id, COUNT(DISTINCT s.shingle) AS n_hits
  FROM sh s JOIN bench USING (shingle)
  WHERE s.doc_id >= 20
  GROUP BY s.doc_id
)
SELECT id, CAST(n_hits AS BIGINT) AS n_hits FROM hits WHERE n_hits >= 1
""",
)
def q_pipe_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the eval-leakage sweep every pretraining
    pipeline runs): training docs sharing any token 3-gram with the held-out
    benchmark set get flagged with their contaminated-shingle count.  The
    benchmark shingle set broadcasts (eval suites are small by
    construction); the training corpus never shuffles — no train×benchmark
    pair materializes."""
    docs = load_table(spark, sf_dir, "documents")
    out = dedup.cross_corpus_contamination(
        docs.filter(F.col("doc_id") >= 20),
        docs.filter(F.col("doc_id") < 20),
        text_col="text", id_col="doc_id", n=3, min_hits=1)
    return out.select("id", F.col("n_hits").cast("long").alias("n_hits"))


@register(
    "pipe_stratified_sample",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source, lang,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('strat' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT doc_id, source, lang FROM ranked WHERE rn <= 5
""",
)
def q_pipe_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum quota sampling for training-mix construction: EXACTLY 5
    docs per source, picked by a deterministic md5 rank within the group
    (layout-independent, unlike sampleBy's approximate fractions).  One
    shuffle on the stratum key; the rank window sees only a group's rows."""
    from ..operators.sampling import stratified_sample  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, "source", "doc_id", 5)
    return out.select("doc_id", "source", "lang")


@register(
    "pipe_dataset_build",
    # the full training-mix build: exact dedup (min doc_id per identical
    # text) -> benchmark decontamination (3-gram overlap with docs < 20)
    # -> quality gate (n_chars in [150, 600], >= 25 tokens) -> stratified
    # quota sample (10 per lang by deterministic md5 rank).
    oracle=r"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> length(x) > 0) AS tk
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(greatest(len(tk)-2, 0)),
                                 i -> array_to_string(tk[i+1:i+3], ' '))) AS shingle
    FROM toks)
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20),
contaminated AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN bench USING (shingle)
  WHERE s.doc_id >= 20
),
dd AS (
  SELECT * FROM (
    SELECT d.*, row_number() OVER (PARTITION BY md5(text)
                                   ORDER BY doc_id) AS rn
    FROM documents d)
  WHERE rn = 1
),
clean AS (
  SELECT dd.doc_id, dd.lang, len(t.tk) AS n_tokens
  FROM dd JOIN toks t USING (doc_id)
  WHERE dd.doc_id >= 20
    AND dd.doc_id NOT IN (SELECT doc_id FROM contaminated)
    AND dd.n_chars BETWEEN 150 AND 600
    AND len(t.tk) >= 25
),
mixed AS (
  SELECT doc_id, lang, n_tokens,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5('mix' || CAST(doc_id AS VARCHAR)),
                                     doc_id) AS rn
  FROM clean
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
FROM mixed WHERE rn <= 10
""",
)
def q_pipe_dataset_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-mix build every pretraining pipeline runs,
    composed from this repo's operators in one plan: exact dedup (keep
    the lowest id per identical text), benchmark DECONTAMINATION (drop
    any doc sharing a token 3-gram with the held-out set — the broadcast
    shingle probe, no train×bench pair materializes), a QUALITY gate
    (length + token-count floors), and a STRATIFIED quota sample (exactly
    10 docs per language by deterministic md5 rank).  Every stage is a
    shuffle-minimal shape that survives 100×: one window on the content
    hash, one broadcast join, pushed filters, one rank window per
    stratum."""
    from ..operators.sampling import stratified_sample  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dd = (docs.withColumn("_rn", F.row_number().over(w))
          .filter(F.col("_rn") == 1).drop("_rn"))
    flagged = dedup.cross_corpus_contamination(
        docs.filter(F.col("doc_id") >= 20), docs.filter(F.col("doc_id") < 20),
        text_col="text", id_col="doc_id", n=3, min_hits=1
    ).select(F.col("id").alias("doc_id"))
    clean = (dd.filter(F.col("doc_id") >= 20)
             .join(flagged, "doc_id", "left_anti")
             .withColumn("n_tokens", F.size(ws_tokens(F.col("text"))))
             .filter((F.col("n_chars") >= 150) & (F.col("n_chars") <= 600)
                     & (F.col("n_tokens") >= 25)))
    out = stratified_sample(clean, "lang", "doc_id", 10, salt="mix")
    return out.select("doc_id", "lang",
                      F.col("n_tokens").cast("long").alias("n_tokens"))


@register(
    "pipe_dataset_build_neardup",
    # round 14 (VERDICT r13 #1): the REALISTIC 100 TB training-mix shape
    # — near-dup dedup is pairs -> clusters -> keep, not pairs alone.
    # MinHash-LSH banded candidate pairs (the exact-oracled banding of
    # dedup_minhash_lsh) -> connected components (Spark: the O(log n)
    # large-star/small-star alternation, algorithm='star'; DuckDB: a
    # RECURSIVE transitive-closure CTE) -> lowest-id keep -> benchmark
    # decontamination -> quality gate -> stratified per-language quota.
    # ONE composed plan, hash-matched end-to-end.
    oracle=f"""
WITH RECURSIVE {DUCK_SHINGLES},
{_minhash_ctes()},
p AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
reach(n, m) AS (
  SELECT a AS n, b AS m FROM edges
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
),
comp AS (SELECT n AS node, LEAST(n, MIN(m)) AS component
         FROM reach GROUP BY n),
dropped AS (SELECT node FROM comp WHERE node <> component),
dd AS (SELECT d.* FROM documents d
       WHERE d.doc_id NOT IN (SELECT node FROM dropped)),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20),
contaminated AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN bench USING (shingle)
  WHERE s.doc_id >= 20
),
clean AS (
  SELECT dd.doc_id, dd.lang, len(t.tk) AS n_tokens
  FROM dd JOIN toks t USING (doc_id)
  WHERE dd.doc_id >= 20
    AND dd.doc_id NOT IN (SELECT doc_id FROM contaminated)
    AND dd.n_chars BETWEEN 150 AND 600
    AND len(t.tk) >= 25
),
mixed AS (
  SELECT doc_id, lang, n_tokens,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5('mixnd' || CAST(doc_id AS VARCHAR)),
                                     doc_id) AS rn
  FROM clean
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
FROM mixed WHERE rn <= 10
""",
)
def q_pipe_dataset_build_neardup(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The NEAR-DUP training-mix build (round 14, VERDICT r13 #1):
    MinHash-LSH banded pairs → duplicate-cluster resolution (connected
    components via the O(log n) star alternation) → lowest-id keep →
    benchmark decontamination → quality gate → stratified per-language
    quota, composed in one plan.  Every stage is the 100 TB shape: the
    pair join is band-bucketed (never all-pairs), CC shuffles the edge
    set only, the bench shingle set broadcasts, the quota is one rank
    window per stratum.  Survivors of the dedup stage are "cluster
    minimum" ∪ "every unpaired document" — pairs alone are not a dedup."""
    from ..operators.sampling import stratified_sample  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    # max_band_size: the skew cap's star edges preserve the transitive
    # closure EXACTLY (test_minhash_band_cap_preserves_clusters), and
    # this pipeline consumes only the CLUSTERS — so the capped Spark
    # plan hash-matches the uncapped oracle while exercising the
    # 100 TB-shaped branch (cap=2 fires on this fixture's 3-member
    # buckets; at crawl scale the cap bounds a boilerplate bucket's
    # pair blowup to n−1 rows)
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4,
                                    max_band_size=2)
    cc = dedup.connected_components(pairs, algorithm="star")
    dropped = (cc.filter(F.col("node") != F.col("component"))
               .select(F.col("node").alias("doc_id")))
    dd = docs.join(dropped, "doc_id", "left_anti")
    flagged = dedup.cross_corpus_contamination(
        dd.filter(F.col("doc_id") >= 20), docs.filter(F.col("doc_id") < 20),
        text_col="text", id_col="doc_id", n=3, min_hits=1
    ).select(F.col("id").alias("doc_id"))
    clean = (dd.filter(F.col("doc_id") >= 20)
             .join(flagged, "doc_id", "left_anti")
             .withColumn("n_tokens", F.size(ws_tokens(F.col("text"))))
             .filter((F.col("n_chars") >= 150) & (F.col("n_chars") <= 600)
                     & (F.col("n_tokens") >= 25)))
    out = stratified_sample(clean, "lang", "doc_id", 10, salt="mixnd")
    return out.select("doc_id", "lang",
                      F.col("n_tokens").cast("long").alias("n_tokens"))


@register(
    "pipe_dataset_build_v2",
    # round 15 (VERDICT r14 task 2): the capstone now composes the r14
    # keep/mix machinery — per-cluster QUALITY keep (highest n_chars,
    # ties lowest id, via duplicate_clusters(quality=)) instead of
    # lowest-id, and TEMPERATURE mixing (quota ∝ count^0.5) instead of
    # fixed per-language quotas.  Same exact-oracled MinHash banding and
    # RECURSIVE transitive closure as v1; the realistic 100 TB build:
    # keep the BEST copy, rebalance the mix.
    oracle=f"""
WITH RECURSIVE {DUCK_SHINGLES},
{_minhash_ctes()},
p AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
reach(n, m) AS (
  SELECT a AS n, b AS m FROM edges
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
),
comp AS (SELECT n AS node, LEAST(n, MIN(m)) AS component
         FROM reach GROUP BY n),
scored AS (
  SELECT c.node, c.component,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY d.n_chars DESC, c.node) AS rn
  FROM comp c JOIN documents d ON d.doc_id = c.node
),
dropped AS (SELECT node FROM scored WHERE rn > 1),
dd AS (SELECT d.* FROM documents d
       WHERE d.doc_id NOT IN (SELECT node FROM dropped)),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20),
contaminated AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN bench USING (shingle)
  WHERE s.doc_id >= 20
),
clean AS (
  SELECT dd.doc_id, dd.lang, len(t.tk) AS n_tokens
  FROM dd JOIN toks t USING (doc_id)
  WHERE dd.doc_id >= 20
    AND dd.doc_id NOT IN (SELECT doc_id FROM contaminated)
    AND dd.n_chars BETWEEN 150 AND 600
    AND len(t.tk) >= 25
),
c AS (SELECT lang, COUNT(*) AS cnt FROM clean GROUP BY lang),
t2 AS (SELECT SUM(pow(cnt, 0.5)) AS tot FROM c),
q AS (SELECT lang,
             GREATEST(1, CAST(FLOOR(ROUND(60 * pow(cnt, 0.5) / tot, 6))
                              AS INT)) AS quota
      FROM c, t2),
r AS (SELECT cl.doc_id, cl.lang, cl.n_tokens, q.quota,
             row_number() OVER (
               PARTITION BY cl.lang
               ORDER BY md5('mixv2' || CAST(cl.doc_id AS VARCHAR)),
                        cl.doc_id) AS rn
      FROM clean cl JOIN q USING (lang))
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
FROM r WHERE rn <= quota
""",
)
def q_pipe_dataset_build_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The v2 training-mix build (round 15): MinHash-LSH banded pairs
    (skew-capped, closure-preserving) → duplicate clusters via star CC
    with the QUALITY keep policy (highest n_chars per cluster — the best
    copy survives, not the oldest) → benchmark decontamination → quality
    gate → TEMPERATURE mixing (per-language quota ∝ count^0.5).  One
    composed plan: the pair join is band-bucketed, the cluster pick is a
    single min_by aggregate, the bench shingle set broadcasts, the quota
    table is |langs| rows broadcast onto one rank window per stratum."""
    from ..operators.sampling import temperature_mix  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4,
                                    max_band_size=2)
    clusters = dedup.duplicate_clusters(
        pairs, algorithm="star",
        quality=docs.select("doc_id", "n_chars"),
        quality_id="doc_id", quality_col="n_chars")
    dropped = (clusters.select(F.explode("members").alias("doc_id"),
                               "keep")
               .filter(F.col("doc_id") != F.col("keep"))
               .select("doc_id"))
    dd = docs.join(dropped, "doc_id", "left_anti")
    flagged = dedup.cross_corpus_contamination(
        dd.filter(F.col("doc_id") >= 20), docs.filter(F.col("doc_id") < 20),
        text_col="text", id_col="doc_id", n=3, min_hits=1
    ).select(F.col("id").alias("doc_id"))
    clean = (dd.filter(F.col("doc_id") >= 20)
             .join(flagged, "doc_id", "left_anti")
             .withColumn("n_tokens", F.size(ws_tokens(F.col("text"))))
             .filter((F.col("n_chars") >= 150) & (F.col("n_chars") <= 600)
                     & (F.col("n_tokens") >= 25)))
    out = temperature_mix(clean, "lang", "doc_id", n_target=60, alpha=0.5,
                          salt="mixv2")
    return out.select("doc_id", "lang",
                      F.col("n_tokens").cast("long").alias("n_tokens"))


@register(
    "pipe_token_shards",
    # shard = floor(tokens_before / 20000) in doc_id order; the oracle's
    # single global cumsum equals the distributed two-phase prefix sum.
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                              x -> length(x) > 0)) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(FLOOR((cum - n_tokens) / 20000.0) AS BIGINT) AS shard
FROM c
""",
)
def q_pipe_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sharding (the uniform-shard packing step before
    tokenizer/loader handoff): each doc's shard is floor(tokens-before-it
    / budget) in id order — computed as a DISTRIBUTED prefix sum
    (contiguous deterministic id ranges cumsum locally; only the
    range-total offsets touch the driver), not the single-task global
    window the naive ``SUM() OVER (ORDER BY id)`` collapses into.  The
    oracle's global cumsum must agree exactly."""
    from ..operators.sampling import pack_token_shards  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(ws_tokens(F.col("text"))).cast("long").alias("n_tokens"))
    out = pack_token_shards(t, "doc_id", "n_tokens", budget=20_000,
                            n_ranges=32)
    return out.select("doc_id", "n_tokens", "shard")


@register(
    "pipe_paragraph_dedup",
    # round 12: CCNet/Dolma paragraph-level corpus dedup — the synthetic
    # corpus gives every base text < 50 FOUR carrier documents (itself
    # plus three doc_id%50 echoes), so those paragraphs cross the
    # min_repeats=2 bar and vanish from every document, while the
    # singleton paragraphs survive in original order; every input id
    # survives (empty text when all paragraphs were boilerplate).
    oracle="""
WITH base AS (SELECT doc_id, text FROM documents
              WHERE doc_id < 200 AND text IS NOT NULL),
synth AS (
  SELECT b.doc_id, b.text || chr(10) || s.text AS text
  FROM base b JOIN base s ON s.doc_id = b.doc_id % 50
),
paras AS (
  SELECT doc_id, unnest(ps) AS para, unnest(range(0, len(ps))) AS pos
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ps FROM synth)
),
np AS (SELECT * FROM paras WHERE length(trim(para)) > 0),
hot AS (SELECT para FROM np GROUP BY para
        HAVING COUNT(DISTINCT doc_id) >= 2),
kept AS (SELECT * FROM np WHERE para NOT IN (SELECT para FROM hot)),
agg AS (SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS text
        FROM kept GROUP BY doc_id)
SELECT s.doc_id, coalesce(a.text, '') AS text
FROM synth s LEFT JOIN agg a USING (doc_id)
""",
)
def q_pipe_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level corpus dedup (CCNet/Dolma boilerplate removal, the
    pass that runs BEFORE document near-dup): paragraphs repeated across
    ≥2 distinct documents vanish from all of them, survivors reassemble
    in original order, and every input id survives (empty text = fully
    boilerplate).  One hash aggregate keyed by sha2(paragraph) + a
    left-anti join back + one per-document reassembly — nothing
    driver-side, narrow shuffle rows (the digest, not the text)."""
    # text IS NOT NULL on BOTH engines: Spark's concat_ws skips NULLs
    # while DuckDB's '||' propagates them — filtering identically keeps
    # the synth corpora byte-equal if a future fixture carries NULL text
    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 200)
            .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    echo = (docs.filter(F.col("doc_id") < 50)
            .select(F.col("doc_id").alias("_k"), F.col("text").alias("_t2")))
    synth = (docs.withColumn("_k", F.col("doc_id") % 50)
             .join(echo, "_k")
             .select("doc_id",
                     F.concat_ws("\n", "text", "_t2").alias("text")))
    return dedup.paragraph_dedup(synth, min_repeats=2)


@register(
    "pipe_substring_dedup",
    # round 15 (VERDICT r14 task 3): ExactSubstr span-level dedup (Lee
    # et al. 2022) — the synthetic corpus appends doc (doc_id % 50)'s
    # text to every doc < 200, so the borrowed segment's 8-token windows
    # repeat across the ~4 docs sharing a base while windows SPANNING
    # the splice boundary stay unique — exactly the span-level shape the
    # pass removes (the whole borrowed segment vanishes, the boundary
    # tokens survive only where no repeated window covers them).
    oracle=r"""
WITH base AS (SELECT doc_id, text FROM documents
              WHERE doc_id < 200 AND text IS NOT NULL),
synth AS (
  SELECT b.doc_id, b.text || ' ' || s.text AS text
  FROM base b JOIN base s ON s.doc_id = b.doc_id % 50
),
toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> length(x) > 0) AS tk
  FROM synth
),
w AS (
  SELECT doc_id,
         unnest(range(greatest(len(tk) - 7, 0))) AS pos,
         unnest(list_transform(range(greatest(len(tk) - 7, 0)),
                               i -> array_to_string(tk[i+1:i+8], ' ')))
           AS wstr
  FROM toks
),
rep AS (SELECT wstr FROM w GROUP BY wstr
        HAVING COUNT(DISTINCT doc_id) >= 2),
cov AS (
  SELECT DISTINCT doc_id, pos + unnest(range(8)) AS cpos
  FROM w JOIN rep USING (wstr)
),
tok AS (SELECT doc_id, unnest(range(len(tk))) AS pos, unnest(tk) AS tok
        FROM toks),
kept AS (
  SELECT t.doc_id, t.pos, t.tok FROM tok t
  WHERE NOT EXISTS (SELECT 1 FROM cov c
                    WHERE c.doc_id = t.doc_id AND c.cpos = t.pos)
),
rebuilt AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
            FROM kept GROUP BY doc_id)
SELECT s.doc_id, COALESCE(r.text, '') AS text
FROM synth s LEFT JOIN rebuilt r USING (doc_id)
""",
)
def q_pipe_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup over a spliced corpus: every token covered by an
    8-token window repeated across ≥2 distinct documents is dropped and
    the survivors reassemble in order — the span-level pass between
    paragraph dedup and MinHash.  Digest-keyed shuffles (sha2 of the
    window, never its text), one bounded ×width explode of the
    duplicated region, one reassembly aggregate."""
    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 200)
            .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    echo = (docs.filter(F.col("doc_id") < 50)
            .select(F.col("doc_id").alias("_k"), F.col("text").alias("_t2")))
    synth = (docs.withColumn("_k", F.col("doc_id") % 50)
             .join(echo, "_k")
             .select("doc_id",
                     F.concat_ws(" ", "text", "_t2").alias("text")))
    return dedup.substring_dedup(synth, width=8, min_repeats=2)


_PII_SQL = """
WITH raw AS (
  SELECT doc_id,
         substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
         || '@example.com via https://ex.com/p?u=' || CAST(doc_id AS VARCHAR)
         || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
         || '.7 tel 555-012-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         AS t
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         t, '@URL@', '<URL>', 'g'), '@EMAIL@', '<EMAIL>', 'g'),
         '@IPV4@', '<IP>', 'g'), '@PHONE@', '<PHONE>', 'g') AS clean,
       CAST(len(regexp_extract_all(t, '@URL@')) AS INT) AS n_url,
       CAST(len(regexp_extract_all(t, '@EMAIL@')) AS INT) AS n_email,
       CAST(len(regexp_extract_all(t, '@IPV4@')) AS INT) AS n_ipv4,
       CAST(len(regexp_extract_all(t, '@PHONE@')) AS INT) AS n_phone
FROM raw
"""


def _pii_oracle() -> str:
    from ..functions.text import PII_PATTERNS  # noqa: PLC0415

    sql = _PII_SQL
    for name, pat, _ in PII_PATTERNS:
        sql = sql.replace(f"@{name.upper()}@", pat)
    return sql


@register(
    "pipe_pii_scrub",
    # round 12: the C4/Dolma PII-redaction tagger — URL/e-mail/IPv4/phone
    # collapse to stable placeholders in ONE fixed order; per-kind hit
    # counts audit the raw text.  The patterns interpolate from the same
    # PII_PATTERNS tuple the Spark expressions compile from, so the two
    # engines can never drift.
    oracle=_pii_oracle(),
)
def q_pipe_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (the C4/Dolma tagger family): deterministic synthetic
    PII (an e-mail, a URL, an IPv4, a phone number derived from doc_id)
    injects into each document, `scrub_pii` collapses each kind to its
    placeholder via JVM regexp_replace chains (whole-stage codegen, no
    Python), and per-kind `pii_counts` audit the raw text.  Both engines
    compile the SAME PII_PATTERNS tuple."""
    from ..functions.text import pii_counts, scrub_pii  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    raw = F.concat(
        F.substring("text", 1, 40), F.lit(" contact user"), d,
        F.lit("@example.com via https://ex.com/p?u="), d,
        F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 tel 555-012-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    out = docs.select("doc_id", raw.alias("_t"))
    counts = [c.cast("int").alias(f"n_{name}")
              for name, c in pii_counts(F.col("_t"))]
    return out.select("doc_id", scrub_pii(F.col("_t")).alias("clean"),
                      *counts)


@register(
    "dedup_duplicate_clusters",
    # round 13: duplicate-CLUSTER resolution — the step every near-dup
    # pipeline runs after pair generation.  Spark: min-label propagation
    # (one shuffle per round, localCheckpoint lineage hygiene) over the
    # exact-oracled n-gram Jaccard pair set; DuckDB: the same pairs +
    # a RECURSIVE transitive-closure CTE — component = min reachable id,
    # so "A~B, B~C" provably collapses to one cluster on both engines.
    oracle=f"""
WITH RECURSIVE {DUCK_SHINGLES},
keep0 AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 50),
sh2 AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep0 USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh2 GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS n_inter
  FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
p AS (
  SELECT ia AS a, ib AS b FROM inter
  JOIN sizes sa ON sa.doc_id = ia
  JOIN sizes sb ON sb.doc_id = ib
  WHERE round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.5
),
edges AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
reach(n, m) AS (
  SELECT a AS n, b AS m FROM edges
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
),
comp AS (SELECT n AS node, LEAST(n, MIN(m)) AS component
         FROM reach GROUP BY n)
SELECT component AS cluster, COUNT(*) AS n_members,
       list(node ORDER BY node) AS members,
       MIN(node) AS keep
FROM comp GROUP BY component
""",
)
def q_dedup_duplicate_clusters(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Duplicate clusters over the exact n-gram Jaccard pairs: transitive
    closure via distributed min-label propagation
    (dedup.connected_components), summarized one row per cluster with
    the lowest-id keep policy — survivors of the dedup pass are "keep
    per cluster" plus every unpaired document."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_df=50)
    return dedup.duplicate_clusters(pairs)


@register(
    "dedup_cluster_keep_quality",
    # round 14: the QUALITY keep policy — real near-dup passes keep the
    # BEST copy per cluster (longest / highest classifier score), not
    # the oldest id.  Same exact-oracled Jaccard pair set and RECURSIVE
    # closure as dedup_duplicate_clusters; keep = highest n_chars, ties
    # by lowest id (a rank window on both engines — deterministic).
    oracle=f"""
WITH RECURSIVE {DUCK_SHINGLES},
keep0 AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 50),
sh2 AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep0 USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh2 GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS n_inter
  FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
p AS (
  SELECT ia AS a, ib AS b FROM inter
  JOIN sizes sa ON sa.doc_id = ia
  JOIN sizes sb ON sb.doc_id = ib
  WHERE round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.5
),
edges AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
reach(n, m) AS (
  SELECT a AS n, b AS m FROM edges
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
),
comp AS (SELECT n AS node, LEAST(n, MIN(m)) AS component
         FROM reach GROUP BY n),
scored AS (
  SELECT c.node, c.component, d.n_chars,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY d.n_chars DESC, c.node) AS rn
  FROM comp c JOIN documents d ON d.doc_id = c.node
)
SELECT component AS cluster, COUNT(*) AS n_members,
       MIN(CASE WHEN rn = 1 THEN node END) AS keep
FROM scored GROUP BY component
""",
)
def q_dedup_cluster_keep_quality(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Duplicate clusters with the QUALITY keep policy: per cluster keep
    the member with the highest ``n_chars`` (ties by lowest id) — what a
    real near-dup pass keeps.  The quality frame joins onto the labeled
    nodes once; the pick is one ``min_by`` aggregate (negated score,
    node) — no per-cluster sort."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_df=50)
    out = dedup.duplicate_clusters(
        pairs, quality=docs.select("doc_id", "n_chars"),
        quality_id="doc_id", quality_col="n_chars")
    return out.select("cluster", "n_members", "keep")


@register(
    "pipe_gopher_rules",
    # round 14: the Gopher quality-rule battery (Rae et al. 2021) — the
    # standard pretraining gate between language-ID and dedup.  Every
    # rule is integer-count arithmetic over identical string primitives,
    # reproduced rule-for-rule in DuckDB (min_words lowered to 20 and
    # min_required_words to 1: the fixture's documents are short and
    # its synthetic vocabulary carries only 'the' of the Gopher
    # function-word set — 382/500 docs hit it, so the flag is a real
    # discriminator instead of a constant).
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> length(x) > 0) AS tk,
         list_filter(regexp_split_to_array(text, '\n'),
                     x -> length(trim(x)) > 0) AS lines,
         length(text) - length(regexp_replace(text, '#', '', 'g'))
           AS n_hash,
         (length(text) - length(regexp_replace(text, '\.\.\.', '', 'g')))
           / 3 AS n_ell
  FROM documents
),
m AS (
  SELECT doc_id, len(tk) AS n, n_hash, n_ell, len(lines) AS n_lines,
         list_sum(list_transform(tk, x -> length(x))) AS tot_len,
         len(list_filter(lines,
             x -> substr(ltrim(x), 1, 2) IN ('- ', '* ')
                  OR substr(ltrim(x), 1, 1) = '•')) AS n_bullet,
         len(list_filter(lines,
             x -> right(rtrim(x), 3) = '...')) AS n_ell_end,
         len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))
           AS n_alpha,
         len(list_filter(['the','be','to','of','and','that','have','with'],
             s -> list_contains(list_transform(tk, x -> lower(x)), s)))
           AS n_req
  FROM t
),
f AS (
  SELECT doc_id,
         CAST(n >= 20 AND n <= 100000 AS INT) AS n_words_ok,
         CAST(n > 0 AND tot_len / n >= 3.0 AND tot_len / n <= 10.0
              AS INT) AS mean_len_ok,
         CAST(n > 0 AND (n_hash + n_ell) / n <= 0.1 AS INT) AS symbol_ok,
         CAST(n_lines = 0 OR n_bullet / n_lines <= 0.9 AS INT)
           AS bullet_ok,
         CAST(n_lines = 0 OR n_ell_end / n_lines <= 0.3 AS INT)
           AS ellipsis_ok,
         CAST(n > 0 AND n_alpha / n >= 0.8 AS INT) AS alpha_ok,
         CAST(n_req >= 1 AS INT) AS required_ok
  FROM m
)
SELECT doc_id, n_words_ok, mean_len_ok, symbol_ok, bullet_ok,
       ellipsis_ok, alpha_ok, required_ok,
       CAST(n_words_ok = 1 AND mean_len_ok = 1 AND symbol_ok = 1
            AND bullet_ok = 1 AND ellipsis_ok = 1 AND alpha_ok = 1
            AND required_ok = 1 AS INT) AS passes
FROM f
""",
)
def q_pipe_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules over the documents table: per-rule flags +
    the conjunction, one codegen projection over a single scan — no
    shuffle, no UDF.  The canonical corpus gate a 100 TB pretraining
    pipeline runs on every document before dedup."""
    from ..functions.text import gopher_rules  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    flags = gopher_rules(F.col("text"), min_words=20,
                         min_required_words=1)
    return docs.select(
        "doc_id", *[v.cast("int").alias(k) for k, v in flags.items()])


@register(
    "pipe_domain_mix_temperature",
    # round 14: temperature-based domain mixing — per-language quota
    # ∝ count^0.5 (α=0.5), the standard multilingual rebalancing between
    # natural (α=1) and uniform (α→0).  The ratio rounds to 6 decimals
    # BEFORE the floor on both engines so summation order can't flip a
    # quota boundary.
    oracle="""
WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
t AS (SELECT SUM(pow(cnt, 0.5)) AS tot FROM c),
q AS (SELECT lang,
             GREATEST(1, CAST(FLOOR(ROUND(60 * pow(cnt, 0.5) / tot, 6))
                              AS INT)) AS quota
      FROM c, t),
r AS (SELECT d.doc_id, d.lang, q.quota,
             row_number() OVER (
               PARTITION BY d.lang
               ORDER BY md5('mix' || CAST(d.doc_id AS VARCHAR)), d.doc_id)
               AS rn
      FROM documents d JOIN q USING (lang))
SELECT doc_id, lang FROM r WHERE rn <= quota
""",
)
def q_pipe_domain_mix_temperature(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Temperature mixing (α=0.5, N=60) over the documents table by
    language: one tiny count aggregate builds the quota table (|langs|
    rows, broadcast), one rank window per stratum cuts the corpus —
    the domain-rebalancing step every multilingual pretraining mix
    runs between dedup and sharding."""
    from ..operators.sampling import temperature_mix  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    out = temperature_mix(docs, "lang", "doc_id", n_target=60, alpha=0.5,
                          salt="mix")
    return out.select("doc_id", "lang")
