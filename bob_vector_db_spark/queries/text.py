"""Text search: BM25 (in-memory + persisted index), sparse vectors,
n-grams, repetition stats (SURVEY F6)."""


from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vector
from ..functions.text import ws_tokens
from ..operators import dedup, index, upsert
from ..sources import load_table

from ._registry import register
from ._shared import *  # noqa: F403 — shared oracle/fixture helpers


@register("text_langid", oracle=_langid_oracle())
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import LANG_MARKERS, lang_scores_text  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    # round 15: the codegen regexp form — no token array materializes
    scores = lang_scores_text(F.col("text"))
    ranked = F.sort_array(F.array(*[
        F.struct((-scores[lang]).alias("neg"), F.lit(lang).alias("l"))
        for lang in sorted(LANG_MARKERS)
    ]))
    return docs.select(
        "doc_id",
        scores["en"].cast("long").alias("s_en"),
        ranked[0]["l"].alias("pred_lang"),
    )


@register(
    "text_quality_stats",
    oracle=r"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> length(x) > 0) AS tk
  FROM documents
),
m AS (
  SELECT doc_id, text, tk, len(tk) AS n_tok,
         len(list_filter(tk, x -> list_contains(
             ['the','a','of','and','is','to','in'], lower(x)))) AS n_sw,
         length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct
  FROM t
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
       round(CASE WHEN n_tok > 0 THEN n_sw::DOUBLE / n_tok ELSE 0.0 END, 6) AS sw_ratio,
       round(CASE WHEN length(text) > 0
                  THEN n_punct::DOUBLE / length(text) ELSE 0.0 END, 6) AS punct_ratio,
       round(CASE WHEN n_tok > 0
                  THEN list_sum(list_transform(tk, x -> length(x)))::DOUBLE / n_tok
                  ELSE 0.0 END, 6) AS avg_tok_len,
       round((CASE WHEN n_tok >= 10 AND n_tok <= 1000 THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN n_tok > 0 AND n_sw::DOUBLE / n_tok >= 0.05 THEN 0.3 ELSE 0.0 END)
           + (CASE WHEN length(text) > 0 AND n_punct::DOUBLE / length(text) <= 0.2
                   THEN 0.3 ELSE 0.0 END), 6) AS quality
FROM m
""",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as TX  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    return docs.select(
        "doc_id",
        TX.token_count(F.col("text")).cast("long").alias("n_tokens"),
        F.round(TX.stopword_ratio_text(F.col("text")), 6).alias("sw_ratio"),
        F.round(TX.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(TX.avg_token_len(toks), 6).alias("avg_tok_len"),
        F.round(TX.quality_score(F.col("text")), 6).alias("quality"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
       ({_FP_HASH}) AS fp,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
            AS BIGINT) AS n_bpe_tokens
FROM documents
""",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as TX  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.fingerprint(F.col("text")).alias("fp"),
        F.size(TX.bpe_tokens(F.col("text"))).cast("long").alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# Corpus vocabulary: top n-grams by document frequency — the vocab-building
# aggregation every tokenizer/dedup pipeline starts from (one shuffle on the
# shingle, map-side partials, global top-k via TakeOrderedAndProject).
# ---------------------------------------------------------------------------

@register(
    "text_top_ngrams",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> length(x) > 0) AS tk
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(greatest(len(tk)-1, 0)),
                                 i -> array_to_string(tk[i+1:i+2], ' '))) AS shingle
    FROM toks)
)
SELECT shingle, COUNT(*) AS df
FROM sh GROUP BY shingle
ORDER BY df DESC, shingle
LIMIT 100
""",
)
def q_text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.doc_shingles(docs, n=2)
    return (
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("shingle")).limit(100)
    )


@register(
    "text_bm25_search",
    oracle=r"""
WITH toks AS (
  SELECT doc_id AS id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
lens AS (SELECT id, len(toks) AS len FROM toks),
stats AS (SELECT COUNT(*) AS n, AVG(len) AS avgdl FROM lens),
posting AS (
  SELECT id, term, COUNT(*) AS tf
  FROM (SELECT id, unnest(toks) AS term FROM toks)
  WHERE term IN ('vector', 'join', 'stream')
  GROUP BY id, term
),
dfreq AS (SELECT term, COUNT(DISTINCT id) AS df FROM posting GROUP BY term),
scored AS (
  SELECT p.id,
         round(SUM(
           ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (p.tf * 2.2)
           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * lens.len / stats.avgdl))
         ), 6) AS score
  FROM posting p
  JOIN dfreq ON p.term = dfreq.term
  JOIN lens ON lens.id = p.id
  CROSS JOIN stats
  GROUP BY p.id
)
SELECT id, score, CAST(row_number() OVER (ORDER BY score DESC, id) AS BIGINT)
       AS rank
FROM scored ORDER BY score DESC, id LIMIT 10
""",
)
def q_text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval twin of the vector search surface: Okapi BM25
    top-10 for a bag-of-terms query, all JVM expressions (see
    operators/text_search.py for the inverted-index-probe plan shape)."""
    from ..operators.text_search import bm25_topk  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    out = bm25_topk(docs, ["vector", "join", "stream"], k=10)
    return out.select("id", "score", F.col("rank").cast("long").alias("rank"))


@register(
    "text_bm25_indexed",
    oracle=r"""
WITH toks AS (
  SELECT doc_id AS id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
lens AS (SELECT id, len(toks) AS len FROM toks),
stats AS (SELECT COUNT(*) AS n, AVG(len) AS avgdl FROM lens),
posting AS (
  SELECT id, term, COUNT(*) AS tf
  FROM (SELECT id, unnest(toks) AS term FROM toks)
  WHERE term IN ('vector', 'join', 'stream')
  GROUP BY id, term
),
dfreq AS (SELECT term, COUNT(DISTINCT id) AS df FROM posting GROUP BY term),
scored AS (
  SELECT p.id,
         round(SUM(
           ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (p.tf * 2.2)
           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * lens.len / stats.avgdl))
         ), 6) AS score
  FROM posting p
  JOIN dfreq ON p.term = dfreq.term
  JOIN lens ON lens.id = p.id
  CROSS JOIN stats
  GROUP BY p.id
)
SELECT id, score, CAST(row_number() OVER (ORDER BY score DESC, id) AS BIGINT)
       AS rank
FROM scored ORDER BY score DESC, id LIMIT 10
""",
)
def q_text_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over the PERSISTED inverted index: build_text_index materializes
    the (term, id, tf, len) posting table bucketed by term hash into the
    collection store once; the query probes only its terms' buckets (static
    partition pruning) with ZERO corpus passes — same oracle as the
    in-memory text_bm25_search, proving stored-index parity."""
    from ..operators.text_search import bm25_topk_indexed, build_text_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "bmidx")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.select(F.col("doc_id").alias("id"), "text"))
    build_text_index(spark, base, "docs", text_col="text", n_term_buckets=16)
    out = bm25_topk_indexed(spark, base, "docs",
                            ["vector", "join", "stream"], k=10,
                            text_col="text")
    return out.select("id", "score", F.col("rank").cast("long").alias("rank"))


@register(
    "text_bm25_refresh",
    oracle=r"""
WITH corpus AS (
  SELECT d.doc_id AS id, d2.text AS text
  FROM documents d JOIN documents d2 ON d2.doc_id = d.doc_id + 100
  WHERE d.doc_id < 5
  UNION ALL
  SELECT doc_id, text FROM documents
  WHERE doc_id >= 5 AND doc_id NOT BETWEEN 20 AND 29
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id BETWEEN 30 AND 39
),
toks AS (
  SELECT id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> length(x) > 0) AS toks
  FROM corpus
),
lens AS (SELECT id, len(toks) AS len FROM toks),
stats AS (SELECT COUNT(*) AS n, AVG(len) AS avgdl FROM lens),
posting AS (
  SELECT id, term, COUNT(*) AS tf
  FROM (SELECT id, unnest(toks) AS term FROM toks)
  WHERE term IN ('vector', 'join', 'stream')
  GROUP BY id, term
),
dfreq AS (SELECT term, COUNT(DISTINCT id) AS df FROM posting GROUP BY term),
scored AS (
  SELECT p.id,
         round(SUM(
           ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (p.tf * 2.2)
           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * lens.len / stats.avgdl))
         ), 6) AS score
  FROM posting p
  JOIN dfreq ON p.term = dfreq.term
  JOIN lens ON lens.id = p.id
  CROSS JOIN stats
  GROUP BY p.id
)
SELECT id, score, CAST(row_number() OVER (ORDER BY score DESC, id) AS BIGINT)
       AS rank
FROM scored ORDER BY score DESC, id LIMIT 10
""",
)
def q_text_bm25_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25 index absorbs mutations incrementally too: overwrite 5 docs,
    add 10, delete 10, then ONE refresh_text_index call appends the changed
    docs' postings at generation 1, masks their old rows, and recomputes
    (n_docs, avgdl) from the masked doc-length table.  The probe stays a
    partition-pruned stored-index read; results must equal BM25 over the
    final corpus (the oracle's recomputation)."""
    from ..operators.text_search import bm25_topk_indexed, build_text_index, refresh_text_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "bmidxr")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.select(F.col("doc_id").alias("id"), "text"))
    build_text_index(spark, base, "docs", text_col="text", n_term_buckets=16)
    overwrite = (docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 105))
                 .select((F.col("doc_id") - 100).alias("id"), "text"))
    fresh_docs = (docs.filter(F.col("doc_id").between(30, 39))
                  .select((F.col("doc_id") + 100000).alias("id"), "text"))
    upsert.upsert(spark, base, "docs", overwrite.unionByName(fresh_docs),
                  id_col="id")
    upsert.delete_points(spark, base, "docs", list(range(20, 30)),
                         count_removed=False)
    refresh_text_index(spark, base, "docs", text_col="text")
    out = bm25_topk_indexed(spark, base, "docs",
                            ["vector", "join", "stream"], k=10,
                            text_col="text")
    return out.select("id", "score", F.col("rank").cast("long").alias("rank"))


@register("sparse_knn_text", oracle=_SPARSE_ORACLE)
def q_sparse_knn_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse top-k over hashed-TF encodings (the deterministic stand-in
    for a SPLADE-style learned sparse encoder): corpus postings prune to
    the queries' active dimensions through ONE broadcast equi-join on the
    dimension id, then a partial-aggregated dot product and a per-query
    rank window — no dense vocab_size vector exists anywhere."""
    from ..operators.sparse import postings_from_text, sparse_dot_topk  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    post = postings_from_text(docs, id_col="doc_id", text_col="text",
                              vocab_size=512)
    q = post.filter(F.col("id") < 3)
    out = sparse_dot_topk(q, post, k=10, exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "text_repetition_stats",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> length(x) > 0) AS tk
  FROM documents WHERE doc_id < 200
),
uni AS (
  SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_tok
  FROM (SELECT doc_id, tok, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(tk) AS tok FROM t)
        GROUP BY doc_id, tok)
  GROUP BY doc_id
),
tri AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= 3 THEN
           list_transform(range(0, len(tk) - 2),
                          i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])
         ELSE [] END AS gs
  FROM t
),
tristats AS (
  SELECT doc_id, COUNT(*) AS total3, COUNT(DISTINCT g) AS uniq3
  FROM (SELECT doc_id, unnest(gs) AS g FROM tri)
  GROUP BY doc_id
)
SELECT u.doc_id,
       CAST(u.n_tok AS BIGINT) AS n_tok,
       round(CAST(u.top_c AS DOUBLE) / u.n_tok, 6) AS top_tok_frac,
       round(CASE WHEN coalesce(ts.total3, 0) = 0 THEN 0.0
                  ELSE 1.0 - CAST(ts.uniq3 AS DOUBLE) / ts.total3 END,
             6) AS dup_3gram_frac
FROM uni u LEFT JOIN tristats ts ON ts.doc_id = u.doc_id
""",
)
def q_text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals for pretraining-data filtering (the
    Gopher/MassiveText style): per doc, the most-frequent-token fraction
    and the duplicated-3-gram fraction.  Both are one explode + hash
    aggregate — whole-stage codegen, map-side partials, shuffle keyed on
    (doc, token/gram); the 3-grams build from the token array with a
    sequence transform, no self-join."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = docs.select(
        "doc_id", ws_tokens(F.lower(F.col("text"))).alias("tk"))

    uni = (toks.select("doc_id", F.explode("tk").alias("tok"))
           .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
           .groupBy("doc_id")
           .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_tok")))

    grams = toks.select(
        "doc_id",
        F.when(
            F.size("tk") >= 3,
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - 3),
                lambda i: F.concat_ws(
                    " ", F.element_at(F.col("tk"), i + 1),
                    F.element_at(F.col("tk"), i + 2),
                    F.element_at(F.col("tk"), i + 3)),
            )).otherwise(F.array().cast("array<string>")).alias("gs"))
    tristats = (grams.select("doc_id", F.explode("gs").alias("g"))
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("total3"),
                     F.countDistinct("g").alias("uniq3")))

    out = uni.join(tristats, "doc_id", "left")
    return out.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.round(F.col("top_c").cast("double") / F.col("n_tok"), 6)
        .alias("top_tok_frac"),
        F.round(
            F.when(F.coalesce(F.col("total3"), F.lit(0)) == 0, F.lit(0.0))
            .otherwise(F.lit(1.0) - F.col("uniq3").cast("double")
                       / F.col("total3")), 6).alias("dup_3gram_frac"))
