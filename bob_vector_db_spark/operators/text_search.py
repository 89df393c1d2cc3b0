"""BM25 keyword retrieval over a document table (SURVEY.md §2 north-star
text analysis; the lexical twin of the delegated vector search surface —
reference README.md:13 "Query the DB and return the results").

Okapi BM25 with the Lucene idf form:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len_d/avgdl))

Everything is JVM-side expressions over one token explode:

  1. corpus stats (N, avgdl) — one tiny aggregate, folded in as literals;
  2. per-(doc, term) tf — explode + filter to the query terms (the filter
     prunes the posting stream BEFORE the shuffle: only matching terms move);
  3. per-term df — aggregate of the pruned stream, |terms| rows, broadcast;
  4. score + per-query top-k window.

Scale: the only full-corpus pass is the token explode, and the term filter
cuts it to the query's posting lists immediately — the shape of an inverted
index probe without materializing the index.  At 100 TB you'd persist stage
2 bucketed by term; the query-time plan is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import ws_tokens


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75,
              round_to: int = 6) -> DataFrame:
    """Top-k (id, score, rank) for a bag-of-terms query, ties broken by id.

    Tokenization is lowercased whitespace split — the exact twin of the
    DuckDB oracle's ``DUCK_WS_TOKENS`` on ``lower(text)``.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        ws_tokens(F.lower(F.col(text_col))).alias("toks"))
    lens = toks.select("id", F.size("toks").alias("len"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("len").alias("avgdl")).first()
    if not stats["n"]:  # empty corpus: empty result, id keeps its true type
        return lens.select("id", F.lit(0.0).alias("score"),
                           F.lit(0).alias("rank")).limit(0)
    n_docs, avgdl = stats["n"], float(stats["avgdl"])

    # doc length rides the explode, so the pruned posting stream already
    # carries it — the corpus-sized `lens` table is never joined back in
    # (the only shuffle over corpus-scale data is this one groupBy, and its
    # input is already pruned to the query's terms)
    posting = (
        toks.select("id", F.size("toks").alias("len"),
                    F.explode("toks").alias("term"))
        .filter(F.col("term").isin([t.lower() for t in terms]))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("len").alias("len"))
    )
    df_t = posting.groupBy("term").agg(
        F.countDistinct("id").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    scored = (
        posting.join(F.broadcast(df_t), "term")
        .withColumn(
            "contrib",
            idf * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("len") / avgdl)))
        .groupBy("id")
        .agg(F.round(F.sum("contrib"), round_to).alias("score"))
    )
    # TakeOrderedAndProject (per-partition heaps + one merge of k rows) —
    # not a global row_number window, which would shuffle every scored doc
    # into a single partition
    topk = scored.orderBy(F.desc("score"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return topk.withColumn("rank", F.row_number().over(w))


def rrf_fuse(ranked: list[DataFrame], k: int = 10, k0: int = 60,
             id_col: str = "id", rank_col: str = "rank",
             round_to: int = 6) -> DataFrame:
    """Reciprocal Rank Fusion of N ranked lists (the hybrid-search combiner:
    lexical BM25 ∪ vector kNN ∪ …): ``score(d) = Σ_lists 1/(k0 + rank_d)``,
    summing only the lists where ``d`` appears.

    Rank lists are top-k-sized (tiny), so the fusion is a chain of
    broadcast-able full-outer joins followed by one TakeOrderedAndProject —
    nothing here scales with the corpus, only with k·n_lists.  Integer
    ranks in, so the fused score is bit-deterministic across engines.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    fused = None
    for i, df in enumerate(ranked):
        part = df.select(
            F.col(id_col).alias("id"),
            (F.lit(1.0) / (F.lit(k0) + F.col(rank_col))).alias(f"_c{i}"))
        fused = part if fused is None else fused.join(part, "id", "full_outer")
    contribs = [F.coalesce(F.col(f"_c{i}"), F.lit(0.0))
                for i in range(len(ranked))]
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    scored = fused.select("id", F.round(score, round_to).alias("rrf_score"))
    topk = scored.orderBy(F.desc("rrf_score"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("rrf_score"), F.asc("id"))
    return topk.withColumn("rank", F.row_number().over(w))
