"""Vector quantization for memory-bounded ANN search (SURVEY.md §2.3 J5
scale path; the Qdrant quantization_config surface the reference's
vectors_config implies — qdrant_embedder.py:95-102 creates the collection
the client would attach ScalarQuantization / BinaryQuantization to).

Two schemes, both fully declarative (no UDF in the hot path):

  scalar int8 — per-dimension (min, max) learned in ONE distributed pass;
      each float32 becomes an 8-bit code ``round((v - min) / scale)``;
      search runs on DEQUANTIZED codes (4× less vector memory, same plan
      shape as exact kNN), optionally reranked exact.
  binary      — 1 bit per dimension (sign), packed into two 32-bit halves
      per 64 dims; Hamming distance = popcount(xor) over packed words is
      the candidate metric, then an exact cosine rerank of the top
      ``rerank_factor × k`` candidates recovers accuracy (32× less vector
      memory; the Qdrant binary-quantization + rescore pattern).

Scale design: quantization params are a 64-row aggregate (dims, not rows —
collects O(dim) to the driver no matter the corpus size) folded back in as
literal arrays so encode/search stay inside whole-stage codegen.  The
packed/binary search is the same broadcast-queries × corpus-scan shape as
:func:`knn.knn_join` — the corpus never shuffles; per-query top-k is the
only exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector


def sq_train(corpus: DataFrame, vec_col: str = "embedding",
             bits: int = 8) -> tuple[list[float], list[float]]:
    """Per-dimension (mins, scales) for scalar quantization.

    One posexplode + groupBy(pos) agg — a single shuffle whose output is
    ``dim`` rows; only those collect to the driver (bounded by dimension,
    never by corpus size).
    """
    levels = (1 << bits) - 1
    dims = (
        corpus.select(F.posexplode(F.col(vec_col)).alias("pos", "val"))
        .groupBy("pos")
        .agg(F.min(F.col("val").cast("double")).alias("mn"),
             F.max(F.col("val").cast("double")).alias("mx"))
        .orderBy("pos")
        .collect()
    )
    mins = [r["mn"] for r in dims]
    scales = [((r["mx"] - r["mn"]) / levels) or 1.0 for r in dims]
    return mins, scales


def sq_encode(df: DataFrame, mins: list[float], scales: list[float],
              vec_col: str = "embedding",
              out_col: str = "codes") -> DataFrame:
    """array<int> codes in [0, 2^bits): ``round((v - min[i]) / scale[i])``.

    Pure codegen transform — the literal param arrays fold into the
    expression, so encoding pipelines into the scan with zero extra stages.
    """
    mn = F.array(*[F.lit(float(m)) for m in mins])
    sc = F.array(*[F.lit(float(s)) for s in scales])
    code = F.transform(
        F.col(vec_col),
        lambda v, i: F.round((v.cast("double") - F.element_at(mn, i + 1))
                             / F.element_at(sc, i + 1), 0).cast("int"),
    )
    return df.withColumn(out_col, code)


def sq_decode_expr(codes_col, mins: list[float], scales: list[float]):
    """Column of array<double>: dequantized vector ``min[i] + code·scale[i]``."""
    mn = F.array(*[F.lit(float(m)) for m in mins])
    sc = F.array(*[F.lit(float(s)) for s in scales])
    return F.transform(
        codes_col,
        lambda c, i: F.element_at(mn, i + 1)
        + c.cast("double") * F.element_at(sc, i + 1),
    )


def sq_knn(queries: DataFrame, corpus: DataFrame, k: int = 10,
           query_id: str = "qid", query_vec: str = "qvec",
           corpus_id: str = "vec_id", corpus_vec: str = "embedding",
           bits: int = 8, exclude_self: bool = True,
           round_to: int | None = 6) -> DataFrame:
    """Top-k cosine over the SCALAR-QUANTIZED corpus (approximate).

    The corpus side of every dot product reads the dequantized int8 code —
    at scale the float vectors never load; queries stay exact float.  Plan
    shape is identical to exact kNN (broadcast queries, corpus scans once,
    per-query top-k window); only the corpus representation changed.
    """
    mins, scales = sq_train(corpus, corpus_vec, bits)
    enc = sq_encode(corpus, mins, scales, corpus_vec).select(
        corpus_id, sq_decode_expr(F.col("codes"), mins, scales).alias("_deq"))
    q = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("qvec"),
        vector.l2_norm(F.col(query_vec)).alias("_qn"))
    pairs = enc.withColumn("_cn", vector.l2_norm(F.col("_deq"))).join(
        F.broadcast(q), how="cross")
    if exclude_self:
        pairs = pairs.filter(F.col("qid") != F.col(corpus_id))
    denom = F.col("_qn") * F.col("_cn")
    sim = F.when(denom != 0.0, vector.dot(F.col("qvec"), F.col("_deq")) / denom)
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = pairs.select("qid", F.col(corpus_id).alias("vec_id"),
                          sim.alias("sim"))
    scored = scored.filter(F.col("sim").isNotNull() & ~F.isnan("sim"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# Binary quantization: sign bits packed into 32-dim words + Hamming candidate
# search + exact rerank
# ---------------------------------------------------------------------------

def binary_pack_expr(vec_col, dim: int):
    """array<bigint> of ceil(dim/32) packed words; bit i of word w set iff
    ``vec[32w + i] > 0``.  32-bit words keep every partial sum positive, so
    the identical SUM(2^i)-style arithmetic is reproducible in any SQL
    engine without unsigned/HUGEINT care."""
    words = []
    for w in range(0, dim, 32):
        n = min(32, dim - w)
        word = None
        for i in range(n):
            bit = F.when(F.element_at(vec_col, w + i + 1) > 0,
                         F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
            word = bit if word is None else word + bit
        words.append(word)
    return F.array(*words)


def binary_knn_rerank(queries: DataFrame, corpus: DataFrame, k: int = 10,
                      dim: int = 64, rerank_factor: int = 5,
                      query_id: str = "qid", query_vec: str = "qvec",
                      corpus_id: str = "vec_id", corpus_vec: str = "embedding",
                      exclude_self: bool = True,
                      round_to: int | None = 6) -> DataFrame:
    """Binary-quantized candidate search + exact cosine rerank.

    Phase 1 ranks by Hamming distance over the packed sign bits (popcount
    of xor — integer-only, 32× smaller than float vectors) and keeps
    ``rerank_factor × k`` candidates per query; phase 2 reranks ONLY those
    candidates with the exact float cosine.  Returns (qid, vec_id, sim,
    rank) like every kNN twin.  The float vectors are touched for
    |Q|·rerank_factor·k rows instead of |Q|·|C| — the Qdrant
    binary-quantization + rescore pattern as one declarative plan.
    """
    n_cand = rerank_factor * k
    # phase 1 carries ONLY (id, packed bits) — the float corpus vectors do
    # not flow through the |Q|·|C| pair stream
    packed_c = corpus.select(
        corpus_id, binary_pack_expr(F.col(corpus_vec), dim).alias("_pc"))
    q_packed = queries.select(
        F.col(query_id).alias("qid"),
        binary_pack_expr(F.col(query_vec), dim).alias("_pq"))
    pairs = packed_c.join(F.broadcast(q_packed), how="cross")
    if exclude_self:
        pairs = pairs.filter(F.col("qid") != F.col(corpus_id))
    ham = None
    for w in range(-(-dim // 32)):
        h = F.bit_count(F.element_at(F.col("_pq"), w + 1)
                        .bitwiseXOR(F.element_at(F.col("_pc"), w + 1)))
        ham = h if ham is None else ham + h
    cand_w = Window.partitionBy("qid").orderBy(
        F.asc("hamming"), F.asc(corpus_id))
    cands = (
        pairs.withColumn("hamming", ham)
        .withColumn("_crank", F.row_number().over(cand_w))
        .filter(F.col("_crank") <= n_cand)
        .select("qid", F.col(corpus_id).alias("vec_id"))
    )
    # phase 2: fetch float vectors ONLY for the |Q|·n_cand candidates — the
    # tiny candidate set broadcasts, the corpus is probed by a hash join
    # (no corpus shuffle), then the exact cosine reranks
    q_exact = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("qvec"),
        vector.l2_norm(F.col(query_vec)).alias("_qn"))
    rerank = (
        corpus.select(F.col(corpus_id).alias("vec_id"),
                      F.col(corpus_vec).alias("_cvec"))
        .join(F.broadcast(cands), "vec_id")
        .join(F.broadcast(q_exact), "qid")
    )
    denom = F.col("_qn") * vector.l2_norm(F.col("_cvec"))
    sim = F.when(denom != 0.0,
                 vector.dot(F.col("qvec"), F.col("_cvec")) / denom)
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = rerank.select("qid", "vec_id", sim.alias("sim"))
    scored = scored.filter(F.col("sim").isNotNull() & ~F.isnan("sim"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
