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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import vector


def _rank_topk(scored: DataFrame, k: int, ascending: bool = False,
               score_col: str = "sim") -> DataFrame:
    """Shared (qid, vec_id, score) → top-k ranking tail: NaN/NULL scores
    dropped (NaN would rank above every real value in desc order), ties
    broken on vec_id, rank ≤ k."""
    scored = scored.filter(
        F.col(score_col).isNotNull() & ~F.isnan(score_col))
    order = F.asc(score_col) if ascending else F.desc(score_col)
    w = Window.partitionBy("qid").orderBy(order, F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


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


def _double_array_expr(vals: list[float]) -> "F.Column":
    """Literal array<double> parsed from ONE SQL string: ``F.array`` of N
    ``F.lit`` columns costs ~2N py4j roundtrips (~0.17 s at dim 64, round
    16); the ``D`` suffix pins each literal to DOUBLE (a bare ``0.1``
    parses as DECIMAL) and ``repr`` is the shortest exact round-trip."""
    return F.expr("array(" + ", ".join(f"{float(v)!r}D" for v in vals) + ")")


def sq_encode(df: DataFrame, mins: list[float], scales: list[float],
              vec_col: str = "embedding",
              out_col: str = "codes") -> DataFrame:
    """array<int> codes in [0, 2^bits): ``round((v - min[i]) / scale[i])``.

    Pure codegen transform — the literal param arrays fold into the
    expression, so encoding pipelines into the scan with zero extra stages.
    """
    mn = _double_array_expr(mins)
    sc = _double_array_expr(scales)
    code = F.transform(
        F.col(vec_col),
        lambda v, i: F.round((v.cast("double") - F.element_at(mn, i + 1))
                             / F.element_at(sc, i + 1), 0).cast("int"),
    )
    return df.withColumn(out_col, code)


def sq_decode_expr(codes_col, mins: list[float], scales: list[float]):
    """Column of array<double>: dequantized vector ``min[i] + code·scale[i]``."""
    mn = _double_array_expr(mins)
    sc = _double_array_expr(scales)
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
    from .knn import knn_join  # noqa: PLC0415 - avoid circular import

    mins, scales = sq_train(corpus, corpus_vec, bits)
    enc = sq_encode(corpus, mins, scales, corpus_vec).select(
        corpus_id, sq_decode_expr(F.col("codes"), mins, scales).alias("_deq"))
    # the search IS exact kNN over the dequantized column — delegate so the
    # score/NaN/tie-break contract lives in exactly one place
    return knn_join(
        queries, enc, k=k, query_id=query_id, query_vec=query_vec,
        corpus_id=corpus_id, corpus_vec="_deq",
        exclude_self=exclude_self, round_to=round_to)


# ---------------------------------------------------------------------------
# Product quantization (PQ): per-subspace k-means codebooks + asymmetric
# distance computation (ADC) — the classic IVF-PQ memory path (Jégou et al.,
# "Product Quantization for Nearest Neighbor Search", TPAMI 2011)
# ---------------------------------------------------------------------------

# THE training-sample default, shared by build_vector_index AND the direct
# ivf_train/pq_train entries so a caller can't get two different artifacts
# from "the defaults" (round 14, ADVICE r13 #4).  25k = ≥390 samples per
# ksub=64 centroid; training-sample size only steers the CANDIDATE stage —
# exact rescores are invariant to it.  Raise per-call for corpora whose
# cluster structure a 25k sample can't capture.
TRAIN_SAMPLE_CAP = 25_000


def _sample_to_driver(corpus: DataFrame, vec_col: str, sample_cap: int,
                      seed: int, order_col: str | None = None):
    """Driver-side float64 training sample, CAPPED at ``sample_cap`` rows
    (loud failure beyond it, like the kNN query-side collect) — index
    structures train on samples by design; the full corpus is only ever
    ENCODED/ASSIGNED, distributed.

    With ``order_col`` (round 13, VERDICT r12 #4) the sample is the
    md5-RANKED top-``sample_cap`` over that column: ONE TakeOrdered pass
    (no count job, no fraction sample), and — unlike ``df.sample`` —
    independent of the physical partition layout, so the trained
    artifact is bit-reproducible across file orderings.  Qdrant trains
    its quantizers on samples too; only the CANDIDATE stage sees the
    trained structure, the exact rescore never does."""
    import numpy as np  # noqa: PLC0415

    if order_col is not None:
        rows = (corpus.orderBy(F.md5(F.col(order_col).cast("string")),
                               F.col(order_col))
                .limit(int(sample_cap)).select(vec_col).collect())
        return np.array([r[0] for r in rows], dtype=np.float64)
    n = corpus.count()
    if n > sample_cap:
        corpus = corpus.sample(fraction=sample_cap / float(n), seed=seed)
    X = np.array(
        [r[0] for r in corpus.select(vec_col).collect()], dtype=np.float64)
    if len(X) > sample_cap * 1.1:
        raise ValueError(
            f"training sample {len(X)} exceeds cap {sample_cap}")
    return X


def _kmeans(X, k: int, iters: int, rng):
    """Seeded Lloyd iterations; empty clusters keep their previous centroid
    (deterministic given the same sample).

    Assignment uses the BLAS form ``argmin_c ‖c‖² − 2·X@Cᵀ`` (the ‖x‖² term
    is constant per row, so the argmin is unchanged) — peak temporary is the
    (n × k) gram matrix, NOT the (n × k × dim) difference tensor the naive
    broadcast form materializes (~3.3 GB at n=100k, k=64, dim=64).  Same
    form as :func:`pq_encode` / :func:`ivf_assign`.
    """
    k = min(k, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        assign = d2.argmin(axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                C[c] = X[mask].mean(axis=0)
    return C


def pq_train(corpus: DataFrame, vec_col: str = "embedding", m: int = 8,
             ksub: int = 64, iters: int = 10,
             sample_cap: int = TRAIN_SAMPLE_CAP,
             seed: int = 42, order_col: str | None = None):
    """Train m per-subspace codebooks of ksub centroids (numpy k-means,
    seeded — deterministic given the same sample).  Returns list of
    (ksub, dsub) float64 arrays.  ``order_col`` switches the sample to
    the layout-independent md5 rank (see :func:`_sample_to_driver`).
    """
    import numpy as np  # noqa: PLC0415

    X = _sample_to_driver(corpus, vec_col, sample_cap, seed, order_col)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    return [
        _kmeans(X[:, j * dsub:(j + 1) * dsub], ksub, iters, rng)
        for j in range(m)
    ]


def pq_encode(df: DataFrame, codebooks, vec_col: str = "embedding",
              out_col: str = "pq_codes") -> DataFrame:
    """array<int> of m codes per vector — argmin subspace centroid.

    Arrow-batched pandas UDF; each batch does m small BLAS gram matrices
    ((batch × ksub) each) instead of per-row loops.  At 100 TB this is the
    one full pass over the float vectors; afterwards searches read only the
    m-byte codes.
    """
    import numpy as np  # noqa: PLC0415

    m = len(codebooks)
    dsub = codebooks[0].shape[1]
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            V = np.stack(s.to_numpy()).astype(np.float64)
            codes = np.empty((len(V), m), dtype=np.int32)
            for j, C in enumerate(books):
                S = V[:, j * dsub:(j + 1) * dsub]
                # ||s-c||² = ||s||² - 2 s·c + ||c||²; ||s||² constant per row
                d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (S @ C.T)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.Series(list(codes))

    return df.withColumn(out_col, enc(F.col(vec_col)))


def make_lut_udf(codebooks):
    """Pandas UDF: query vector → (m × ksub) nested list of subspace squared
    distances — the per-query ADC look-up table.  Tiny (runs over the
    broadcast-sized query side only); shared by :func:`pq_search` and the
    persisted-index probe (:mod:`.index`)."""
    import numpy as np  # noqa: PLC0415

    m = len(codebooks)
    dsub = codebooks[0].shape[1]
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]

    @F.pandas_udf(T.ArrayType(T.ArrayType(T.DoubleType())))
    def make_lut(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            out = []
            for qv in s:
                if qv is None:
                    # a NULL query vector scores nothing anywhere (the
                    # expression scorers' degenerate-query policy); a
                    # NULL LUT makes adc_dist_expr NULL → the pair drops
                    # in _rank_topk, instead of np.asarray crashing the
                    # executor
                    out.append(None)
                    continue
                q = np.asarray(qv, dtype=np.float64)
                lut = [
                    (((books[j] - q[j * dsub:(j + 1) * dsub][None, :]) ** 2)
                     .sum(axis=1)).tolist()
                    for j in range(m)
                ]
                out.append(lut)
            yield pd.Series(out)

    return make_lut


def adc_dist_expr(lut_col, codes_col, m: int):
    """ADC distance ``Σ_j lut[j][code_j]`` as m chained element_at look-ups —
    pure JVM codegen over the per-query LUT column."""
    dist = None
    for j in range(m):
        term = F.element_at(
            F.element_at(lut_col, j + 1),
            F.element_at(codes_col, j + 1) + F.lit(1))
        dist = term if dist is None else dist + term
    return dist


def pq_search(queries: DataFrame, encoded: DataFrame, codebooks, k: int = 10,
              query_id: str = "qid", query_vec: str = "qvec",
              corpus_id: str = "vec_id", codes_col: str = "pq_codes",
              exclude_self: bool = True,
              round_to: int | None = 6,
              rerank_corpus: DataFrame | None = None,
              corpus_vec: str = "embedding",
              rerank_factor: int = 5) -> DataFrame:
    """ADC top-k: per query, an (m × ksub) look-up table of subspace
    distances is computed ONCE (tiny, query-side pandas UDF); every corpus
    row's approximate distance is then ``Σ_j lut[j][code_j]`` — m array
    look-ups per row, pure JVM codegen over the broadcast query row.  The
    float corpus vectors never load; the scan reads m int codes per point.
    Returns (qid, vec_id, dist, rank), ascending distance.

    With ``rerank_corpus`` (the IVF-PQ "refine" stage): ADC keeps
    ``rerank_factor × k`` candidates, whose float vectors are fetched by a
    broadcast hash join and reranked by exact euclidean — float reads drop
    from |Q|·|C| to |Q|·rerank_factor·k, like :func:`binary_knn_rerank`.
    """
    m = len(codebooks)
    make_lut = make_lut_udf(codebooks)
    q = queries.select(F.col(query_id).alias("qid"),
                       make_lut(F.col(query_vec)).alias("_lut"))
    pairs = encoded.select(corpus_id, codes_col).join(
        F.broadcast(q), how="cross")
    if exclude_self:
        pairs = pairs.filter(F.col("qid") != F.col(corpus_id))
    dist = adc_dist_expr(F.col("_lut"), F.col(codes_col), m)
    n_keep = k if rerank_corpus is None else rerank_factor * k
    if round_to is not None and rerank_corpus is None:
        dist = F.round(dist, round_to)
    scored = pairs.select("qid", F.col(corpus_id).alias("vec_id"),
                          dist.alias("dist"))
    adc = _rank_topk(scored, n_keep, ascending=True, score_col="dist")
    if rerank_corpus is None:
        return adc
    q_exact = queries.select(F.col(query_id).alias("qid"),
                             F.col(query_vec).alias("qvec"))
    rr = (
        rerank_corpus.select(F.col(corpus_id).alias("vec_id"),
                             F.col(corpus_vec).alias("_cvec"))
        .join(F.broadcast(adc.select("qid", "vec_id")), "vec_id")
        .join(F.broadcast(q_exact), "qid")
    )
    exact = vector.l2_distance(F.col("qvec"), F.col("_cvec"))
    if round_to is not None:
        exact = F.round(exact, round_to)
    rescored = rr.select("qid", "vec_id", exact.alias("dist"))
    return _rank_topk(rescored, k, ascending=True, score_col="dist")


# ---------------------------------------------------------------------------
# Binary quantization: sign bits packed into 32-dim words + Hamming candidate
# search + exact rerank
# ---------------------------------------------------------------------------

# Above this many dimensions the unrolled when-chain (dim expressions) is
# replaced by a per-word aggregate fold: the chain is whole-stage-codegen
# friendly at embedding-sized dims, but at 768-4096 dims it generates
# thousands of nested expressions and Catalyst falls back to interpreted
# eval (or trips the codegen method-size limit).
_PACK_UNROLL_MAX_DIM = 128


def binary_pack_expr(vec_col, dim: int):
    """array<bigint> of ceil(dim/32) packed words; bit i of word w set iff
    ``vec[32w + i] > 0``.  32-bit words keep every partial sum positive, so
    the identical SUM(2^i)-style arithmetic is reproducible in any SQL
    engine without unsigned/HUGEINT care.

    Two physical forms with identical values: dims ≤ 128 unroll to a flat
    when-chain (stays inside whole-stage codegen); wider dims fold each word
    with ``aggregate(sequence(0, n-1))`` — O(dim/32) expressions instead of
    O(dim), so a 4096-dim pack is 128 small folds, not 4096 nested adds.

    ``vec_col`` may be a plain column NAME (string): the unrolled form then
    parses from one SQL string instead of ~8 py4j roundtrips per bit —
    ~0.5 s of driver time saved per pack expression at dim 64 (round 16,
    the simhash_table finding); the Catalyst tree and values are identical.
    """
    if dim <= _PACK_UNROLL_MAX_DIM and isinstance(vec_col, str):
        words = []
        for w in range(0, dim, 32):
            n = min(32, dim - w)
            words.append(" + ".join(
                f"(CASE WHEN element_at(`{vec_col}`, {w + i + 1}) > 0 "
                f"THEN CAST({1 << i} AS BIGINT) "
                f"ELSE CAST(0 AS BIGINT) END)"
                for i in range(n)))
        return F.expr("array(" + ", ".join(words) + ")")
    if isinstance(vec_col, str):
        vec_col = F.col(vec_col)
    if dim <= _PACK_UNROLL_MAX_DIM:
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
    weights = F.array(*[F.lit(1 << j).cast("long") for j in range(32)])

    def word_fold(w: int):
        # closure factory: pyspark counts every named lambda parameter, so a
        # `_w=w` default would mis-declare a 3-arg merge function
        def merge(acc, i):
            return acc + F.when(
                F.element_at(vec_col, F.lit(w + 1) + i) > 0,
                F.element_at(weights, i + 1)
            ).otherwise(F.lit(0).cast("long"))
        return merge

    words = []
    for w in range(0, dim, 32):
        n = min(32, dim - w)
        words.append(F.aggregate(
            F.sequence(F.lit(0), F.lit(n - 1)),
            F.lit(0).cast("long"), word_fold(w)))
    return F.array(*words)


def hamming_expr(a_col, b_col, dim: int):
    """Hamming distance between two packed sign-bit columns
    (:func:`binary_pack_expr` layout): ``Σ_w popcount(a[w] XOR b[w])`` —
    ceil(dim/32) chained ``bit_count`` terms, pure JVM codegen.  The ONE
    binary-distance implementation shared by :func:`binary_knn_rerank`
    and the persisted ``ivf_bq`` artifacts' coarse stage (the r9 lesson:
    one ADC implementation, one Hamming implementation)."""
    ham = None
    for w in range(-(-dim // 32)):
        h = F.bit_count(F.element_at(a_col, w + 1)
                        .bitwiseXOR(F.element_at(b_col, w + 1)))
        ham = h if ham is None else ham + h
    return ham


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
    # dim must MATCH the data: packing beyond the real length would treat
    # the missing dimensions as sign-0 bits (element_at past the end is
    # NULL → otherwise(0)) and silently corrupt every Hamming distance
    for side, frame, col in (("corpus", corpus, corpus_vec),
                             ("query", queries, query_vec)):
        probe = frame.select(F.size(F.col(col)).alias("n")).first()
        if probe is not None and probe["n"] != dim:
            raise ValueError(
                f"binary_knn_rerank: dim={dim} but {side} vectors have "
                f"{probe['n']} dimensions")
    # phase 1 carries ONLY (id, packed bits) — the float corpus vectors do
    # not flow through the |Q|·|C| pair stream
    packed_c = corpus.select(
        corpus_id, binary_pack_expr(corpus_vec, dim).alias("_pc"))
    q_packed = queries.select(
        F.col(query_id).alias("qid"),
        binary_pack_expr(query_vec, dim).alias("_pq"))
    pairs = packed_c.join(F.broadcast(q_packed), how="cross")
    if exclude_self:
        pairs = pairs.filter(F.col("qid") != F.col(corpus_id))
    ham = hamming_expr(F.col("_pq"), F.col("_pc"), dim)
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
    return _rank_topk(scored, k)


# ---------------------------------------------------------------------------
# IVF with TRAINED (k-means) partitions — the unsupervised upgrade of
# knn.knn_join_blocked's label-blocking: cluster ids come from the data, and
# search probes only the n_probe nearest inverted lists
# ---------------------------------------------------------------------------

def ivf_train(corpus: DataFrame, vec_col: str = "embedding",
              n_lists: int = 16, iters: int = 10,
              sample_cap: int = TRAIN_SAMPLE_CAP, seed: int = 42,
              order_col: str | None = None):
    """(n_lists, dim) float64 coarse centroids via seeded k-means.
    ``order_col`` switches to the layout-independent md5-ranked sample
    (see :func:`_sample_to_driver`)."""
    import numpy as np  # noqa: PLC0415

    X = _sample_to_driver(corpus, vec_col, sample_cap, seed, order_col)
    return _kmeans(X, n_lists, iters, np.random.default_rng(seed))


def ivf_assign(df: DataFrame, centroids, vec_col: str = "embedding",
               out_col: str = "list_id") -> DataFrame:
    """Nearest-centroid list assignment (Arrow-batched BLAS argmin).

    At scale the assigned table is then ``repartition(out_col)`` + written
    bucketed by list, so a probe reads only its lists' files.
    """
    import numpy as np  # noqa: PLC0415

    C = np.asarray(centroids, dtype=np.float64)
    c2 = (C * C).sum(axis=1)

    @F.pandas_udf(T.IntegerType())
    def assign(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            V = np.stack(s.to_numpy()).astype(np.float64)
            d2 = c2[None, :] - 2.0 * (V @ C.T)
            yield pd.Series(d2.argmin(axis=1).astype(np.int32))

    return df.withColumn(out_col, assign(F.col(vec_col)))


def probe_list_ids(V, centroids, n_probe: int):
    """Stable nearest-centroid probe assignment: (n, n_probe) int32 list
    ids per query row.  Shared by the :func:`ivf_knn` query-side UDF and
    the persisted index's DRIVER-side partition pruner
    (:mod:`.index`) — identical arithmetic on both sides, so the static
    prune list can never exclude a list the probe join expects."""
    import numpy as np  # noqa: PLC0415

    C = np.asarray(centroids, dtype=np.float64)
    c2 = (C * C).sum(axis=1)
    V = np.asarray(V, dtype=np.float64)
    d2 = c2[None, :] - 2.0 * (V @ C.T)
    n_probe = min(n_probe, len(C))
    return np.argsort(d2, axis=1, kind="stable")[:, :n_probe].astype(np.int32)


def probe_lists_udf(centroids, n_probe: int):
    """Pandas UDF wrapping :func:`probe_list_ids` (array<int> per query)."""
    import numpy as np  # noqa: PLC0415

    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_lists(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            # a NULL query vector (mean_pool of an empty/NULL token
            # list) probes no lists — the degenerate-query policy the
            # expression scorers share; np.stack would die on it
            vals = s.to_numpy()
            ok = [i for i, v in enumerate(vals) if v is not None]
            out = [[]] * len(vals)
            if ok:
                ids = probe_list_ids(
                    np.stack([vals[i] for i in ok]), C, n_probe)
                for j, i in enumerate(ok):
                    out[i] = list(ids[j])
            yield pd.Series(out)

    return probe_lists


def metric_score_expr(qvec_col, cvec_col, qnorm_col, metric: str):
    """(score Column, ascending) for cosine | dot | euclid — the same
    expressions as :func:`knn.knn_join`, factored for the IVF paths."""
    if metric == "cosine":
        denom = qnorm_col * vector.l2_norm(cvec_col)
        return F.when(denom != 0.0, vector.dot(qvec_col, cvec_col) / denom), False
    if metric == "dot":
        return vector.dot(qvec_col, cvec_col), False
    if metric == "euclid":
        return vector.l2_distance(qvec_col, cvec_col), True
    if metric == "manhattan":
        return vector.l1_distance(qvec_col, cvec_col), True
    raise ValueError(f"unknown metric {metric!r}")


def ivf_knn(queries: DataFrame, assigned: DataFrame, centroids,
            k: int = 10, n_probe: int = 4,
            query_id: str = "qid", query_vec: str = "qvec",
            corpus_id: str = "vec_id", corpus_vec: str = "embedding",
            list_col: str = "list_id", exclude_self: bool = True,
            round_to: int | None = 6, metric: str = "cosine",
            probe_frame: DataFrame | None = None) -> DataFrame:
    """Probe the ``n_probe`` nearest lists per query, exact ``metric``
    scoring inside (cosine | dot rank descending, euclid ascending — the
    :func:`knn.knn_join` contract).

    The probe explodes each query into its probe-list ids and EQUI-joins on
    ``list_id`` — with the corpus laid out by list, that join touches
    ~n_probe/n_lists of the data and nothing else.  Same top-k window as
    every kNN twin.

    ``probe_frame`` (round 14, ADVICE r13 #1): an explicit exploded
    (``query_id``, ``list_id``) frame replaces the per-query
    nearest-centroid derivation — the caller decides which lists each
    query probes (per-token multivector probing builds pooled∪per-token
    sets driver-side; the UDF here could only ever re-derive the pooled
    lists, which made the widened static prune a no-op downstream).
    """
    if probe_frame is not None:
        pf = probe_frame.toDF("qid", list_col)
        q = queries.select(
            F.col(query_id).alias("qid"), F.col(query_vec).alias("qvec"),
            vector.l2_norm(F.col(query_vec)).alias("_qn"),
        ).join(pf, "qid")
    else:
        probe = probe_lists_udf(centroids, n_probe)
        q = queries.select(
            F.col(query_id).alias("qid"), F.col(query_vec).alias("qvec"),
            vector.l2_norm(F.col(query_vec)).alias("_qn"),
            F.explode(probe(F.col(query_vec))).alias(list_col))
    pairs = assigned.join(F.broadcast(q), list_col)
    if exclude_self:
        pairs = pairs.filter(F.col("qid") != F.col(corpus_id))
    sim, ascending = metric_score_expr(
        F.col("qvec"), F.col(corpus_vec), F.col("_qn"), metric)
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = pairs.select("qid", F.col(corpus_id).alias("vec_id"),
                          sim.alias("sim"))
    return _rank_topk(scored, k, ascending=ascending)
