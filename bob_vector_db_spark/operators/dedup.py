"""Deduplication family for training-data pipelines (SURVEY.md §2.3 J8,
§2.8 F4; north star "dedup").

Five strategies, all expressed as DataFrame ops over the ``documents`` table:

  exact          — md5/sha2 content hash group-by (one shuffle on the hash)
  ngram_jaccard  — token-shingle inverted index self-join: candidate pairs
                   share ≥1 shingle, Jaccard = |∩|/|∪| computed from
                   per-pair intersection counts (MinHash's exact ground truth)
  minhash_lsh    — n permutations of a universal hash over shingles → band
                   signatures → bucket equi-join (candidates only collide in
                   a band; no O(n²) pair scan)
  simhash        — 64-bit sign-aggregated token-hash fingerprint; near-dups
                   have small Hamming distance (bit_count(xor))
  embedding      — cosine ≥ τ on an embedding column (exact; LSH/IVF prune
                   via knn.knn_join_blocked at scale)

Scale notes: every strategy is shuffle-on-key (shingle / band-bucket / hash),
never a cross join — the O(n²) exact cosine variant exists only as the
oracle's ground truth at small SF.  Skewed shingles (stopword-only) are
filtered by document-frequency cap before the self-join.

Caching: the pair-finders persist() intermediates that feed multiple plan
consumers (both self-join sides), materialize the (small) pair result once
via ``localCheckpoint(eager=True)``, and eagerly unpersist the intermediates
before returning — a long-lived session calling finders in a loop never
accumulates cache entries.  The checkpointed result's blocks are
weak-referenced and reclaimed by Spark's ContextCleaner once the caller
drops the DataFrame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import vector
from ..functions.hashing import (
    MINHASH_PRIME,
    POLY_MOD,
    minhash_params,
    poly_hash,
)
from ..functions.text import ws_tokens

def _finalize(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize ``result`` once (localCheckpoint cuts the lineage back to
    the persisted intermediates), then eagerly unpersist those intermediates.

    Pair tables are tiny next to their shingle/band inputs, so checkpointing
    the result and dropping the inputs is strictly cheaper than keeping the
    inputs cached until some caller remembers to release them (the r2/r3
    leak: the old module-global registry only drained when bench called
    release_cache).
    """
    out = result.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out


def release_cache() -> None:
    """Deprecated no-op: finders now release their own intermediates
    eagerly (see :func:`_finalize`); kept for callers of the old API."""


def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Groups of exact duplicates: (content_hash, n_dups, sorted ids)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.array_sort(F.collect_list(id_col)).alias("ids"),
        )
    )


def doc_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 n: int = 3) -> DataFrame:
    """(id, shingle) rows — distinct token n-grams per document.

    Shingling runs through Spark ML's ``NGram`` (compiled Scala sliding
    window) rather than the Catalyst transform+slice higher-order functions:
    HOFs are interpreted, not codegen'd, and the ML transformer measured 8×
    faster at sf0.1 with byte-identical output (space-joined n-grams).

    NULL text coalesces to an empty token array BEFORE the transformer —
    NGram's Scala lambda NPEs on a null Seq (round 15; matters since the
    persisted near-dup index shingles arbitrary stored rows, not just the
    NULL-free parquet fixtures).  A NULL/empty doc contributes no
    shingles either way.
    """
    from pyspark.ml.feature import NGram  # noqa: PLC0415

    tok = df.select(F.col(id_col).alias("id"),
                    F.coalesce(ws_tokens(F.col(text_col)),
                               F.array().cast("array<string>")).alias("_tk"))
    ng = NGram(n=n, inputCol="_tk", outputCol="_sh").transform(tok)
    return ng.select(
        "id", F.explode(F.array_distinct(F.col("_sh"))).alias("shingle")
    )


def cross_corpus_contamination(train: DataFrame, benchmark: DataFrame,
                               text_col: str = "text",
                               id_col: str = "doc_id", n: int = 3,
                               min_hits: int = 1) -> DataFrame:
    """Benchmark decontamination for pretraining data: training docs that
    share ≥ ``min_hits`` distinct token n-grams with ANY benchmark doc —
    the standard eval-leakage sweep (flagged docs are dropped or audited
    before training).  Returns (id, n_hits), n_hits = distinct
    contaminated shingles.

    Scale shape: the benchmark's distinct shingle set is tiny next to the
    training corpus (eval suites are small by construction), so the probe
    is ONE broadcast semi-ish join on the shingle — the training side
    shuffles nothing, and each training doc aggregates its hit count
    map-side.  No train×benchmark pair ever materializes.
    """
    tr = doc_shingles(train, text_col, id_col, n)
    be = (doc_shingles(benchmark, text_col, id_col, n)
          .select("shingle").distinct())
    hits = (tr.join(F.broadcast(be), "shingle")
            .groupBy("id")
            .agg(F.countDistinct("shingle").alias("n_hits")))
    return hits.filter(F.col("n_hits") >= min_hits)


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5,
                        max_df: int | None = None) -> DataFrame:
    """Exact Jaccard near-dup pairs (id_a < id_b, jaccard ≥ threshold) via
    inverted-index self-join — shuffle on shingle, not O(n²).

    ``max_df`` drops shingles appearing in more than that many docs (skew
    guard: a stopword shingle shared by every document would create a
    quadratic hot bucket at 100 TB).
    """
    # The shingle table feeds FOUR consumers (df-cap aggregate, sizes, and
    # both self-join sides); without persist Spark re-derives the whole
    # map-only subtree per consumer — measured 8× recompute at sf0.1.
    cached = [doc_shingles(df, text_col, id_col, n).persist()]
    sh = cached[0]
    if max_df is not None:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > max_df)
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti").persist()
        cached.append(sh)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    pairs = (
        inter.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return _finalize(pairs, *cached)


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 3,
                       num_hashes: int = 16, seed: int = 42) -> DataFrame:
    """(id, sig ARRAY<BIGINT>[num_hashes]) MinHash signatures.

    Shingle → poly-hash (h < POLY_MOD) → per-permutation min of
    (a_i*h + b_i) mod 2^31-1.  Integer-exact, so the DuckDB oracle
    reproduces it bit-for-bit.

    The poly-hash is an interpreted char-fold, so it runs once per DISTINCT
    shingle (shingle dictionary → hash → equi-join back to the posting list)
    instead of once per (doc, shingle) row — at corpus scale the dictionary
    is orders of magnitude smaller than the postings.  The permutations are
    cheap codegen'd integer expressions inside one groupBy(id) min-aggregate.
    """
    params = minhash_params(num_hashes, seed)
    sh = doc_shingles(df, text_col, id_col, n)
    dictionary = sh.select("shingle").distinct().withColumn(
        "h", poly_hash(F.col("shingle"), POLY_MOD)
    )
    hashed = sh.join(dictionary, "shingle").select("id", "h")
    # SQL-text permutations (round 16): identical Catalyst tree, one
    # parser call per permutation instead of ~7 py4j roundtrips each —
    # this builder runs 2-3× per neardup-index fixture
    mins = [
        F.expr(f"min((h * {a} + {b}) % {MINHASH_PRIME})").alias(f"mh{i}")
        for i, (a, b) in enumerate(params)
    ]
    agg = hashed.groupBy("id").agg(*mins)
    sig = "array(" + ", ".join(f"mh{i}" for i in range(num_hashes)) + ")"
    return agg.select("id", F.expr(sig).alias("sig"))


def band_signatures(sig: DataFrame, num_hashes: int,
                    bands: int) -> DataFrame:
    """(id, band, band_key) rows from an (id, sig) signature frame — the
    band key is the comma-joined slice of the signature covering the band.
    Shared by the in-memory pair finder and the persisted near-dup index
    (round 15), so both materialize IDENTICAL band keys."""
    rows_per_band = num_hashes // bands
    return sig.select(
        "id",
        F.posexplode(
            F.array(*[
                F.concat_ws(",", *[
                    F.col("sig")[b * rows_per_band + r].cast("string")
                    for r in range(rows_per_band)
                ])
                for b in range(bands)
            ])
        ).alias("band", "band_key"),
    )


def banded_pairs(banded: DataFrame,
                 max_band_size: int | None = None) -> DataFrame:
    """Candidate pairs from an (id, band, band_key) frame: equi-join on the
    band key, ``max_band_size`` switching over-cap buckets to star edges
    (see :func:`minhash_lsh_pairs` for the full semantics).  The caller
    persists ``banded`` (both self-join sides read it) and finalizes the
    result; this helper only declares the plan."""
    if max_band_size is not None:
        # per-bucket size + anchor via one aggregate, rejoined on the
        # band key — a SHUFFLE join by design: bsz is O(#buckets) rows
        # (one per band bucket, up to bands×n_docs at full dispersion),
        # not broadcast-small at crawl scale, and both sides are already
        # hash-partitioned on the same key from the aggregate.  Under-cap
        # buckets keep the all-pairs join, over-cap buckets emit
        # (anchor=min id, member) star edges — n−1 rows, same transitive
        # closure (ADVICE r14 #3: this was mislabeled "broadcast back")
        bsz = (banded.groupBy("band", "band_key")
               .agg(F.count(F.lit(1)).alias("_bn"),
                    F.min("id").alias("_anchor")))
        tagged = banded.join(bsz, ["band", "band_key"])
        small = tagged.filter(F.col("_bn") <= int(max_band_size))
        a, b = small.alias("a"), small.alias("b")
        pairs_small = (
            a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b")))
        pairs_big = (tagged.filter(F.col("_bn") > int(max_band_size))
                     .filter(F.col("id") != F.col("_anchor"))
                     .select(F.col("_anchor").alias("id_a"),
                             F.col("id").alias("id_b")))
        return (pairs_small.unionByName(pairs_big)
                .groupBy("id_a", "id_b")
                .agg(F.count("*").alias("n_bands_matched")))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_bands_matched"))
    )


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3,
                      num_hashes: int = 16, bands: int = 4,
                      seed: int = 42,
                      max_band_size: int | None = None) -> DataFrame:
    """LSH candidate pairs: ids whose signatures agree on ≥1 full band.

    Band key = (band index, the band's slice of the signature); candidates
    come from an equi-join on the band key — the scale path that avoids any
    all-pairs comparison.  Returns (id_a, id_b, n_bands_matched).

    ``max_band_size`` (round 14 — the LSH twin of the n-gram path's
    ``max_df`` skew cap): a boilerplate template at 100 TB puts millions
    of documents into ONE band bucket, and the self-join would emit n²
    pairs from it.  With a cap, an over-cap bucket emits STAR edges
    instead — every member pairs with the bucket's MINIMUM id — so the
    downstream cluster step (:func:`connected_components` /
    :func:`duplicate_clusters`) sees the SAME connectivity (the cluster
    survives intact) from n−1 edges instead of n(n−1)/2.  Dropping the
    bucket (the max_df approach) is right for ubiquitous SHINGLES, wrong
    here: a full-signature-band collision IS the near-duplicate signal.
    ``n_bands_matched`` keeps counting the bands in which a pair was
    EMITTED (star pairs count their bucket; non-anchor co-members of an
    over-cap bucket aren't emitted there by design)."""
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes, seed)
    # persisted: both self-join sides in banded_pairs read it
    banded = band_signatures(sig, num_hashes, bands).persist()
    return _finalize(banded_pairs(banded, max_band_size), banded)


def minhash_lsh_pairs_ml(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", n: int = 3,
                         num_hash_tables: int = 8, threshold: float = 0.5,
                         num_features: int = 1 << 18,
                         seed: int = 42) -> DataFrame:
    """Spark ML ``MinHashLSH.approxSimilarityJoin`` variant of
    :func:`minhash_lsh_pairs` (SURVEY.md §2.3 J8 names this as the at-scale
    alternative).

    Shingles → ``HashingTF`` binary sparse vectors → MinHash LSH self-join at
    Jaccard distance ≤ 1-threshold.  Returns (id_a, id_b, jaccard) where the
    jaccard is computed on the hashed feature space (ulp-level differences vs
    the exact token jaccard only when HashingTF buckets collide).  Recall is
    probabilistic (grows with ``num_hash_tables``), so this is registered
    rows-only; the hand-rolled banding in :func:`minhash_lsh_pairs` is the
    oracle-checkable twin.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH  # noqa: PLC0415

    from pyspark.ml.feature import NGram  # noqa: PLC0415

    tok = df.select(F.col(id_col).alias("id"),
                    F.coalesce(ws_tokens(F.col(text_col)),
                               F.array().cast("array<string>")).alias("_tk"))
    sh = (NGram(n=n, inputCol="_tk", outputCol="_sh").transform(tok)
          .select("id", F.array_distinct(F.col("_sh")).alias("sh"))
          .filter(F.size("sh") > 0))
    feat = HashingTF(inputCol="sh", outputCol="features",
                     numFeatures=num_features, binary=True).transform(sh)
    # materialization barrier: approxSimilarityJoin's internal transform
    # re-plans the lazy pipeline and evaluates the LSH hash UDF in a
    # position where rows the size(sh)>0 filter WOULD drop (empty/NULL
    # text, docs shorter than n tokens) still reach it — MinHashLSH
    # raises "Must have at least 1 non zero entry" on their all-zero
    # vectors.  The checkpoint pins the filtered feature table before
    # the model touches it (round 15, found by the NULL-text audit).
    feat = feat.localCheckpoint(eager=True)
    model = MinHashLSH(inputCol="features", outputCol="hashes",
                       numHashTables=num_hash_tables, seed=seed).fit(feat)
    # materialize the hashed features ONCE (round 16, guide §1.2/§5):
    # approxSimilarityJoin transforms any input missing its outputCol, so
    # a lazy self-join side pays the MinHash UDF over the corpus per side
    # per action; handing it the checkpointed transform halves that work
    # with identical rows.  In-flow materialization, nothing persists.
    hashed = model.transform(feat).localCheckpoint(eager=True)
    joined = model.approxSimilarityJoin(hashed, hashed, 1.0 - threshold,
                                        distCol="jaccard_dist")
    return (
        joined.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.round(1.0 - F.col("jaccard_dist"), 6).alias("jaccard"),
        )
    )


def simhash_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  bits: int = 64) -> DataFrame:
    """(id, fp): SimHash fingerprints.  Bit j of fp is the sign of
    Σ_tokens ±1, where token t votes +1 at bit j iff
    ((poly_hash(t) * (2j+3)) mod POLY_MOD) is odd.

    The interpreted poly-hash runs once per DISTINCT token (dictionary →
    hash → join back to occurrences); the votes are ``bits`` SUM(CASE)
    codegen'd aggregate columns grouped by id — one shuffle.  Pure integer
    SQL, bit-identical in the DuckDB oracle.  Bit 63 is encoded as the
    signed-long minimum so a 64-bit fingerprint fits BIGINT on both engines.
    """
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(ws_tokens(F.col(text_col))).alias("tok"))
    dictionary = toks.select("tok").distinct().withColumn(
        "th", poly_hash(F.col("tok"), POLY_MOD)
    )
    # The vote/fingerprint expressions parse from SQL text (round 16):
    # building them as Column chains costs ~1150 py4j roundtrips — ~1.5 s
    # of DRIVER time per call, more than the aggregate's own execution at
    # fixture scale.  F.expr yields the identical Catalyst tree (same
    # integer arithmetic, same types, bit-identical fingerprints — pinned
    # by tests/test_dedup.py and the dedup_simhash oracle) in one parser
    # call per expression.
    votes = [
        F.expr(f"sum((((th * {2 * j + 3}) % {POLY_MOD}) & 1) * 2 - 1)")
        .alias(f"v{j}")
        for j in range(bits)
    ]
    per_doc = toks.join(dictionary, "tok").groupBy("id").agg(*votes)
    # bit 63's weight is the signed-long minimum: shiftleft(1L, 63) folds
    # to exactly -(2^63) without a parse-hostile negative literal
    fp_sql = " + ".join(
        "(CASE WHEN v{j} > 0 THEN {w} ELSE CAST(0 AS BIGINT) END)".format(
            j=j, w="shiftleft(CAST(1 AS BIGINT), 63)" if j == 63
            else f"CAST({2 ** j} AS BIGINT)")
        for j in range(bits)
    )
    return per_doc.select("id", F.expr(fp_sql).alias("fp"))


def simhash_chunks(fp: DataFrame, bits: int, max_hamming: int) -> DataFrame:
    """(id, fp, chunk_idx, chunk_val) rows from an (id, fp) fingerprint
    frame — the pigeonhole split into ``max_hamming + 1`` chunks.  Shared
    by the in-memory pair finder and the persisted SimHash index
    (round 15), so both materialize IDENTICAL chunk values."""
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks
    return fp.select(
        "id", "fp",
        F.posexplode(F.array(*[
            F.shiftright(F.col("fp"), c * chunk_bits)
            .bitwiseAND(F.lit((1 << chunk_bits) - 1))
            for c in range(n_chunks)
        ])).alias("chunk_idx", "chunk_val"),
    )


def simhash_chunk_pairs(chunks: DataFrame, max_hamming: int) -> DataFrame:
    """(id_a, id_b, hamming) pairs from an (id, fp, chunk_idx, chunk_val)
    frame: candidates share ≥1 exact chunk (equi-join), then the exact
    bit_count(xor) filter.  The caller persists ``chunks`` (both
    self-join sides read it) and finalizes the result."""
    a, c = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(c, (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
               & (F.col("a.chunk_val") == F.col("b.chunk_val"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.fp").alias("fp_a"), F.col("b.fp").alias("fp_b"))
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  bits: int = 64, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Pigeonhole blocking: split the fingerprint into max_hamming+1 chunks —
    two docs within the distance share at least one exact chunk, so an
    equi-join on (chunk_idx, chunk_value) finds all candidates.  With 64-bit
    fingerprints and 16-bit chunks each chunk index has up to 65,536 distinct
    values, so bucket occupancy stays sub-quadratic at corpus scale (the old
    32-bit/8-bit layout had only 256 values per chunk — a quadratic hot-spot
    at 100 TB).
    """
    fp = simhash_table(df, text_col, id_col, bits)
    # persisted: both self-join sides in simhash_chunk_pairs read it
    chunks = simhash_chunks(fp, bits, max_hamming).persist()
    return _finalize(simhash_chunk_pairs(chunks, max_hamming), chunks)


def embedding_neardup_pairs(df: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            block_col: str | None = "label",
                            threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-dup pairs with similarity ≥ threshold.

    With ``block_col`` the self-join is an equi-join inside blocks (IVF-style
    — at scale the block is the cluster/partition key); without it, exact
    all-pairs (oracle ground truth only).

    Norms are computed ONCE per row before the self-join (|N| evaluations,
    not |pairs|); the per-pair work is a single HOF dot fold (unrolled
    arithmetic is NOT used here — see functions.vector.dot_unrolled caveat:
    wide unrolled expressions fail Janino inside join codegen).
    """
    base = df.withColumn("_n", vector.l2_norm(F.col(vec_col)))
    blk = [F.col(block_col).alias("blk")] if block_col else []
    a = base.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"),
                    F.col("_n").alias("n_a"), *blk)
    b = base.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"),
                    F.col("_n").alias("n_b"), *blk)
    cond = F.col("id_a") < F.col("id_b")
    joined = a.join(b, ["blk"]).filter(cond) if block_col else a.join(b, cond)
    dot = vector.dot(F.col("vec_a"), F.col("vec_b"))
    denom = F.col("n_a") * F.col("n_b")
    return (
        joined.withColumn(
            "sim", F.round(F.when(denom != 0.0, dot / denom), 6)
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def embedding_neardup_pairs_vectorized(df: DataFrame, id_col: str = "vec_id",
                                       vec_col: str = "embedding",
                                       block_col: str = "label",
                                       threshold: float = 0.9) -> DataFrame:
    """Embedding near-dup pairs — the 100 TB physical strategy.

    ``applyInPandas`` per block: one float64 BLAS gram matrix (b × b) per
    block instead of |pairs| interpreted expressions, emitting only the
    upper-triangle pairs ≥ threshold.  At scale the block is the IVF cluster
    key, sized so b×b fits an executor (the blocked SQL form
    :func:`embedding_neardup_pairs` is the bit-exact semantic contract).
    BLAS accumulation differs from the sequential fold by ~1 ulp — absorbed
    by the round-6 on ``sim`` away from exact rounding boundaries.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "sim": "float64"})
        ids = pdf[id_col].to_numpy()
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        n = np.linalg.norm(V, axis=1)
        n[n == 0.0] = np.nan
        S = (V @ V.T) / np.outer(n, n)
        iu, ju = np.triu_indices(len(ids), k=1)
        sims = np.round(S[iu, ju], 6)
        keep = sims >= threshold
        ia, ib = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({"id_a": lo.astype("int64"),
                             "id_b": hi.astype("int64"), "sim": sims[keep]})

    return (
        df.select(F.col(block_col).alias("_blk"), id_col, vec_col)
        .groupBy("_blk")
        .applyInPandas(per_block, "id_a long, id_b long, sim double")
    )


def paragraph_dedup(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", min_repeats: int = 2,
                    sep: str = "\n") -> DataFrame:
    """Paragraph-level corpus dedup — the CCNet/Dolma pass a training
    pipeline runs BEFORE document-level near-dup: split every document
    on ``sep``, drop each paragraph whose exact content appears in
    ``min_repeats`` or more DISTINCT documents (boilerplate headers,
    cookie banners, license blocks), and reassemble the survivors in
    their original order.  Every input id survives — a document whose
    paragraphs were all boilerplate comes back with empty text, so
    callers can count/filter the casualties explicitly.

    Physical shape (100 TB-safe): explode → ONE hash aggregate keyed by
    ``sha2(paragraph)`` (narrow shuffle rows — the 256-bit digest, not
    the paragraph text), a same-key join back, and one per-document
    reassembly aggregate.  Nothing driver-side; whitespace-only
    segments are dropped up front (they would otherwise count as the
    corpus's most-repeated "paragraph" and hot-key the shuffle).

    ``sep`` is a LITERAL separator (regex-escaped before the split).
    Returns (id_col, text_col) with the same id type as the input."""
    import re  # noqa: PLC0415

    paras = (docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), re.escape(sep), -1))
        .alias("_pos", "_para"))
        .filter(F.length(F.trim("_para")) > 0)
        .withColumn("_ph", F.sha2(F.col("_para"), 256)))
    counts = (paras.groupBy("_ph")
              .agg(F.countDistinct(id_col).alias("_ndocs"))
              .filter(F.col("_ndocs") >= int(min_repeats))
              .select("_ph"))
    kept = paras.join(counts, "_ph", "left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_sort(F.collect_list(F.struct("_pos", "_para")))
                    .alias("_z"))
               .select(id_col,
                       F.concat_ws(sep, F.col("_z._para")).alias(text_col)))
    return (docs.select(id_col)
            .join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce(F.col(text_col), F.lit("")).alias(text_col)))


def substring_dedup(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", width: int = 50,
                    min_repeats: int = 2) -> DataFrame:
    """Exact-substring (span-level) dedup — the ExactSubstr pass of Lee
    et al. 2022, "Deduplicating Training Data Makes Language Models
    Better" (public): drop every token covered by a ``width``-token
    window whose exact content appears in ``min_repeats`` or more
    DISTINCT documents, and reassemble the survivors in order.  Sits
    between paragraph dedup (exact whole-segment) and MinHash
    (whole-document, fuzzy) in a real pretraining pipeline: it removes
    the repeated ≥width-token SPANS (licenses, templates, quoted
    passages) that neither neighbor catches.  Every input id survives —
    a fully-boilerplate document comes back with empty text.

    Token-level semantics (like the reference algorithm, which operates
    on token streams): output text is the kept tokens joined by single
    spaces; original inter-token whitespace is not preserved.

    Physical shape (100 TB-safe, the paragraph_dedup idiom at window
    granularity): windows come from Spark ML's NGram (compiled sliding
    window — the doc_shingles rationale) and are immediately projected
    to a sha2 digest, so the repeat-count shuffle moves 32-byte keys,
    never window text; the duplicated-window set joins back on the
    digest; coverage expands each duplicated window into its ``width``
    positions (a bounded ×width explode of the DUPLICATED region only)
    followed by one distinct + anti-join on (id, pos) and one
    per-document reassembly aggregate.  The map-side window
    materialization is O(n·width) bytes per task before the digest
    projection — transient; a rolling Rabin-Karp over per-token hashes
    would avoid it at the cost of an interpreted fold (slower in
    practice, see doc_shingles' NGram-vs-HOF measurement)."""
    from pyspark.ml.feature import NGram  # noqa: PLC0415

    toks = docs.select(F.col(id_col),
                       F.coalesce(ws_tokens(F.col(text_col)),
                                  F.array().cast("array<string>"))
                       .alias("_tk"))
    tok = toks.select(id_col, F.posexplode("_tk").alias("_pos", "_tok"))
    ng = NGram(n=int(width), inputCol="_tk", outputCol="_w").transform(toks)
    wins = (ng.select(id_col, F.posexplode("_w").alias("_pos", "_wstr"))
            .select(id_col, "_pos", F.sha2(F.col("_wstr"), 256).alias("_wh")))
    rep = (wins.groupBy("_wh")
           .agg(F.countDistinct(id_col).alias("_nd"))
           .filter(F.col("_nd") >= int(min_repeats))
           .select("_wh"))
    covered = (wins.join(rep, "_wh")
               .select(F.col(id_col),
                       F.explode(F.sequence(
                           F.col("_pos"),
                           F.col("_pos") + F.lit(int(width) - 1)))
                       .alias("_cpos"))
               .distinct())
    kept = tok.join(
        covered,
        (tok[id_col] == covered[id_col])
        & (F.col("_pos") == F.col("_cpos")),
        "left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_sort(F.collect_list(F.struct("_pos", "_tok")))
                    .alias("_z"))
               .select(id_col,
                       F.concat_ws(" ", F.col("_z._tok")).alias(text_col)))
    return (docs.select(id_col)
            .join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce(F.col(text_col), F.lit("")).alias(text_col)))


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iterations: int = 25,
                         algorithm: str = "label") -> DataFrame:
    """Duplicate-CLUSTER resolution (round 13): the step every near-dup
    pipeline runs AFTER pair generation — transitive closure over the
    candidate pairs, so "A~B, B~C" collapses to ONE cluster and a keep
    policy (lowest id, best quality, ...) applies per cluster instead of
    per pair.  Returns (node, component) for every node appearing in
    ``pairs``, with component = the MINIMUM id reachable from the node.

    ``algorithm='label'`` (default): distributed min-label propagation —
    each iteration joins the current labels across the (undirected) edge
    set and keeps the per-node minimum; converges in O(cluster diameter)
    rounds, which for near-dup graphs is tiny (clusters are
    near-cliques: every member pairs with most others, so labels cross a
    cluster in 1-2 hops).  Each round is ONE self-contained shuffle
    (join + groupBy-min, ``localCheckpoint``-ed so lineage stays O(1));
    the convergence probe rides the SAME aggregate (round 14, VERDICT
    r13 #4): the old label is carried through the groupBy as a second
    min, so "did anything change" is a filter over the already-
    materialized checkpoint — no second join, no extra shuffle.

    ``algorithm='star'`` (round 14, VERDICT r13 #7): the
    large-star/small-star alternation (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC 2014) — O(log n) rounds
    regardless of diameter, the right mode for adversarial long-chain
    graphs (boilerplate-heavy crawls chain A~B~C across shingle drift).
    Each round rewires edges toward per-neighborhood minima (two
    groupBy-min shuffles) until the edge set is a fixed point of stars;
    costs ~2x per round vs 'label', wins when diameter ≫ log n.

    Both raise after ``max_iterations`` rather than silently returning a
    non-converged labeling — the label error names the 'star' switch."""
    if algorithm not in ("label", "star"):
        raise ValueError(
            f"algorithm {algorithm!r} not one of ('label', 'star')")
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (e.unionByName(e.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
             .distinct()
             # materialize ONCE: the pair-generation plan upstream (an
             # n-gram self-join, an LSH bucket join, ...) is the
             # expensive part — without this every propagation round
             # AND every convergence probe would re-execute it
             .localCheckpoint(eager=True))
    if algorithm == "star":
        return _cc_star(edges, max_iterations)
    labels = (edges.select(F.col("src").alias("node"))
              .distinct()
              .withColumn("label", F.col("node")))
    lbl_t = labels.schema["label"].dataType
    # delta propagation (round 16, VERDICT r15 #7): only nodes whose label
    # CHANGED last round can lower a neighbor's label this round — an
    # unchanged neighbor's label already fed the previous round's min.  So
    # each round pushes from the shrinking `active` frontier instead of
    # every node: converged components stop paying join work while
    # stragglers finish.  Round 1 pushes from everyone (all labels "just
    # changed" from nonexistence).  The convergence probe is unchanged —
    # an empty frontier is exactly "nothing changed".
    active = labels
    for _ in range(int(max_iterations)):
        # push the frontier's labels to its neighbors, keep the per-node
        # min; the previous label rides the union as `_old` (NULL on
        # pushed rows — each node contributes exactly one old row, so
        # min(_old) recovers it) and the change probe becomes a plain
        # filter over THIS round's checkpoint
        pushed = (edges.join(active.withColumnRenamed("node", "src"),
                             "src")
                  .select(F.col("dst").alias("node"), "label")
                  .withColumn("_old", F.lit(None).cast(lbl_t)))
        merged = (labels.withColumn("_old", F.col("label"))
                  .unionByName(pushed)
                  .groupBy("node").agg(F.min("label").alias("label"),
                                       F.min("_old").alias("_old"))
                  .localCheckpoint(eager=True))
        active = (merged.filter(F.col("label") != F.col("_old"))
                  .select("node", "label"))
        changed = active.limit(1).count()
        labels = merged.select("node", "label")
        if changed == 0:
            return labels.select(F.col("node"),
                                 F.col("label").alias("component"))
    raise ValueError(
        f"connected_components did not converge in {max_iterations} "
        f"iterations — the pair graph has chains longer than expected "
        f"for near-dup clusters; raise max_iterations, or switch to "
        f"algorithm='star' (O(log n) rounds regardless of diameter)")


def _cc_star(edges: DataFrame, max_iterations: int) -> DataFrame:
    """Large-star/small-star alternation over a symmetric, distinct,
    checkpointed edge set; returns (node, component).  At the fixed
    point the edge set is a forest of stars (every edge points a node
    at its component's minimum id), so the labeling is the edge set
    plus an identity row per star center."""
    nodes = (edges.select(F.col("src").alias("node")).distinct()
             .localCheckpoint(eager=True))

    def large_star(e: DataFrame) -> DataFrame:
        # symmetrize, then point every LARGER neighbor of u at
        # min(N(u) ∪ {u}) — strictly-decreasing potential, keeps the
        # graph connected (Kiveris et al. lemma 1)
        sym = (e.unionByName(e.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
               .distinct())
        mins = sym.groupBy("src").agg(F.min("dst").alias("_mn"))
        return (sym.join(mins, "src")
                .filter(F.col("dst") > F.col("src"))
                .select(F.col("dst").alias("src"),
                        F.least(F.col("_mn"), F.col("src")).alias("dst"))
                .distinct())

    def small_star(e: DataFrame) -> DataFrame:
        # orient each edge large→small, then point every SMALLER
        # neighbor of u (and u itself) at min(N⁻(u)); self-loops drop
        ori = (e.select(F.greatest("src", "dst").alias("src"),
                        F.least("src", "dst").alias("dst"))
               .filter(F.col("src") != F.col("dst"))
               .distinct())
        mins = ori.groupBy("src").agg(F.min("dst").alias("_mn"))
        nbr = (ori.join(mins, "src")
               .select(F.col("dst").alias("src"),
                       F.col("_mn").alias("dst")))
        own = mins.select("src", F.col("_mn").alias("dst"))
        return (nbr.unionByName(own)
                .filter(F.col("src") != F.col("dst"))
                .distinct())

    e = edges
    n_prev = None
    for _ in range(int(max_iterations)):
        new = small_star(large_star(e)).localCheckpoint(eager=True)
        n_new = new.count()
        if n_prev is not None and n_new == n_prev:
            # counts tie → exact set-equality probe on two materialized
            # frames (cheap: star edge sets are ≤ |nodes| rows by now)
            if new.exceptAll(e).limit(1).count() == 0:
                e = new
                break
        n_prev, e = n_new, new
    else:
        raise ValueError(
            f"connected_components(algorithm='star') did not converge "
            f"in {max_iterations} iterations — raise max_iterations "
            f"(star contraction needs O(log n) rounds; this graph "
            f"exceeded the budget)")
    centers = nodes.join(e.select(F.col("src").alias("node")),
                         "node", "left_anti")
    return (e.select(F.col("src").alias("node"),
                     F.col("dst").alias("component"))
            .unionByName(centers.select(
                "node", F.col("node").alias("component"))))


def duplicate_clusters(pairs: DataFrame, id_a: str = "id_a",
                       id_b: str = "id_b",
                       max_iterations: int = 25,
                       algorithm: str = "label",
                       quality: DataFrame | None = None,
                       quality_id: str = "id",
                       quality_col: str = "score") -> DataFrame:
    """Cluster SUMMARY over :func:`connected_components`: one row per
    duplicate cluster — (cluster, n_members, member ids ascending, the
    kept id).  The survivors of a dedup pass are "kept id per cluster"
    ∪ "every unpaired document".  ``algorithm`` passes through
    ('label' | 'star').

    Keep policy: lowest id by default; with ``quality`` (an
    (id, score) frame — length, quality-classifier score, …) the kept
    id is the cluster's HIGHEST-score member, ties by lowest id — what
    a real near-dup pass keeps (the best copy, not the oldest).  A
    member missing from ``quality`` scores NULL and only wins when the
    whole cluster is unscored (then lowest id).  The quality join adds
    one broadcast-or-shuffle join on the node id; the per-cluster pick
    is the same single aggregate."""
    cc = connected_components(pairs, id_a=id_a, id_b=id_b,
                              max_iterations=max_iterations,
                              algorithm=algorithm)
    if quality is not None:
        # one score per id BEFORE the node join (max, ties irrelevant):
        # duplicate (id, score) rows in a caller's quality frame would
        # otherwise multiply cluster nodes through the left join,
        # inflating n_members and duplicating members entries (ADVICE
        # r14 #2) — the dedupe is one extra aggregate on a frame that is
        # at most |corpus| rows, and F.max keeps NULL-only ids NULL
        qf = (quality.select(
            F.col(quality_id).alias("_q_id"),
            F.col(quality_col).cast("double").alias("_q_score"))
            .groupBy("_q_id").agg(F.max("_q_score").alias("_q_score")))
        cc = cc.join(qf, cc["node"] == qf["_q_id"], "left").drop("_q_id")
        # min_by over (NEGATED score, node): the smallest negated score
        # is the highest score (a NULL score negates to +Infinity and
        # loses to any scored member), ties break to the LOWEST node —
        # id-type-agnostic (the node is only a tiebreaker field, never
        # negated)
        best = F.expr(
            "min_by(node, struct(-coalesce(_q_score, cast('-Infinity' "
            "as double)), node))")
        return (cc.groupBy(F.col("component").alias("cluster"))
                .agg(F.count(F.lit(1)).alias("n_members"),
                     F.array_sort(F.collect_list("node")).alias("members"),
                     best.alias("keep")))
    return (cc.groupBy(F.col("component").alias("cluster"))
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.array_sort(F.collect_list("node")).alias("members"))
            .withColumn("keep", F.element_at(F.col("members"), 1)))
