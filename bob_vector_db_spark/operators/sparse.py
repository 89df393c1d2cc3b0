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
from .localframe import local_frame


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
                    k: int | None = 10, exclude_self: bool = False,
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
    if k is None:
        # no cut, no rank: the full (qid, vec_id, sim) set of
        # dim-sharing docs — the grouped search's input (it ranks per
        # GROUP; a global per-qid window here would shuffle every
        # scored doc into one partition for nothing)
        return scored
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# Persisted sparse index: the posting table lives in the collection store,
# partitioned by dimension hash bucket — a query's active dims partition-
# prune the scan, the same stored-inverted-index shape as the BM25 index
# (operators.text_search.build_text_index) but without corpus stats (plain
# dot product needs none).  Shares the delta-log / generation / mask
# incremental-maintenance scheme of operators.index.
# ---------------------------------------------------------------------------

def _sparse_index_name(indices_col: str) -> str:
    return f"{indices_col}__sparse"


def _declared_modifier(meta: dict | None, indices_col: str) -> str | None:
    """The sparse space's declared ``modifier`` (Qdrant
    ``SparseVectorParams.modifier``), resolved by the PHYSICAL indices
    column: a space config matches when its ``indices_col`` (default
    'indices') equals the searched column, or the space NAME does."""
    for name, cfg in ((meta or {}).get("vectors") or {}).items():
        if str(cfg.get("kind", "")).lower() != "sparse":
            continue
        if cfg.get("indices_col", "indices") == indices_col \
                or name == indices_col:
            mod = cfg.get("modifier")
            # Qdrant's Modifier.NONE spelled explicitly is the default
            if mod is None or str(mod).lower() == "none":
                return None
            return str(mod).lower()
    return None


def sparse_index_meta(root: str, collection: str,
                      indices_col: str = "indices") -> dict | None:
    from .index import vector_index_meta  # noqa: PLC0415

    return vector_index_meta(root, collection, _sparse_index_name(indices_col))


def build_sparse_index(spark, root: str, collection: str,
                       indices_col: str = "indices",
                       values_col: str = "values",
                       n_dim_buckets: int = 32,
                       files_per_bucket: int = 1) -> dict:
    """Materialize the sparse posting table ONCE into the collection store:
    explode the (indices, values) array pairs, bucket by
    ``pmod(xxhash64(idx CAST AS long), n_dim_buckets)`` (hash, not plain
    mod — BPE-style vocabularies concentrate low ids; the cast is
    load-bearing: Spark's xxhash64 hashes int and long to DIFFERENT values,
    and the search-time probe hashes a long column, so both sides must hash
    the canonical long type or ``indices array<int>`` collections would
    prune the correct buckets away).  Same staged atomic swap and built_version staleness gate as
    the dense and BM25 indexes."""
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from .index import INDEX_META_FILE, atomic_replace_dir, index_path  # noqa: PLC0415
    from .upsert import (  # noqa: PLC0415
        _store_exists,
        collection_meta,
        collection_path,
        collection_version,
        read_collection,
    )

    meta = collection_meta(root, collection)
    if meta is None:
        raise ValueError(
            f"collection {collection!r} has no meta sidecar; create it via "
            f"create_collection/upsert before indexing")
    id_col = meta.get("id_col", "id")
    built_version = collection_version(root, collection)
    ipath = index_path(root, collection, _sparse_index_name(indices_col))
    staging = ipath + "__staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    n_points = 0
    if _store_exists(collection_path(root, collection)):
        post = postings_from_arrays(
            read_collection(spark, root, collection),
            id_col=id_col, indices_col=indices_col, values_col=values_col)
        (post.withColumn("gen", F.lit(0))
         .withColumn("dim_bucket",
                     F.pmod(F.xxhash64(F.col("idx").cast("long")),
                            F.lit(n_dim_buckets)).cast("int"))
         .repartition(n_dim_buckets * files_per_bucket, F.col("dim_bucket"))
         .write.partitionBy("dim_bucket")
         .parquet(os.path.join(staging, "postings")))
        # one row per point carrying the space — the IDF modifier's N
        # (Qdrant Modifier.IDF) recomputes from this tiny masked table at
        # refresh, never from the postings (the BM25 doclens pattern).
        # Derive it from the postings JUST WRITTEN (a column-pruned
        # parquet read), not from `post` — that lineage is the full
        # collection explode and would re-execute per consumer
        docids = (spark.read.parquet(os.path.join(staging, "postings"))
                  .select(F.col("id").cast("string").alias("id"))
                  .distinct().withColumn("gen", F.lit(0)))
        docids.coalesce(8).write.parquet(os.path.join(staging, "docids"))
        n_points = int(spark.read.parquet(os.path.join(staging, "docids"))
                       .count())
    imeta = {
        "kind": "sparse",
        "indices_col": indices_col,
        "values_col": values_col,
        "id_col": id_col,
        "n_dim_buckets": n_dim_buckets,
        "n_points": n_points,
        "built_version": built_version,
        "generation": 0,
    }
    with open(os.path.join(staging, INDEX_META_FILE), "w") as fh:
        json.dump(imeta, fh, indent=2, sort_keys=True)
    atomic_replace_dir(staging, ipath)
    return imeta


def refresh_sparse_index(spark, root: str, collection: str,
                         indices_col: str = "indices",
                         mask_compact_threshold: int | None = None) -> dict:
    """Absorb mutations since ``built_version`` incrementally — the sparse
    twin of ``operators.index.refresh_vector_index``: changed ids re-explode
    their array pairs and APPEND at generation g into the existing
    dim-bucket layout; masks hide the ids' older posting rows.  Same
    crash-safe write order (claim g → masks → appends → commit)."""
    import os  # noqa: PLC0415

    from .index import index_path, run_incremental_refresh  # noqa: PLC0415
    from .upsert import collection_meta  # noqa: PLC0415

    meta = collection_meta(root, collection)
    if meta is None:
        raise ValueError(f"collection {collection!r} has no meta sidecar")
    imeta = sparse_index_meta(root, collection, indices_col)
    if imeta is None:
        raise ValueError(
            f"no persisted sparse index for {collection!r}/{indices_col!r}; "
            f"run build_sparse_index first")
    ipath = index_path(root, collection, _sparse_index_name(indices_col))
    id_col = imeta["id_col"]

    def append_fn(fresh, g: int) -> None:
        post = postings_from_arrays(
            fresh, id_col=id_col, indices_col=imeta["indices_col"],
            values_col=imeta["values_col"])
        (post.withColumn("gen", F.lit(g))
         .withColumn("dim_bucket",
                     F.pmod(F.xxhash64(F.col("idx").cast("long")),
                            F.lit(imeta["n_dim_buckets"])).cast("int"))
         .write.mode("append").partitionBy("dim_bucket")
         .parquet(os.path.join(ipath, "postings")))
        (post.select(F.col("id").cast("string").alias("id")).distinct()
         .withColumn("gen", F.lit(g))
         .coalesce(8).write.mode("append")
         .parquet(os.path.join(ipath, "docids")))

    def finalize_fn(im: dict) -> None:
        # the IDF modifier's N over the masked docids — surviving
        # carriers only, one tiny scan (never the postings)
        from .index import _apply_masks  # noqa: PLC0415

        did_dir = os.path.join(ipath, "docids")
        # "n_points" missing = a legacy index built before the docids
        # sidecar existed: leave it absent (the modifier raises with a
        # rebuild hint) rather than recording a delta-only count
        if "n_points" in im and os.path.isdir(did_dir):
            im["n_points"] = int(_apply_masks(
                spark, ipath, spark.read.parquet(did_dir), "id").count())

    return run_incremental_refresh(
        spark, root, collection, ipath, imeta, append_fn, finalize_fn,
        data_layouts=[("postings", "id", "dim_bucket"),
                      ("docids", "id", None)],
        mask_compact_threshold=mask_compact_threshold)


def idf_weight(df, n_points) -> "F.Column":
    """Qdrant ``Modifier.IDF``: ``ln(1 + (N - n_t + 0.5)/(n_t + 0.5))``
    — the BM25 idf term — where N is the number of points carrying the
    sparse space and ``n_t`` (the ``df`` Column) the number containing
    dimension t.  Query values multiply by it at search time; stored
    values stay as-is (the Qdrant sparse-space config semantics)."""
    n = F.lit(float(n_points))
    return F.log(F.lit(1.0) + (n - df + 0.5) / (df + 0.5))


def sparse_search_indexed(spark, root: str, collection: str,
                          query_postings: DataFrame, k: int | None = 10,
                          indices_col: str = "indices",
                          exclude_self: bool = False,
                          round_to: int | None = 6,
                          max_query_dims: int = 100_000,
                          allow_stale: bool = False,
                          candidate_ids: DataFrame | None = None,
                          modifier: str | None = "auto"
                          ) -> DataFrame:
    """Top-k over the PERSISTED sparse index: the queries' active dims
    become a STATIC ``dim_bucket IN (...)`` partition filter plus an
    ``idx IN (...)`` predicate pushed into the parquet scan — only the
    probed posting lists are ever read, zero corpus passes.  Results are
    identical to :func:`sparse_dot_topk` over the live collection
    (pytest-pinned + shared oracle).  Raises on a stale index unless
    ``allow_stale``; refresh with :func:`refresh_sparse_index`.

    ``candidate_ids`` (one id column) narrows the search to those points
    — the FILTERED sparse search (Qdrant filters on sparse spaces): the
    id set semi-joins the probed posting lists (AQE picks the shape), so
    payload pruning composes with the dimension pruning in one plan;
    ``query_api.search_sparse_points`` wires the filter DSL to it.

    ``modifier`` 'auto' (default) honors the sparse space's DECLARED
    config (``{"kind": "sparse", "modifier": "idf"}`` — the Qdrant
    ``SparseVectorParams(modifier=Modifier.IDF)`` twin); 'idf' forces
    it, None disables.  IDF stats are corpus-global even under a
    filter: N persists in the index meta (maintained through refresh
    via the masked docids sidecar) and per-dim frequencies aggregate
    over the probed posting lists BEFORE candidate narrowing — only
    the query dims' buckets are ever read for them."""
    import os  # noqa: PLC0415

    from .index import _apply_masks, index_path  # noqa: PLC0415
    from .upsert import collection_meta, collection_version  # noqa: PLC0415

    imeta = sparse_index_meta(root, collection, indices_col)
    if imeta is None:
        raise ValueError(
            f"no persisted sparse index for {collection!r}/{indices_col!r}; "
            f"run build_sparse_index first")
    if not allow_stale and int(imeta["built_version"]) != \
            collection_version(root, collection):
        raise ValueError(
            f"sparse index for {collection!r}/{indices_col!r} was built at "
            f"data version {imeta['built_version']} but the collection is "
            f"at {collection_version(root, collection)}; "
            f"refresh_sparse_index absorbs the mutations (or rebuild)")
    # driver-side probe set — bounded by the kNN small-query-side contract
    dims = [r[0] for r in
            query_postings.select("idx").distinct()
            .limit(max_query_dims + 1).collect()]
    if len(dims) > max_query_dims:
        raise ValueError(
            f"sparse_search_indexed computes the probe set driver-side; got "
            f">{max_query_dims} distinct query dims — raise max_query_dims "
            f"or batch the input")
    n = imeta["n_dim_buckets"]
    buckets = sorted(
        r[0] for r in local_frame(spark, [(int(d),) for d in dims],
                                  "idx long")
        .select(F.pmod(F.xxhash64("idx"), F.lit(n)).cast("int").alias("b"))
        .distinct().collect()) if dims else []
    ipath = index_path(root, collection, _sparse_index_name(indices_col))
    pdir = os.path.join(ipath, "postings")
    if not os.path.isdir(pdir):  # index built over an empty collection
        return sparse_dot_topk(
            query_postings, query_postings.limit(0), k=k,
            exclude_self=exclude_self, round_to=round_to)
    post = (spark.read.parquet(pdir)
            .filter(F.col("dim_bucket").isin(buckets))
            .filter(F.col("idx").isin(dims)))
    post = _apply_masks(spark, ipath, post, "id").select("id", "idx", "val")
    if modifier == "auto":
        modifier = _declared_modifier(collection_meta(root, collection),
                                      indices_col)
    if modifier is not None:
        if str(modifier).lower() != "idf":
            raise ValueError(
                f"unknown sparse modifier {modifier!r} (only 'idf')")
        if "n_points" not in imeta:
            raise ValueError(
                f"sparse index for {collection!r}/{indices_col!r} predates "
                f"the IDF sidecar; rebuild with build_sparse_index to use "
                f"modifier='idf'")
        # per-dim document frequency over the PROBED lists, pre-candidate
        # (IDF is corpus-global under a filter, like BM25's df_t)
        df_t = post.groupBy("idx").agg(
            F.countDistinct("id").alias("_df"))
        query_postings = (
            query_postings.join(F.broadcast(df_t), "idx", "left")
            .withColumn(
                "val",
                F.col("val") * idf_weight(
                    F.coalesce(F.col("_df").cast("double"), F.lit(0.0)),
                    imeta["n_points"]))
            .drop("_df"))
    if candidate_ids is not None:
        cands = candidate_ids.select(
            F.col(candidate_ids.columns[0]).cast("string")
            .alias("_flt_id")).distinct()
        post = post.join(
            cands, F.col("id").cast("string") == F.col("_flt_id"),
            "left_semi")
    return sparse_dot_topk(query_postings, post, k=k,
                           exclude_self=exclude_self, round_to=round_to)
