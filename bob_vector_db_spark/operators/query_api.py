"""The filtered Query API over a stored collection — search / count /
facet / scroll, each accepting the composable :mod:`filters` DSL.

This is the surface the reference delegates to its store for
(README.md:13 "Query the DB and return the results" over the payloads
built at qdrant_embedder.py:119-128): every entry point takes ONE
``Filter`` object and resolves it through a single planner,
:func:`operators.filters.filter_match_ids`:

- **selective path** — top-level must MatchValue/MatchAny leaves over
  columns with a FRESH payload index resolve to pruned posting probes;
  the candidate ids fetch their rows through the store's static
  id-bucket filter (``upsert.read_rows_for_ids`` — O(|candidates|),
  never a collection scan) and only the residual conditions evaluate on
  the fetched rows;
- **scan path** — everything else compiles to one pushed SQL predicate
  (``Filter.to_sql`` → ``F.expr``), so Catalyst folds the leaf
  comparisons into the parquet scan.  Non-selective filters WANT this
  plan: scanning with pushdown beats fetching when most points match.

``use_payload_index`` mirrors the vector-search dispatch contract of
``knn.search_collection``: "auto" (default) routes through the index iff
it helps and is fresh, "always" raises when it can't, False scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .filters import (
    Filter,
    as_filter,
    filter_match_ids,
    has_literal_id_leaves,
)
from .upsert import (
    collection_meta,
    read_collection,
    read_rows_for_ids,
)


def _scope_tenant(root: str, collection: str, rows: DataFrame,
                  tenant: str | None) -> DataFrame:
    """Restrict candidate rows (already fetched by id) to one tenant — the
    residual tenant check of the payload-index path, where the fetch was
    id-bucket-pruned rather than tenant-pruned.  Scan paths scope through
    ``read_collection(tenant=...)`` instead, which prunes partitions."""
    if tenant is None:
        return rows
    from .upsert import _tenant_col  # noqa: PLC0415

    tcol = _tenant_col(root, collection)
    if tcol is None:
        raise ValueError(
            f"collection {collection!r} was not created with a tenant_col; "
            f"tenant-scoped queries need the multitenant layout")
    return rows.filter(F.col(tcol) == str(tenant))


def _resolve_candidates(spark: SparkSession, root: str, collection: str,
                        flt, use_payload_index,
                        max_candidates: int,
                        resolution: tuple | None = None
                        ) -> tuple[DataFrame | None, Filter]:
    """Shared dispatch: (candidate rows | None, residual filter).  None
    means "use the pushed-predicate scan" — no usable index, the filter
    matched too many points for the fetch plan to win, or routing was
    disabled.  ``resolution`` is an optional precomputed
    ``(ids, residual, n_cand)`` from an earlier ``filter_match_ids`` in
    the same call (the composed-search dispatch) — reusing it avoids a
    second posting probe + count when 'auto' declines the composition."""
    flt = as_filter(flt)
    if use_payload_index is False:
        return None, flt
    if resolution is not None:
        ids, residual, n_pre = resolution
    else:
        ids, residual = filter_match_ids(spark, root, collection, flt)
        n_pre = None
    if ids is None:
        if use_payload_index == "always":
            raise ValueError(
                f"use_payload_index='always' but no top-level must leaf of "
                f"the filter has a fresh payload index on {collection!r}; "
                f"build_payload_index the filtered column(s) or use 'auto'")
        return None, flt
    n_cand = n_pre if n_pre is not None else ids.count()
    if n_cand > max_candidates:
        if use_payload_index == "always":
            raise ValueError(
                f"filter matches {n_cand} > {max_candidates} points — not "
                f"selective; use the scan path (use_payload_index='auto')")
        return None, flt
    rows = read_rows_for_ids(spark, root, collection, ids)
    if rows is None:  # empty store / empty candidate set
        rows = read_collection(spark, root, collection).limit(0)
    return rows.filter(residual.to_column()), residual


def _final_filter_ids(spark: SparkSession, root: str, collection: str,
                      ids: DataFrame, residual: Filter, id_col: str,
                      tenant: str | None = None) -> DataFrame:
    """The filter's FINAL candidate id frame: the payload-index id set
    narrowed by the residual conditions evaluated on a bucket-pruned
    fetch of those ids (a no-op when the index answered every leaf)."""
    if residual == Filter():
        return ids
    rows = read_rows_for_ids(spark, root, collection, ids, tenant=tenant)
    return (ids.limit(0) if rows is None
            else rows.filter(residual.to_column()).select(id_col))


def _filter_candidate_ids(spark: SparkSession, root: str, collection: str,
                          flt, use_payload_index,
                          id_col: str) -> DataFrame:
    """Resolve a filter to its candidate id frame for the POSTING-INDEX
    searches (sparse / BM25): pruned payload-index probes + residual on
    the bucket-pruned fetch when a fresh index exists, else ONE
    pushed-predicate scan projecting just the id column.  Deliberately
    no ``max_candidates`` guard: unlike the dense fetch-vs-scan choice,
    a posting search has no pushed-predicate alternative (the payload
    lives in the collection, not the postings) — the candidate
    semi-join IS the plan at every selectivity, and AQE sizes it."""
    flt_o = as_filter(flt)
    ids = residual = None
    if use_payload_index is not False:
        ids, residual = filter_match_ids(spark, root, collection, flt_o)
    if ids is not None:
        return _final_filter_ids(spark, root, collection, ids,
                                 residual, id_col)
    if use_payload_index == "always":
        raise ValueError(
            f"use_payload_index='always' but no top-level must leaf of "
            f"the filter has a fresh payload index on {collection!r}")
    return (read_collection(spark, root, collection)
            .filter(flt_o.to_column()).select(id_col))


def search_sparse_points(spark: SparkSession, root: str, collection: str,
                         query_postings: DataFrame, flt=None, k: int = 10,
                         indices_col: str = "indices",
                         use_payload_index: str | bool = "auto",
                         exclude_self: bool = False,
                         round_to: int | None = 6,
                         allow_stale: bool = False,
                         modifier: str | None = "auto") -> DataFrame:
    """FILTERED sparse search — Qdrant's ``query_points`` over a sparse
    space with a ``query_filter``: the filter resolves to candidate ids
    (:func:`_filter_candidate_ids`) and the id set semi-joins INSIDE the
    probed posting lists of the persisted sparse index — dimension
    pruning AND payload pruning in one plan, the sparse twin of the
    dense composed search.  With no filter this is plain
    ``sparse_search_indexed``."""
    from .sparse import sparse_search_indexed  # noqa: PLC0415

    meta = collection_meta(root, collection) or {}
    id_col = meta.get("id_col", "id")
    cand = (None if flt is None else _filter_candidate_ids(
        spark, root, collection, flt, use_payload_index, id_col))
    return sparse_search_indexed(
        spark, root, collection, query_postings, k=k,
        indices_col=indices_col, exclude_self=exclude_self,
        round_to=round_to, allow_stale=allow_stale, candidate_ids=cand,
        modifier=modifier)


def search_text_points(spark: SparkSession, root: str, collection: str,
                       terms: list[str], flt=None, k: int = 10,
                       text_col: str = "document",
                       use_payload_index: str | bool = "auto",
                       k1: float = 1.2, b: float = 0.75,
                       round_to: int = 6,
                       allow_stale: bool = False) -> DataFrame:
    """FILTERED full-text search — BM25 over the persisted posting index
    with a payload ``query_filter``: the filter resolves to candidate
    ids (:func:`_filter_candidate_ids`) and the id set semi-joins INSIDE
    the probed term buckets — term pruning AND payload pruning in one
    plan, with corpus-global BM25 statistics (a filter narrows
    candidates, not term rarity).  With no filter this is plain
    ``bm25_topk_indexed``."""
    from .text_search import bm25_topk_indexed  # noqa: PLC0415

    meta = collection_meta(root, collection) or {}
    id_col = meta.get("id_col", "id")
    cand = (None if flt is None else _filter_candidate_ids(
        spark, root, collection, flt, use_payload_index, id_col))
    return bm25_topk_indexed(
        spark, root, collection, terms, k=k, text_col=text_col,
        k1=k1, b=b, round_to=round_to, allow_stale=allow_stale,
        candidate_ids=cand)


def _filtered_indexed_search(spark: SparkSession, root: str, collection: str,
                             queries: DataFrame, flt, k: int,
                             vector_name: str, metric: str, query_id: str,
                             query_vec: str, round_to: int | None,
                             use_index, use_payload_index,
                             n_probe: int | None,
                             rerank_factor: int,
                             index_candidate_threshold: int,
                             tenant: str | None,
                             id_col: str
                             ) -> tuple[DataFrame | None, tuple | None]:
    """Compose the payload index with the persisted ANN artifact: filter →
    candidate ids (pruned posting probes), residual conditions evaluated on
    a bucket-pruned fetch of those ids, and the final id set semi-joined
    INSIDE the probed ``list_id`` partitions of the vector index
    (``index.search_indexed(candidate_ids=...)``) — the two prunings
    in one plan.

    Returns ``(result | None, resolution | None)``: result None when
    "auto" decides the exact path wins (unusable index, or a candidate
    set small enough that the bucket-pruned exact fetch is cheaper AND
    exact) — then ``resolution`` carries the already-computed
    ``(ids, residual, n_cand)`` so the exact path doesn't re-probe the
    postings.  Raises under "always" when composition can't run."""
    from .index import (  # noqa: PLC0415
        index_is_fresh,
        search_indexed,
        vector_index_meta,
    )

    def fail(msg: str):
        if use_index == "always":
            raise ValueError(msg)
        return None, None

    imeta = vector_index_meta(root, collection, vector_name, tenant)
    if imeta is None or not index_is_fresh(root, collection, vector_name,
                                           tenant):
        return fail(
            f"use_index='always' but the vector index for {collection!r}/"
            f"{vector_name!r}"
            + (f" (tenant {tenant!r})" if tenant is not None else "")
            + (" is stale" if imeta is not None else " is absent")
            + "; build_vector_index / refresh_vector_index first")
    if imeta.get("metric") != metric:
        return fail(
            f"vector index for {collection!r}/{vector_name!r} was built "
            f"for metric {imeta.get('metric')!r}, not {metric!r}")
    if use_payload_index is False:
        return fail(
            "use_index='always' needs the payload-index candidate path; "
            "use_payload_index=False disables it")
    ids, residual = filter_match_ids(spark, root, collection, flt)
    if ids is None:
        if use_index == "always":
            raise ValueError(
                f"use_index='always' but no top-level must leaf of the "
                f"filter has a fresh payload index on {collection!r}; "
                f"build_payload_index the filtered column(s)")
        return None, None
    # the candidate id frame feeds THREE consumers (the selectivity
    # count, the residual fetch's bucket probe, the final semi-join) —
    # materialize the bounded posting-probe output ONCE through the
    # capped driver roundtrip (the rescore-tail pattern; lazy fallback
    # past the cap keeps the unbounded case two pruned passes instead
    # of a multi-GB collect).  The probe's own val_bucket pruning is
    # plan-asserted on the probe frame in tests/test_payload_index.py;
    # it no longer appears in the composed plan because it already ran.
    from .upsert import materialize_small  # noqa: PLC0415

    mat = materialize_small(spark, ids)
    over_cap = mat is ids  # identity return = the lazy fallback fired
    ids = mat
    if use_index != "always":
        # past the materialize cap the candidate set is certainly above
        # the (much smaller) threshold — skip the count; downstream
        # consumers that need an exact n recount lazily
        n_cand = None if over_cap else ids.count()
        if n_cand is not None and n_cand <= index_candidate_threshold:
            # few candidates: the pruned exact fetch is the plan — hand
            # the resolution back so it isn't recomputed
            return None, (ids, residual, n_cand)
        if n_probe is None and imeta.get("kind") == "ivf":
            # full probe over the FLOAT artifact reads as much as the
            # pushed-predicate scan and adds a semi-join — no IO win, so
            # 'auto' declines; composition pays when the probe narrows
            # (explicit n_probe) or the artifact is quantized (ivf_sq /
            # ivf_pq codes are 4-32x smaller than the float column).
            # 'always' still composes as asked.
            return None, (ids, residual, n_cand)
    final_ids = _final_filter_ids(spark, root, collection, ids, residual,
                                  id_col, tenant=tenant)
    return search_indexed(spark, root, collection, queries, k=k,
                          vector_name=vector_name, n_probe=n_probe,
                          query_id=query_id, query_vec=query_vec,
                          exclude_self=False, round_to=round_to,
                          rerank_factor=rerank_factor,
                          tenant=tenant, candidate_ids=final_ids), None


def search_points(spark: SparkSession, root: str, collection: str,
                  queries: DataFrame, flt=None, k: int = 10,
                  vector_name: str | None = None,
                  query_id: str = "qid", query_vec: str = "qvec",
                  round_to: int | None = 6,
                  use_payload_index: str | bool = "auto",
                  max_candidates: int = 1_000_000,
                  tenant: str | None = None,
                  score_threshold: float | None = None,
                  offset: int = 0,
                  use_index: str | bool = "auto",
                  n_probe: int | None = None,
                  rerank_factor: int = 5,
                  index_candidate_threshold: int = 100_000,
                  with_payload: bool | list = False,
                  with_vectors: bool | list = False) -> DataFrame:
    """Filtered kNN with the collection's declared metric — the Qdrant
    ``search(query_vector, query_filter=Filter(...))`` twin.  With no
    filter this defers to ``knn.search_collection`` (which may dispatch
    to the vector index); with one, the filter resolves FIRST (Qdrant's
    filtered-search order) through the payload index when selective,
    else as a pushed predicate on the exact scan.

    ``use_index`` additionally lets the FILTERED search compose with the
    persisted ANN artifact (Qdrant's filtered-HNSW twin): the filter's
    candidate ids semi-join INSIDE the probed ``list_id`` partitions of
    the vector index and only the survivors score/rescore — both
    prunings in one plan.  "auto" (default) composes only when the
    filter resolves through a fresh payload index AND matches more than
    ``index_candidate_threshold`` points — below that the bucket-pruned
    exact fetch is the better plan (and exact) — AND the probe actually
    narrows IO (an explicit ``n_probe``, or a quantized artifact kind;
    a full probe over the float ivf artifact reads as much as the
    pushed scan); "always" requires the composed plan (raises when
    either index is missing/stale); False never touches the ANN
    artifact.  ``n_probe=None`` probes every list,
    so a composed search with full probe stays EXACT over the filtered
    set (ivf — rescoring kinds like ivf_mv/ivf_sq/ivf_pq additionally
    need a COVERING ``rerank_factor``: ``rerank_factor*k`` ≥ the
    filtered point count — Qdrant's quantization ``oversampling`` knob,
    threaded to the artifact's rescore stage).

    ``score_threshold`` drops hits past the quality floor (better-than
    semantics follow the metric: >= for cosine/dot, <= for euclid);
    ``offset`` skips the first hits for paged search (ranks re-number
    from 1) — both post-rank cuts, exactly Qdrant's search params.
    ``with_payload`` (True, or a list of column names) joins each hit's
    payload back on via the bucket-pruned fetch (:func:`attach_payload`)
    — the Qdrant hit shape with payload attached; ``with_vectors``
    (True, or a list of space names) likewise attaches the stored
    vector data (:func:`attach_vectors`)."""
    from .knn import knn_join, resolve_metric, search_collection  # noqa: PLC0415

    meta = collection_meta(root, collection) or {}
    vectors = meta.get("vectors", {})
    if vector_name is None:
        if len(vectors) != 1:
            raise ValueError(
                f"collection {collection!r} declares {sorted(vectors)} "
                f"vector spaces; pass vector_name")
        vector_name = next(iter(vectors))
    metric = resolve_metric(
        vectors.get(vector_name, {}).get("distance", "cosine"))
    if use_index is True:  # the bool complement of False, on BOTH branches
        use_index = "always"
    if flt is None:
        out = search_collection(spark, root, collection, queries,
                                k=k + offset,
                                vector_name=vector_name, query_id=query_id,
                                query_vec=query_vec, tenant=tenant,
                                use_index=("auto" if use_index is None
                                           else use_index),
                                n_probe=n_probe,
                                rerank_factor=rerank_factor)
        if round_to is not None and round_to < 6:
            # search_collection's scorers round to the repo-wide 6;
            # honor a COARSER round_to by re-rounding (ranks computed at
            # 6 stay — a deterministic refinement of the coarser ties).
            # A finer-than-6 request cannot recover precision on this
            # branch (the 6-decimal value is already the stored truth);
            # callers needing more decimals use the filtered path or
            # knn_join directly, which thread round_to natively.
            out = out.withColumn("sim", F.round("sim", int(round_to)))
    else:
        id_col = meta.get("id_col", "id")
        out, resolution = None, None
        if use_index not in (False, None):
            out, resolution = _filtered_indexed_search(
                spark, root, collection, queries, flt, k + offset,
                vector_name, metric, query_id, query_vec, round_to,
                use_index, use_payload_index, n_probe, rerank_factor,
                index_candidate_threshold, tenant, id_col)
        if out is None:
            cand, _residual = _resolve_candidates(
                spark, root, collection, flt, use_payload_index,
                max_candidates, resolution=resolution)
            if cand is None:
                corpus = (read_collection(spark, root, collection,
                                          tenant=tenant)
                          .filter(as_filter(flt).to_column()))
            else:
                corpus = _scope_tenant(root, collection, cand, tenant)
            if vectors.get(vector_name, {}).get("multivector") is not None:
                from .knn import (  # noqa: PLC0415
                    _maxsim_blas_ok,
                    knn_join_maxsim,
                    knn_join_maxsim_vectorized,
                )

                # the same vectorized='auto' dual as search_collection:
                # BLAS when the id contract holds, expression form (the
                # oracle contract) otherwise
                scorer = (knn_join_maxsim_vectorized
                          if _maxsim_blas_ok("auto", queries, query_id,
                                             corpus, id_col)
                          else knn_join_maxsim)
                out = scorer(
                    queries, corpus.select(id_col, vector_name),
                    k=k + offset, query_id=query_id, query_vec=query_vec,
                    corpus_id=id_col, corpus_vec=vector_name,
                    metric=metric, exclude_self=False, round_to=round_to)
            else:
                out = knn_join(queries,
                               corpus.select(id_col, vector_name),
                               k=k + offset,
                               query_id=query_id, query_vec=query_vec,
                               corpus_id=id_col, corpus_vec=vector_name,
                               exclude_self=False, round_to=round_to,
                               metric=metric)
    if offset:
        out = (out.filter(F.col("rank") > offset)
               .withColumn("rank", F.col("rank") - F.lit(int(offset))))
    if score_threshold is not None:
        out = out.filter(_native_cut(F.col("sim"), score_threshold,
                                     metric))
    if with_payload:
        out = attach_payload(spark, root, collection, out,
                             with_payload, meta=meta)
    if with_vectors:
        out = attach_vectors(spark, root, collection, out,
                             with_vectors, meta=meta)
    return out


def attach_payload(spark: SparkSession, root: str, collection: str,
                   hits: DataFrame, with_payload=True,
                   id_col_out: str = "vec_id",
                   meta: dict | None = None) -> DataFrame:
    """Qdrant ``with_payload``: join each hit's payload columns back onto
    a ranked result.  ``with_payload`` True attaches every payload column
    (vector spaces excluded — that's ``with_vectors`` territory and they
    are heavy); a list of names attaches exactly those.  The fetch goes
    through the store's static id-bucket filter (``read_rows_for_ids`` —
    O(|hits|), never a collection scan) and joins broadcast: hits are
    k·|queries| rows by construction."""
    from .upsert import _all_vector_columns  # noqa: PLC0415

    meta = meta if meta is not None else \
        (collection_meta(root, collection) or {})
    id_col = meta.get("id_col", "id")
    # exclude spaces by name AND by physical column (a sparse space's
    # indices/values pair) — payload means payload, never vector data
    vectors = set(meta.get("vectors", {})) | _all_vector_columns(meta)
    rows = read_rows_for_ids(spark, root, collection,
                             hits.select(id_col_out).distinct())
    if rows is None:
        return hits
    if with_payload is True:
        cols = [c for c in rows.columns if c != id_col and c not in vectors]
    else:
        missing = [c for c in with_payload if c not in rows.columns]
        if missing:
            raise ValueError(
                f"with_payload: {missing} not in the stored schema of "
                f"{collection!r}")
        cols = list(with_payload)
    looked = rows.select(F.col(id_col).cast("string").alias("_wp_id"),
                         *cols)
    return (hits.join(F.broadcast(looked),
                      F.col(id_col_out).cast("string") == F.col("_wp_id"),
                      "left")
            .drop("_wp_id"))


def attach_vectors(spark: SparkSession, root: str, collection: str,
                   hits: DataFrame, with_vectors=True,
                   id_col_out: str = "vec_id",
                   meta: dict | None = None) -> DataFrame:
    """Qdrant ``with_vectors`` — the return-flag twin of ``with_payload``
    (VERDICT r7 missing #3): join each hit's stored vector data back onto
    a ranked result.  ``with_vectors`` True attaches every declared
    space; a list of SPACE NAMES attaches exactly those — a sparse space
    contributes its physical (indices, values) column pair, a dense or
    multivector space its own column.  Same bucket-pruned
    ``read_rows_for_ids`` fetch and broadcast join as the payload attach:
    O(|hits|), never a collection scan."""
    from .upsert import _space_columns  # noqa: PLC0415

    meta = meta if meta is not None else \
        (collection_meta(root, collection) or {})
    id_col = meta.get("id_col", "id")
    spaces = meta.get("vectors", {})
    if with_vectors is True:
        names = sorted(spaces)
    else:
        missing = [n for n in with_vectors if n not in spaces]
        if missing:
            raise ValueError(
                f"with_vectors: {missing} not declared vector spaces of "
                f"{collection!r} (has {sorted(spaces)})")
        names = list(with_vectors)
    cols: list[str] = []
    for n in names:
        cols.extend(c for c in _space_columns(meta, n) if c not in cols)
    if not cols:
        return hits
    rows = read_rows_for_ids(spark, root, collection,
                             hits.select(id_col_out).distinct())
    if rows is None:
        return hits
    looked = rows.select(F.col(id_col).cast("string").alias("_wv_id"),
                         *cols)
    return (hits.join(F.broadcast(looked),
                      F.col(id_col_out).cast("string") == F.col("_wv_id"),
                      "left")
            .drop("_wv_id"))


def _shape_columns(meta: dict, have: list[str], collection: str,
                   with_payload, with_vectors) -> list[str]:
    """The returned column list under Qdrant's return flags — id always,
    payload columns per ``with_payload`` (True = all non-vector), vector
    spaces' PHYSICAL columns per ``with_vectors`` (a sparse space
    contributes its (indices, values) pair).  Shared by scroll and
    retrieve; the search paths attach instead (their frames carry ranks,
    not stored rows)."""
    from .upsert import _all_vector_columns, _space_columns  # noqa: PLC0415

    id_col = meta.get("id_col", "id")
    vec_cols = _all_vector_columns(meta)
    cols: list[str] = [id_col]
    if with_payload is True:
        cols += [c for c in have if c != id_col and c not in vec_cols]
    elif with_payload:
        missing = [c for c in with_payload if c not in have]
        if missing:
            raise ValueError(
                f"with_payload: {missing} not in the stored schema of "
                f"{collection!r}")
        cols += [c for c in with_payload if c != id_col]
    if with_vectors:
        spaces = meta.get("vectors", {})
        names = sorted(spaces) if with_vectors is True else list(with_vectors)
        missing = [n for n in names if n not in spaces]
        if missing:
            raise ValueError(
                f"with_vectors: {missing} not declared vector spaces of "
                f"{collection!r} (has {sorted(spaces)})")
        for n in names:
            cols += [c for c in _space_columns(meta, n) if c not in cols]
    return cols


def retrieve_points(spark: SparkSession, root: str, collection: str,
                    ids, with_payload: bool | list = True,
                    with_vectors: bool | list = False,
                    tenant: str | None = None) -> DataFrame:
    """Qdrant ``retrieve``: fetch the points with the given ids — one
    bucket-pruned ``read_rows_for_ids`` pass (O(|ids| + their buckets),
    never a collection scan), shaped by the return flags exactly like a
    scroll page; ids absent from the store simply return no row.
    ``ids`` is a list or a one-column DataFrame.  Rows come back ordered
    by id (Qdrant doesn't define an order; this makes paging callers
    deterministic)."""
    meta = collection_meta(root, collection) or {}
    id_col = meta.get("id_col", "id")
    ids_df = (ids if isinstance(ids, DataFrame) else
              spark.createDataFrame([(str(i),) for i in ids],
                                    "`_r_id` string"))
    rows = read_rows_for_ids(spark, root, collection, ids_df)
    if rows is None:
        rows = read_collection(spark, root, collection).limit(0)
    rows = _scope_tenant(root, collection, rows, tenant)
    cols = _shape_columns(meta, rows.columns, collection,
                          with_payload, with_vectors)
    return rows.select(*cols).orderBy(id_col)


def count_points(spark: SparkSession, root: str, collection: str,
                 flt=None, use_payload_index: str | bool = "auto",
                 max_candidates: int = 1_000_000,
                 tenant: str | None = None) -> int:
    """Qdrant ``count(count_filter=...)``: exact filtered cardinality.
    The count itself is a distributed aggregate either way; the index
    path avoids touching the collection entirely when the residual is
    empty (the posting probe already knows the answer)."""
    if flt is None:
        return read_collection(spark, root, collection, tenant=tenant).count()
    flt = as_filter(flt)
    if use_payload_index is not False:
        ids, residual = filter_match_ids(spark, root, collection, flt)
        if ids is not None:
            # HasId leaves contribute LITERAL ids that may not exist in
            # the store (posting-derived ids always do) — those must go
            # through the fetch so ghosts drop from the count
            if residual == Filter() and tenant is None \
                    and not has_literal_id_leaves(flt):
                return ids.count()
            rows = read_rows_for_ids(spark, root, collection, ids)
            if rows is None:
                return 0
            rows = _scope_tenant(root, collection, rows, tenant)
            return rows.filter(residual.to_column()).count()
        if use_payload_index == "always":
            raise ValueError(
                f"use_payload_index='always' but no top-level must leaf "
                f"has a fresh payload index on {collection!r}")
    return (read_collection(spark, root, collection, tenant=tenant)
            .filter(flt.to_column()).count())


def facet_values(spark: SparkSession, root: str, collection: str,
                 key: str, flt=None, limit: int = 10,
                 use_payload_index: str | bool = "auto",
                 max_candidates: int = 1_000_000,
                 tenant: str | None = None) -> DataFrame:
    """Qdrant ``facet``: distinct values of a payload key with counts,
    under a filter — (value, count) descending.  Qdrant semantics
    throughout: a NULL (missing) payload never forms a group, and an
    ARRAY key counts points per ELEMENT (each point once per distinct
    element) — identical whether the answer comes from the scan or the
    index.  One pushed-filter scan (or candidate fetch) plus one
    partial-aggregated groupBy; only |distinct values| rows move.  An
    UNFILTERED, UNTENANTED facet over a freshly-indexed key answers from
    the posting table alone (index-only aggregate — the collection's
    data files never open; the 100 TB facet plan)."""
    from pyspark.sql.types import ArrayType  # noqa: PLC0415

    if flt is None:
        if use_payload_index is not False and tenant is None:
            from .payload_index import facet_from_index  # noqa: PLC0415

            got = facet_from_index(spark, root, collection, key, limit)
            if got is not None:
                return got
        base = read_collection(spark, root, collection, tenant=tenant)
    else:
        cand, _ = _resolve_candidates(
            spark, root, collection, flt, use_payload_index, max_candidates)
        base = (_scope_tenant(root, collection, cand, tenant)
                if cand is not None else
                read_collection(spark, root, collection, tenant=tenant)
                .filter(as_filter(flt).to_column()))
    meta = collection_meta(root, collection) or {}
    id_col = meta.get("id_col", "id")
    dtype = base.select(F.col(key)).schema[0].dataType
    if isinstance(dtype, ArrayType):
        # per-element counts, each point once per DISTINCT element — the
        # exact shape the array payload index stores as postings
        vals = (base.select(F.col(id_col),
                            F.explode(F.col(key)).alias("value"))
                .distinct())
    else:
        vals = base.select(F.col(key).alias("value"))
    return (vals.filter(F.col("value").isNotNull())
            .groupBy("value")
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.desc("count"), F.asc("value"))
            .limit(limit))


def scroll_points(spark: SparkSession, root: str, collection: str,
                  flt=None, limit: int = 20,
                  order_by: str | None = None,
                  cursor: tuple | None = None,
                  use_payload_index: str | bool = "auto",
                  max_candidates: int = 1_000_000,
                  tenant: str | None = None,
                  descending: bool = False,
                  start_from=None,
                  with_payload: bool | list = True,
                  with_vectors: bool | list = False,
                  return_cursor: bool = False):
    """Qdrant ``scroll``: filtered pagination with a KEYSET cursor (no
    OFFSET rescans).  Default order is by id; ``order_by`` pages by a
    payload field with an (value, id) composite cursor — the id tiebreak
    keeps the cursor total when values repeat.  ``cursor`` is the last
    row of the previous page: ``(id,)`` for id order, ``(value, id)``
    for order_by.  The cursor inequality is part of the pushed filter,
    so page N+1's scan prunes everything at or before the cursor.
    ``descending`` flips the order_by direction (Qdrant's
    ``OrderBy(direction=DESC)`` — newest-first paging); the value leg of
    the cursor inequality flips with it while the id tiebreak stays
    ascending, keeping the composite order total either way.
    ``start_from`` (Qdrant ``OrderBy.start_from``) begins the scroll at
    the given order_by value INCLUSIVE (``>=`` asc / ``<=`` desc) — a
    pushed predicate, so with a range payload index on the column the
    scan opens mid-collection instead of at its edge; rows with a NULL
    order_by value never match it (both engines' comparison semantics),
    matching Qdrant's skip-missing-key behavior under start_from.

    Page shape follows Qdrant's return flags: ``with_payload`` (default
    True — scroll is the payload-reading API) keeps the payload columns,
    a list keeps exactly those; ``with_vectors`` (default False —
    vectors are heavy) adds the named spaces' stored columns back.  The
    id column is always present.

    ``return_cursor=True`` returns ``(page_df, next_cursor)`` — the
    Qdrant ``(points, next_page_offset)`` pair: ``next_cursor`` is the
    LAST ROW'S key in this scroll's cursor convention (pass it straight
    back as ``cursor=``), or None when the page came back short (the
    scroll is exhausted).  The page materializes once (it is ≤ ``limit``
    rows by construction) so deriving the cursor costs no second scan."""
    meta = collection_meta(root, collection) or {}
    id_col = meta.get("id_col", "id")
    page, resolution = None, None
    if order_by is not None and tenant is None and use_payload_index \
            is not False and (
            start_from is not None
            or (cursor is not None and cursor[0] is not None)):
        # keyset-over-index (VERDICT r8 next #6), tried BEFORE any scan
        # plan is built: with a fresh RANGE index on the order_by
        # column, the page's ids come from the value-ordered postings —
        # the cursor's bucket window opens mid-collection, no full
        # sort.  Routable only when the keyset predicates provably
        # exclude NULL order values (the postings never hold them): a
        # non-NULL cursor leg or a start_from bound; the probe declines
        # (None) on anything it cannot answer exactly and the scan
        # below settles it.  A FILTER composes when it resolves to an
        # EXACT id set (empty residual): the candidates semi-join
        # inside each pruned bucket window — filter and order in one
        # plan, nothing sorted but the page; the probe result is
        # cached in ``resolution`` so a fallback never re-probes.
        from .payload_index import range_ordered_page  # noqa: PLC0415

        cand_ids, routable = None, True
        if flt is not None:
            ids_r, residual = filter_match_ids(spark, root,
                                               collection, flt)
            resolution = (ids_r, residual, None)
            if ids_r is None or residual != Filter() \
                    or has_literal_id_leaves(flt):
                # a residual (or HasId ghosts) would need a fetch +
                # re-page — the scan settles those exactly
                routable = False
            else:
                # selectivity guard (ADVICE r9): a non-selective id set
                # would semi-join into every geometric widening round
                # where the pushed-predicate scan wins outright.  The
                # capped count is exact whenever it is <= the cap, so
                # it feeds the fallback's resolution as n_pre too — the
                # scan path never re-counts.  A set that passes the
                # guard is provably bounded, so materialize it ONCE
                # (capped driver roundtrip, lazy fallback past the
                # internal cap) — the widening loop and the final page
                # then reuse rows instead of re-running the posting
                # probe per consumer (r10 review finding).
                n_cand = ids_r.limit(max_candidates + 1).count()
                if n_cand > max_candidates:
                    resolution = (ids_r, residual, n_cand)
                    routable = False
                else:
                    from .upsert import materialize_small  # noqa: PLC0415

                    ids_r = materialize_small(spark, ids_r)
                    resolution = (ids_r, residual, n_cand)
                    cand_ids = ids_r
        if routable:
            coll = read_collection(spark, root, collection)
            id_type = coll.schema[id_col].dataType.simpleString()
            got = range_ordered_page(
                spark, root, collection, order_by, limit,
                descending=descending, cursor=cursor,
                start_from=start_from, id_type=id_type,
                candidate_ids=cand_ids)
            if got is not None:
                rows = read_rows_for_ids(spark, root, collection, got)
                order = (F.desc(order_by) if descending
                         else F.asc(order_by))
                page = (coll.limit(0) if rows is None
                        else rows.orderBy(order, F.asc(id_col))
                        .limit(limit))
    if page is None:
        if flt is None:
            base = read_collection(spark, root, collection, tenant=tenant)
        else:
            cand, _ = _resolve_candidates(
                spark, root, collection, flt, use_payload_index,
                max_candidates, resolution=resolution)
            base = (_scope_tenant(root, collection, cand, tenant)
                    if cand is not None else
                    read_collection(spark, root, collection, tenant=tenant)
                    .filter(as_filter(flt).to_column()))
    if page is not None:
        pass  # index-answered
    elif order_by is None:
        if start_from is not None:
            raise ValueError("start_from needs order_by (Qdrant's "
                             "OrderBy.start_from lives on the order key)")
        if cursor is not None:
            base = base.filter(F.col(id_col) < F.lit(cursor[0])
                               if descending
                               else F.col(id_col) > F.lit(cursor[0]))
        page = base.orderBy(F.desc(id_col) if descending
                            else F.asc(id_col)).limit(limit)
    else:  # the order_by scan path (exact for every case)
        if start_from is not None:
            base = base.filter(F.col(order_by) <= F.lit(start_from)
                               if descending
                               else F.col(order_by) >= F.lit(start_from))
        if cursor is not None:
            c_val, c_id = cursor
            # NULL-aware keyset: NULL values sort FIRST asc / LAST
            # desc (Spark's default), so a cursor that lands on a
            # NULL row must hand the next page the non-NULL tail
            # (asc) or the rest of the NULL run (desc) — a plain
            # (v > NULL) predicate is all-NULL and would silently
            # end the scroll early
            if c_val is None:
                beyond = (F.lit(False) if descending
                          else F.col(order_by).isNotNull())
                same = F.col(order_by).isNull()
            else:
                beyond = (F.col(order_by) < F.lit(c_val)
                          if descending
                          else F.col(order_by) > F.lit(c_val))
                if descending:
                    # the NULL tail comes after every non-NULL value
                    beyond = beyond | F.col(order_by).isNull()
                same = F.col(order_by) == F.lit(c_val)
            base = base.filter(
                beyond | (same & (F.col(id_col) > F.lit(c_id))))
        order = F.desc(order_by) if descending else F.asc(order_by)
        page = base.orderBy(order, F.asc(id_col)).limit(limit)

    cols = _shape_columns(meta, page.columns, collection,
                          with_payload, with_vectors)
    if not return_cursor:
        return page.select(*cols)
    # collect only the returned columns (+ the cursor key) — the page
    # may carry undisplayed vector columns that with_vectors=False
    # excludes; shipping them to the driver and back is pure waste
    cur_cols = list(cols)
    if order_by is not None and order_by not in cur_cols:
        cur_cols.append(order_by)
    slim = page.select(*cur_cols)
    rows = slim.collect()
    next_cursor = None
    if rows and len(rows) == limit:
        last = rows[-1]
        next_cursor = ((last[id_col],) if order_by is None
                       else (last[order_by], last[id_col]))
    local = (spark.createDataFrame(rows, slim.schema) if rows
             else slim.limit(0))
    return local.select(*cols), next_cursor


def _group_topk(scored: DataFrame, ascending: bool,
                k_groups: int, group_size: int) -> DataFrame:
    """The two-window group ranking shared by ``search_groups`` and
    ``recommend_groups``: rank-in-group over (qid, group) cuts each group
    to ``group_size`` hits, then groups rank by their BEST hit's score
    (ties by group value) and only the top ``k_groups`` survive.  Input
    is the scored frame (qid, vec_id, group, sim); nothing here scales
    with the corpus — only with |distinct groups| · group_size."""
    from pyspark.sql import Window  # noqa: PLC0415

    order = F.asc("sim") if ascending else F.desc("sim")
    w_in = Window.partitionBy("qid", "group").orderBy(order, F.asc("vec_id"))
    top_in = (scored.withColumn("rank_in_group", F.row_number().over(w_in))
              .filter(F.col("rank_in_group") <= group_size))
    # each group's representative score is its best hit's (rank_in_group 1)
    w_grp = Window.partitionBy("qid", "group")
    best = (F.min("sim").over(w_grp) if ascending
            else F.max("sim").over(w_grp))
    ranked = top_in.withColumn("_best", best)
    g_order = [F.asc("_best") if ascending else F.desc("_best"),
               F.asc("group")]
    w_rank = Window.partitionBy("qid").orderBy(*g_order)
    return (ranked.withColumn("group_rank", F.dense_rank().over(w_rank))
            .filter(F.col("group_rank") <= k_groups)
            .select("qid", "group", "group_rank", "vec_id", "sim",
                    "rank_in_group"))


def search_groups(spark: SparkSession, root: str, collection: str,
                  queries: DataFrame, group_by: str,
                  k_groups: int = 5, group_size: int = 3,
                  flt=None, vector_name: str | None = None,
                  query_id: str = "qid", query_vec: str = "qvec",
                  round_to: int | None = 6,
                  tenant: str | None = None,
                  _exclude_ids: list[str] | None = None) -> DataFrame:
    """Grouped kNN — the Qdrant ``search_groups`` / ``query_groups`` API:
    per query, the best ``k_groups`` groups (a group = one distinct value
    of the ``group_by`` payload key), each carrying its own top
    ``group_size`` hits.  The use case is result diversification: top
    documents per SOURCE, best chunk per parent document, one hit per
    product — instead of one dominant group filling the whole top-k.

    Returns (qid, group, group_rank, vec_id, sim, rank_in_group); groups
    rank by their BEST hit's score (ties by group value), hits within a
    group by score (ties by id) — all deterministic.

    Physical shape: one pushed-filter corpus scan scores every (query,
    point) pair exactly like the exact kNN (broadcast queries, no corpus
    shuffle), then TWO windows: rank-in-group over (qid, group) cuts to
    ``group_size`` rows per group, and a dense group ranking over the
    surviving ≤ |groups|·group_size rows picks the best ``k_groups``.
    Nothing after the scan scales with the corpus — only with the number
    of distinct groups."""
    from ..functions import vector  # noqa: PLC0415

    meta, id_col, vector_name, metric = _resolve_search_space(
        root, collection, vector_name)
    corpus = read_collection(spark, root, collection, tenant=tenant)
    if flt is not None:
        corpus = corpus.filter(as_filter(flt).to_column())
    if _exclude_ids:  # recommend_groups: example ids never appear as hits
        corpus = corpus.filter(
            ~F.col(id_col).cast("string").isin(list(_exclude_ids)))
    # Qdrant's search_groups excludes points MISSING the group_by key —
    # a NULL group must never consume a k_groups slot (and under euclid's
    # ascending order it would otherwise sort first on ties)
    corpus = (corpus.filter(F.col(group_by).isNotNull())
              .select(F.col(id_col).alias("vec_id"),
                      F.col(vector_name).alias("_cv"),
                      F.col(group_by).alias("group")))

    q = queries.select(F.col(query_id).alias("qid"),
                       F.col(query_vec).alias("qvec"))
    if metric == "cosine":
        q = q.withColumn("_qn", vector.l2_norm(F.col("qvec")))
        corpus = corpus.withColumn("_cn", vector.l2_norm(F.col("_cv")))
        pairs = corpus.join(F.broadcast(q), how="cross")
        denom = F.col("_qn") * F.col("_cn")
        sim = F.when(denom != 0.0,
                     vector.dot(F.col("qvec"), F.col("_cv")) / denom)
        ascending = False
    elif metric == "dot":
        pairs = corpus.join(F.broadcast(q), how="cross")
        sim = vector.dot(F.col("qvec"), F.col("_cv"))
        ascending = False
    else:  # euclid / manhattan (both rank ascending)
        pairs = corpus.join(F.broadcast(q), how="cross")
        sim = (vector.l1_distance(F.col("qvec"), F.col("_cv"))
               if metric == "manhattan"
               else vector.l2_distance(F.col("qvec"), F.col("_cv")))
        ascending = True
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = (pairs.select("qid", "vec_id", "group", sim.alias("sim"))
              .filter(F.col("sim").isNotNull() & ~F.isnan("sim")))
    return _group_topk(scored, ascending, k_groups, group_size)


def _resolve_lookup(root: str, collection: str, meta: dict,
                    vector_name: str | None,
                    lookup_from_collection: str | None,
                    lookup_from_vector: str | None
                    ) -> tuple[str, bool, dict, str]:
    """Qdrant ``LookupLocation`` resolution shared by
    :func:`query_points` and :func:`recommend_points`:
    ``(lk_coll, same_coll, lk_meta, lk_vec)``.  Defaults to this
    collection / the searched space; validates the resolved space IS
    declared in the lookup collection.  Shape requirements differ per
    caller (query matches the searched space's shape, recommend needs
    dense) and stay with them."""
    lk_coll = lookup_from_collection or collection
    same_coll = lk_coll == collection
    lk_meta = meta if same_coll else (collection_meta(root, lk_coll) or {})
    lk_vectors = lk_meta.get("vectors", {})
    lk_vec = lookup_from_vector or (vector_name if same_coll else None)
    if lk_vec is None:
        if len(lk_vectors) != 1:
            raise ValueError(
                f"lookup collection {lk_coll!r} declares "
                f"{sorted(lk_vectors)} vector spaces; pass "
                f"lookup_from_vector")
        lk_vec = next(iter(lk_vectors))
    if lk_vec not in lk_vectors:
        raise ValueError(
            f"lookup_from_vector {lk_vec!r} is not a declared space of "
            f"{lk_coll!r} (has {sorted(lk_vectors)})")
    return lk_coll, same_coll, lk_meta, lk_vec


def query_points(spark: SparkSession, root: str, collection: str,
                 query=None, prefetch=None, fusion: str = "rrf",
                 k: int = 10, flt=None, vector_name: str | None = None,
                 use_payload_index: str | bool = "auto",
                 tenant: str | None = None,
                 score_threshold: float | None = None,
                 offset: int = 0,
                 use_index: str | bool = "auto",
                 n_probe: int | None = None,
                 rerank_factor: int = 5,
                 round_to: int = 6,
                 lookup_from_collection: str | None = None,
                 lookup_from_vector: str | None = None,
                 with_payload: bool | list = False,
                 with_vectors: bool | list = False) -> DataFrame:
    """The unified Query API entry (Qdrant ``query_points``), dispatching
    on the query's shape:

    - ``query`` a **DataFrame** of (qid, qvec): plain (filtered) kNN —
      defers to :func:`search_points`;
    - ``query`` a **point id** (int/str): query BY STORED POINT — the
      point's vector is fetched through the store's static id-bucket
      filter and used as the query (its own id is excluded from results,
      Qdrant's lookup semantics);
    - ``prefetch`` a list (with ``fusion`` = 'rrf' | 'dbsf'): a fusion
      tree — defers to :func:`fuse_prefetch`; each element is a ranked
      DataFrame, a nested fusion dict, or (round 11) a TYPED QUERY NODE
      (``{'recommend': ...}`` / ``{'discover': ...}`` /
      ``{'context': ...}`` / ``{'nearest': vector-or-id}`` /
      ``{'text': ...}`` stored-BM25 / ``{'formula': ..., 'prefetch':
      [...]}``) resolved against THIS collection with per-node
      ``limit``/``filter``/``using`` — the full Qdrant
      ``query_points(prefetch=[Prefetch(query=RecommendQuery...)],
      query=FusionQuery(...))`` tree as one serializable payload;
    - ``query`` a **dict node** (Qdrant's typed query inputs):
      ``{'formula': ...}`` rescores prefetch candidates,
      ``{'recommend': {'positive': [...], 'negative': [...],
      'strategy': ...}}`` → :func:`recommend_points`,
      ``{'discover': {'target': ..., 'context': [(p, n), ...]}}`` →
      :func:`discover_points`, ``{'context': [(p, n), ...]}`` →
      :func:`context_points`, ``{'sample': 'random' | seed}`` →
      :func:`sample_points` — with ``offset`` / ``score_threshold`` /
      ``with_payload`` / ``with_vectors`` applied as post-rank shaping.

    Exactly one of ``query`` / ``prefetch`` must be given.

    ``use_index`` / ``n_probe`` / ``rerank_factor`` are the
    :func:`search_points` ANN knobs, threaded through on both kNN
    shapes (DataFrame and by-id); they don't apply to ``prefetch``
    fusion, whose branches are already-ranked caller plans.

    ``lookup_from_collection`` / ``lookup_from_vector`` (Qdrant
    ``LookupLocation``) resolve a by-id ``query`` from ANOTHER
    collection / named space — the "recommend by a point stored
    elsewhere" pattern; the point id is excluded from results only when
    the lookup collection IS the searched one (ids from a different
    collection are a different namespace, Qdrant's semantics).  The
    lookup space's shape must match the searched space's (multivector
    with multivector, dense with dense).
    """
    if isinstance(query, dict):
        _kinds = ({"formula", "recommend", "discover", "context",
                   "sample", "nearest"} & set(query))
        if len(_kinds) != 1:
            raise ValueError(
                "query_points dict query must carry exactly one of "
                "'formula', 'recommend', 'discover', 'context', "
                f"'sample', 'nearest'; got {sorted(query)}")
        _extra = sorted(set(query) - _kinds
                        - ({"defaults"} if "formula" in query else set()))
        if _extra:
            # at the TOP level, limit/filter/using/score_threshold are
            # the query_points ARGUMENTS — a sibling key in the dict
            # (valid on a prefetch LEAF) would be silently dropped here
            raise ValueError(
                f"query_points dict query has sibling keys {_extra} — "
                "pass k/flt/vector_name/score_threshold as query_points "
                "arguments (per-node keys apply to prefetch leaves)")
    if isinstance(query, dict) and "formula" in query:
        # Qdrant query=FormulaQuery(formula=..., defaults=...) WITH
        # prefetch: rescore the union of prefetch candidates by the
        # compiled formula (operators/formula.py)
        from .formula import formula_rescore  # noqa: PLC0415

        if not prefetch:
            raise ValueError(
                "query_points(query={'formula': ...}) needs prefetch= — "
                "formula rescoring draws its candidates from the "
                "prefetch branches (Qdrant's FormulaQuery contract)")
        if flt is not None or tenant is not None:
            raise ValueError(
                "formula rescoring scores CALLER-BUILT prefetch branches "
                "— apply query_filter/tenant scope inside each branch")
        out = formula_rescore(
            spark, root, collection, list(prefetch), query["formula"],
            defaults=query.get("defaults"), k=k + int(offset),
            round_to=round_to)
        if offset:
            out = (out.filter(F.col("rank") > offset)
                   .withColumn("rank", F.col("rank") - F.lit(int(offset))))
        if score_threshold is not None:
            out = out.filter(F.col("score") >= float(score_threshold))
        if with_payload:
            out = attach_payload(spark, root, collection, out,
                                 with_payload, id_col_out="id")
        if with_vectors:
            out = attach_vectors(spark, root, collection, out,
                                 with_vectors, id_col_out="id")
        return out
    if isinstance(query, dict) and "nearest" in query:
        # Qdrant NearestQuery node.  WITH prefetch this is the Query
        # API's two-stage shape — the branches retrieve, the nearest
        # query RESCORES their candidate union (rescore_by_nearest);
        # without prefetch it is sugar for query=<vector-or-id>.
        spec = query["nearest"]
        if prefetch is None:
            qdf = (_vec_query_df(spark, spec)
                   if isinstance(spec, (list, tuple))
                   else spec)  # stored point id — the by-id path below
            return query_points(
                spark, root, collection, query=qdf, k=k, flt=flt,
                vector_name=vector_name,
                use_payload_index=use_payload_index, tenant=tenant,
                score_threshold=score_threshold, offset=offset,
                use_index=use_index, n_probe=n_probe,
                rerank_factor=rerank_factor, round_to=round_to,
                lookup_from_collection=lookup_from_collection,
                lookup_from_vector=lookup_from_vector,
                with_payload=with_payload, with_vectors=with_vectors)
        if tenant is not None:
            raise ValueError(
                "query_points(prefetch=..., query={'nearest': ...}) "
                "can't scope tenant= — the prefetch branches retrieve "
                "tenant-UNscoped, so a post-hoc tenant cut would "
                "silently change which k hits survive; scope each "
                "branch (e.g. a tenant-filtered ranked DataFrame) "
                "instead")
        out = rescore_by_nearest(
            spark, root, collection, list(prefetch), spec,
            k=k + int(offset), flt=flt, vector_name=vector_name,
            round_to=round_to,
            lookup_from_collection=lookup_from_collection,
            lookup_from_vector=lookup_from_vector)
        if offset:
            out = (out.filter(F.col("rank") > offset)
                   .withColumn("rank", F.col("rank") - F.lit(int(offset))))
        if score_threshold is not None:
            _, _, _, _m = _resolve_search_space(
                root, collection, vector_name)
            out = out.filter(_native_cut(F.col("score"),
                                         score_threshold, _m))
        if with_payload:
            out = attach_payload(spark, root, collection, out,
                                 with_payload, id_col_out="vec_id")
        if with_vectors:
            out = attach_vectors(spark, root, collection, out,
                                 with_vectors, id_col_out="vec_id")
        return out
    if isinstance(query, dict):
        # Qdrant universal-API query NODES: RecommendInput /
        # DiscoverInput / ContextInput / SampleQuery — terminal queries
        # dispatching to their dedicated operators with the common
        # post-rank knobs (offset / score_threshold / with_payload /
        # with_vectors) applied here, exactly like the formula branch.
        kind = _kinds.pop()  # exactly one — validated above, pre-formula
        if prefetch is not None:
            raise ValueError(
                "query_points: recommend/discover/context/sample query "
                "nodes are terminal — they don't fuse prefetch= "
                "branches (embed the node IN the prefetch list instead: "
                "query_points(prefetch=[{'recommend': ...}, ...], "
                "fusion='rrf'))")
        n_pre = k + int(offset)
        if kind == "sample":
            spec = query["sample"]
            seed = "" if (spec is True or spec == "random") else str(spec)
            if offset:
                raise ValueError(
                    "query_points(sample=...) doesn't page — redraw "
                    "with a different seed instead")
            if score_threshold is not None:
                raise ValueError(
                    "score_threshold doesn't apply to a random sample")
            if with_payload or with_vectors:
                raise ValueError(
                    "query_points(sample=...) returns FULL stored rows "
                    "— with_payload/with_vectors shaping doesn't apply; "
                    "select columns on the result instead")
            return sample_points(
                spark, root, collection, n=k, seed=seed, flt=flt,
                use_payload_index=use_payload_index, tenant=tenant)
        if kind == "recommend":
            spec = query["recommend"]
            _check_spec_keys(spec, {"positive", "negative", "strategy",
                                    "lookup_from_collection",
                                    "lookup_from_vector"}, "recommend")
            strategy = spec.get("strategy", "average_vector")
            out = recommend_points(
                spark, root, collection,
                positive=list(spec.get("positive", [])),
                negative=list(spec.get("negative") or []),
                strategy=strategy,
                k=n_pre, flt=flt, vector_name=vector_name, tenant=tenant,
                round_to=round_to,
                lookup_from_collection=spec.get("lookup_from_collection",
                                                lookup_from_collection),
                lookup_from_vector=spec.get("lookup_from_vector",
                                            lookup_from_vector))
            score_col = "score"
            if score_threshold is not None \
                    and strategy == "average_vector":
                # average_vector IS a search by the synthetic vector, so
                # its score carries the metric's native order — on a
                # euclid/manhattan collection that is a DISTANCE ranked
                # ascending and the threshold is an UPPER bound (the
                # search_points cut at the top of this module); >= would
                # keep the worst hits.  best_score/sum_scores fold
                # negated distances (descending) so >= stays right.
                _, _, _, _m = _resolve_search_space(
                    root, collection, vector_name)
                if _m in ("euclid", "manhattan"):
                    out = out.filter(
                        F.col(score_col) <= float(score_threshold))
                    score_threshold = None
        elif kind == "discover":
            if score_threshold is not None:
                raise ValueError(
                    "score_threshold doesn't apply to discover — its "
                    "ranking is composite (ctx_wins first, target sim "
                    "second), so a sim floor is not a suffix cut of "
                    "the result")
            spec = query["discover"]
            _check_spec_keys(spec, {"target", "context",
                                    "lookup_from_collection",
                                    "lookup_from_vector"}, "discover")
            out = discover_points(
                spark, root, collection, target=spec.get("target"),
                context=list(spec.get("context", [])), k=n_pre, flt=flt,
                vector_name=vector_name, tenant=tenant, round_to=round_to,
                lookup_from_collection=spec.get("lookup_from_collection",
                                                lookup_from_collection),
                lookup_from_vector=spec.get("lookup_from_vector",
                                            lookup_from_vector))
            score_col = "sim"
        else:  # context
            out = context_points(
                spark, root, collection, context=list(query["context"]),
                k=n_pre, flt=flt, vector_name=vector_name, tenant=tenant,
                round_to=round_to,
                lookup_from_collection=lookup_from_collection,
                lookup_from_vector=lookup_from_vector)
            score_col = "ctx_score"
        if offset:
            out = (out.filter(F.col("rank") > offset)
                   .withColumn("rank", F.col("rank") - F.lit(int(offset))))
        if score_threshold is not None:
            out = out.filter(F.col(score_col) >= float(score_threshold))
        if with_payload:
            out = attach_payload(spark, root, collection, out,
                                 with_payload, id_col_out="vec_id")
        if with_vectors:
            out = attach_vectors(spark, root, collection, out,
                                 with_vectors, id_col_out="vec_id")
        return out
    if (query is None) == (prefetch is None):
        raise ValueError("query_points takes exactly one of query= (a "
                         "DataFrame or a point id) or prefetch= (a fusion "
                         "tree)")
    if prefetch is not None:
        if flt is not None or tenant is not None:
            raise ValueError(
                "query_points(prefetch=...) fuses CALLER-BUILT ranked "
                "branches — a query_filter/tenant scope must be applied "
                "inside each prefetch branch (e.g. search_points(flt=...)"
                "), not to the fused list, where it would silently change "
                "which k hits survive fusion")
        out = fuse_prefetch({"fusion": fusion, "k": k + int(offset),
                             "prefetch": list(prefetch)},
                            round_to=round_to,
                            spark=spark, root=root, collection=collection)
        # the search params apply to the FUSED ranking (Qdrant applies
        # limit/offset/threshold after fusion): rrf/dbsf scores both
        # rank descending, so the threshold is a lower bound
        if offset:
            out = (out.filter(F.col("rank") > offset)
                   .withColumn("rank", F.col("rank") - F.lit(int(offset))))
        if score_threshold is not None:
            out = out.filter(F.col("score") >= float(score_threshold))
        if with_payload:
            out = attach_payload(spark, root, collection, out,
                                 with_payload, id_col_out="id")
        if with_vectors:
            out = attach_vectors(spark, root, collection, out,
                                 with_vectors, id_col_out="id")
        return out
    if isinstance(query, DataFrame):
        return search_points(spark, root, collection, query, flt=flt, k=k,
                             vector_name=vector_name, round_to=round_to,
                             use_payload_index=use_payload_index,
                             tenant=tenant, score_threshold=score_threshold,
                             offset=offset, use_index=use_index,
                             n_probe=n_probe, rerank_factor=rerank_factor,
                             with_payload=with_payload,
                             with_vectors=with_vectors)
    # query by stored point id
    meta = collection_meta(root, collection) or {}
    id_col = meta.get("id_col", "id")
    vectors = meta.get("vectors", {})
    if vector_name is None:
        if len(vectors) != 1:
            raise ValueError(
                f"collection {collection!r} declares {sorted(vectors)} "
                f"vector spaces; pass vector_name")
        vector_name = next(iter(vectors))
    # LookupLocation: the id resolves in the lookup collection/space
    # (defaults: this collection, the searched space)
    lk_coll, same_coll, lk_meta, lk_vec = _resolve_lookup(
        root, collection, meta, vector_name,
        lookup_from_collection, lookup_from_vector)
    lk_vectors = lk_meta.get("vectors", {})
    tgt_mv = vectors.get(vector_name, {}).get("multivector") is not None
    lk_mv = lk_vectors.get(lk_vec, {}).get("multivector") is not None
    if tgt_mv != lk_mv:
        raise ValueError(
            f"lookup space {lk_coll!r}/{lk_vec!r} is "
            f"{'multivector' if lk_mv else 'dense'} but the searched "
            f"space {collection!r}/{vector_name!r} is "
            f"{'multivector' if tgt_mv else 'dense'}; query shapes "
            f"can't mix")
    lk_id_col = lk_meta.get("id_col", "id")
    ids = spark.createDataFrame([(str(query),)], "`_q_id` string")
    rows = read_rows_for_ids(spark, root, lk_coll, ids)
    got = ([] if rows is None else
           rows.select(lk_id_col, lk_vec).limit(2).collect())
    if not got:
        raise ValueError(
            f"query_points: no point with id {query!r} in {lk_coll!r}")
    v = got[0][lk_vec]
    if v is None or len(v) == 0:
        raise ValueError(
            f"query_points: point {query!r} has no vector in space "
            f"{lk_vec!r} (deleted via delete_vectors?); query by "
            f"a point that carries the space, or pass an explicit query "
            f"DataFrame")
    if tgt_mv:
        # multivector space (declared in the collection meta): query
        # with the nested shape — max-sim scoring dispatches downstream
        qdf = spark.createDataFrame(
            [(got[0][lk_id_col], [list(t) for t in v])],
            "qid string, qvec array<array<double>>")
    else:
        qdf = spark.createDataFrame(
            [(got[0][lk_id_col], list(v))],
            "qid string, qvec array<double>")
    from pyspark.sql import Window  # noqa: PLC0415

    out = search_points(spark, root, collection, qdf, flt=flt,
                        k=k + 1 + int(offset),
                        vector_name=vector_name, round_to=round_to,
                        use_payload_index=use_payload_index, tenant=tenant,
                        score_threshold=score_threshold,
                        use_index=use_index, n_probe=n_probe,
                        rerank_factor=rerank_factor)
    # Qdrant excludes the looked-up point itself from its own results —
    # but ONLY when the lookup collection is the searched one (an id
    # from another collection is another namespace): over-fetch by one,
    # drop self, close the rank gap (offset applies AFTER the
    # self-drop, so page boundaries never shift by the self hit's
    # position)
    kept = (out.filter(F.col("vec_id").cast("string") != str(query))
            if same_coll else out)
    w = Window.partitionBy("qid").orderBy("rank")
    kept = (kept.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k + int(offset)))
    if offset:
        kept = (kept.filter(F.col("rank") > offset)
                .withColumn("rank", F.col("rank") - F.lit(int(offset))))
    if with_payload:
        kept = attach_payload(spark, root, collection, kept, with_payload)
    if with_vectors:
        kept = attach_vectors(spark, root, collection, kept, with_vectors)
    return kept


def sample_points(spark: SparkSession, root: str, collection: str,
                  n: int, seed: str = "", flt=None,
                  use_payload_index: str | bool = "auto",
                  max_candidates: int = 1_000_000,
                  tenant: str | None = None) -> DataFrame:
    """Qdrant ``query(sample=random)`` made REPRODUCIBLE: a deterministic
    pseudo-random draw of ``n`` points — order by ``md5(seed || '|' ||
    id)``, which is layout- and partition-invariant (the same ids on any
    cluster, any file order, any day), unlike ``rand()`` or
    ``TABLESAMPLE``.  Changing ``seed`` redraws.  Composes with the
    filter DSL and tenant scoping; the plan is one pushed-filter scan
    plus a TakeOrderedAndProject on the hash — no full sort
    materializes."""
    meta = collection_meta(root, collection) or {}
    id_col = meta.get("id_col", "id")
    if flt is None:
        base = read_collection(spark, root, collection, tenant=tenant)
    else:
        cand, _ = _resolve_candidates(
            spark, root, collection, flt, use_payload_index, max_candidates)
        base = (_scope_tenant(root, collection, cand, tenant)
                if cand is not None else
                read_collection(spark, root, collection, tenant=tenant)
                .filter(as_filter(flt).to_column()))
    order = F.md5(F.concat(F.lit(str(seed)), F.lit("|"),
                           F.col(id_col).cast("string")))
    return base.orderBy(order, F.col(id_col)).limit(n)


def search_points_mmr(spark: SparkSession, root: str, collection: str,
                      queries: DataFrame, k: int = 10, pool: int = 50,
                      lambda_: float = 0.5, flt=None,
                      vector_name: str | None = None,
                      query_id: str = "qid", query_vec: str = "qvec",
                      use_payload_index: str | bool = "auto",
                      tenant: str | None = None) -> DataFrame:
    """Diversified search: filtered kNN for a ``pool``-sized candidate
    set, then Maximal Marginal Relevance re-ranking picks ``k`` of them
    (λ trades relevance against novelty; λ=1 is the plain ranking).  The
    pool fetch is the ordinary distributed search; only pool-sized
    per-query frames enter the greedy pass (knn.mmr_rerank) — the corpus
    never does."""
    from .knn import mmr_rerank  # noqa: PLC0415

    meta = collection_meta(root, collection) or {}
    id_col = meta.get("id_col", "id")
    vectors = meta.get("vectors", {})
    if vector_name is None:
        if len(vectors) != 1:
            raise ValueError(
                f"collection {collection!r} declares {sorted(vectors)} "
                f"vector spaces; pass vector_name")
        vector_name = next(iter(vectors))
    from .upsert import materialize_small  # noqa: PLC0415

    cand = materialize_small(spark, search_points(
        spark, root, collection, queries, flt=flt, k=pool,
        vector_name=vector_name, query_id=query_id, query_vec=query_vec,
        use_payload_index=use_payload_index, tenant=tenant))
    # the pool search executes ONCE (pool·|queries| rows materialize via
    # the capped driver roundtrip — no persist leak, no re-execution)
    # and the pool vectors fetch through the store's static id-bucket
    # filter (read_rows_for_ids) — never a second collection scan
    rows = read_rows_for_ids(spark, root, collection,
                             cand.select("vec_id").distinct(), tenant=tenant)
    if rows is None:  # empty pool / empty store
        rows = read_collection(spark, root, collection).limit(0)
    withvec = (rows.select(F.col(id_col).alias("vec_id"),
                           F.col(vector_name).alias("cvec"))
               .join(F.broadcast(cand.select("qid", "vec_id", "sim")),
                     "vec_id"))
    return mmr_rerank(withvec, k=k, lambda_=lambda_)


def _resolve_search_space(root: str, collection: str,
                          vector_name: str | None):
    """Resolve the searched dense space — the boilerplate shared by
    search_groups / recommend_points / recommend_groups / the
    discover-context scan: collection meta, id column, the (only or
    named) vector space, and its declared metric.
    Returns (meta, id_col, vector_name, metric)."""
    from .knn import resolve_metric  # noqa: PLC0415

    meta = collection_meta(root, collection) or {}
    id_col = meta.get("id_col", "id")
    vectors = meta.get("vectors", {})
    if vector_name is None:
        if len(vectors) != 1:
            raise ValueError(
                f"collection {collection!r} declares {sorted(vectors)} "
                f"vector spaces; pass vector_name")
        vector_name = next(iter(vectors))
    metric = resolve_metric(
        vectors.get(vector_name, {}).get("distance", "cosine"))
    return meta, id_col, vector_name, metric


def _fetch_example_vectors(spark: SparkSession, root: str, collection: str,
                           meta: dict, vector_name: str, ex_ids: list[str],
                           lookup_from_collection: str | None,
                           lookup_from_vector: str | None,
                           caller: str = "recommend_points",
                           metric: str | None = None):
    """Resolve example POINT IDS to their stored dense vectors (Qdrant
    ``lookup_from`` semantics) — the shared head of recommend_points /
    recommend_groups.  The ids fetch through the store's static id-bucket
    filter (``read_rows_for_ids`` — O(|examples|), never a scan); missing
    ids and ids whose vector was removed from the space both raise.
    Returns ``(got: {id → list[float]}, same_coll)``."""
    lk_coll, same_coll, lk_meta, lk_vec = _resolve_lookup(
        root, collection, meta, vector_name,
        lookup_from_collection, lookup_from_vector)
    if lk_meta.get("vectors", {}).get(lk_vec, {}) \
            .get("multivector") is not None:
        raise ValueError(
            f"{caller} examples need a DENSE space; {lk_coll!r}/"
            f"{lk_vec!r} is multivector")
    lk_id_col = lk_meta.get("id_col", "id")
    ids_df = spark.createDataFrame([(i,) for i in ex_ids], "`_r_id` string")
    rows = read_rows_for_ids(spark, root, lk_coll, ids_df)
    fetched = {} if rows is None else {
        str(r[lk_id_col]): r[lk_vec]
        for r in rows.select(lk_id_col, lk_vec).collect()}
    missing = [i for i in ex_ids if i not in fetched]
    if missing:
        raise ValueError(
            f"{caller}: example ids {missing} not in {lk_coll!r}")
    nulled = [i for i, v in fetched.items() if v is None or len(v) == 0]
    if nulled:
        raise ValueError(
            f"{caller}: example ids {nulled} have no vector in "
            f"space {lk_vec!r} (deleted via delete_vectors?); pick "
            f"examples that carry the space")
    if metric is not None:
        # a NaN example component poisons its sim/distance to EVERY
        # point (all candidates drop silently); a zero-norm example
        # additionally has no cosine to anything — refuse both up front
        bad_nan = [i for i, v in fetched.items()
                   if any(x != x for x in v)]
        if bad_nan:
            raise ValueError(
                f"{caller}: example ids {bad_nan} have NaN components "
                "— they can't be compared to anything")
        if metric == "cosine":
            bad = [i for i, v in fetched.items()
                   if not any(x != 0.0 for x in v)]
            if bad:
                raise ValueError(
                    f"{caller}: example ids {bad} have zero norm — "
                    "cosine can't compare them to anything")
    return {i: list(v) for i, v in fetched.items()}, same_coll


def _mean_example_query(got: dict, positive: list, negative: list):
    """The average_vector strategy's synthetic query: mean(positives) −
    mean(negatives), folded driver-side in example order (the fold order
    is part of the oracle contract — engines must add the same way)."""
    dim = len(got[str(positive[0])])
    qv = [0.0] * dim
    for i in positive:
        for j, x in enumerate(got[str(i)]):
            qv[j] += x / len(positive)
    for i in negative:
        for j, x in enumerate(got[str(i)]):
            qv[j] -= x / len(negative)
    return qv


def _reco_pair_scores(spark: SparkSession, c: DataFrame, got: dict,
                      positive: list, negative: list, strategy: str,
                      metric: str, round_to: int,
                      keys: tuple = ()) -> DataFrame:
    """The shared example-pairs fold of recommend_points /
    recommend_groups: ``c`` is (vec_id, _cv, *keys); the examples
    broadcast with their signs and every candidate folds its pair sims —
    best_score keeps the RecoQuery max formula (best positive unless the
    best negative wins, then −best-negative²), sum_scores sums the
    per-pair sims (rounded BEFORE the sum so the fold is engine-stable).
    Metric-complete (r11): on a euclid/manhattan collection the per-pair
    "sim" is the NEGATED distance — Qdrant's internal score order for
    distance metrics, where RecoQuery's formula is defined on scores
    that compare larger-is-better — so best_score/sum_scores serve every
    declared ``Distance``; the returned score is that negated-distance
    fold (≤ 0, still ranked descending).  Plain −d, not upstream's
    internal −d² (euclid): through the formula the two are
    RANK-EQUIVALENT (bp>bn is invariant under the monotone square, and
    a bp-branch −d_a vs a bn-branch −d_b² compares like −d_a² vs −d_b⁴
    — squaring both sides), so orderings match upstream while the score
    value stays the interpretable negated distance.  Faithful quirk
    carried over: a near-clone of a NEGATIVE has bn ≈ 0, so its −(bn²)
    ≈ 0 outranks true positives' negative scores — RecoQuery's squaring
    fold assumes scores straddle zero (cosine-like); on distance
    metrics upstream behaves the same way.
    One broadcast row PER ROLE, not per unique id — an id listed both
    positive and negative contributes both roles (sum nets to 0, best
    gets bp == bn), matching the average_vector mean's netting.
    Returns (vec_id, *keys, score); unscorable points (NULL from a
    zero-norm cosine or a missing vector, NaN from a NaN component) are
    dropped — Qdrant skips points it cannot score.

    ZERO-shuffle physical shape (the _context_scan pattern): the
    examples fold into ONE broadcast row with a column per role, every
    score is a per-row projection over the corpus scan (best = greatest
    over the role sims — same NULL-skip / NaN-largest semantics as the
    max aggregate), and nothing shuffles before the caller's top-k /
    group windows.  Norms materialize once: each example's in the 1-row
    ref frame, the candidate's as a single ``_cn`` column."""
    from ..functions import vector  # noqa: PLC0415

    if strategy not in ("best_score", "sum_scores"):
        raise ValueError(
            f"unknown strategy {strategy!r} "
            f"(expected 'average_vector', 'best_score' or 'sum_scores')")
    roles = ([(f"_rp{i}", str(p), 1) for i, p in enumerate(positive)]
             + [(f"_rn{i}", str(n), -1) for i, n in enumerate(negative)])
    ref = spark.createDataFrame(
        [tuple(got[i] for _, i, _s in roles)],
        ", ".join(f"`{col}` array<double>" for col, _, _ in roles))
    if metric == "cosine":
        for col, _, _ in roles:
            ref = ref.withColumn(col + "_n", vector.l2_norm(F.col(col)))
        c = c.withColumn("_cn", vector.l2_norm(F.col("_cv")))
    joined = c.join(F.broadcast(ref), how="cross")

    def sim(col: str):
        if metric == "cosine":
            denom = F.col(col + "_n") * F.col("_cn")
            return F.when(denom != 0.0,
                          vector.dot(F.col(col), F.col("_cv")) / denom)
        if metric == "euclid":
            return -vector.l2_distance(F.col(col), F.col("_cv"))
        if metric == "manhattan":
            return -vector.l1_distance(F.col(col), F.col("_cv"))
        return vector.dot(F.col(col), F.col("_cv"))

    keys = list(keys)
    if strategy == "sum_scores":
        # per-role sims round BEFORE the sum (the discover convention)
        # so the fixed-order fold is engine-stable
        terms = [F.round(sim(col), round_to) * F.lit(s)
                 for col, _, s in roles]
        score = terms[0]
        for t in terms[1:]:
            score = score + t
    else:
        pos = [sim(col) for col, _, s in roles if s == 1]
        neg = [sim(col) for col, _, s in roles if s == -1]
        bp = pos[0] if len(pos) == 1 else F.greatest(*pos)
        if not neg:
            score = bp
        else:
            bn = neg[0] if len(neg) == 1 else F.greatest(*neg)
            score = F.when(bn.isNull() | (bp > bn),
                           bp).otherwise(-(bn * bn))
    return (joined.select("vec_id", *keys,
                          F.round(score, round_to).alias("score"))
            .filter(F.col("score").isNotNull() & ~F.isnan("score")))


def recommend_points(spark: SparkSession, root: str, collection: str,
                     positive: list, negative: list | None = None,
                     strategy: str = "average_vector", k: int = 10,
                     flt=None, vector_name: str | None = None,
                     round_to: int = 6,
                     tenant: str | None = None,
                     lookup_from_collection: str | None = None,
                     lookup_from_vector: str | None = None) -> DataFrame:
    """Qdrant ``recommend``: positive/negative POINT IDS (their stored
    vectors are the examples) with all three strategies:

    - ``average_vector`` (default): query = mean(positives) −
      mean(negatives), then one plain kNN — one query vector, built
      driver-side from ≤ |examples| fetched rows;
    - ``best_score``: each candidate scores ``max sim to any positive``,
      unless its best NEGATIVE beats its best positive — then the score
      is ``−(best negative)²``, pushing look-alikes of the negatives to
      the bottom (Qdrant's RecoQuery formula: squaring keeps a negative-
      dominated point at a non-positive score even when both best sims
      are negative, where a bare sign flip would promote it).  The
      examples broadcast; the corpus scans once — the exact-kNN plan
      shape with a wider broadcast side.
    - ``sum_scores``: each candidate scores ``Σ sim(c, pᵢ) − Σ sim(c,
      nⱼ)`` over ALL examples (Qdrant's third RecoQuery strategy) — the
      same broadcast-pairs scan as best_score with a sum fold instead of
      the max pair.  Per-pair sims round to ``round_to`` BEFORE the sum
      (the discover convention) so the fold is engine-stable, then the
      sum rounds once more.

    Every declared ``Distance`` is served (r11): on euclid/manhattan
    collections ``best_score``/``sum_scores`` fold NEGATED distances
    (Qdrant's internal score order — larger is better), so their
    returned score is ≤ 0 and ranks descending, while
    ``average_vector``'s score stays the metric's native order (a
    distance, ascending) because it IS a plain search.

    Example ids are excluded from the results (Qdrant semantics) — but
    only when they resolve in THIS collection:
    ``lookup_from_collection`` / ``lookup_from_vector`` (Qdrant
    ``RecommendRequest.lookup_from``) fetch the example vectors from
    another collection / named DENSE space instead, and ids from a
    different collection are a different namespace, so nothing is
    excluded.  Points that carry no vector in the searched space score
    NULL and are dropped (Qdrant skips them).  Returns
    (vec_id, score, rank).
    """
    from pyspark.sql import Window  # noqa: PLC0415

    negative = negative or []
    if not positive:
        raise ValueError("recommend_points needs at least one positive id")
    meta, id_col, vector_name, metric = _resolve_search_space(
        root, collection, vector_name)
    # LookupLocation: example ids resolve in the lookup collection/space
    ex_ids = [str(i) for i in positive] + [str(i) for i in negative]
    got, same_coll = _fetch_example_vectors(
        spark, root, collection, meta, vector_name, ex_ids,
        lookup_from_collection, lookup_from_vector, metric=metric)

    corpus = read_collection(spark, root, collection, tenant=tenant)
    if flt is not None:
        corpus = corpus.filter(as_filter(flt).to_column())
    if same_coll:
        corpus = corpus.filter(
            ~F.col(id_col).cast("string").isin(ex_ids))

    if strategy == "average_vector":
        from .knn import knn_join  # noqa: PLC0415

        qv = _mean_example_query(got, positive, negative)
        q = spark.createDataFrame([(0, qv)], "qid long, qvec array<double>")
        out = knn_join(q, corpus.select(id_col, vector_name), k=k,
                       corpus_id=id_col, corpus_vec=vector_name,
                       exclude_self=False, round_to=round_to, metric=metric)
        return out.select("vec_id", F.col("sim").alias("score"), "rank")
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      F.col(vector_name).alias("_cv"))
    scored = _reco_pair_scores(spark, c, got, positive, negative,
                               strategy, metric, round_to)
    topk = scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w))


def recommend_groups(spark: SparkSession, root: str, collection: str,
                     positive: list, group_by: str,
                     negative: list | None = None,
                     strategy: str = "average_vector",
                     k_groups: int = 5, group_size: int = 3,
                     flt=None, vector_name: str | None = None,
                     round_to: int = 6,
                     tenant: str | None = None,
                     lookup_from_collection: str | None = None,
                     lookup_from_vector: str | None = None) -> DataFrame:
    """Qdrant ``recommend_groups``: recommend-by-example scoring with the
    grouped result shape — the best ``k_groups`` distinct values of the
    ``group_by`` payload key, each carrying its own top ``group_size``
    recommendations.  All three recommend strategies:

    - ``average_vector``: the synthetic query (mean positives − mean
      negatives) runs through ``search_groups``' scan — the scoring and
      both ranking windows are literally the shared code;
    - ``best_score`` / ``sum_scores``: the broadcast example-pairs scan
      (``recommend_points``' shape) keeps the ``group_by`` column through
      the fold, then the same two-window group ranking cuts it.

    Example ids never appear as hits (when they resolve in THIS
    collection — ``lookup_from`` ids are a different namespace); points
    missing the ``group_by`` key never consume a slot (the
    ``search_groups`` contract).  Returns (group, group_rank, vec_id,
    score, rank_in_group) — group-major, deterministic ties."""

    negative = negative or []
    if not positive:
        raise ValueError("recommend_groups needs at least one positive id")
    meta, id_col, vector_name, metric = _resolve_search_space(
        root, collection, vector_name)
    ex_ids = [str(i) for i in positive] + [str(i) for i in negative]
    got, same_coll = _fetch_example_vectors(
        spark, root, collection, meta, vector_name, ex_ids,
        lookup_from_collection, lookup_from_vector,
        caller="recommend_groups", metric=metric)

    if strategy == "average_vector":
        qv = _mean_example_query(got, positive, negative)
        q = spark.createDataFrame([(0, qv)], "qid long, qvec array<double>")
        out = search_groups(
            spark, root, collection, q, group_by,
            k_groups=k_groups, group_size=group_size, flt=flt,
            vector_name=vector_name, round_to=round_to, tenant=tenant,
            _exclude_ids=ex_ids if same_coll else None)
        return out.select("group", "group_rank", "vec_id",
                          F.col("sim").alias("score"), "rank_in_group")
    corpus = read_collection(spark, root, collection, tenant=tenant)
    if flt is not None:
        corpus = corpus.filter(as_filter(flt).to_column())
    if same_coll:
        corpus = corpus.filter(
            ~F.col(id_col).cast("string").isin(ex_ids))
    c = (corpus.filter(F.col(group_by).isNotNull())
         .select(F.col(id_col).alias("vec_id"),
                 F.col(vector_name).alias("_cv"),
                 F.col(group_by).alias("group")))
    scored = (_reco_pair_scores(spark, c, got, positive, negative,
                                strategy, metric, round_to,
                                keys=("group",))
              .select(F.lit(0).alias("qid"), "vec_id", "group",
                      F.col("score").alias("sim")))
    out = _group_topk(scored, ascending=False,
                      k_groups=k_groups, group_size=group_size)
    return out.select("group", "group_rank", "vec_id",
                      F.col("sim").alias("score"), "rank_in_group")


def _example_vec(x, got: dict):
    """An example in discover/context calls is either a RAW VECTOR
    (list/tuple of numbers — used as-is) or a POINT ID (resolved through
    the store fetch in ``got``)."""
    if isinstance(x, (list, tuple)):
        return [float(v) for v in x]
    return got[str(x)]


def _discover_refs(spark: SparkSession, root: str, collection: str,
                   meta: dict, vector_name: str, examples: list,
                   lookup_from_collection: str | None,
                   lookup_from_vector: str | None, caller: str,
                   metric: str | None = None):
    """Resolve the id-shaped examples of a discover/context call to their
    stored vectors.  Returns ``(got, exclude_ids)`` — ``exclude_ids`` is
    the id list to drop from the corpus (empty when every example is a
    raw vector, or when they resolve in another collection).  ``metric``
    makes the fetch refuse NaN / zero-norm examples with an id-specific
    message (``_context_scan`` re-validates every resolved ref anyway —
    this is the earlier, clearer failure)."""
    ids_needed = [x for x in examples if not isinstance(x, (list, tuple))]
    if not ids_needed:
        return {}, []
    ex_ids = [str(i) for i in ids_needed]
    got, same_coll = _fetch_example_vectors(
        spark, root, collection, meta, vector_name, ex_ids,
        lookup_from_collection, lookup_from_vector, caller=caller,
        metric=metric)
    return got, (ex_ids if same_coll else [])


def _pair_sims(metric: str, ref_cols: list[str], round_to: int):
    """Per-ref similarity expressions for the discover/context scan —
    cosine or dot of the corpus vector column ``_cv`` against each
    broadcast ref column, ROUNDED before any comparison so the win/loss
    classification is engine-stable (the discover convention).  Norms
    are NOT re-folded here: the candidate norm is materialized once as
    ``_cn`` and each ref's norm once (in the 1-row ref frame) as
    ``<col>_n`` — with |pairs| refs the scan folds |refs| dots + ONE
    candidate norm per row, not 2·|refs| extra norm folds."""
    from ..functions import vector  # noqa: PLC0415

    def sim(col: str):
        if metric == "cosine":
            denom = F.col(col + "_n") * F.col("_cn")
            s = F.when(denom != 0.0,
                       vector.dot(F.col(col), F.col("_cv")) / denom)
        elif metric == "euclid":
            # negated distance: Qdrant's internal score order for
            # distance metrics — 'closer' compares larger, so the
            # win/loss classification and target ranking hold verbatim
            s = -vector.l2_distance(F.col(col), F.col("_cv"))
        elif metric == "manhattan":
            s = -vector.l1_distance(F.col(col), F.col("_cv"))
        else:  # dot
            s = vector.dot(F.col(col), F.col("_cv"))
        return F.round(s, round_to)
    return {c: sim(c) for c in ref_cols}


def _context_scan(spark: SparkSession, root: str, collection: str,
                  context: list, flt, vector_name: str | None,
                  round_to: int, tenant: str | None,
                  lookup_from_collection: str | None,
                  lookup_from_vector: str | None,
                  target=None, caller: str = "context_points"):
    """Shared scan for :func:`discover_points` / :func:`context_points`:
    one broadcast row carries the target and every (positive, negative)
    context pair; the corpus scans ONCE with per-row JVM expressions —
    |pairs| cosines per point, no shuffle, nothing scales with the pair
    count but the projection width."""

    if not context and target is None:
        raise ValueError(f"{caller} needs at least one (positive, "
                         "negative) context pair")
    meta, id_col, vector_name, metric = _resolve_search_space(
        root, collection, vector_name)
    examples = ([] if target is None else [target]) + \
        [x for pair in context for x in pair]
    got, exclude = _discover_refs(
        spark, root, collection, meta, vector_name, examples,
        lookup_from_collection, lookup_from_vector, caller, metric=metric)

    ref_cols, ref_vals = [], []
    if target is not None:
        ref_cols.append("_t")
        ref_vals.append(_example_vec(target, got))
    for i, (p, n) in enumerate(context):
        ref_cols += [f"_p{i}", f"_n{i}"]
        ref_vals += [_example_vec(p, got), _example_vec(n, got)]
    # a NaN reference component poisons every sim (all candidates drop
    # silently); a zero-norm reference additionally has no cosine to ANY
    # point — refuse both up front (driver-side lists, the check is free)
    for col, v in zip(ref_cols, ref_vals):
        bad_nan = any(x != x for x in v)
        bad_zero = metric == "cosine" and not any(x != 0.0 for x in v)
        if bad_nan or bad_zero:
            role = ("target" if col == "_t" else
                    f"context pair {col[2:]} "
                    f"{'positive' if col[1] == 'p' else 'negative'}")
            what = ("a NaN component" if bad_nan
                    else "zero norm — cosine can't compare it to anything")
            raise ValueError(f"{caller}: the {role} example has {what}")
    ref = spark.createDataFrame(
        [tuple(ref_vals)],
        ", ".join(f"`{c}` array<double>" for c in ref_cols))

    corpus = read_collection(spark, root, collection, tenant=tenant)
    if flt is not None:
        corpus = corpus.filter(as_filter(flt).to_column())
    if exclude:
        corpus = corpus.filter(
            ~F.col(id_col).cast("string").isin(exclude))
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      F.col(vector_name).alias("_cv"))
    if metric == "cosine":
        # materialize every norm ONCE: each ref's in the 1-row broadcast
        # frame, the candidate's as one _cn column per scanned row
        from ..functions import vector  # noqa: PLC0415

        for col in ref_cols:
            ref = ref.withColumn(col + "_n", vector.l2_norm(F.col(col)))
        c = c.withColumn("_cn", vector.l2_norm(F.col("_cv")))
    joined = c.join(F.broadcast(ref), how="cross")
    sims = _pair_sims(metric, ref_cols, round_to)
    return joined, sims, len(context)


def discover_points(spark: SparkSession, root: str, collection: str,
                    target, context: list, k: int = 10, flt=None,
                    vector_name: str | None = None, round_to: int = 6,
                    tenant: str | None = None,
                    lookup_from_collection: str | None = None,
                    lookup_from_vector: str | None = None) -> DataFrame:
    """Qdrant ``discover`` over a STORED collection: a target (point id
    or raw vector) plus (positive, negative) context pairs — points rank
    FIRST by how many pairs they sit on the positive side of (closer to
    the pair's positive than its negative), THEN by similarity to the
    target.  Id-shaped examples fetch through the store's id-bucket
    filter (``lookup_from`` resolves them from another collection /
    space) and are excluded from the results when they live in THIS
    collection (Qdrant's semantics).  Returns (vec_id, ctx_wins, sim,
    rank); sims round to ``round_to`` BEFORE comparison on both engines
    so the classification is stable.  Served on every declared
    ``Distance`` (r11): euclid/manhattan spaces compare NEGATED
    distances (Qdrant's score order), so 'closer to the positive' and
    'similar to the target' both keep their meaning — ``sim`` is then
    ≤ 0, still ranked descending."""
    from pyspark.sql import Window  # noqa: PLC0415

    if target is None:
        raise ValueError(
            "discover_points needs a target (point id or raw vector) — "
            "for target-less context search use context_points")
    joined, sims, n_pairs = _context_scan(
        spark, root, collection, context, flt, vector_name, round_to,
        tenant, lookup_from_collection, lookup_from_vector,
        target=target, caller="discover_points")
    wins = None
    for i in range(n_pairs):
        w = (sims[f"_p{i}"] > sims[f"_n{i}"]).cast("long")
        wins = w if wins is None else wins + w
    scored = (joined.select("vec_id",
                            (wins if wins is not None
                             else F.lit(0)).alias("ctx_wins"),
                            sims["_t"].alias("sim"))
              .filter(F.col("sim").isNotNull() & ~F.isnan("sim")))
    w = Window.orderBy(F.desc("ctx_wins"), F.desc("sim"), F.asc("vec_id"))
    return (scored.orderBy(F.desc("ctx_wins"), F.desc("sim"),
                           F.asc("vec_id"))
            .limit(k).withColumn("rank", F.row_number().over(w)))


def context_points(spark: SparkSession, root: str, collection: str,
                   context: list, k: int = 10, flt=None,
                   vector_name: str | None = None, round_to: int = 6,
                   tenant: str | None = None,
                   lookup_from_collection: str | None = None,
                   lookup_from_vector: str | None = None) -> DataFrame:
    """Qdrant CONTEXT search over a STORED collection (discover's
    target-less sibling): each (positive, negative) pair contributes
    ``min(0, sim(c,p) − sim(c,n))``, so a point on the positive side of
    every pair scores 0 (best) and violations subtract — the top-k are
    the points deepest inside the context zone, ties by id.  Same
    broadcast-row single scan as :func:`discover_points`; id-shaped
    examples are excluded when they resolve in this collection.
    Returns (vec_id, ctx_score, rank).  Euclid/manhattan spaces are
    served through negated distances (the discover convention), so the
    pair loss ``min(0, (−d_p) − (−d_n))`` still means 'distance past
    the positive side'."""
    from pyspark.sql import Window  # noqa: PLC0415

    joined, sims, n_pairs = _context_scan(
        spark, root, collection, context, flt, vector_name, round_to,
        tenant, lookup_from_collection, lookup_from_vector,
        target=None, caller="context_points")
    loss_parts = []
    for i in range(n_pairs):
        loss_parts.append(
            F.least(F.lit(0.0), sims[f"_p{i}"] - sims[f"_n{i}"]))
    score = loss_parts[0]
    for part in loss_parts[1:]:
        score = score + part
    # least(0.0, NULL) skips the NULL and least(0.0, NaN) returns 0.0
    # (Spark orders NaN largest), so an UNSCORABLE candidate (zero norm,
    # missing vector, NaN component — refs are validated in
    # _context_scan) would otherwise score a perfect 0; require the
    # first pair sim to resolve to a real number
    scored = (joined.filter(sims["_p0"].isNotNull()
                            & ~F.isnan(sims["_p0"]))
              .select("vec_id",
                      F.round(score, round_to).alias("ctx_score"))
              .filter(F.col("ctx_score").isNotNull()
                      & ~F.isnan("ctx_score")))
    w = Window.orderBy(F.desc("ctx_score"), F.asc("vec_id"))
    return (scored.orderBy(F.desc("ctx_score"), F.asc("vec_id"))
            .limit(k).withColumn("rank", F.row_number().over(w)))


def with_group_lookup(spark: SparkSession, root: str,
                      lookup_collection: str, groups: DataFrame,
                      group_col: str = "group",
                      prefix: str = "lookup_") -> DataFrame:
    """The groups API's ``with_lookup`` (Qdrant search_groups): attach the
    record BEHIND each group id from another collection — chunks grouped
    by parent document, lookup the document; products grouped by brand,
    lookup the brand record.  Every lookup column joins in under
    ``prefix`` (the lookup's own id column is dropped — ``group`` already
    carries it).

    The group values fetch through the store's static id-bucket filter
    (``read_rows_for_ids`` — O(|groups|), never a scan of the lookup
    collection), and the join side is k_groups·n_queries rows —
    broadcast, corpus-size-independent."""
    meta = collection_meta(root, lookup_collection) or {}
    id_col = meta.get("id_col", "id")
    ids = groups.select(group_col).distinct()
    rows = read_rows_for_ids(spark, root, lookup_collection, ids)
    if rows is None:  # empty lookup store: every lookup column is absent
        return groups
    looked = rows.select(
        *[F.col(c).alias(prefix + c) for c in rows.columns])
    return (groups.join(
        F.broadcast(looked),
        F.col(group_col).cast("string")
        == F.col(prefix + id_col).cast("string"),
        "left")
        .drop(prefix + id_col))


# The typed query-node kinds a prefetch tree may carry (round 11,
# VERDICT r10 #1) — mirrors Qdrant's Prefetch.query variants: a nested
# fusion, a formula rescore over its own prefetches, the three
# example-based queries, a nearest (raw vector / stored point id), and
# the stored-BM25 text branch.  A dict node must carry EXACTLY one.
_NODE_KINDS = ("fusion", "formula", "recommend", "discover", "context",
               "nearest", "text")


def _native_cut(col: Column, thr: float, metric: str) -> Column:
    """The metric-directional ``score_threshold`` comparison in the
    NATIVE score convention — distances (euclid/manhattan) cut as an
    upper bound, similarities as a lower bound.  One definition for
    every node kind so the direction logic can't drift."""
    return (col <= float(thr) if metric in ("euclid", "manhattan")
            else col >= float(thr))


def _vec_query_df(spark: SparkSession, spec) -> DataFrame:
    """A 1-row (qid, qvec) query frame from a raw serialized vector —
    nested list-of-lists builds the multivector shape."""
    if spec and isinstance(spec[0], (list, tuple)):
        return spark.createDataFrame(
            [(0, [[float(x) for x in row] for row in spec])],
            "qid long, qvec array<array<double>>")
    return spark.createDataFrame(
        [(0, [float(x) for x in spec])], "qid long, qvec array<double>")


def _check_spec_keys(spec, ok: set, what: str) -> None:
    """Typo guard for serialized query-node SPECS (the inner dicts of
    ``{'recommend': {...}}`` etc.): unknown keys raise loudly — a typo
    like ``'negitive'`` would otherwise silently change the query.
    Shared by the prefetch-leaf resolver and the terminal ``query=``
    dict branches so both entry points enforce one contract."""
    if not isinstance(spec, dict):
        return  # context nodes carry a pair LIST, not a spec dict
    bad = sorted(set(spec) - ok)
    if bad:
        raise ValueError(
            f"{what} node spec has unknown keys {bad}; "
            f"allowed: {sorted(ok)}")


def _resolve_typed_node(spark, root: str | None, collection: str | None,
                        kind: str, node: dict, k: int,
                        round_to: int) -> DataFrame:
    """Resolve one serialized typed query node against the stored
    collection, normalized to the branch contract ``(id, score, rank)``.
    Per-node knobs: ``limit`` (alias ``k``), ``filter`` (the payload
    DSL), ``using`` (named vector space), ``score_threshold`` (cut in
    the kind's NATIVE score convention — a rank-suffix cut for every
    kind that accepts it; discover refuses, its ranking is composite)
    — Qdrant's Prefetch fields.
    Unknown keys raise loudly: these nodes travel as serialized payloads
    where a typo would otherwise silently change the query."""
    if spark is None or root is None or collection is None:
        raise ValueError(
            f"prefetch node {{{kind!r}: ...}} resolves against a STORED "
            f"collection — reach it through query_points(prefetch=...) "
            f"or pass spark/root/collection to fuse_prefetch")
    allowed = {kind, "limit", "k", "filter", "using", "score_threshold"}
    if kind == "formula":
        allowed |= {"prefetch", "defaults"}
    if kind == "nearest":
        # a nearest node with its OWN prefetch is Qdrant's multi-stage
        # chain (Prefetch(prefetch=[coarse...], query=NearestQuery) —
        # retrieve coarse, rescore by this vector), nestable like any
        # other node
        allowed |= {"prefetch"}
    if kind == "text":
        allowed -= {"using"}  # BM25 has no vector space — a stray
        # 'using' would be silently meaningless, so it raises below
    if kind == "discover":
        # composite ranking (ctx_wins first) — a sim floor is not a
        # suffix cut; same refusal as the terminal discover node
        allowed -= {"score_threshold"}
    extra = sorted(set(node) - allowed)
    if extra:
        raise ValueError(
            f"prefetch node {{{kind!r}: ...}} has unknown keys {extra}; "
            f"allowed besides the kind: {sorted(allowed - {kind})}"
            + (" (score_threshold doesn't apply to discover's composite "
               "ranking)" if kind == "discover" else ""))
    limit = int(node.get("limit", node.get("k", k)))
    flt = node.get("filter")
    using = node.get("using")
    thr = node.get("score_threshold")
    thr = None if thr is None else float(thr)
    def _internal_order(score_df: DataFrame) -> DataFrame:
        # branch scores carry Qdrant's INTERNAL order (larger is better)
        # so every fusion parent — DBSF normalizes by score — sees one
        # convention: a nearest / average_vector branch on a euclid or
        # manhattan collection negates its raw (ascending) distance
        _, _, _, m = _resolve_search_space(root, collection, using)
        if m in ("euclid", "manhattan"):
            return score_df.withColumn("score", -F.col("score"))
        return score_df

    if kind == "recommend":
        spec = node["recommend"]
        _check_spec_keys(spec, {"positive", "negative", "strategy",
                          "lookup_from_collection", "lookup_from_vector"},
                   "recommend")
        strategy = spec.get("strategy", "average_vector")
        out = recommend_points(
            spark, root, collection,
            positive=list(spec.get("positive", [])),
            negative=list(spec.get("negative") or []),
            strategy=strategy,
            k=limit, flt=flt, vector_name=using, round_to=round_to,
            lookup_from_collection=spec.get("lookup_from_collection"),
            lookup_from_vector=spec.get("lookup_from_vector"))
        out = out.select(F.col("vec_id").alias("id"), "score", "rank")
        if thr is not None:
            # native-order cut (the terminal recommend node's logic):
            # average_vector carries the metric's native score order so
            # distance metrics cut <=; best/sum fold internal (negated)
            # scores — >= always.  The cut is a rank SUFFIX for every
            # allowed kind (score IS the ranking key), so the surviving
            # ranks stay contiguous for RRF parents.
            _, _, _, _m = _resolve_search_space(root, collection, using)
            out = out.filter(_native_cut(
                F.col("score"), thr,
                _m if strategy == "average_vector" else "cosine"))
        return _internal_order(out) if strategy == "average_vector" else out
    if kind == "discover":
        spec = node["discover"]
        _check_spec_keys(spec, {"target", "context",
                          "lookup_from_collection", "lookup_from_vector"},
                   "discover")
        out = discover_points(
            spark, root, collection, target=spec.get("target"),
            context=list(spec.get("context", [])), k=limit, flt=flt,
            vector_name=using, round_to=round_to,
            lookup_from_collection=spec.get("lookup_from_collection"),
            lookup_from_vector=spec.get("lookup_from_vector"))
        # branch score = target sim (the composite ctx_wins ordering
        # lives in `rank`, which is what RRF parents consume; a DBSF
        # parent normalizes the sim column — documented shape)
        return out.select(F.col("vec_id").alias("id"),
                          F.col("sim").alias("score"), "rank")
    if kind == "context":
        out = context_points(
            spark, root, collection, context=list(node["context"]),
            k=limit, flt=flt, vector_name=using, round_to=round_to)
        out = out.select(F.col("vec_id").alias("id"),
                         F.col("ctx_score").alias("score"), "rank")
        return out if thr is None else out.filter(F.col("score") >= thr)
    if kind == "nearest":
        spec = node["nearest"]
        if "prefetch" in node:
            # multi-stage: this node's own prefetch branches retrieve,
            # the nearest vector rescores their candidate union; the
            # result normalizes to internal order like every leaf.  An
            # EMPTY branch list is a malformed tree, not a plain search
            # (the same input raises at the query_points top level)
            out = rescore_by_nearest(
                spark, root, collection, list(node["prefetch"]), spec,
                k=limit, flt=flt, vector_name=using, round_to=round_to)
            if thr is not None:
                _, _, _, _m = _resolve_search_space(root, collection,
                                                    using)
                out = out.filter(_native_cut(F.col("score"), thr, _m))
            return _internal_order(
                out.select(F.col("vec_id").alias("id"), "score", "rank"))
        if isinstance(spec, (list, tuple)):  # raw query vector
            q = _vec_query_df(spark, spec)
            out = search_points(spark, root, collection, q, k=limit,
                                flt=flt, vector_name=using,
                                round_to=round_to,
                                score_threshold=thr)
        else:  # stored point id (self-excluding by-id search)
            out = query_points(spark, root, collection, query=spec,
                               k=limit, flt=flt, vector_name=using,
                               round_to=round_to, score_threshold=thr)
        return _internal_order(
            out.select(F.col("vec_id").alias("id"),
                       F.col("sim").alias("score"), "rank"))
    if kind == "text":
        spec = node["text"]
        _check_spec_keys(spec, {"column", "field", "terms", "query", "k1", "b"},
                   "text")
        if "terms" not in spec and "query" not in spec:
            raise ValueError(
                "text node spec needs 'terms' (a token list) or "
                "'query' (a whitespace-split string)")
        terms = (list(spec["terms"]) if "terms" in spec
                 else str(spec["query"]).split())
        out = search_text_points(
            spark, root, collection, terms, flt=flt, k=limit,
            text_col=spec.get("column", spec.get("field", "document")),
            k1=float(spec.get("k1", 1.2)), b=float(spec.get("b", 0.75)),
            round_to=round_to)
        out = out.select("id", "score", "rank")
        return out if thr is None else out.filter(F.col("score") >= thr)
    # kind == "formula": rescore the node's OWN prefetch branches
    from .formula import formula_rescore  # noqa: PLC0415

    # guards BEFORE child resolution: resolving a typed child runs eager
    # store work (example-vector fetches), wasted on an always-rejected
    # input
    if not node.get("prefetch"):
        raise ValueError(
            "a formula prefetch node needs its own prefetch=[...] "
            "children — candidates come from them (FormulaQuery)")
    if flt is not None or using is not None:
        raise ValueError(
            "a formula node rescores branches — apply filter/using "
            "inside each child branch, not to the rescoring node")
    children = [fuse_prefetch(c, k=limit, round_to=round_to, spark=spark,
                              root=root, collection=collection)
                for c in node.get("prefetch", [])]
    out = formula_rescore(spark, root, collection, children,
                          node["formula"], defaults=node.get("defaults"),
                          k=limit, round_to=round_to)
    return out if thr is None else out.filter(F.col("score") >= thr)


def fuse_prefetch(node, k: int = 10, round_to: int = 6, spark=None,
                  root: str | None = None,
                  collection: str | None = None) -> DataFrame:
    """Nested prefetch fusion — the Qdrant Query API's recursive
    ``query_points(prefetch=[Prefetch(...), ...], query=FusionQuery(...))``
    shape.  ``node`` is one of

    - a **leaf DataFrame**: a ranked frame with an ``id`` column plus
      ``rank`` (for RRF parents) and/or ``score`` (for DBSF parents) —
      any search branch in this repo produces one;
    - a **fusion node**: ``{"fusion": "rrf" | "dbsf",
      "prefetch": [child, ...], "k": int?}`` whose children resolve
      bottom-up (a bare ``{"prefetch": [...]}`` defaults to RRF);
    - a **typed query node** (round 11 — the fully SERIALIZABLE Qdrant
      tree): ``{"recommend": {...}}``, ``{"discover": {...}}``,
      ``{"context": [...]}``, ``{"nearest": vector-or-id}``,
      ``{"text": {...}}`` (stored BM25), or ``{"formula": ...,
      "prefetch": [...]}`` — resolved against the stored collection
      given by ``spark``/``root``/``collection`` (threaded through
      automatically by ``query_points(prefetch=...)``), each with
      optional per-node ``limit``/``filter``/``using``/
      ``score_threshold``.

    Every node's output is normalized to ``(id, score, rank)`` so it can
    itself be a branch of its parent — arbitrary nesting depth for free.
    Each fusion joins k·n_children rows (corpus-size-independent); the
    leaves carry whatever physical plan produced them, so a nested tree
    over three stored indexes stays partition-pruned end-to-end.
    """
    from .text_search import dbsf_fuse, rrf_fuse  # noqa: PLC0415

    if isinstance(node, DataFrame):
        return node
    if not isinstance(node, dict):
        raise TypeError(
            f"prefetch node must be a DataFrame leaf, a fusion dict or a "
            f"typed query node, got {type(node).__name__}")
    kinds = {kk for kk in _NODE_KINDS if kk in node}
    if not kinds and "prefetch" in node:
        kinds = {"fusion"}  # bare prefetch list: RRF by default
    if len(kinds) != 1:
        raise ValueError(
            f"prefetch node must carry exactly one of {list(_NODE_KINDS)}"
            f"; got keys {sorted(node)}")
    kind = kinds.pop()
    if kind != "fusion":
        return _resolve_typed_node(spark, root, collection, kind, node,
                                   k=k, round_to=round_to)
    stray = sorted(set(node) - {"fusion", "prefetch", "k", "limit"})
    if stray:
        # a filter/using on a FUSION node would be silently dropped —
        # per-branch knobs live on the leaves (the typed leaves raise on
        # stray keys too; the guards must match)
        raise ValueError(
            f"fusion node has unknown keys {stray}; allowed: "
            f"['fusion', 'prefetch', 'k'|'limit'] — put filter/using on "
            f"the leaf nodes, not the fusion")
    fusion = str(node.get("fusion", "rrf")).lower()
    kk = int(node.get("limit", node.get("k", k)))
    children = [fuse_prefetch(c, k=kk, round_to=round_to, spark=spark,
                              root=root, collection=collection)
                for c in node.get("prefetch", [])]
    if not children:
        raise ValueError("fusion node needs at least one prefetch child")
    if fusion == "rrf":
        out = rrf_fuse(children, k=kk, round_to=round_to)
        return out.select("id", F.col("rrf_score").alias("score"), "rank")
    if fusion == "dbsf":
        out = dbsf_fuse(children, k=kk, round_to=round_to)
        return out.select("id", F.col("dbsf_score").alias("score"), "rank")
    raise ValueError(f"unknown fusion {fusion!r} (expected 'rrf' or 'dbsf')")


def _mv_rescore_query(spark: SparkSession, root: str, collection: str,
                      meta: dict, vector_name: str, metric: str, nearest,
                      lookup_from_collection: str | None,
                      lookup_from_vector: str | None
                      ) -> tuple[list, str | None]:
    """Resolve the MULTIVECTOR rescoring query of
    :func:`rescore_by_nearest`: ``nearest`` is a list of token vectors
    (a flat list of numbers coerces to a single-token multivector,
    Qdrant's dense-against-multivector semantics) or a stored point id
    whose looked-up space must be multivector too.  Validates the same
    degenerate shapes the dense path refuses — an empty token list, a
    NaN component, or (cosine) a zero-norm token would silently poison
    every candidate's max-sim — and returns ``(tokens, exclude_id)``."""
    if isinstance(nearest, (list, tuple)):
        if nearest and isinstance(nearest[0], (list, tuple)):
            qv = [[float(x) for x in t] for t in nearest]
        else:  # flat dense vector → one-token multivector
            qv = [[float(x) for x in nearest]] if nearest else []
        exclude = None
    else:
        lk_coll, same_coll, lk_meta, lk_vec = _resolve_lookup(
            root, collection, meta, vector_name,
            lookup_from_collection, lookup_from_vector)
        if lk_meta.get("vectors", {}).get(lk_vec, {}) \
                .get("multivector") is None:
            raise ValueError(
                f"rescore_by_nearest: the rescoring space {collection!r}/"
                f"{vector_name!r} is multivector but the lookup space "
                f"{lk_coll!r}/{lk_vec!r} is dense; query shapes can't mix")
        lk_id_col = lk_meta.get("id_col", "id")
        ids_df = spark.createDataFrame([(str(nearest),)], "`_r_id` string")
        rows = read_rows_for_ids(spark, root, lk_coll, ids_df)
        got = ([] if rows is None else
               rows.select(lk_id_col, lk_vec).limit(2).collect())
        if not got:
            raise ValueError(
                f"rescore_by_nearest: no point with id {nearest!r} in "
                f"{lk_coll!r}")
        v = got[0][lk_vec]
        if v is None or len(v) == 0:
            raise ValueError(
                f"rescore_by_nearest: point {nearest!r} has no vector in "
                f"space {lk_vec!r} (deleted via delete_vectors?)")
        qv = [[float(x) for x in t] for t in v]
        exclude = str(nearest) if same_coll else None
    if not qv or any(len(t) == 0 for t in qv):
        raise ValueError(
            "rescore_by_nearest: the multivector query needs at least "
            "one non-empty token vector — an empty token scores nothing")
    if any(x != x for t in qv for x in t):
        raise ValueError(
            "rescore_by_nearest: the multivector query has a NaN "
            "component — it can't score anything")
    if metric == "cosine" and any(
            not any(x != 0.0 for x in t) for t in qv):
        raise ValueError(
            "rescore_by_nearest: a zero-norm query token has no cosine "
            "to anything — every candidate's max-sim would be poisoned")
    return qv, exclude


def rescore_by_nearest(spark: SparkSession, root: str, collection: str,
                       prefetch: list, nearest, k: int = 10, flt=None,
                       vector_name: str | None = None, round_to: int = 6,
                       tenant: str | None = None,
                       lookup_from_collection: str | None = None,
                       lookup_from_vector: str | None = None) -> DataFrame:
    """Qdrant ``query_points(prefetch=[...], query=NearestQuery(...))`` —
    the two-stage retrieval the Query API tree is built around: the
    prefetch branches RETRIEVE candidates (the union of their ids —
    k·n_branches rows by construction), and the nearest query RESCORES
    exactly those candidates against the dense space.  The classic
    "retrieve by BM25, rescore by embedding" pattern is
    ``prefetch=[{'text': ...}], query={'nearest': <vec>}``.

    ``nearest`` is a raw vector (list of floats) or a stored point id
    (``lookup_from`` resolves it from another collection / space; the
    id is excluded from the candidates when it lives in THIS
    collection).  The candidate vectors fetch through the store's
    static id-bucket filter (``read_rows_for_ids`` — O(|candidates|),
    never a collection scan); ``flt`` narrows the candidates (the
    Qdrant top-level filter applies to the final stage — per-branch
    filters belong on the prefetch leaves).  Candidates missing the
    space are skipped (Qdrant's semantics).  Returns (vec_id, score,
    rank) with the metric's NATIVE score order — similarity descending,
    distance ascending — exactly like :func:`search_points`.

    When the rescoring space is MULTIVECTOR (round 12) this is the
    ColBERT late-interaction pattern the Query API tree is built
    around — retrieve coarse (BM25 / dense prefetch), rescore by
    max-sim: ``nearest`` is a LIST OF TOKEN VECTORS (a flat list is
    treated as a single-token multivector, Qdrant's coercion) or a
    stored point id carrying the multivector space, and each candidate
    scores ``Σ_t max_v sim(t, v)`` (:func:`knn.maxsim_score_expr` —
    the same expression the exact scan and the ivf_mv rescore tail
    use, so all three paths score bit-identically).  Max-sim is
    defined for similarity metrics only (dot/cosine) — a euclid or
    manhattan multivector space raises, like everywhere else."""
    from ..functions import vector  # noqa: PLC0415

    if not prefetch:
        raise ValueError(
            "rescore_by_nearest needs prefetch=[...] branches — the "
            "candidates come from them (pass query= alone for a plain "
            "search)")
    meta, id_col, vector_name, metric = _resolve_search_space(
        root, collection, vector_name)
    mv = meta.get("vectors", {}).get(vector_name, {}) \
        .get("multivector") is not None
    from .upsert import materialize_small  # noqa: PLC0415

    branches = [fuse_prefetch(b, k=k, round_to=round_to, spark=spark,
                              root=root, collection=collection)
                for b in prefetch]
    ids = branches[0].select("id")
    for b in branches[1:]:
        ids = ids.unionByName(b.select("id"))
    # k·n_branches rows by construction — materialize ONCE through the
    # capped driver roundtrip: read_rows_for_ids consumes the id frame
    # twice (bucket probe + semi-join), which would otherwise re-execute
    # every branch plan per consumer
    ids = materialize_small(spark, ids.distinct())

    if mv:
        qv, exclude = _mv_rescore_query(
            spark, root, collection, meta, vector_name, metric, nearest,
            lookup_from_collection, lookup_from_vector)
    elif isinstance(nearest, (list, tuple)):
        qv = [float(x) for x in nearest]
        if any(x != x for x in qv) or (
                metric == "cosine" and not any(x != 0.0 for x in qv)):
            raise ValueError(
                "rescore_by_nearest: the query vector has a NaN "
                "component or zero norm — it can't score anything")
        exclude = None
    else:
        got, same_coll = _fetch_example_vectors(
            spark, root, collection, meta, vector_name, [str(nearest)],
            lookup_from_collection, lookup_from_vector,
            caller="rescore_by_nearest", metric=metric)
        qv = got[str(nearest)]
        exclude = str(nearest) if same_coll else None

    rows = read_rows_for_ids(spark, root, collection, ids, tenant=tenant)
    if rows is None:  # empty branches / empty store — keep the stored
        # id type so the empty frame unions/joins like the filled one
        return (read_collection(spark, root, collection).limit(0)
                .select(F.col(id_col).alias("vec_id"),
                        F.lit(0.0).alias("score"),
                        F.lit(0).cast("int").alias("rank")))
    if flt is not None:
        rows = rows.filter(as_filter(flt).to_column())
    c = rows.select(F.col(id_col).alias("vec_id"),
                    F.col(vector_name).alias("_cv"))
    if exclude is not None:
        c = c.filter(F.col("vec_id").cast("string") != exclude)
    if mv:
        from .knn import maxsim_score_expr  # noqa: PLC0415

        # a candidate whose token list is NULL or empty scores NULL
        # (array_max over zero token sims) and drops through the same
        # isNotNull filter as the dense path — "missing the space is
        # skipped", never a crash (the pinned degenerate-shape class)
        ref = spark.createDataFrame([(qv,)], "`_q` array<array<double>>")
        sim = maxsim_score_expr(F.col("_q"), F.col("_cv"), metric)
    else:
        ref = spark.createDataFrame([(qv,)], "`_q` array<double>")
        if metric == "cosine":
            ref = ref.withColumn("_qn", vector.l2_norm(F.col("_q")))
            denom = F.col("_qn") * vector.l2_norm(F.col("_cv"))
            sim = F.when(denom != 0.0,
                         vector.dot(F.col("_q"), F.col("_cv")) / denom)
        elif metric == "euclid":
            sim = vector.l2_distance(F.col("_q"), F.col("_cv"))
        elif metric == "manhattan":
            sim = vector.l1_distance(F.col("_q"), F.col("_cv"))
        else:  # dot
            sim = vector.dot(F.col("_q"), F.col("_cv"))
    scored = (c.join(F.broadcast(ref), how="cross")
              .select("vec_id", F.round(sim, round_to).alias("score"))
              .filter(F.col("score").isNotNull() & ~F.isnan("score")))
    asc = metric in ("euclid", "manhattan")
    order = ([F.asc("score"), F.asc("vec_id")] if asc
             else [F.desc("score"), F.asc("vec_id")])
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.orderBy(*order)
    return (scored.orderBy(*order).limit(k)
            .withColumn("rank", F.row_number().over(w)))
