"""The filtered Query API over a stored collection — search / count /
facet / scroll / groups, each accepting the composable :mod:`filters`
DSL.

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

(Round 12: the former ``operators.query_api`` monolith split along its
seams — this module is the search/scroll/facet core; the
example-based queries live in :mod:`operators.query_recommend`, the
serializable typed-node tree in :mod:`operators.query_tree`, and
``operators.query_api`` re-exports everything, so every existing
import path keeps working.)
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
from .localframe import local_frame
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


def _check_strict_k(spark, root: str, collection: str, strict, flt,
                    k: int | None, what: str) -> None:
    """Strict gate shared by the text/sparse posting entries (round 14):
    the driving-filter check plus the limit cap, where ``k=None``
    (corpus-complete scoring — the grouped search's input) counts as an
    UNCAPPED request and refuses under an active ``max_query_limit``."""
    from . import strict as strict_mod  # noqa: PLC0415

    sm = strict_mod.resolve_strict_for(root, collection, strict)
    if sm is None:
        return
    if k is None and sm.max_query_limit is not None:
        raise ValueError(
            f"strict mode: {what}(k=None) scores the corpus-complete "
            f"matching set — pass a k within max_query_limit "
            f"({sm.max_query_limit}), or raise "
            f"StrictMode(max_query_limit=None)")
    if k is not None:
        strict_mod.check_limits(sm, k, 0)
    strict_mod.check_filter(spark, root, collection, flt, sm)


def search_sparse_points(spark: SparkSession, root: str, collection: str,
                         query_postings: DataFrame, flt=None,
                         k: int | None = 10,
                         indices_col: str = "indices",
                         use_payload_index: str | bool = "auto",
                         exclude_self: bool = False,
                         round_to: int | None = 6,
                         allow_stale: bool = False,
                         modifier: str | None = "auto",
                         strict=None) -> DataFrame:
    """FILTERED sparse search — Qdrant's ``query_points`` over a sparse
    space with a ``query_filter``: the filter resolves to candidate ids
    (:func:`_filter_candidate_ids`) and the id set semi-joins INSIDE the
    probed posting lists of the persisted sparse index — dimension
    pruning AND payload pruning in one plan, the sparse twin of the
    dense composed search.  With no filter this is plain
    ``sparse_search_indexed``.

    ``strict`` (round 14): the Qdrant ``StrictModeConfig`` contract on
    the sparse entry — driving-filter and limit checks; ``k=None``
    (the corpus-complete scored set) counts as an uncapped request, so
    an active ``max_query_limit`` refuses it."""
    from .sparse import sparse_search_indexed  # noqa: PLC0415

    _check_strict_k(spark, root, collection, strict, flt, k,
                    "search_sparse_points")
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
                       terms: list[str], flt=None, k: int | None = 10,
                       text_col: str = "document",
                       use_payload_index: str | bool = "auto",
                       k1: float = 1.2, b: float = 0.75,
                       round_to: int = 6,
                       allow_stale: bool = False,
                       strict=None) -> DataFrame:
    """FILTERED full-text search — BM25 over the persisted posting index
    with a payload ``query_filter``: the filter resolves to candidate
    ids (:func:`_filter_candidate_ids`) and the id set semi-joins INSIDE
    the probed term buckets — term pruning AND payload pruning in one
    plan, with corpus-global BM25 statistics (a filter narrows
    candidates, not term rarity).  With no filter this is plain
    ``bm25_topk_indexed``.  ``strict`` — see
    :func:`search_sparse_points` (same contract)."""
    from .text_search import bm25_topk_indexed  # noqa: PLC0415

    _check_strict_k(spark, root, collection, strict, flt, k,
                    "search_text_points")
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
                             id_col: str,
                             rescore: bool = True,
                             oversampling: float | None = None,
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
                          rescore=rescore, oversampling=oversampling,
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
                  with_vectors: bool | list = False,
                  rescore: bool = True,
                  oversampling: float | None = None,
                  strict=None) -> DataFrame:
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
    vector data (:func:`attach_vectors`).

    ``rescore`` / ``oversampling`` (round 13) are Qdrant's
    ``QuantizationSearchParams``, threaded to the stored quantized
    artifact: ``rescore=False`` returns the quantized-score ranking
    (sq/pq/bq families — no exact-rescore fetch), ``oversampling``
    sizes the candidate stage at ``ceil(oversampling·k)``.  A
    non-default value forces ``use_index='always'`` — the exact scan
    has no quantized stage to honor them with.

    ``strict`` (round 13 — Qdrant ``StrictModeConfig``): True applies
    the default :class:`operators.strict.StrictMode` caps (refuse
    unindexed driving filters, cap limit/offset, refuse full-probe /
    exact scans over quantized spaces); pass an instance to tune.  All
    checks are driver-side metadata reads — a refusal costs no job."""
    from .knn import knn_join, resolve_metric, search_collection  # noqa: PLC0415

    meta = collection_meta(root, collection) or {}
    vectors = meta.get("vectors", {})
    if vector_name is None:
        if len(vectors) != 1:
            raise ValueError(
                f"collection {collection!r} declares {sorted(vectors)} "
                f"vector spaces; pass vector_name")
        vector_name = next(iter(vectors))
    if str(vectors.get(vector_name, {}).get("kind", "")).lower() \
            == "sparse":
        raise ValueError(
            f"space {collection!r}/{vector_name!r} is SPARSE — a dense "
            f"query vector can't search it; pass a sparse query "
            f"({{'nearest': {{'indices': [...], 'values': [...]}}}}) "
            f"through query_points, or search_sparse_points directly")
    metric = resolve_metric(
        vectors.get(vector_name, {}).get("distance", "cosine"))
    from .strict import resolve_strict_for  # noqa: PLC0415

    _sm = resolve_strict_for(root, collection, strict)
    if _sm is not None:
        from . import strict as strict_mod  # noqa: PLC0415

        strict_mod.check_limits(_sm, k, offset)
        strict_mod.check_filter(spark, root, collection, flt, _sm)
        strict_mod.check_probe(root, collection, vector_name, tenant,
                               _sm, n_probe, use_index)
    if use_index is True:  # the bool complement of False, on BOTH branches
        use_index = "always"
    if not rescore or oversampling is not None:
        # quantization search params describe the stored artifact; the
        # exact paths can't honor them — require the composed plan
        if use_index is False:
            raise ValueError(
                "rescore=False / oversampling describe the quantized "
                "artifact's search — they can't combine with "
                "use_index=False (the exact scan has no quantized "
                "stage)")
        use_index = "always"
    if flt is None:
        out = search_collection(spark, root, collection, queries,
                                k=k + offset,
                                vector_name=vector_name, query_id=query_id,
                                query_vec=query_vec, tenant=tenant,
                                use_index=("auto" if use_index is None
                                           else use_index),
                                n_probe=n_probe,
                                rerank_factor=rerank_factor,
                                rescore=rescore, oversampling=oversampling)
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
                index_candidate_threshold, tenant, id_col,
                rescore=rescore, oversampling=oversampling)
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
        cut_metric = metric
        if not rescore:
            # rescore=False pages carry the QUANTIZED score: bq/pq
            # kinds emit distances (Hamming / ADC — lower is better),
            # so the threshold cuts as an upper bound there; sq emits
            # the metric score and keeps its native direction
            from .index import vector_index_meta  # noqa: PLC0415

            _im = vector_index_meta(root, collection, vector_name,
                                    tenant) or {}
            if _im.get("kind") in ("ivf_bq", "pq", "ivf_pq"):
                cut_metric = "euclid"
        out = out.filter(_native_cut(F.col("sim"), score_threshold,
                                     cut_metric))
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
              local_frame(spark, [(str(i),) for i in ids],
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
                 tenant: str | None = None, strict=None) -> int:
    """Qdrant ``count(count_filter=...)``: exact filtered cardinality.
    The count itself is a distributed aggregate either way; the index
    path avoids touching the collection entirely when the residual is
    empty (the posting probe already knows the answer).  ``strict``
    applies the unindexed-filter refusal (per-request or the
    collection-declared config)."""
    from .strict import resolve_strict_for  # noqa: PLC0415

    _sm = resolve_strict_for(root, collection, strict)
    if _sm is not None:
        from . import strict as strict_mod  # noqa: PLC0415

        strict_mod.check_filter(spark, root, collection, flt, _sm)
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
                 tenant: str | None = None, strict=None) -> DataFrame:
    """Qdrant ``facet``: distinct values of a payload key with counts,
    under a filter — (value, count) descending.  Qdrant semantics
    throughout: a NULL (missing) payload never forms a group, and an
    ARRAY key counts points per ELEMENT (each point once per distinct
    element) — identical whether the answer comes from the scan or the
    index.  One pushed-filter scan (or candidate fetch) plus one
    partial-aggregated groupBy; only |distinct values| rows move.  An
    UNFILTERED, UNTENANTED facet over a freshly-indexed key answers from
    the posting table alone (index-only aggregate — the collection's
    data files never open; the 100 TB facet plan).  ``strict`` applies
    the unindexed-filter refusal (per-request or collection-declared)."""
    from pyspark.sql.types import ArrayType  # noqa: PLC0415

    from .strict import resolve_strict_for  # noqa: PLC0415

    _sm = resolve_strict_for(root, collection, strict)
    if _sm is not None:
        from . import strict as strict_mod  # noqa: PLC0415

        strict_mod.check_filter(spark, root, collection, flt, _sm)
        strict_mod.check_limits(_sm, limit, 0)
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
                  return_cursor: bool = False,
                  strict=None):
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
    from .strict import resolve_strict_for  # noqa: PLC0415

    _sm = resolve_strict_for(root, collection, strict)
    if _sm is not None:
        from . import strict as strict_mod  # noqa: PLC0415

        strict_mod.check_limits(_sm, limit, 0)
        strict_mod.check_filter(spark, root, collection, flt, _sm)
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
    # Arrow-form literal page (round 14, VERDICT r13 #4): the rows-form
    # local relation costs pickled-row workers per downstream action
    local = (local_frame(spark, rows, slim.schema) if rows
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
                  _exclude_ids: list[str] | None = None,
                  strict=None) -> DataFrame:
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
    of distinct groups.

    ``strict`` (round 14, VERDICT r13 #5): the Qdrant
    ``StrictModeConfig`` contract — the unindexed-driving-filter refusal
    and the page cap (``k_groups·group_size``, the rows this request
    returns) apply to grouped search like every other entry point."""
    from ..functions import vector  # noqa: PLC0415
    from . import strict as strict_mod  # noqa: PLC0415

    strict_mod.check_entry(spark, root, collection, strict,
                           flt=flt, limit=k_groups * group_size)
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
                      tenant: str | None = None,
                      score_threshold: float | None = None,
                      strict=None) -> DataFrame:
    """Diversified search: filtered kNN for a ``pool``-sized candidate
    set, then Maximal Marginal Relevance re-ranking picks ``k`` of them
    (λ trades relevance against novelty; λ=1 is the plain ranking).  The
    pool fetch is the ordinary distributed search; only pool-sized
    per-query frames enter the greedy pass (knn.mmr_rerank) — the corpus
    never does.  ``score_threshold`` cuts the CANDIDATES (Qdrant applies
    it to similarity, pre-rerank — a post-hoc cut on the MMR ordering
    would not be a suffix).

    ``strict`` (round 14, ADVICE r13 #2): the same Qdrant
    ``StrictModeConfig`` contract as :func:`search_points` — a
    collection-declared strict config applies to direct MMR calls too
    (caps check the POOL, the fetch this entry actually drives);
    checks run HERE, once, and the inner pool fetch skips them."""
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
    from . import strict as strict_mod  # noqa: PLC0415

    _sm = strict_mod.check_entry(spark, root, collection, strict,
                                 flt=flt, limit=pool)
    if _sm is not None:
        strict_mod.check_probe(root, collection, vector_name, tenant,
                               _sm, None, "auto")
    from .upsert import materialize_small  # noqa: PLC0415

    cand = materialize_small(spark, search_points(
        spark, root, collection, queries, flt=flt, k=pool,
        vector_name=vector_name, query_id=query_id, query_vec=query_vec,
        use_payload_index=use_payload_index, tenant=tenant,
        score_threshold=score_threshold,
        strict=False))  # internal pool fetch — checked above, once
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
    cfg = vectors.get(vector_name, {})
    if str(cfg.get("kind", "")).lower() == "sparse":
        # the dense surface (search/recommend/discover/context/groups)
        # has no meaning over a posting-list space — refuse HERE, once,
        # so every caller gets the same message instead of a deep
        # shape error (recommend can't average postings, discover
        # can't triplet-score them, ...)
        raise ValueError(
            f"space {collection!r}/{vector_name!r} is SPARSE — this "
            f"operation needs a dense (or multivector) space; query a "
            f"sparse space with a sparse nearest node "
            f"({{'nearest': {{'indices': [...], 'values': [...]}}, "
            f"'using': {vector_name!r}}}) or search_sparse_points")
    metric = resolve_metric(cfg.get("distance", "cosine"))
    return meta, id_col, vector_name, metric


def _resolve_sparse_space(root: str, collection: str,
                          using: str | None):
    """Resolve the searched SPARSE space — the twin of
    :func:`_resolve_search_space` for posting-list spaces: the (only or
    named) space whose declared ``kind`` is 'sparse', and the physical
    ``indices_col`` its persisted index is keyed by (a space config may
    carry ``indices_col``, default 'indices' — the
    :func:`operators.sparse._declared_modifier` convention).
    Returns (meta, id_col, space_name, indices_col)."""
    meta = collection_meta(root, collection) or {}
    id_col = meta.get("id_col", "id")
    vectors = meta.get("vectors", {})
    sparse = {n: c for n, c in vectors.items()
              if str((c or {}).get("kind", "")).lower() == "sparse"}
    if using is None:
        if len(sparse) != 1:
            raise ValueError(
                f"collection {collection!r} declares "
                f"{sorted(sparse) or 'no'} sparse spaces; pass "
                f"using=<space name> to a sparse nearest query")
        using = next(iter(sparse))
    if using not in sparse:
        raise ValueError(
            f"space {collection!r}/{using!r} is "
            f"{'dense' if using in vectors else 'undeclared'} — a "
            f"sparse nearest query ({{'indices': ..., 'values': ...}}) "
            f"needs a space declared {{'kind': 'sparse'}}; sparse "
            f"spaces here: {sorted(sparse)}")
    return meta, id_col, using, sparse[using].get("indices_col", "indices")


def _sparse_query_postings(spark: SparkSession, spec: dict,
                           what: str = "nearest") -> DataFrame:
    """A 1-query postings frame (id=0, idx, val) from Qdrant's
    ``SparseVector`` wire shape ``{'indices': [...], 'values': [...]}``.
    The degenerate shapes that would silently score nothing (or
    everything wrong) raise up front: ragged pairs, an empty vector,
    NaN values, duplicate dimensions (Qdrant rejects them too — the
    sum-vs-last-wins ambiguity has no right answer)."""
    _check_spec_keys(spec, {"indices", "values"}, what)
    idxs = [int(i) for i in spec.get("indices") or []]
    vals = [float(v) for v in spec.get("values") or []]
    if len(idxs) != len(vals):
        raise ValueError(
            f"{what}: sparse query is ragged — {len(idxs)} indices vs "
            f"{len(vals)} values")
    if not idxs:
        raise ValueError(
            f"{what}: empty sparse query scores nothing — pass at "
            f"least one (index, value) pair")
    if any(v != v for v in vals):
        raise ValueError(
            f"{what}: sparse query has a NaN value — it can't score "
            f"anything")
    if len(set(idxs)) != len(idxs):
        raise ValueError(
            f"{what}: sparse query repeats a dimension — merge "
            f"duplicate indices before querying")
    return local_frame(
        spark, [(0, i, v) for i, v in zip(idxs, vals)],
        "id long, idx long, val double")

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
        return local_frame(
            spark, [(0, [[float(x) for x in row] for row in spec])],
            "qid long, qvec array<array<double>>")
    return local_frame(
        spark, [(0, [float(x) for x in spec])],
        "qid long, qvec array<double>")


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
