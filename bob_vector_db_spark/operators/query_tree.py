"""The serializable Qdrant Query API tree — ``query_points`` (the
universal endpoint), typed prefetch nodes, fusion, and the two-stage
rescore (split out of the former ``operators.query_api`` monolith,
round 12; import through ``operators.query_api`` or here, both work).

A query travels as PLAIN DATA — nested dicts/lists of the exact shapes
Qdrant's client serializes (NearestQuery / RecommendQuery /
DiscoverQuery / ContextQuery / FusionQuery / FormulaQuery /
SparseVector / Mmr / Prefetch) — and every node resolves against the
stored collection to a ranked DataFrame normalized to
``(id, score, rank)``, so arbitrary nesting composes for free.

Reference provenance: the reference node delegates this entire query
surface to its Qdrant server (README.md:13 "Query the DB and return
the results"; qdrant_embedder.py:119-128 builds the payloads,
:95-103 attaches the per-collection vector config the named spaces
here mirror — dense, named multivector, and the sparse/IDF params).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .filters import as_filter
from .localframe import local_frame
from .upsert import (
    collection_meta,
    read_collection,
    read_rows_for_ids,
)

from .query_recommend import (
    _fetch_example_vectors,
    context_points,
    discover_points,
    recommend_points,
)
from .query_search import (
    _check_spec_keys,
    _native_cut,
    _resolve_lookup,
    _resolve_search_space,
    _resolve_sparse_space,
    _sparse_query_postings,
    _vec_query_df,
    attach_payload,
    attach_vectors,
    sample_points,
    search_points,
    search_sparse_points,
    search_text_points,
)


# The typed query-node kinds a prefetch tree may carry (round 11,
# VERDICT r10 #1) — mirrors Qdrant's Prefetch.query variants: a nested
# fusion, a formula rescore over its own prefetches, the three
# example-based queries, a nearest (raw vector / stored point id / a
# SparseVector dict), and the stored-BM25 text branch.  A dict node
# must carry EXACTLY one.
_NODE_KINDS = ("fusion", "formula", "recommend", "discover", "context",
               "nearest", "text")


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
                 with_vectors: bool | list = False,
                 rescore: bool = True,
                 oversampling: float | None = None,
                 strict=None) -> DataFrame:
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
      ``{'nearest': {'indices': ..., 'values': ...}, 'using':
      <sparse space>}`` (round 12 — Qdrant's SparseVector leaf, served
      by the persisted sparse index, so the canonical hybrid
      sparse+dense RRF payload is ONE serializable tree) /
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
    from .strict import resolve_strict_for  # noqa: PLC0415

    _sm = resolve_strict_for(root, collection, strict)
    if _sm is not None:
        # strict checks run ONCE up front for every node kind
        # (driver-side metadata only); they are NOT re-threaded into the
        # inner search_points calls — the by-id path's +1 self-exclusion
        # overfetch must not trip the cap the user-facing k respects
        from . import strict as strict_mod  # noqa: PLC0415

        strict_mod.check_limits(_sm, k, offset)
        strict_mod.check_filter(spark, root, collection, flt, _sm)
        strict_mod.check_probe(root, collection, vector_name, tenant,
                               _sm, n_probe, use_index)
    if (not rescore or oversampling is not None) and not (
            prefetch is None
            and (isinstance(query, (DataFrame, int, str))
                 or (isinstance(query, dict) and "nearest" in query
                     and "mmr" not in query
                     and not isinstance(query.get("nearest"), dict)))):
        # the quantization search params thread only to the DENSE
        # terminal shapes (DataFrame / raw vector / by-id) — refusing
        # loudly beats a silently ignored knob (the tenant-leak lesson)
        raise ValueError(
            "rescore=False / oversampling apply to a dense quantized "
            "search — pass a DataFrame, raw-vector or by-id query "
            "(other node kinds and prefetch trees don't thread them)")
    if isinstance(query, dict):
        _kinds = ({"formula", "recommend", "discover", "context",
                   "sample", "nearest"} & set(query))
        if len(_kinds) != 1:
            raise ValueError(
                "query_points dict query must carry exactly one of "
                "'formula', 'recommend', 'discover', 'context', "
                f"'sample', 'nearest'; got {sorted(query)}")
        _extra = sorted(set(query) - _kinds
                        - ({"defaults"} if "formula" in query else set())
                        - ({"mmr"} if "nearest" in query else set()))
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
        if "mmr" in query:
            # Qdrant NearestQuery(mmr=Mmr(diversity, candidates_limit))
            # — diversified retrieval as a serialized payload (round 12,
            # VERDICT r11 #5): the nearest search fetches the candidate
            # pool, MMR greedily picks k (knn.mmr_rerank)
            if isinstance(spec, dict):
                raise ValueError(
                    "mmr reranks a DENSE nearest search's pool — a "
                    "sparse query doesn't carry the single similarity "
                    "scale the relevance/novelty trade needs")
            if prefetch is not None:
                raise ValueError(
                    "mmr doesn't compose with a rescore stage — "
                    "diversify the plain nearest search "
                    "(query={'nearest': ..., 'mmr': ...} without "
                    "prefetch=)")
            out = _nearest_mmr(
                spark, root, collection, spec, query["mmr"], k=k,
                flt=flt, vector_name=vector_name, tenant=tenant,
                offset=offset, score_threshold=score_threshold,
                use_payload_index=use_payload_index,
                lookup_from_collection=lookup_from_collection,
                lookup_from_vector=lookup_from_vector)
            if with_payload:
                out = attach_payload(spark, root, collection, out,
                                     with_payload, id_col_out="vec_id")
            if with_vectors:
                out = attach_vectors(spark, root, collection, out,
                                     with_vectors, id_col_out="vec_id")
            return out
        if isinstance(spec, dict):
            # Qdrant SparseVector terminal query — the persisted
            # sparse index serves it (dim-bucket pruned probe,
            # declared IDF modifier honored), with the common
            # post-rank shaping.  The ANN knobs and lookup_from are
            # dense-space concepts; tenant scoping composes through
            # flt like the other sparse surfaces.
            if prefetch is not None:
                raise ValueError(
                    "a sparse nearest query can't rescore prefetch "
                    "branches — retrieve sparse as its own prefetch "
                    "BRANCH and rescore by a dense or multivector "
                    "nearest query instead")
            if tenant is not None:
                raise ValueError(
                    "sparse search doesn't thread tenant= — scope the "
                    "query_filter instead (flt on the tenant field)")
            if lookup_from_collection or lookup_from_vector:
                raise ValueError(
                    "lookup_from doesn't apply to a literal sparse "
                    "query — pass the stored point's id as query= to "
                    "search by a stored vector")
            qpost = _sparse_query_postings(spark, spec, "nearest")
            _, _, _sp, icol = _resolve_sparse_space(
                root, collection, vector_name)
            out = search_sparse_points(
                spark, root, collection, qpost, flt=flt,
                k=k + int(offset), indices_col=icol, round_to=round_to,
                use_payload_index=use_payload_index,
                strict=False)  # checks ran at this entry
            if offset:
                out = (out.filter(F.col("rank") > offset)
                       .withColumn("rank",
                                   F.col("rank") - F.lit(int(offset))))
            if score_threshold is not None:
                out = out.filter(F.col("sim") >= float(score_threshold))
            if with_payload:
                out = attach_payload(spark, root, collection, out,
                                     with_payload, id_col_out="vec_id")
            if with_vectors:
                out = attach_vectors(spark, root, collection, out,
                                     with_vectors, id_col_out="vec_id")
            return out
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
                rescore=rescore, oversampling=oversampling,
                strict=False,  # checks already ran at this entry
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
                                            lookup_from_vector),
                strict=False)  # checks ran at this entry (incl. the
            # n_pre=k+offset overfetch, which must not re-trip the cap)
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
                                            lookup_from_vector),
                strict=False)  # checks ran at this entry
            score_col = "sim"
        else:  # context
            out = context_points(
                spark, root, collection, context=list(query["context"]),
                k=n_pre, flt=flt, vector_name=vector_name, tenant=tenant,
                round_to=round_to,
                lookup_from_collection=lookup_from_collection,
                lookup_from_vector=lookup_from_vector,
                strict=False)  # checks ran at this entry
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
                             with_vectors=with_vectors,
                             rescore=rescore, oversampling=oversampling,
                             strict=False)  # checks ran at this entry
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
    ids = local_frame(spark, [(str(query),)], "`_q_id` string")
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
        qdf = local_frame(
            spark, [(str(got[0][lk_id_col]), [list(t) for t in v])],
            "qid string, qvec array<array<double>>")
    else:
        qdf = local_frame(
            spark, [(str(got[0][lk_id_col]), list(v))],
            "qid string, qvec array<double>")
    from pyspark.sql import Window  # noqa: PLC0415

    out = search_points(spark, root, collection, qdf, flt=flt,
                        k=k + 1 + int(offset),
                        vector_name=vector_name, round_to=round_to,
                        use_payload_index=use_payload_index, tenant=tenant,
                        score_threshold=score_threshold,
                        use_index=use_index, n_probe=n_probe,
                        rerank_factor=rerank_factor,
                        rescore=rescore, oversampling=oversampling,
                        strict=False)  # checks ran at this entry
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
        # other node; 'mmr' is NearestQuery's diversified-rerank knob
        allowed |= {"prefetch", "mmr"}
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
            lookup_from_vector=spec.get("lookup_from_vector"),
            strict=False)  # prefetch-leaf fetch
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
            lookup_from_vector=spec.get("lookup_from_vector"),
            strict=False)  # prefetch-leaf fetch
        # branch score = target sim (the composite ctx_wins ordering
        # lives in `rank`, which is what RRF parents consume; a DBSF
        # parent normalizes the sim column — documented shape)
        return out.select(F.col("vec_id").alias("id"),
                          F.col("sim").alias("score"), "rank")
    if kind == "context":
        out = context_points(
            spark, root, collection, context=list(node["context"]),
            k=limit, flt=flt, vector_name=using, round_to=round_to,
            strict=False)  # prefetch-leaf fetch
        out = out.select(F.col("vec_id").alias("id"),
                         F.col("ctx_score").alias("score"), "rank")
        return out if thr is None else out.filter(F.col("score") >= thr)
    if kind == "nearest":
        spec = node["nearest"]
        if "mmr" in node:
            # diversified leaf (NearestQuery.mmr): branch score = sim
            # (like discover, the composite MMR ordering lives in rank,
            # which is what RRF parents consume)
            if isinstance(spec, dict) or "prefetch" in node:
                raise ValueError(
                    "mmr reranks a plain DENSE nearest search — it "
                    "doesn't compose with a sparse query or a rescore "
                    "stage in one node")
            out = _nearest_mmr(
                spark, root, collection, spec, node["mmr"], k=limit,
                flt=flt, vector_name=using, tenant=None,
                score_threshold=thr)  # cuts the CANDIDATES, pre-rerank
            return out.select(F.col("vec_id").alias("id"),
                              F.col("sim").alias("score"), "rank")
        if isinstance(spec, dict):
            # Qdrant SparseVector leaf ({'indices': ..., 'values': ...},
            # 'using' names the sparse space) — the canonical hybrid
            # payload's sparse branch, served by the PERSISTED sparse
            # index (dim-bucket pruned probe, declared IDF modifier
            # honored).  Sparse dot already ranks larger-is-better, so
            # no _internal_order negation.
            if "prefetch" in node:
                raise ValueError(
                    "a sparse nearest node can't rescore prefetch "
                    "branches — retrieve sparse as its own prefetch "
                    "BRANCH and rescore by a dense or multivector "
                    "nearest query instead")
            qpost = _sparse_query_postings(spark, spec, "nearest")
            _, _, _sp, icol = _resolve_sparse_space(root, collection,
                                                    using)
            out = search_sparse_points(
                spark, root, collection, qpost, flt=flt, k=limit,
                indices_col=icol, round_to=round_to,
                strict=False)  # prefetch-leaf fetch
            out = out.select(F.col("vec_id").alias("id"),
                             F.col("sim").alias("score"), "rank")
            return out if thr is None else out.filter(
                F.col("score") >= thr)
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
                                score_threshold=thr,
                                strict=False)  # prefetch-leaf fetch
        else:  # stored point id (self-excluding by-id search)
            out = query_points(spark, root, collection, query=spec,
                               k=limit, flt=flt, vector_name=using,
                               round_to=round_to, score_threshold=thr,
                               strict=False)  # prefetch-leaf fetch
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
            round_to=round_to, strict=False)  # prefetch-leaf fetch
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
        ids_df = local_frame(spark, [(str(nearest),)], "`_r_id` string")
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
    if isinstance(nearest, dict):
        raise ValueError(
            "rescore_by_nearest rescores against a dense or "
            "multivector space — a sparse query ({'indices': ..., "
            "'values': ...}) retrieves as its own prefetch BRANCH "
            "instead")
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
        ref = local_frame(spark, [(qv,)], "`_q` array<array<double>>")
        sim = maxsim_score_expr(F.col("_q"), F.col("_cv"), metric)
    else:
        ref = local_frame(spark, [(qv,)], "`_q` array<double>")
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


def query_points_groups(spark: SparkSession, root: str, collection: str,
                        group_by: str, query=None, prefetch=None,
                        fusion: str = "rrf",
                        k_groups: int = 5, group_size: int = 3,
                        flt=None, vector_name: str | None = None,
                        round_to: int = 6, tenant: str | None = None,
                        score_threshold: float | None = None,
                        with_lookup: str | None = None,
                        lookup_from_collection: str | None = None,
                        lookup_from_vector: str | None = None,
                        strict=None) -> DataFrame:
    """Qdrant ``query_points_groups`` — the universal endpoint's grouped
    variant: any query node + ``group_by``/``group_size``, returning the
    best ``k_groups`` distinct values of the ``group_by`` payload key,
    each carrying its own top ``group_size`` hits.  Points missing the
    key never consume a slot; ``with_lookup`` attaches the record behind
    each group id from another collection (:func:`with_group_lookup`).

    Dispatch by the query's shape, each to the EXACT grouped plan:

    - a **DataFrame** of (qid, qvec), a **raw vector**
      (``{'nearest': [...]}``), a **stored point id** (bare or
      ``{'nearest': id}`` — self-excluded, ``lookup_from`` honored) →
      :func:`query_search.search_groups`'s corpus-complete scan;
    - ``{'recommend': {...}}`` (all three strategies) →
      :func:`query_recommend.recommend_groups` — the grouped cut IS the
      flat recommend scoring + the shared two-window ranking, so the
      grouped result ties exactly to :func:`recommend_points`;
    - ``{'text': {...}}`` (stored BM25) and ``{'nearest': {'indices':
      ..., 'values': ...}}`` (sparse) → the posting index scores EVERY
      matching doc (``k=None`` — no global cut) and the shared grouped
      tail ranks per group ("top docs per source", the flagship
      diversification) — corpus-complete like the dense scan;
    - a **prefetch tree** (typed leaves / fusion / rescore-by-nearest):
      the tree retrieves its fused top ``k_groups·group_size`` pool,
      then the pool's ids fetch their ``group_by`` values through the
      store's static id-bucket filter and the same two-window cut
      shapes them — CANDIDATE-BOUNDED grouping (the tree's own per-leaf
      ``limit``s bound the pool; raise them for fuller groups).  This
      is also the grouped route for discover / context / formula / mmr
      queries: embed the node as a prefetch leaf.

    ``score_threshold`` cuts hits in the node's NATIVE score convention;
    both windows stay contiguous (hits within a group are score-ordered,
    groups by their best hit, so the cut is a suffix at each level).

    Returns (group, group_rank, vec_id, score, rank_in_group) —
    group-major, deterministic ties; a DataFrame query keeps its
    ``qid`` as the leading column (multi-query grouped search)."""
    from .query_recommend import recommend_groups  # noqa: PLC0415
    from .query_search import (  # noqa: PLC0415
        _group_topk,
        search_groups,
        with_group_lookup,
    )

    if query is None and prefetch is None:
        raise ValueError(
            "query_points_groups needs a query= node, a prefetch= tree, "
            "or both (prefetch retrieves, query={'nearest': ...} "
            "rescores, the grouped cut shapes the result)")
    from . import strict as strict_mod  # noqa: PLC0415

    # round 14 (VERDICT r13 #5): the grouped universal endpoint gates
    # HERE, once — every internal delegation below (pool fetch,
    # search_groups, recommend_groups) runs strict=False
    strict_mod.check_entry(spark, root, collection, strict,
                           flt=flt, limit=int(k_groups) * int(group_size))

    def _finish(out: DataFrame, metric: str | None) -> DataFrame:
        if score_threshold is not None:
            out = out.filter(_native_cut(
                F.col("score"), score_threshold, metric or "cosine"))
        if with_lookup:
            out = with_group_lookup(spark, root, with_lookup, out)
        return out

    if isinstance(query, dict) and prefetch is None:
        kinds = ({"recommend", "nearest", "text"} & set(query))
        bad = sorted(set(query) - kinds)
        if len(kinds) != 1 or bad:
            raise ValueError(
                "query_points_groups dict query carries exactly one of "
                "'recommend', 'nearest', 'text' — group a discover / "
                "context / formula / mmr node by embedding it as a "
                f"prefetch leaf; got keys {sorted(query)}")
        meta_g = collection_meta(root, collection) or {}
        id_col_g = meta_g.get("id_col", "id")
        if "text" in query:
            # EXACT grouped BM25 ("top docs per source"): the probed
            # posting buckets score EVERY term-matching doc (k=None —
            # no global cut, no global sort), then the shared grouped
            # tail
            if tenant is not None:
                raise ValueError(
                    "text search doesn't thread tenant= — scope the "
                    "query_filter instead (flt on the tenant field)")
            spec = query["text"]
            _check_spec_keys(spec, {"column", "field", "terms", "query",
                                    "k1", "b"}, "text")
            if "terms" not in spec and "query" not in spec:
                raise ValueError(
                    "text node spec needs 'terms' (a token list) or "
                    "'query' (a whitespace-split string)")
            terms = (list(spec["terms"]) if "terms" in spec
                     else str(spec["query"]).split())
            scored = search_text_points(
                spark, root, collection, terms, flt=flt, k=None,
                text_col=spec.get("column", spec.get("field",
                                                     "document")),
                k1=float(spec.get("k1", 1.2)),
                b=float(spec.get("b", 0.75)), round_to=round_to,
                strict=False)  # internal corpus-complete grouped input
            return _grouped_from_scored(
                spark, root, collection,
                scored.select(F.col("id").alias("vec_id"), "score"),
                group_by, k_groups, group_size, score_threshold,
                with_lookup, id_col_g)
        if "nearest" in query and isinstance(query["nearest"], dict):
            # EXACT grouped SPARSE search: every dim-sharing doc scores
            # through the persisted index (k=None), then the shared
            # grouped tail — Qdrant groups sparse queries too
            if tenant is not None:
                raise ValueError(
                    "sparse search doesn't thread tenant= — scope the "
                    "query_filter instead (flt on the tenant field)")
            qpost = _sparse_query_postings(spark, query["nearest"],
                                           "nearest")
            _, _, _sp, icol = _resolve_sparse_space(root, collection,
                                                    vector_name)
            scored = search_sparse_points(
                spark, root, collection, qpost, flt=flt, k=None,
                indices_col=icol, round_to=round_to,
                strict=False)  # internal corpus-complete grouped input
            return _grouped_from_scored(
                spark, root, collection,
                scored.select("vec_id", F.col("sim").alias("score")),
                group_by, k_groups, group_size, score_threshold,
                with_lookup, id_col_g)
        if "recommend" in query:
            spec = query["recommend"]
            _check_spec_keys(spec, {"positive", "negative", "strategy",
                                    "lookup_from_collection",
                                    "lookup_from_vector"}, "recommend")
            strategy = spec.get("strategy", "average_vector")
            out = recommend_groups(
                spark, root, collection,
                positive=list(spec.get("positive", [])),
                negative=list(spec.get("negative") or []),
                strategy=strategy, group_by=group_by,
                k_groups=k_groups, group_size=group_size, flt=flt,
                vector_name=vector_name, round_to=round_to,
                tenant=tenant,
                lookup_from_collection=spec.get("lookup_from_collection",
                                                lookup_from_collection),
                lookup_from_vector=spec.get("lookup_from_vector",
                                            lookup_from_vector),
                strict=False)  # internal: checked at entry, once
            # the terminal recommend node's threshold convention:
            # average_vector carries the metric's native score order,
            # best/sum fold internal (negated-distance) scores — >=
            _, _, _, m = _resolve_search_space(root, collection,
                                               vector_name)
            return _finish(out, m if strategy == "average_vector"
                           else "cosine")
        query = query["nearest"]  # unwrap; falls through to the
        # vector / by-id dispatch below (a sparse dict raises there)

    if prefetch is not None:
        # CANDIDATE-BOUNDED grouping: the tree retrieves its pool, the
        # pool's ids fetch group values (O(|pool|), never a scan), and
        # the fused RANK drives both windows (uniform across node kinds
        # — fusion scores, native rescore scores, and branch sims all
        # already fold into it)
        pool = query_points(
            spark, root, collection, query=query, prefetch=prefetch,
            fusion=fusion, k=int(k_groups) * int(group_size), flt=flt,
            vector_name=vector_name, round_to=round_to, tenant=tenant,
            score_threshold=score_threshold,
            strict=False,  # internal pool fetch (k_groups·group_size)
            lookup_from_collection=lookup_from_collection,
            lookup_from_vector=lookup_from_vector)
        idc = "vec_id" if "vec_id" in pool.columns else "id"
        from .upsert import materialize_small  # noqa: PLC0415

        pool = materialize_small(
            spark, pool.select(F.col(idc).alias("vec_id"),
                               "score", "rank"))
        meta = collection_meta(root, collection) or {}
        id_col = meta.get("id_col", "id")
        rows = read_rows_for_ids(spark, root, collection,
                                 pool.select("vec_id"))
        if rows is None:
            # typed empty frame: the group column keeps the STORED
            # group_by type (the r11 empty-result-schema rule), so the
            # empty result unions/joins like a filled one
            out = (read_collection(spark, root, collection).limit(0)
                   .select(F.col(group_by).alias("group"),
                           F.lit(0).cast("int").alias("group_rank"),
                           F.col(id_col).alias("vec_id"),
                           F.lit(0.0).alias("score"),
                           F.lit(0).cast("int").alias("rank_in_group")))
            return _finish(out, None)
        gmap = rows.select(F.col(id_col).cast("string").alias("_gid"),
                           F.col(group_by).alias("group"))
        scored = (pool.join(
            F.broadcast(gmap),
            F.col("vec_id").cast("string") == F.col("_gid"))
            .filter(F.col("group").isNotNull())
            .select(F.lit(0).alias("qid"), "vec_id", "group",
                    F.col("rank").alias("sim"), "score"))
        # _group_topk over the fused rank (ascending: rank 1 is best);
        # carry the real score back in by vec_id join — the cut frame
        # is ≤ k_groups·group_size rows
        cut = _group_topk(scored.drop("score"), ascending=True,
                          k_groups=k_groups, group_size=group_size)
        out = (cut.join(F.broadcast(scored.select("vec_id", "score")),
                        "vec_id")
               .select("group", "group_rank", "vec_id", "score",
                       "rank_in_group"))
        # threshold already applied INSIDE query_points (native cut on
        # the fused/rescored ranking) — only the lookup join remains
        if with_lookup:
            out = with_group_lookup(spark, root, with_lookup, out)
        return out

    meta, id_col, vector_name, metric = _resolve_search_space(
        root, collection, vector_name)
    if meta.get("vectors", {}).get(vector_name, {}) \
            .get("multivector") is not None:
        raise ValueError(
            f"query_points_groups searches a DENSE space; "
            f"{collection!r}/{vector_name!r} is multivector — group a "
            f"multivector retrieval through the prefetch path "
            f"(prefetch=[{{'nearest': <id-or-tokens>}}])")
    if isinstance(query, DataFrame):
        out = search_groups(spark, root, collection, query, group_by,
                            k_groups=k_groups, group_size=group_size,
                            flt=flt, vector_name=vector_name,
                            round_to=round_to, tenant=tenant,
                            strict=False)  # internal: checked at entry
        out = out.select("qid", "group", "group_rank", "vec_id",
                         F.col("sim").alias("score"), "rank_in_group")
        return _finish(out, metric)
    if isinstance(query, (list, tuple)):  # raw query vector
        qdf = _vec_query_df(spark, query)
        exclude = None
    else:  # stored point id (self-excluding, lookup_from honored)
        got, same_coll = _fetch_example_vectors(
            spark, root, collection, meta, vector_name, [str(query)],
            lookup_from_collection, lookup_from_vector,
            caller="query_points_groups", metric=metric)
        qdf = local_frame(
            spark, [(0, [float(x) for x in got[str(query)]])],
            "qid long, qvec array<double>")
        exclude = [str(query)] if same_coll else None
    out = search_groups(spark, root, collection, qdf, group_by,
                        k_groups=k_groups, group_size=group_size,
                        flt=flt, vector_name=vector_name,
                        round_to=round_to, tenant=tenant,
                        _exclude_ids=exclude,
                        strict=False)  # internal: checked at entry
    out = out.select("group", "group_rank", "vec_id",
                     F.col("sim").alias("score"), "rank_in_group")
    return _finish(out, metric)


def _nearest_mmr(spark: SparkSession, root: str, collection: str,
                 spec, mmr: dict, *, k: int, flt, vector_name: str | None,
                 tenant: str | None, offset: int = 0,
                 score_threshold: float | None = None,
                 use_payload_index: str | bool = "auto",
                 lookup_from_collection: str | None = None,
                 lookup_from_vector: str | None = None) -> DataFrame:
    """Resolve a serialized ``{'nearest': <vector-or-id>, 'mmr':
    {'diversity': d, 'candidates_limit': n}}`` node — Qdrant's
    ``NearestQuery(mmr=Mmr(...))``.  ``diversity`` ∈ [0, 1] maps to the
    MMR relevance weight λ = 1 − diversity (diversity 0 = the plain
    ranking, 1 = pure novelty); ``candidates_limit`` sizes the pool the
    plain search retrieves before the greedy pass
    (:func:`query_search.search_points_mmr` — pool-sized frames only,
    the corpus never enters the rerank).  A by-id query excludes itself
    via a ``must_not HasId`` leaf composed onto the caller filter.
    MMR trades relevance against novelty in ONE similarity scale, so
    distance-ranked (euclid/manhattan) and multivector spaces refuse."""
    from .filters import HasId  # noqa: PLC0415
    from .query_search import search_points_mmr  # noqa: PLC0415

    if not isinstance(mmr, dict):
        raise ValueError(
            "mmr must be a spec dict {'diversity': d, "
            f"'candidates_limit': n}}, got {type(mmr).__name__}")
    _check_spec_keys(mmr, {"diversity", "candidates_limit"}, "mmr")
    diversity = float(mmr.get("diversity", 0.5))
    if not 0.0 <= diversity <= 1.0:
        raise ValueError(f"mmr diversity must be in [0, 1], "
                         f"got {diversity}")
    meta, id_col, vector_name, metric = _resolve_search_space(
        root, collection, vector_name)
    if metric in ("euclid", "manhattan"):
        raise ValueError(
            f"mmr needs a similarity-ranked space (cosine/dot); "
            f"{collection!r}/{vector_name!r} ranks by {metric} distance")
    if meta.get("vectors", {}).get(vector_name, {}) \
            .get("multivector") is not None:
        raise ValueError(
            f"mmr reranks dense pools; {collection!r}/{vector_name!r} "
            f"is multivector")
    pool = int(mmr.get("candidates_limit", max(50, (k + offset) * 5)))
    if pool < k + offset:
        raise ValueError(
            f"mmr candidates_limit {pool} < limit {k + offset} — the "
            f"pool must at least cover the requested hits")
    if isinstance(spec, (list, tuple)):
        if spec and isinstance(spec[0], (list, tuple)):
            raise ValueError("mmr reranks dense pools; the nearest "
                             "query can't be a multivector")
        qdf = _vec_query_df(spark, spec)
    else:  # stored point id — lookup_from honored, self excluded
        got, same_coll = _fetch_example_vectors(
            spark, root, collection, meta, vector_name, [str(spec)],
            lookup_from_collection, lookup_from_vector,
            caller="query_points(mmr)", metric=metric)
        qdf = local_frame(
            spark, [(0, [float(x) for x in got[str(spec)]])],
            "qid long, qvec array<double>")
        if same_coll:
            from .filters import Filter  # noqa: PLC0415

            exclude = HasId([spec])
            flt = (Filter(must_not=[exclude]) if flt is None
                   else Filter(must=[as_filter(flt)],
                               must_not=[exclude]))
    out = search_points_mmr(
        spark, root, collection, qdf, k=k + int(offset), pool=pool,
        lambda_=1.0 - diversity, flt=flt, vector_name=vector_name,
        use_payload_index=use_payload_index, tenant=tenant,
        score_threshold=score_threshold,
        strict=False)  # internal: query_points checked at its entry
    # (the composed must_not HasId self-exclusion would otherwise trip
    # the driving-filter check a declared config applies by default)
    if offset:
        out = (out.filter(F.col("rank") > offset)
               .withColumn("rank", F.col("rank") - F.lit(int(offset))))
    return out


def query_batch_points(spark: SparkSession, root: str, collection: str,
                       requests: list, k: int = 10,
                       round_to: int = 6, strict=None) -> DataFrame:
    """Qdrant ``query_batch_points`` — N universal-endpoint requests
    against one collection in one call, as ONE serializable payload:
    each request is a dict of ``query_points`` fields (``query`` /
    ``prefetch`` / ``fusion`` / ``limit`` / ``filter`` / ``using`` /
    ``score_threshold`` / ``offset``), resolved independently so every
    request keeps the physical plan its node kind earns (pruned
    artifact probes, broadcast example scans, fused trees).

    Results union to one frame normalized to (req, id, score, rank) —
    ``req`` is the request's position — so a batch of k-row rankings
    stays k·n_requests rows end-to-end (corpus-size-independent past
    the per-request scans).  Qdrant's batch endpoint exists to
    amortize transport, not to change semantics: each request here is
    exactly ``query_points(**request)``, pytest-pinned."""
    if not requests:
        raise ValueError("query_batch_points needs at least one request")
    from .strict import resolve_strict_for  # noqa: PLC0415

    _sm = resolve_strict_for(root, collection, strict)
    if _sm is not None:
        from . import strict as strict_mod  # noqa: PLC0415

        strict_mod.check_batch(_sm, len(requests))
    _ALLOWED = {"query", "prefetch", "fusion", "limit", "k", "filter",
                "using", "score_threshold", "offset"}
    outs = []
    for i, req in enumerate(requests):
        if not isinstance(req, dict):
            raise ValueError(
                f"request #{i} must be a dict of query_points fields, "
                f"got {type(req).__name__}")
        bad = sorted(set(req) - _ALLOWED)
        if bad:
            raise ValueError(
                f"request #{i} has unknown keys {bad}; "
                f"allowed: {sorted(_ALLOWED)}")
        if isinstance(req.get("query"), dict) and "sample" in req["query"]:
            raise ValueError(
                f"request #{i}: sample returns full stored rows, not a "
                f"ranking — it doesn't batch; call query_points("
                f"query={{'sample': ...}}) directly")
        out = query_points(
            spark, root, collection,
            query=req.get("query"), prefetch=req.get("prefetch"),
            fusion=req.get("fusion", "rrf"),
            k=int(req.get("limit", req.get("k", k))),
            flt=req.get("filter"), vector_name=req.get("using"),
            score_threshold=req.get("score_threshold"),
            offset=int(req.get("offset", 0)), round_to=round_to,
            strict=strict)
        cols = set(out.columns)
        idc = "vec_id" if "vec_id" in cols else "id"
        score = ("sim" if "sim" in cols
                 else "score" if "score" in cols else "rrf_score")
        outs.append(out.select(
            F.lit(i).cast("int").alias("req"),
            F.col(idc).alias("id"),
            F.col(score).cast("double").alias("score"),
            F.col("rank").cast("int").alias("rank")))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def _grouped_from_scored(spark: SparkSession, root: str, collection: str,
                         scored: DataFrame, group_by: str,
                         k_groups: int, group_size: int,
                         score_threshold: float | None,
                         with_lookup: str | None,
                         id_col: str) -> DataFrame:
    """Shared tail of the posting-index grouped searches (sparse / BM25
    text): ``scored`` is the COMPLETE (vec_id, score) set of matching
    docs (similarity order, larger is better — docs sharing no
    dimension/term score nothing, Qdrant's "no match"), the group
    values fetch through the store's static id-bucket filter
    (O(|matching docs|), never a collection scan), and the same
    two-window cut that serves search_groups/recommend_groups shapes
    the result.  The group join deliberately does NOT broadcast — the
    matching set is unbounded, AQE picks the join shape.  The threshold
    cuts the scored set BEFORE the windows (Qdrant drops sub-threshold
    hits before grouping; post-window it would still be a suffix at
    both levels, same result — pre-window is just cheaper)."""
    from .query_search import _group_topk, with_group_lookup  # noqa: PLC0415
    from .upsert import materialize_small  # noqa: PLC0415

    if score_threshold is not None:
        scored = scored.filter(F.col("score") >= float(score_threshold))
    # the scored plan feeds THREE consumers (bucket probe, semi-join,
    # group join) — materialize once through the capped roundtrip;
    # past the cap it falls back to lazy re-execution of the pruned
    # posting probe (the documented trade)
    scored = materialize_small(spark, scored)
    rows = read_rows_for_ids(spark, root, collection,
                             scored.select("vec_id").distinct())
    if rows is None:
        out = (read_collection(spark, root, collection).limit(0)
               .select(F.col(group_by).alias("group"),
                       F.lit(0).cast("int").alias("group_rank"),
                       F.col(id_col).alias("vec_id"),
                       F.lit(0.0).alias("score"),
                       F.lit(0).cast("int").alias("rank_in_group")))
    else:
        gmap = rows.select(F.col(id_col).cast("string").alias("_gid"),
                           F.col(group_by).alias("group"))
        j = (scored.join(
            gmap, F.col("vec_id").cast("string") == F.col("_gid"))
            .filter(F.col("group").isNotNull())
            .select(F.lit(0).alias("qid"), "vec_id", "group",
                    F.col("score").alias("sim")))
        out = (_group_topk(j, ascending=False, k_groups=k_groups,
                           group_size=group_size)
               .select("group", "group_rank", "vec_id",
                       F.col("sim").alias("score"), "rank_in_group"))
    if with_lookup:
        out = with_group_lookup(spark, root, with_lookup, out)
    return out
