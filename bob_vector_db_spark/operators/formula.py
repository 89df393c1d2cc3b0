"""Formula rescoring — Qdrant's ``FormulaQuery`` (score boosting).

The reference delegates all querying to a Qdrant server (reference
``qdrant_embedder.py:119-128`` holds the client; ``README.md:13`` names
the delegated engine), whose Query API accepts::

    query_points(collection,
                 prefetch=[Prefetch(...), ...],
                 query=FormulaQuery(formula=..., defaults={...}))

Candidates come from the prefetch branches; the final score is an
arbitrary arithmetic expression over the branch scores (``$score[i]``),
numeric payload fields, boolean filter conditions (1/0), geo distances,
and decay functions (Qdrant's score-boosting surface).

Spark-first design: the formula compiles to ONE shared-dialect SQL
scalar — the ``filters.py`` convention, so the exact compiled text also
interpolates into the DuckDB oracles — evaluated JVM-side over

    (union of branch ids) ⋈ per-branch scores ⋈ bucket-pruned payload

All joins are broadcast (k·n_branches rows by construction), the payload
fetch goes through the store's static ``id_bucket`` filter
(``read_rows_for_ids`` — O(|hits|), never a collection scan), and the
rescore itself is whole-stage-codegen arithmetic: no UDFs anywhere.

Expression grammar (mirrors Qdrant's JSON shapes):

==========================  =============================================
leaf / node                 meaning
==========================  =============================================
``int`` / ``float``         constant
``"$score"``                branch-0 prefetch score (alias of $score[0])
``"$score[i]"``             branch-i prefetch score (missing → default/0)
``"key"`` / ``"a.b"``       numeric payload field (dotted = struct field)
filter condition / Filter   1.0 when it matches, else 0.0 (NULL-safe)
``{"sum": [e, ...]}``       e1 + e2 + ...
``{"mult": [e, ...]}``      e1 * e2 * ...
``{"div": {"left", "right", "by_zero_default"?}}``  guarded division
``{"neg"|"abs"|"sqrt"|"exp"|"ln"|"log10": e}``      unary math
``{"pow": {"base", "exponent"}}``                   POWER(base, exp)
``{"geo_distance": {"origin": {"lat","lon"},
   "to": {"lat_key","lon_key"}}}``   haversine meters to stored point
``{"datetime": "YYYY-MM-DD HH:MM:SS"}``  UTC epoch-seconds constant
``{"datetime_key": "key"}``              epoch seconds of a ts column
``{"lin_decay"|"exp_decay"|"gauss_decay":
   {"x": e, "target": e?, "scale": s?, "midpoint": m?}}``  decay kernels
==========================  =============================================

Decay kernels (Qdrant's documented forms; ``target`` defaults 0,
``scale`` 1, ``midpoint`` 0.5 — the value of the kernel at distance
``scale`` from ``target``):

- ``gauss_decay``: ``exp(ln(m)/s² · (x-t)²)``
- ``exp_decay``:   ``exp(ln(m)/s · |x-t|)``
- ``lin_decay``:   ``max(0, 1 - (1-m)/s · |x-t|)``

``defaults`` maps a variable name (``"$score[i]"`` / payload key) to the
constant used when the variable is NULL / the point missed branch i —
Qdrant's ``FormulaQuery.defaults``.  A payload key with no default keeps
SQL NULL semantics (the hit's score goes NULL and sorts last).
"""
from __future__ import annotations

import math
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .filters import _EARTH_RADIUS_M, _TS_LITERAL, _ident, _lit

_SCORE = "$score"


def _is_score_ref(s: str) -> int | None:
    """``"$score"`` → 0, ``"$score[i]"`` → i, anything else → None."""
    if s == _SCORE:
        return 0
    if s.startswith(_SCORE + "[") and s.endswith("]"):
        body = s[len(_SCORE) + 1:-1]
        if body.isdigit():
            return int(body)
    return None


def _epoch_const(v: str) -> str:
    """A datetime literal folded driver-side to UTC epoch seconds (the
    repo pins the session zone to UTC, the DatetimeRange convention)."""
    v = str(v).replace("T", " ")
    if not _TS_LITERAL.match(v):
        raise ValueError(
            f"datetime literal {v!r} is not 'YYYY-MM-DD HH:MM:SS[.ffffff]'")
    fmt = "%Y-%m-%d %H:%M:%S.%f" if "." in v else "%Y-%m-%d %H:%M:%S"
    ts = datetime.strptime(v, fmt).replace(tzinfo=timezone.utc).timestamp()
    return _lit(float(ts))


class FormulaCompiler:
    """Compiles one formula tree to a shared-dialect SQL scalar.

    ``dialect`` switches ONLY the epoch-seconds primitive
    (``datetime_key``): Spark spells it ``unix_timestamp``, DuckDB
    ``floor(epoch(...))`` — every other node is the shared subset both
    engines parse identically (the filters.py discipline).
    """

    def __init__(self, n_branches: int, defaults: dict | None = None,
                 dialect: str = "spark"):
        if dialect not in ("spark", "duckdb"):
            raise ValueError(f"unknown dialect {dialect!r}")
        self.n = int(n_branches)
        self.defaults = dict(defaults or {})
        self.dialect = dialect
        self.payload_keys: set[str] = set()

    # -- leaves -----------------------------------------------------------

    def _score(self, i: int) -> str:
        if not (0 <= i < self.n):
            raise ValueError(
                f"$score[{i}] but only {self.n} prefetch branches")
        dflt = self.defaults.get(f"$score[{i}]",
                                 self.defaults.get(_SCORE, 0.0)
                                 if i == 0 else 0.0)
        return f"COALESCE(_score_{i}, {_lit(float(dflt))})"

    def _field(self, key: str) -> str:
        self.payload_keys.add(key.split(".", 1)[0])
        ident = _ident(key)
        if key in self.defaults:
            return f"COALESCE({ident}, {_lit(self.defaults[key])})"
        return ident

    def _epoch_key(self, key: str) -> str:
        self.payload_keys.add(key.split(".", 1)[0])
        ident = _ident(key)
        if self.dialect == "spark":
            out = f"CAST(unix_timestamp({ident}) AS DOUBLE)"
        else:
            out = f"CAST(floor(epoch({ident})) AS DOUBLE)"
        if key in self.defaults:
            return f"COALESCE({out}, {_lit(float(self.defaults[key]))})"
        return out

    def _harvest_keys(self, cond) -> None:
        # A condition may be a composite Filter (the grammar accepts any
        # filter-DSL object): walk must/should/must_not recursively so
        # EVERY referenced root column reaches payload_keys — otherwise
        # formula_rescore skips the payload fetch and F.expr fails at
        # analysis with an unresolved column.  A NestedCondition's inner
        # filter rewrites its keys to the lambda variable, so only the
        # array column itself is a root reference.
        for branch in ("must", "should", "must_not"):
            for sub in getattr(cond, branch, ()) or ():
                self._harvest_keys(sub)
        # ``column`` covers HasVector (the space's physical column) and
        # ``id_col`` covers HasId (ADVICE r9): both render into the
        # condition SQL, so the rescore must fetch them like any payload
        # key — formula_rescore skips keys the candidate frame already
        # carries (the string-cast ``id``).
        for key in getattr(cond, "key", None), \
                getattr(cond, "lat_key", None), \
                getattr(cond, "lon_key", None), \
                getattr(cond, "column", None), \
                getattr(cond, "id_col", None):
            if isinstance(key, str):
                self.payload_keys.add(key.split(".", 1)[0])

    def _condition(self, cond) -> str:
        # CASE WHEN is the NULL-safe 1/0 cast: a NULL predicate (missing
        # payload) scores 0.0, Qdrant's "condition did not match"
        sql = cond.to_sql()
        self._harvest_keys(cond)
        return f"(CASE WHEN {sql} THEN 1.0 ELSE 0.0 END)"

    # -- nodes ------------------------------------------------------------

    def _decay(self, kind: str, spec: dict) -> str:
        if not isinstance(spec, dict) or "x" not in spec:
            raise ValueError(f"{kind} needs {{'x': expr, ...}}")
        x = self.compile(spec["x"])
        t = self.compile(spec.get("target", 0.0))
        scale = float(spec.get("scale", 1.0))
        midpoint = float(spec.get("midpoint", 0.5))
        if scale <= 0:
            raise ValueError(f"{kind}: scale must be positive, got {scale}")
        if not (0.0 < midpoint < 1.0):
            raise ValueError(
                f"{kind}: midpoint must be in (0, 1), got {midpoint}")
        if kind == "gauss_decay":
            lam = math.log(midpoint) / (scale * scale)
            return f"EXP({_lit(lam)} * POWER(({x}) - ({t}), 2))"
        if kind == "exp_decay":
            lam = math.log(midpoint) / scale
            return f"EXP({_lit(lam)} * ABS(({x}) - ({t})))"
        # lin_decay
        slope = (1.0 - midpoint) / scale
        return (f"GREATEST(0.0, 1.0 - {_lit(slope)} * "
                f"ABS(({x}) - ({t})))")

    def _geo_distance(self, spec: dict) -> str:
        origin, to = spec.get("origin"), spec.get("to")
        if not (isinstance(origin, dict) and isinstance(to, dict)
                and {"lat", "lon"} <= set(origin)
                and {"lat_key", "lon_key"} <= set(to)):
            raise ValueError(
                "geo_distance needs {'origin': {'lat','lon'}, "
                "'to': {'lat_key','lon_key'}} — the store keeps "
                "coordinates as two plain double columns")
        # the GeoRadius haversine, shared-dialect by construction
        from .filters import GeoRadius  # noqa: PLC0415

        leaf = GeoRadius(str(to["lat_key"]), str(to["lon_key"]),
                         float(origin["lat"]), float(origin["lon"]), 1.0)
        self.payload_keys.add(str(to["lat_key"]).split(".", 1)[0])
        self.payload_keys.add(str(to["lon_key"]).split(".", 1)[0])
        return leaf.haversine_sql()

    def compile(self, node) -> str:
        """The SQL scalar for one formula node (recursive)."""
        if isinstance(node, bool):
            raise TypeError("bare booleans are not formula values; use a "
                            "filter condition for 1/0 semantics")
        if isinstance(node, (int, float)):
            return _lit(float(node))
        if isinstance(node, str):
            i = _is_score_ref(node)
            if i is not None:
                return self._score(i)
            return self._field(node)
        if hasattr(node, "to_sql"):  # a filter DSL condition / Filter
            return self._condition(node)
        if not isinstance(node, dict) or len(node) != 1:
            raise TypeError(
                f"formula node must be a number, '$score[i]', a payload "
                f"key, a filter condition, or a one-key dict; got "
                f"{node!r}")
        (op, arg), = node.items()
        if op in ("sum", "mult"):
            if not isinstance(arg, (list, tuple)) or not arg:
                raise ValueError(f"{op} needs a non-empty list")
            joiner = " + " if op == "sum" else " * "
            return "(" + joiner.join(
                f"({self.compile(a)})" for a in arg) + ")"
        if op == "div":
            left = self.compile(arg["left"])
            right = self.compile(arg["right"])
            bzd = arg.get("by_zero_default")
            bzd_sql = (_lit(float(bzd)) if bzd is not None
                       else "CAST(NULL AS DOUBLE)")
            # guarded: Spark's ANSI mode raises on x/0, DuckDB returns
            # inf — the CASE keeps both engines on Qdrant's semantics
            return (f"(CASE WHEN ({right}) = 0 THEN {bzd_sql} "
                    f"ELSE ({left}) / ({right}) END)")
        if op == "neg":
            return f"(-({self.compile(arg)}))"
        if op in ("abs", "sqrt", "exp", "ln", "log10"):
            return f"{op.upper()}({self.compile(arg)})"
        if op == "pow":
            return (f"POWER({self.compile(arg['base'])}, "
                    f"{self.compile(arg['exponent'])})")
        if op == "geo_distance":
            return self._geo_distance(arg)
        if op == "datetime":
            return _epoch_const(arg)
        if op == "datetime_key":
            return self._epoch_key(str(arg))
        if op in ("lin_decay", "exp_decay", "gauss_decay"):
            return self._decay(op, arg)
        raise ValueError(f"unknown formula op {op!r}")


def compile_formula(formula, n_branches: int, defaults: dict | None = None,
                    dialect: str = "spark") -> tuple[str, set[str]]:
    """Compile a formula tree → (SQL scalar, referenced payload root
    columns).  Branch scores are referenced as ``_score_{i}`` columns."""
    c = FormulaCompiler(n_branches, defaults, dialect)
    return c.compile(formula), c.payload_keys


def formula_rescore(spark: SparkSession, root: str, collection: str,
                    prefetch: list, formula, defaults: dict | None = None,
                    k: int = 10, round_to: int = 6,
                    with_payload: bool | list = False,
                    with_vectors: bool | list = False) -> DataFrame:
    """Qdrant ``query_points(prefetch=..., query=FormulaQuery(...))``.

    Each prefetch branch is a ranked DataFrame with ``id`` + ``score``
    columns (the ``fuse_prefetch`` leaf convention) or a nested fusion
    dict.  The candidate set is the UNION of all branches (Qdrant's
    semantics); each candidate's branch scores pivot into ``_score_{i}``
    columns, payload columns the formula references are fetched through
    the store's bucket-pruned ``read_rows_for_ids``, and the compiled
    scalar evaluates JVM-side.  Returns ``(id, score, rank)`` ranked by
    the formula score descending, id ascending on ties (deterministic).
    """
    from .query_api import attach_payload, attach_vectors, \
        fuse_prefetch  # noqa: PLC0415
    from .upsert import collection_meta, read_rows_for_ids  # noqa: PLC0415

    if not prefetch:
        raise ValueError("formula_rescore needs at least one prefetch "
                         "branch — candidates come from the prefetches")
    branches = [fuse_prefetch(b, k=k, round_to=round_to, spark=spark,
                              root=root, collection=collection)
                if isinstance(b, dict) else b
                for b in prefetch]
    scored = []
    for i, b in enumerate(branches):
        id_col = "id" if "id" in b.columns else (
            "vec_id" if "vec_id" in b.columns else None)
        if id_col is None or "score" not in b.columns:
            raise ValueError(
                f"prefetch branch {i} must carry an 'id' (or 'vec_id') "
                f"and a 'score' column; has {b.columns}")
        scored.append(b.select(
            F.col(id_col).cast("string").alias("id"),
            F.col("score").cast("double").alias(f"_score_{i}")))

    sql, payload_keys = compile_formula(formula, len(branches), defaults,
                                        dialect="spark")

    # union of branch ids, then broadcast-join each branch's score back —
    # every frame here is ≤ Σ k_i rows by construction
    ids = scored[0].select("id")
    for s in scored[1:]:
        ids = ids.unionByName(s.select("id"))
    cand = ids.distinct()
    for s in scored:
        cand = cand.join(F.broadcast(s), "id", "left")

    # The one key the candidate frame legitimately carries is the POINT
    # ID under its default name: a HasId leaf on id_col='id' evaluates
    # against cand's string-cast ids, so it needs no fetch.  Any OTHER
    # collision (a stored payload field literally named 'id' while the
    # collection's id_col is different, or one named like a _score_i
    # column) would silently bind the condition to the wrong column —
    # refuse loudly instead (r10 review finding).
    meta = collection_meta(root, collection) or {}
    id_col = meta.get("id_col", "id")
    skip = {"id"} if id_col == "id" else set()
    clash = sorted((payload_keys - skip) & set(cand.columns))
    if clash:
        raise ValueError(
            f"formula references column(s) {clash} that collide with the "
            f"rescore frame's columns (the candidate ids / branch "
            f"scores). If this came from a HasId leaf, pass the "
            f"collection's real id column (HasId(ids, "
            f"id_col={id_col!r})); if it is a stored payload field, "
            f"rename it or rescore through a view that aliases it")
    fetch_keys = sorted(payload_keys - skip)
    if fetch_keys:
        rows = read_rows_for_ids(spark, root, collection,
                                 cand.select("id"))
        if rows is None:
            raise ValueError(
                f"collection {collection!r} has no stored rows to "
                f"resolve formula payload fields {fetch_keys}")
        missing = sorted(set(fetch_keys) - set(rows.columns))
        if missing:
            raise ValueError(
                f"formula references {missing} not in the stored schema "
                f"of {collection!r}; add a default or fix the key")
        looked = rows.select(
            F.col(id_col).cast("string").alias("_fp_id"),
            *fetch_keys)
        cand = (cand.join(F.broadcast(looked),
                          cand["id"] == F.col("_fp_id"), "left")
                .drop("_fp_id"))

    from pyspark.sql import Window  # noqa: PLC0415

    out = (cand.withColumn("score",
                           F.round(F.expr(sql).cast("double"), round_to))
           .withColumn("rank", F.row_number().over(
               Window.orderBy(F.col("score").desc_nulls_last(), "id")))
           .filter(F.col("rank") <= int(k))
           .select("id", "score", "rank"))
    if with_payload:
        out = attach_payload(spark, root, collection, out, with_payload,
                             id_col_out="id")
    if with_vectors:
        out = attach_vectors(spark, root, collection, out, with_vectors,
                             id_col_out="id")
    return out
