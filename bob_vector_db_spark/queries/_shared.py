"""Shared helpers for the per-family query registry modules:
oracle SQL fragments (DuckDB twins of the Spark functions),
fixture path helpers, and the filter-DSL / formula imports the
query bodies reference."""


from __future__ import annotations

import os


from ..functions import vector
from ..functions.hashing import POLY_MOD, poly_hash
from ..functions.text import ws_tokens
from ..operators import centroid, dedup, index, upsert


# DuckDB twin of functions.hashing.poly_hash (kept in one place so every
# oracle embeds the same text).
DUCK_POLY_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({t}, ''), c -> ascii(c))), "
    "(a, c) -> (a*31 + c) % 1000003)"
)
# DuckDB twin of functions.text.ws_tokens
DUCK_WS_TOKENS = r"list_filter(regexp_split_to_array(trim({t}), '\s+'), x -> length(x) > 0)"

# Exact-decimal money sum: CAST per input, sum in DECIMAL, one cast out.
DEC = "CAST({x} AS DECIMAL(18,4))"


# ---------------------------------------------------------------------------
# J6: range (theta) join — events bucketed into value bands
# ---------------------------------------------------------------------------

VALUE_BANDS = [("low", 0.0, 10.0), ("mid", 10.0, 50.0), ("high", 50.0, 1e9)]


# ---------------------------------------------------------------------------
# Dedup family (J8/F4, north star): every strategy with an integer-exact or
# rounded-deterministic DuckDB twin.  Shared oracle CTE: distinct 3-gram
# shingles per doc (DuckDB mirror of operators.dedup.doc_shingles).
# ---------------------------------------------------------------------------

_DUCK_SHINGLES_TMPL = r"""
toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> length(x) > 0) AS tk
  FROM {src}
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(greatest(len(tk)-2, 0)),
                                 i -> array_to_string(tk[i+1:i+3], ' '))) AS shingle
    FROM toks)
)"""

DUCK_SHINGLES = _DUCK_SHINGLES_TMPL.format(src="documents")


def duck_shingles_from(src: str) -> str:
    """``DUCK_SHINGLES`` over an arbitrary (doc_id, text) CTE — the store
    near-dup index oracles band a MUTATED corpus, not the raw table."""
    return _DUCK_SHINGLES_TMPL.format(src=src)

_POLY_H = DUCK_POLY_HASH.format(t="shingle")


def _minhash_ctes(num_hashes: int = 16, bands: int = 4) -> str:
    """The MinHash-LSH banding pipeline as a reusable CTE chain (follows
    ``DUCK_SHINGLES``): hashed → sig → banded.  Shared by the pair query
    oracle and the near-dup dataset-build capstone (round 14)."""
    from ..functions.hashing import MINHASH_PRIME, minhash_params  # noqa: PLC0415

    params = minhash_params(num_hashes)
    mins = ",\n       ".join(
        f"MIN((h * {a} + {b}) % {MINHASH_PRIME}) AS mh{i}"
        for i, (a, b) in enumerate(params)
    )
    rpb = num_hashes // bands
    band_rows = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, concat_ws(',', {cols}) AS band_key FROM sig".format(
            b=b, cols=", ".join(f"mh{b * rpb + r}" for r in range(rpb))
        )
        for b in range(bands)
    )
    return f"""hashed AS (SELECT doc_id, ({_POLY_H}) AS h FROM sh),
sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
banded AS (
  {band_rows}
)"""


def _minhash_oracle(num_hashes: int = 16, bands: int = 4) -> str:
    return f"""
WITH {DUCK_SHINGLES},
{_minhash_ctes(num_hashes, bands)}
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_bands_matched
FROM banded a
JOIN banded b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


def _simhash_oracle(bits: int = 64, max_hamming: int = 3,
                    src: str = "documents", prelude: str = "") -> str:
    """SimHash pair oracle; ``src`` names the (doc_id, text) relation and
    ``prelude`` prepends CTEs (e.g. a mutated-corpus CTE for the store
    index queries, round 15)."""
    votes = ",\n       ".join(
        f"SUM((((h * {2 * j + 3}) % {POLY_MOD}) & 1) * 2 - 1) AS v{j}"
        for j in range(bits)
    )
    # Bit 63 is the sign bit: encode it as the signed-long minimum so the
    # fingerprint stays in BIGINT range on both engines.
    fp_expr = " + ".join(
        "(CASE WHEN v{j} > 0 THEN CAST({w} AS BIGINT) ELSE 0 END)".format(
            j=j, w=-(2 ** 63) if j == 63 else 2 ** j)
        for j in range(bits)
    )
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks
    chunk_vals = ", ".join(f"({c})" for c in range(n_chunks))
    tok_h = DUCK_POLY_HASH.format(t="t")
    return f"""
WITH {prelude}toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             x -> length(x) > 0) AS tk
  FROM {src}
),
tok AS (SELECT doc_id, unnest(tk) AS t FROM toks),
h AS (SELECT doc_id, ({tok_h}) AS h FROM tok),
votes AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id),
fp AS (SELECT doc_id, CAST({fp_expr} AS BIGINT) AS fp FROM votes),
chunks AS (
  SELECT doc_id, fp, c, (fp >> (c * {chunk_bits})) & {(1 << chunk_bits) - 1} AS cv
  FROM fp, (VALUES {chunk_vals}) t(c)
),
cand AS (
  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib, a.fp AS fa, b.fp AS fb
  FROM chunks a JOIN chunks b ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
)
SELECT ia AS id_a, ib AS id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# Text analysis (F6 ext, north star): language-ID, quality scoring,
# token counting, fingerprinting — all JVM-side expressions
# ---------------------------------------------------------------------------

def _langid_oracle() -> str:
    from ..functions.text import LANG_MARKERS  # noqa: PLC0415

    score_cols = ",\n       ".join(
        "len(list_filter(tk, t -> list_contains([{words}], lower(t)))) AS s_{lang}".format(
            words=", ".join(f"'{w}'" for w in words), lang=lang
        )
        for lang, words in sorted(LANG_MARKERS.items())
    )
    values = ", ".join(f"('{lang}', s_{lang})" for lang in sorted(LANG_MARKERS))
    return f"""
WITH toks AS (
  SELECT doc_id, {DUCK_WS_TOKENS.format(t='text')} AS tk FROM documents
),
scored AS (SELECT doc_id, {score_cols} FROM toks)
SELECT doc_id, CAST(s_en AS BIGINT) AS s_en,
       (SELECT l FROM (VALUES {values}) t(l, s) ORDER BY s DESC, l LIMIT 1)
         AS pred_lang
FROM scored
"""


_NORM_TEXT = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_FP_HASH = DUCK_POLY_HASH.format(t=_NORM_TEXT)


# ---------------------------------------------------------------------------
# J5 at scale: IVF-blocked approximate kNN (centroid probe → pruned exact)
# ---------------------------------------------------------------------------

_DUCK_COS = """
round(
  (SELECT SUM(x*y) FROM (SELECT unnest({a})::DOUBLE AS x, unnest({b})::DOUBLE AS y))
  / ( sqrt((SELECT SUM(x*x) FROM (SELECT unnest({a})::DOUBLE AS x)))
    * sqrt((SELECT SUM(y*y) FROM (SELECT unnest({b})::DOUBLE AS y)))), 6)"""


# ---------------------------------------------------------------------------
# Training-pipeline sampling (F4 ext): deterministic hash sampling and
# train/val/test split assignment — by content hash, never rand(), so the
# selection is reproducible across runs/partitionings and oracle-checkable.
# ---------------------------------------------------------------------------

_DUCK_BUCKET = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split(substr(md5('{salt}' || chr(31) || "
    "CAST(doc_id AS VARCHAR)), 1, 8), ''), "
    "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
    "(a, c) -> a*16 + c) % 10000"
)


# ---------------------------------------------------------------------------
# Store lifecycle (round 4): the delete/compact/catalog half of the upsert
# API — Qdrant's point-delete is the twin of upload_points
# (qdrant_embedder.py:58-62), and get_or_create_collection
# (chroma_embedder.py:30-32) implies enumerate/drop.  Each query builds a
# real bucketed store in a temp dir, mutates it through operators.upsert,
# and returns the parquet READBACK — so the oracle checks the persisted
# state, not an in-memory shortcut.
# ---------------------------------------------------------------------------

def _tmp_base(sf_dir: str, tag: str) -> str:
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    token = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    # pid suffix: two processes running the same store query concurrently
    # (bench + a test session) must not rmtree each other's live stores;
    # within one process, reruns still reuse and clean the same dir
    base = os.path.join(tempfile.gettempdir(),
                        f"bvds_{tag}_{token}_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    return base


def build_concurrently(*thunks) -> None:
    """Run INDEPENDENT index builds as overlapping Spark jobs (round-15
    optimization, guide §2.6: actions are only sequential because the
    driver calls them sequentially — submitting 2-3 from a small thread
    pool lets the next build's tasks back-fill executors freed by the
    current build's straggler tail).  Only for builds over the SAME
    immutable collection state writing DISTINCT ``_index/<name>``
    staging dirs (every ``build_*_index`` kind): no shared mutable
    state, each ends in its own atomic swap.  Exceptions propagate;
    results are discarded — builds return metadata the fixtures never
    use."""
    from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

    with ThreadPoolExecutor(max_workers=min(3, len(thunks))) as pool:
        for f in [pool.submit(t) for t in thunks]:
            f.result()


# ---------------------------------------------------------------------------
# Sparse vector search (round 5): the Qdrant sparse-space twin.  A sparse
# vector lives in posting form (id, idx, val); search is an inverted-index
# probe — query dims prune the corpus nonzeros BEFORE the shuffle, exactly
# the BM25 shape, so nothing ever densifies to vocab_size.
# ---------------------------------------------------------------------------

_SPARSE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id AS id, unnest({DUCK_WS_TOKENS.format(t='lower(text)')}) AS tok
  FROM documents
),
post AS (
  SELECT id, ({DUCK_POLY_HASH.format(t='tok')}) % 512 AS idx,
         CAST(COUNT(*) AS DOUBLE) AS val
  FROM toks GROUP BY id, idx
),
q AS (SELECT id AS qid, idx, val AS qval FROM post WHERE id < 3),
pairs AS (
  SELECT q.qid, p.id AS vec_id, round(SUM(p.val * q.qval), 6) AS sim
  FROM post p JOIN q ON p.idx = q.idx
  WHERE q.qid <> p.id
  GROUP BY q.qid, p.id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
"""


# ---------------------------------------------------------------------------
# Qdrant API surface completions (round 5): discover (context-pair search),
# facet (filtered value counts), order_by scroll (composite keyset), and the
# distance matrix (pairwise sims over a sampled point set).
# ---------------------------------------------------------------------------

def _duck_cos(a: str, b: str) -> str:
    """DuckDB cosine(a, b) rounded to 6 — the same arithmetic the Spark side
    uses, so comparisons BETWEEN two cosines agree across engines."""
    return (
        f"round((SELECT SUM(a*b) FROM (SELECT unnest({a})::DOUBLE AS a, "
        f"unnest({b})::DOUBLE AS b)) / "
        f"(sqrt((SELECT SUM(a*a) FROM (SELECT unnest({a})::DOUBLE AS a))) * "
        f"sqrt((SELECT SUM(b*b) FROM (SELECT unnest({b})::DOUBLE AS b)))), 6)"
    )


# ---------------------------------------------------------------------------
# Round 6: composable filter DSL (operators/filters.py) + filtered Query API
# (operators/query_api.py).  The DSL compiles ONCE to a SQL boolean in the
# dialect subset Spark and DuckDB share, so each oracle below embeds the
# LITERAL to_sql() output — Spark/oracle symmetry is structural.
# ---------------------------------------------------------------------------

from ..operators.filters import (  # noqa: E402
    Filter,
    GeoRadius,
    IsEmpty,
    MatchAny,
    MatchExcept,
    MatchText,
    MatchValue,
    Range,
    ValuesCount,
)

_DSL_FLT = Filter(
    must=[MatchAny("lang", ["en", "de", "fr"]),
          Range("n_chars", gte=120, lt=400)],
    should=[MatchValue("source", "src3"), MatchText("text", "data table")],
    must_not=[MatchValue("lang", "fr")],
)


_GEO_FLT = Filter(must=[GeoRadius("lat", "lon", 10.0, 20.0, 1_500_000.0)])


from ..operators.filters import DatetimeRange  # noqa: E402

_DT_FLT = Filter(
    must=[DatetimeRange("ts", gte="2024-01-10 00:00:00",
                        lt="2024-01-20 00:00:00")],
    must_not=[MatchValue("event_type", "view")],
)


_VC_FLT = Filter(
    must=[MatchExcept("lang", ["fr"])],
    should=[IsEmpty("tags"), ValuesCount("tags", gte=2, lte=3)],
)


from ..operators.filters import MatchPhrase, MatchTextPrefix  # noqa: E402

_PHRASE_FLT = Filter(must=[MatchPhrase("text", "data table"),
                           Range("n_chars", gte=100)])


_SAMPLE_FLT = Filter(must_not=[MatchValue("lang", "fr")])


from ..operators.filters import MatchContains  # noqa: E402

_SP_FLT = Filter(must=[MatchContains("tags", "l1")])


_ARR_FLT = Filter(must=[MatchContains("tags", "l1"),
                        Range("parity", lte=1)])


# ---------------------------------------------------------------------------
# round 7: filtered search composed WITH the ANN artifact, nested payload
# keys + NestedCondition, GeoPolygon, multivector max-sim — the remaining
# delegated-surface tail (VERDICT r6 "What's missing" #1-4).
# ---------------------------------------------------------------------------

from ..operators.filters import GeoPolygon, NestedCondition  # noqa: E402

_FIS_FLT = Filter(must=[MatchAny("grp", ["g0", "g1"]),
                        Range("parity", lte=1)])


_NESTED_FLT = Filter(
    must=[MatchValue("meta.lang", "en"),
          Range("meta.n_chars", gte=150),
          NestedCondition("props", Filter(
              must=[MatchValue("kind", "src"), Range("num", gte=2)]))])


_POLY_FLT = Filter(must=[GeoPolygon(
    "lat", "lon",
    exterior=[(0.0, -30.0), (35.0, -10.0), (45.0, 25.0),
              (10.0, 45.0), (-15.0, 10.0)],
    interiors=[[(5.0, -5.0), (20.0, -5.0), (20.0, 15.0), (5.0, 15.0)]])])


_WP_FLT = Filter(must=[Range("n", gte=40)])


_SPF_FLT = Filter(must=[MatchValue("parity", 1)])


_TXT_FLT = Filter(must=[MatchAny("lang", ["en", "de"])])


# ---------------------------------------------------------------------------
# round 8: typed RANGE payload index (Range/DatetimeRange leaves resolve to
# candidate ids and compose with the ANN artifact), multivector ANN artifact,
# with_vectors, nested element index, cursor-returning scroll — the VERDICT
# r7 "Next round" list.
# ---------------------------------------------------------------------------

_RI_FLT = Filter(must=[Range("score", gte=12.0, lt=61.0)])


_DTI_FLT = Filter(must=[DatetimeRange("ts", gte="2024-02-01 00:00:00",
                                      lt="2024-03-15 00:00:00")])


_RIX_FLT = Filter(must=[Range("score", gte=20.0, lt=80.0)])


_NIX_FLT = Filter(must=[NestedCondition("props", Filter(
    must=[MatchValue("kind", "src"), MatchAny("num", [1, 3])]))])


_MTI_FLT = Filter(must=[MatchText("text", "data table")])


_MPI_FLT = Filter(must=[MatchPhrase("text", "data table")])


_TPX_FLT = Filter(must=[MatchTextPrefix("text", "dat tabl")])


_MTW_FLT = Filter(must=[MatchText("text", "data table", tokenizer="word")])


_TSW_FLT = Filter(must=[MatchPhrase("text", "the data table",
                                    stopwords="english")])


_TST_FLT = Filter(must=[MatchText("text", "queries tables columns",
                                  stemmer="english")])


_GIX_FLT = Filter(must=[GeoRadius("lat", "lon", 45.0, 10.0, 300_000.0)])


_HASID_IDS = tuple(range(0, 200, 3)) + (1_000_000,)  # ghost id: fetches nothing


from ..operators.filters import MatchValue as _FMatchValue  # noqa: E402
from ..operators.formula import compile_formula  # noqa: E402

_FB_FORMULA = {"sum": ["$score",
                       {"mult": [0.25, _FMatchValue("grp", "g1")]},
                       {"mult": [0.01, "n"]}]}
_FB_DUCK, _ = compile_formula(_FB_FORMULA, 1, dialect="duckdb")


_FD_FORMULA = {"sum": [
    {"mult": ["$score",
              {"gauss_decay": {"x": {"datetime_key": "ts"},
                               "target": {"datetime": "2024-01-01 08:00:00"},
                               "scale": 7200.0, "midpoint": 0.5}}]},
    {"mult": [2.0,
              {"exp_decay": {"x": {"geo_distance": {
                  "origin": {"lat": 10.0, "lon": 20.0},
                  "to": {"lat_key": "lat", "lon_key": "lon"}}},
                  "scale": 2000000.0, "midpoint": 0.5}}]},
]}
_FD_DUCK, _ = compile_formula(_FD_FORMULA, 1, dialect="duckdb")


# star-import surface for the family modules (underscore
# names included on purpose — the helpers are private to the
# registry package but shared across its modules)
__all__ = [
    "DEC",
    "DUCK_POLY_HASH",
    "DUCK_SHINGLES",
    "DUCK_WS_TOKENS",
    "DatetimeRange",
    "Filter",
    "GeoPolygon",
    "GeoRadius",
    "IsEmpty",
    "MatchAny",
    "MatchContains",
    "MatchExcept",
    "MatchPhrase",
    "MatchText",
    "MatchTextPrefix",
    "MatchValue",
    "NestedCondition",
    "Range",
    "VALUE_BANDS",
    "ValuesCount",
    "_",
    "_ARR_FLT",
    "_DSL_FLT",
    "_DTI_FLT",
    "_DT_FLT",
    "_DUCK_BUCKET",
    "_DUCK_COS",
    "_FB_DUCK",
    "_FB_FORMULA",
    "_FD_DUCK",
    "_FD_FORMULA",
    "_FIS_FLT",
    "_FMatchValue",
    "_FP_HASH",
    "_GEO_FLT",
    "_GIX_FLT",
    "_HASID_IDS",
    "_MPI_FLT",
    "_MTI_FLT",
    "_MTW_FLT",
    "_NESTED_FLT",
    "_NIX_FLT",
    "_NORM_TEXT",
    "_PHRASE_FLT",
    "_POLY_FLT",
    "_POLY_H",
    "_RIX_FLT",
    "_RI_FLT",
    "_SAMPLE_FLT",
    "_SPARSE_ORACLE",
    "_SPF_FLT",
    "_SP_FLT",
    "build_concurrently",
    "_TPX_FLT",
    "_TST_FLT",
    "_TSW_FLT",
    "_TXT_FLT",
    "_VC_FLT",
    "_WP_FLT",
    "_duck_cos",
    "_langid_oracle",
    "_minhash_ctes",
    "_minhash_oracle",
    "_simhash_oracle",
    "_tmp_base",
    "compile_formula",
    "duck_shingles_from"
]
