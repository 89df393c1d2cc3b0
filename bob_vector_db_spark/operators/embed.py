"""Embedding operators (SURVEY.md §2.10 X1-X3).

X3 — the deterministic hash embedder — is the oracle-tested path: a
HashingTF-style bag-of-tokens vector computed entirely with built-in SQL
functions (split → poly-hash → bucket-count), so Spark and DuckDB agree
bit-for-bit and the whole embed pipeline is hash-checkable.

X1/X2 — real ML embedders (sentence-transformers MiniLM, CLIP — the
reference's defaults at qdrant_embedder.py:56-57,71) — follow the reference's
lazy one-time model-init pattern (``self.text_model = self.text_model or ...``
at qdrant_embedder.py:76,87) as Iterator pandas UDFs: the model loads once per
Python worker, then streams Arrow batches.  The model libraries are not in
this container, so the loader is gated behind an import-try and unit tests use
a deterministic fake.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import POLY_MOD, poly_hash
from ..functions.text import ws_tokens


def hash_embed(text: Column, dim: int = 64) -> Column:
    """X3: deterministic bag-of-tokens embedding, ARRAY<DOUBLE> of length
    ``dim``; component j = count of tokens whose poly-hash lands in bucket j.

    Column form for small inputs (query vectors, unit tests).  Spark's
    higher-order functions are interpreted, so this is O(dim · n_tokens)
    lambda evaluations per row — for corpus-scale embedding use
    :func:`hash_embed_df`, which restructures the same computation as
    codegen'd row aggregation.
    """
    bucketed = F.transform(ws_tokens(text), lambda t: poly_hash(t, POLY_MOD) % dim)
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.size(F.filter(bucketed, lambda b: b == j.cast("long"))).cast("double"),
    )


def hash_embed_df(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  dim: int = 64, out_col: str = "vec") -> DataFrame:
    """X3 at scale: same embedding as :func:`hash_embed` but computed as
    explode → bucket → groupBy(id, bucket) count → re-assemble.

    The hot path (token hashing + bucket counting) is a plain hash aggregate
    — whole-stage codegen, map-side partials, one shuffle on (id, bucket).
    Only the final 1-lambda-per-dim zero-fill is interpreted, and it runs
    once per document, not once per token.
    """
    toks = df.select(F.col(id_col), F.explode(ws_tokens(F.col(text_col))).alias("tok"))
    counts = (
        toks.select(id_col, (poly_hash(F.col("tok"), POLY_MOD) % dim).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    assembled = (
        counts.groupBy(id_col)
        .agg(F.map_from_entries(F.collect_list(F.struct("bucket", "tf"))).alias("_m"))
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: F.coalesce(
                    F.element_at(F.col("_m"), j.cast("long")), F.lit(0)
                ).cast("double"),
            ).alias(out_col),
        )
    )
    # documents with zero tokens still deserve a (zero) vector
    zeros = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda _: F.lit(0.0))
    return (
        df.select(id_col).join(assembled, id_col, "left")
        .select(id_col, F.coalesce(F.col(out_col), zeros).alias(out_col))
    )


# ---------------------------------------------------------------------------
# X1: pluggable ML text embedder (rows-only checked; off the oracle path)
# ---------------------------------------------------------------------------

DEFAULT_TEXT_MODEL = "sentence-transformers/all-MiniLM-L6-v2"  # qdrant_embedder.py:56-57


def _load_text_model(model_name: str):
    """Lazy import so the engine works without ML deps installed."""
    try:
        from sentence_transformers import SentenceTransformer  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - container has no ML libs
        raise NotImplementedError(
            f"sentence-transformers not installed; cannot load {model_name!r}. "
            "Use operators.embed.hash_embed (X3) for the deterministic path."
        ) from exc
    return SentenceTransformer(model_name)


def make_text_embedder_udf(model_name: str = DEFAULT_TEXT_MODEL,
                           dim: int = 384,
                           _encode_fn=None):
    """Build an Iterator pandas UDF embedding a string column → array<float>.

    ``_encode_fn`` injects a deterministic fake for tests (batch: list[str] →
    list[list[float]]).  The real path loads the model once per executor
    worker — the Spark analogue of the reference's lazy init.
    """

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        encode = _encode_fn
        if encode is None:
            model = _load_text_model(model_name)
            encode = lambda texts: model.encode(texts).tolist()  # noqa: E731
        for batch in batches:
            yield pd.Series(encode(batch.tolist()))

    return embed_udf


def embed_documents(df: DataFrame, text_col: str = "document",
                    out_col: str = "text_vec", dim: int = 64,
                    ml_model: str | None = None, _encode_fn=None) -> DataFrame:
    """Attach an embedding column: deterministic X3 by default, ML X1 when a
    model name is given (same column contract either way).
    """
    if ml_model is None and _encode_fn is None:
        return df.withColumn(out_col, hash_embed(F.col(text_col), dim))
    udf = make_text_embedder_udf(ml_model or DEFAULT_TEXT_MODEL, dim, _encode_fn)
    return df.withColumn(out_col, udf(F.col(text_col)))
