"""Embed-message normalization and zip-explode (SURVEY.md §2.1 S1/S2, §2.2
P1-P3, §2.10 X5).

The reference's unit of ingest is a JSON "embed message"
(reference README.md:40-58):

    {"collection": str, "documents": [str], "metadatas": [dict],
     "ids": [str]?, "images": [str]?}

with the four lists positionally zipped into records
(qdrant_embedder.py:130-142 indexes every list by ``idx``).  Its ``/embed_raw``
entry point additionally accepts *anything* and coerces it with a 3-branch
probe (embedder.py:234-267):

    1. well-formed message            → pass through
    2. any other JSON object          → documents := [.documents | .data |
                                        whole-object-as-json], metadatas := [.]
    3. non-JSON plain text            → documents := [text],
                                        metadatas := [{"data": text}]

Here each branch is a declarative column expression — `from_json` PERMISSIVE
probing + `coalesce`/`when` chains — so Catalyst can pipeline normalization
into the scan with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import content_id

MESSAGE_SCHEMA = T.StructType([
    T.StructField("collection", T.StringType()),
    T.StructField("documents", T.ArrayType(T.StringType())),
    T.StructField("metadatas", T.ArrayType(T.StringType())),  # kept as raw JSON strings (open schema)
    T.StructField("ids", T.ArrayType(T.StringType())),
    T.StructField("images", T.ArrayType(T.StringType())),
])

# 'data' probed for raw branch 2 (embedder.py:251-253); `_corrupt_record`
# captures non-JSON input so the branch-3 probe works even though PERMISSIVE
# from_json yields an all-null struct (not a NULL struct) on malformed input.
RAW_PROBE_SCHEMA = T.StructType([
    T.StructField("collection", T.StringType()),
    T.StructField("documents", T.ArrayType(T.StringType())),
    T.StructField("metadatas", T.ArrayType(T.StringType())),
    T.StructField("ids", T.ArrayType(T.StringType())),
    T.StructField("images", T.ArrayType(T.StringType())),
    T.StructField("data", T.StringType()),
    T.StructField("_corrupt_record", T.StringType()),
])


def parse_messages(df: DataFrame, json_col: str = "value",
                   default_collection: str = "default",
                   keep: tuple[str, ...] = ()) -> DataFrame:
    """S1: parse well-formed embed-message JSON strings into typed columns.

    ``collection`` defaults like the reference node parameter
    ``default_collection`` (embedder.py:249-250); missing ``metadatas``
    defaults to one empty payload per document.  ``keep`` names provenance
    columns (source_topic, ingest timestamps) carried through unchanged.
    """
    parsed = df.withColumn("_msg", F.from_json(F.col(json_col), MESSAGE_SCHEMA))
    return parsed.select(
        F.coalesce(F.col("_msg.collection"), F.lit(default_collection)).alias("collection"),
        F.col("_msg.documents").alias("documents"),
        F.coalesce(
            F.col("_msg.metadatas"),
            F.transform(F.col("_msg.documents"), lambda _: F.lit("{}")),
        ).alias("metadatas"),
        F.col("_msg.ids").alias("ids"),
        F.col("_msg.images").alias("images"),
        *[F.col(c) for c in keep],
    )


def normalize_raw(df: DataFrame, text_col: str = "value",
                  default_collection: str = "default",
                  keep: tuple[str, ...] = ()) -> DataFrame:
    """S2: the 3-branch ``/embed_raw`` coercion (embedder.py:234-267) as one
    declarative projection.

    Branch probing uses PERMISSIVE ``from_json``: a non-JSON input yields a
    NULL struct (the reference's ``except json.JSONDecodeError`` branch 3).
    """
    c = F.col(text_col)
    probed = df.withColumn(
        "_p",
        F.from_json(c, RAW_PROBE_SCHEMA,
                    {"mode": "PERMISSIVE",
                     "columnNameOfCorruptRecord": "_corrupt_record"}),
    )
    is_json = F.col("_p").isNotNull() & F.col("_p._corrupt_record").isNull()
    well_formed = (
        F.col("_p.collection").isNotNull()
        & F.col("_p.documents").isNotNull()
        & F.col("_p.metadatas").isNotNull()
    )

    documents = (
        F.when(is_json & well_formed, F.col("_p.documents"))
        .when(is_json & F.col("_p.documents").isNotNull(), F.col("_p.documents"))
        .when(is_json & F.col("_p.data").isNotNull(), F.array(F.col("_p.data")))
        .when(is_json, F.array(c))       # whole-dict-as-JSON-string (embedder.py:253)
        .otherwise(F.array(c))           # branch 3: plain text (embedder.py:262-267)
    )
    metadatas = (
        F.when(is_json & well_formed, F.col("_p.metadatas"))
        .when(is_json, F.array(c))       # metadatas := [whole original dict] (embedder.py:254)
        .otherwise(F.array(F.to_json(F.struct(c.alias("data")))))  # {"data": raw}
    )
    # Only branch 1 (well-formed) keeps the message's collection; branches
    # 2/3 force the default even when the dict carries a 'collection' key
    # (embedder.py:248-250 builds the branch-2 message from scratch).
    collection = (
        F.when(is_json & well_formed, F.col("_p.collection"))
        .otherwise(F.lit(default_collection))
    )
    return probed.select(
        collection.alias("collection"),
        documents.alias("documents"),
        metadatas.alias("metadatas"),
        F.col("_p.ids").alias("ids"),
        F.col("_p.images").alias("images"),
        *[F.col(c) for c in keep],
    )


def zip_explode(messages: DataFrame, deterministic_ids: bool = True,
                keep: tuple[str, ...] = ()) -> DataFrame:
    """X5/F8: one message → N records, positionally zipping the four lists
    (qdrant_embedder.py:130-142), with id defaulting.

    ``arrays_zip`` + ``posexplode`` is the whole-stage-codegen expression of
    the reference's ``enumerate(data['metadatas'])`` loop.  Missing ids get
    deterministic content hashes on the tested path (the reference uses uuid4,
    qdrant_embedder.py:115-117 — available via deterministic_ids=False).
    """
    exploded = messages.select(
        "collection",
        *[F.col(c) for c in keep],
        F.posexplode(
            F.arrays_zip(
                F.col("documents"),
                F.coalesce(
                    F.col("metadatas"),
                    F.transform(F.col("documents"), lambda _: F.lit("{}")),
                ).alias("metadatas"),
                F.coalesce(
                    F.col("ids"),
                    F.transform(F.col("documents"), lambda _: F.lit(None).cast("string")),
                ).alias("ids"),
                F.coalesce(
                    F.col("images"),
                    F.transform(F.col("documents"), lambda _: F.lit(None).cast("string")),
                ).alias("images"),
            )
        ).alias("pos", "rec"),
    )
    default_id: Column = (
        content_id(F.col("collection"), F.col("rec.documents"))
        if deterministic_ids else F.expr("uuid()")
    )
    return exploded.select(
        "collection",
        F.coalesce(F.col("rec.ids"), default_id).alias("id"),
        F.col("rec.documents").alias("document"),
        F.col("rec.metadatas").alias("payload_json"),
        F.col("rec.images").alias("image_path"),
        F.col("pos").alias("pos"),
        *[F.col(c) for c in keep],
    )
