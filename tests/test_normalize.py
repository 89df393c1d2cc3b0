"""Unit tests for embed-message normalization (SURVEY.md §5.2 item 3) —
the reference's edge semantics at embedder.py:234-267 and
qdrant_embedder.py:115-117,130-142."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from bob_vector_db_spark.operators import normalize


def _msgs(spark, *texts):
    return spark.createDataFrame([(t,) for t in texts], "value string")


def test_parse_well_formed_message(spark):
    msg = json.dumps({
        "collection": "col1",
        "documents": ["d1", "d2"],
        "metadatas": [{"k": "1"}, {"k": "2"}],
        "ids": ["a", "b"],
    })
    out = normalize.parse_messages(_msgs(spark, msg)).first()
    assert out["collection"] == "col1"
    assert out["documents"] == ["d1", "d2"]
    assert out["ids"] == ["a", "b"]


def test_parse_defaults_collection_and_metadatas(spark):
    msg = json.dumps({"documents": ["d1"]})
    out = normalize.parse_messages(_msgs(spark, msg), default_collection="dc").first()
    assert out["collection"] == "dc"
    assert out["metadatas"] == ["{}"]


def test_raw_branch1_well_formed_passthrough(spark):
    msg = json.dumps({"collection": "c", "documents": ["d"], "metadatas": [{}]})
    out = normalize.normalize_raw(_msgs(spark, msg)).first()
    assert out["collection"] == "c"
    assert out["documents"] == ["d"]


def test_raw_branch2_json_dict_with_data(spark):
    # embedder.py:251-253: documents := [data['data']]; metadatas := [whole dict]
    msg = json.dumps({"data": "hello", "extra": 1})
    out = normalize.normalize_raw(_msgs(spark, msg), default_collection="dc").first()
    assert out["collection"] == "dc"
    assert out["documents"] == ["hello"]
    assert json.loads(out["metadatas"][0])["extra"] == 1


def test_raw_branch2_json_dict_with_documents(spark):
    msg = json.dumps({"documents": ["x", "y"]})
    out = normalize.normalize_raw(_msgs(spark, msg)).first()
    assert out["documents"] == ["x", "y"]


def test_raw_branch2_forces_default_collection(spark):
    # embedder.py:248-250: a non-well-formed dict gets the DEFAULT collection
    # even when it carries a 'collection' key (no metadatas → not branch 1).
    msg = json.dumps({"collection": "sneaky", "documents": ["d"]})
    out = normalize.normalize_raw(_msgs(spark, msg), default_collection="dc").first()
    assert out["collection"] == "dc"
    assert out["documents"] == ["d"]


def test_raw_branch3_plain_text(spark):
    # embedder.py:262-267: {documents: [raw], metadatas: [{data: raw}]}
    out = normalize.normalize_raw(_msgs(spark, "just some text")).first()
    assert out["documents"] == ["just some text"]
    assert json.loads(out["metadatas"][0]) == {"data": "just some text"}


def test_zip_explode_positional(spark):
    # qdrant_embedder.py:130-142: element i of each list forms record i
    msg = json.dumps({
        "collection": "c",
        "documents": ["d0", "d1"],
        "metadatas": [{"i": "0"}, {"i": "1"}],
        "ids": ["id0", "id1"],
        "images": ["img0.png", None],
    })
    recs = normalize.zip_explode(normalize.parse_messages(_msgs(spark, msg)))
    rows = {r["id"]: r for r in recs.collect()}
    assert rows["id0"]["document"] == "d0"
    assert rows["id1"]["document"] == "d1"
    assert rows["id0"]["image_path"] == "img0.png"
    assert rows["id1"]["image_path"] is None


def test_zip_explode_default_ids_deterministic(spark):
    # reference default is uuid4 (qdrant_embedder.py:115-117); tested path
    # uses content hashes so re-runs agree (FIXTURES.md §3)
    msg = json.dumps({"collection": "c", "documents": ["d0"], "metadatas": [{}]})
    a = normalize.zip_explode(normalize.parse_messages(_msgs(spark, msg))).first()["id"]
    b = normalize.zip_explode(normalize.parse_messages(_msgs(spark, msg))).first()["id"]
    assert a == b and len(a) == 64  # sha2-256 hex


def test_zip_explode_preserves_message_multiplicity(spark):
    msgs = _msgs(
        spark,
        json.dumps({"collection": "c", "documents": ["a", "b", "c"], "metadatas": [{}, {}, {}]}),
        json.dumps({"collection": "c2", "documents": ["z"], "metadatas": [{}]}),
    )
    recs = normalize.zip_explode(normalize.parse_messages(msgs))
    assert recs.count() == 4
    assert recs.filter(F.col("collection") == "c2").count() == 1
