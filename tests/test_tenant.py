"""Multitenant collections (operators/upsert.py tenant layout): one
partition level ABOVE the id bucket (``tenant=<v>/id_bucket=<n>``), the
Qdrant shard-key / group_id pattern — tenant-scoped reads prune to one
tenant's subtree, mutations rewrite only the partitions they touch, and
a tenant move (an id's tenant value changing) rewrites exactly its
source and destination directories."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bob_vector_db_spark.operators import index, knn, upsert
from bob_vector_db_spark.plans.inspect import (
    assert_partition_filters,
    formatted_plan,
)


def _mk(spark, root, n=30, collection="mt", n_buckets=4):
    rows = [(i, f"t{i % 3}", f"doc {i}", float(i)) for i in range(n)]
    df = spark.createDataFrame(
        rows, "id long, tenant string, text string, score double")
    upsert.create_collection(spark, root, collection, df=df, id_col="id",
                             n_buckets=n_buckets, tenant_col="tenant")
    return df


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_tenant_layout_and_roundtrip(spark, tmp_path):
    root = str(tmp_path / "s")
    _mk(spark, root)
    path = upsert.collection_path(root, "mt")
    tenants = sorted(e for e in os.listdir(path) if e.startswith("tenant="))
    assert tenants == ["tenant=t0", "tenant=t1", "tenant=t2"]
    assert any(e.startswith("id_bucket=")
               for e in os.listdir(os.path.join(path, "tenant=t0")))
    got = upsert.read_collection(spark, root, "mt")
    assert got.count() == 30
    assert _ids(upsert.read_collection(spark, root, "mt", tenant="t1")) == \
        sorted(i for i in range(30) if i % 3 == 1)


def test_tenant_scoped_read_prunes_partitions(spark, tmp_path):
    """The multitenant contract: a tenant-scoped read reaches the scan as a
    PARTITION filter on the tenant level — other tenants' subtrees are
    pruned away, not read-and-filtered."""
    root = str(tmp_path / "s")
    _mk(spark, root)
    scoped = upsert.read_collection(spark, root, "mt", tenant="t1")
    assert_partition_filters(scoped, "tenant")
    pf = next(ln for ln in formatted_plan(scoped).splitlines()
              if "PartitionFilters" in ln)
    assert "t1" in pf, pf
    # and the non-target tenants' files never appear in the scan
    files = scoped.select(F.input_file_name().alias("f")).distinct().collect()
    assert files, "scoped read returned no files"
    assert all("tenant=t1" in r["f"] for r in files)


def test_tenant_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    root = str(tmp_path / "s")
    _mk(spark, root)
    path = upsert.collection_path(root, "mt")

    def mtimes(tenant):
        tdir = os.path.join(path, f"tenant={tenant}")
        return {e: os.path.getmtime(os.path.join(tdir, e))
                for e in os.listdir(tdir) if e.startswith("id_bucket=")}

    before_t2 = mtimes("t2")
    upsert.upsert(spark, root, "mt", spark.createDataFrame(
        [(0, "t0", "patched", 99.0)],
        "id long, tenant string, text string, score double"))
    assert mtimes("t2") == before_t2  # untouched tenant: no dir swapped
    got = upsert.read_collection(spark, root, "mt")
    assert got.count() == 30
    assert got.filter(F.col("id") == 0).first()["text"] == "patched"


def test_tenant_move_via_upsert(spark, tmp_path):
    """Re-sending an id under a DIFFERENT tenant moves the point: exactly
    one copy survives, in the new tenant's subtree."""
    root = str(tmp_path / "s")
    _mk(spark, root)
    upsert.upsert(spark, root, "mt", spark.createDataFrame(
        [(3, "t1", "moved", 3.0)],  # id 3 was tenant t0
        "id long, tenant string, text string, score double"))
    got = upsert.read_collection(spark, root, "mt")
    assert got.count() == 30  # moved, not duplicated
    assert got.filter(F.col("id") == 3).count() == 1
    assert 3 in _ids(upsert.read_collection(spark, root, "mt", tenant="t1"))
    assert 3 not in _ids(upsert.read_collection(spark, root, "mt", tenant="t0"))


def test_tenant_move_via_update_columns(spark, tmp_path):
    """Patching the tenant column re-shards the row: source and destination
    partitions rewrite, payload survives."""
    root = str(tmp_path / "s")
    _mk(spark, root)
    upsert.update_columns(spark, root, "mt", spark.createDataFrame(
        [(6, "t2")], "id long, tenant string"))  # id 6 was t0
    got = upsert.read_collection(spark, root, "mt")
    assert got.count() == 30
    row = got.filter(F.col("id") == 6).first()
    assert row["tenant"] == "t2" and row["text"] == "doc 6"
    assert 6 in _ids(upsert.read_collection(spark, root, "mt", tenant="t2"))
    assert 6 not in _ids(upsert.read_collection(spark, root, "mt", tenant="t0"))


def test_tenant_scoped_delete(spark, tmp_path):
    root = str(tmp_path / "s")
    _mk(spark, root)
    # unscoped delete finds the id wherever it lives
    assert upsert.delete_points(spark, root, "mt", [4]) == 1
    # tenant-scoped delete only removes ids under that tenant
    assert upsert.delete_points(spark, root, "mt", [5, 6], tenant="t0") == 1
    left = _ids(upsert.read_collection(spark, root, "mt"))
    assert 4 not in left and 6 not in left and 5 in left
    # deleting every row of a tenant removes its subtree husk
    t2_ids = [i for i in range(30) if i % 3 == 2]
    upsert.delete_points(spark, root, "mt", t2_ids)
    path = upsert.collection_path(root, "mt")
    assert not os.path.isdir(os.path.join(path, "tenant=t2"))
    assert upsert.read_collection(spark, root, "mt").count() == 30 - 2 - len(t2_ids)


def test_tenant_delete_by_filter_prunes_to_tenant(spark, tmp_path):
    root = str(tmp_path / "s")
    _mk(spark, root)
    removed = upsert.delete_by_filter(
        spark, root, "mt", (F.col("tenant") == "t1") & (F.col("score") < 10))
    assert removed == len([i for i in range(10) if i % 3 == 1])
    assert upsert.read_collection(
        spark, root, "mt", tenant="t2").count() == 10


def test_tenant_value_validation(spark, tmp_path):
    root = str(tmp_path / "s")
    bad_rows = [(1, "123", "x"), (2, "ok_tenant", "y")]
    with pytest.raises(ValueError, match="not storable"):
        upsert.create_collection(
            spark, root, "bad",
            df=spark.createDataFrame(bad_rows,
                                     "id long, tenant string, text string"),
            id_col="id", tenant_col="tenant")
    _mk(spark, root)
    for v in ("has space", None, "NaN", "a/b"):
        with pytest.raises(ValueError, match="not storable|missing"):
            upsert.upsert(spark, root, "mt", spark.createDataFrame(
                [(99, v, "x", 0.0)],
                "id long, tenant string, text string, score double"))
    with pytest.raises(ValueError, match="tenant_col and id_col"):
        upsert.create_collection(spark, root, "bad2", id_col="id",
                                 tenant_col="id")
    with pytest.raises(ValueError, match="not created with a tenant_col"):
        upsert.read_collection(spark, root, "mt2_none", tenant="t0") \
            if upsert.create_collection(
                spark, root, "mt2_none",
                df=spark.createDataFrame([(1, "x")], "id long, text string"),
                id_col="id") else None


def test_tenant_search_equals_filtered_exact(spark, tmp_path):
    root = str(tmp_path / "s")
    rows = [(i, f"t{i % 2}", [float(i % 7), float((i * 3) % 5), 1.0])
            for i in range(40)]
    df = spark.createDataFrame(rows, "id long, tenant string, vec array<double>")
    upsert.create_collection(
        spark, root, "vt", df=df, id_col="id", n_buckets=4,
        tenant_col="tenant",
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    q = spark.createDataFrame([(0, [1.0, 1.0, 1.0])],
                              "qid long, qvec array<double>")
    scoped = knn.search_collection(spark, root, "vt", q, k=5, corpus_id="id",
                                   tenant="t1")
    manual = knn.knn_join(
        q, df.filter(F.col("tenant") == "t1").select("id", "vec"),
        k=5, corpus_id="id", corpus_vec="vec", exclude_self=False)
    assert sorted(map(tuple, scoped.collect())) == \
        sorted(map(tuple, manual.collect()))
    with pytest.raises(ValueError, match="tenant 't1'.*absent"):
        knn.search_collection(spark, root, "vt", q, k=5, tenant="t1",
                              use_index="always")


def test_tenant_query_api_scoping(spark, tmp_path):
    from bob_vector_db_spark.operators import query_api
    from bob_vector_db_spark.operators.filters import Filter, Range

    root = str(tmp_path / "s")
    _mk(spark, root)
    assert query_api.count_points(spark, root, "mt", tenant="t0") == 10
    flt = Filter(must=[Range("score", gte=15)])
    assert query_api.count_points(spark, root, "mt", flt=flt, tenant="t0") \
        == len([i for i in range(15, 30) if i % 3 == 0])
    page = query_api.scroll_points(spark, root, "mt", limit=4, tenant="t1")
    assert [r["id"] for r in page.collect()] == [1, 4, 7, 10]
    fv = {r["value"]: r["count"] for r in
          query_api.facet_values(spark, root, "mt", "tenant").collect()}
    assert fv == {"t0": 10, "t1": 10, "t2": 10}


def test_tenant_compact_and_recover(spark, tmp_path):
    root = str(tmp_path / "s")
    _mk(spark, root)
    # pile up files via per-tenant micro-upserts, then compact
    for i in (101, 102, 103):
        upsert.upsert(spark, root, "mt", spark.createDataFrame(
            [(i, "t0", f"extra {i}", float(i))],
            "id long, tenant string, text string, score double"))
    before = sorted(map(tuple, upsert.read_collection(
        spark, root, "mt").collect()))
    stats = upsert.compact_collection(spark, root, "mt")
    assert stats["files_after"] <= stats["files_before"]
    after = sorted(map(tuple, upsert.read_collection(
        spark, root, "mt").collect()))
    assert after == before
    # crash-sim: a bucket dir inside a tenant vanished mid-swap, trash left
    path = upsert.collection_path(root, "mt")
    tdir = os.path.join(path, "tenant=t0")
    bucket = next(e for e in os.listdir(tdir) if e.startswith("id_bucket="))
    os.rename(os.path.join(tdir, bucket), os.path.join(tdir, bucket + "__old"))
    restored = upsert.recover_collection(root, "mt")
    assert restored == [int(bucket.split("=")[1])]
    assert sorted(map(tuple, upsert.read_collection(
        spark, root, "mt").collect())) == before


def test_many_partition_upsert_uses_superset_filter(spark, tmp_path):
    """A batch touching more (tenant, bucket) pairs than the exact-OR
    predicate cap falls back to the superset tenant-IN × bucket-IN filter;
    the merge and the exact-swap set stay correct (no dups, all rows
    updated, nothing lost)."""
    from bob_vector_db_spark.operators.upsert import _EXACT_PARTS_FILTER_MAX

    root = str(tmp_path / "s")
    n_tenants, n = 20, 400
    rows = [(i, f"t{i % n_tenants}", f"old {i}") for i in range(n)]
    df = spark.createDataFrame(rows, "id long, tenant string, text string")
    upsert.create_collection(spark, root, "mt", df=df, id_col="id",
                             n_buckets=4, tenant_col="tenant")
    assert n_tenants * 4 > _EXACT_PARTS_FILTER_MAX  # trips the fallback
    patch = spark.createDataFrame(
        [(i, f"t{i % n_tenants}", f"new {i}") for i in range(n)],
        "id long, tenant string, text string")
    upsert.upsert(spark, root, "mt", patch)
    got = upsert.read_collection(spark, root, "mt")
    assert got.count() == n
    assert got.filter(F.col("text").startswith("old")).count() == 0
    assert got.select("id").distinct().count() == n
    # tenant-scoped read still exact
    assert upsert.read_collection(spark, root, "mt", tenant="t3").count() \
        == n // n_tenants


def test_tenant_store_random_ops_match_dict_model(spark, tmp_path):
    """Model-based property: a random interleaving of upserts (including
    tenant moves), tenant-column patches, scoped and unscoped deletes must
    leave the store equal to a plain dict model of the same ops — and
    every tenant-scoped read equal to the model's slice."""
    rnd = __import__("random").Random(606)
    root = str(tmp_path / "s")
    tenants = ["ta", "tb", "tc"]
    model: dict[int, tuple[str, str]] = {}  # id -> (tenant, text)

    init = [(i, rnd.choice(tenants), f"v0 {i}") for i in range(40)]
    model.update({i: (t, x) for i, t, x in init})
    upsert.create_collection(
        spark, root, "m", id_col="id", n_buckets=4, tenant_col="tenant",
        df=spark.createDataFrame(init, "id long, tenant string, text string"))

    for step in range(8):
        op = rnd.choice(["upsert", "move", "delete", "scoped_delete",
                         "patch_tenant"])
        if op == "upsert":
            ids = rnd.sample(range(60), 5)
            rows = [(i, rnd.choice(tenants), f"v{step} {i}") for i in ids]
            model.update({i: (t, x) for i, t, x in rows})
            upsert.upsert(spark, root, "m", spark.createDataFrame(
                rows, "id long, tenant string, text string"))
        elif op == "move":
            live = sorted(model)
            if not live:
                continue
            i = rnd.choice(live)
            t = rnd.choice(tenants)
            model[i] = (t, f"moved{step} {i}")
            upsert.upsert(spark, root, "m", spark.createDataFrame(
                [(i, t, f"moved{step} {i}")],
                "id long, tenant string, text string"))
        elif op == "delete":
            ids = rnd.sample(range(60), 4)
            for i in ids:
                model.pop(i, None)
            upsert.delete_points(spark, root, "m", ids)
        elif op == "scoped_delete":
            t = rnd.choice(tenants)
            ids = rnd.sample(range(60), 4)
            for i in ids:
                if i in model and model[i][0] == t:
                    del model[i]
            upsert.delete_points(spark, root, "m", ids, tenant=t)
        else:  # patch_tenant via update_columns
            live = sorted(model)
            if not live:
                continue
            i = rnd.choice(live)
            t = rnd.choice(tenants)
            model[i] = (t, model[i][1])
            upsert.update_columns(spark, root, "m", spark.createDataFrame(
                [(i, t)], "id long, tenant string"))

    got = {r["id"]: (r["tenant"], r["text"]) for r in
           upsert.read_collection(spark, root, "m").collect()}
    assert got == model
    for t in tenants:
        scoped = {r["id"] for r in
                  upsert.read_collection(spark, root, "m", tenant=t).collect()}
        assert scoped == {i for i, (mt, _) in model.items() if mt == t}


def test_per_tenant_index_build_search_refresh(spark, tmp_path):
    """A tenant-scoped index artifact: trained over ONE tenant's subtree,
    dispatched by search_collection(tenant=..., use_index=...), kept
    scoped by refresh — an id that moves OUT of the tenant is masked from
    the index while the store still serves it under its new tenant."""
    from bob_vector_db_spark.operators import index

    root = str(tmp_path / "s")
    rows = [(i, "ta" if i < 30 else "tb",
             [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, tenant string, vec array<double>")
    upsert.create_collection(
        spark, root, "vt", df=df, id_col="id", n_buckets=4,
        tenant_col="tenant",
        vector_config={"vec": {"size": 3, "distance": "cosine"}})
    imeta = index.build_vector_index(spark, root, "vt", kind="ivf",
                                     n_lists=2, iters=4, tenant="ta")
    assert imeta["tenant"] == "ta"
    q = spark.createDataFrame([(0, [1.0, 1.0, 0.5])],
                              "qid long, qvec array<double>")

    def exact(t):
        return sorted(map(tuple, knn.search_collection(
            spark, root, "vt", q, k=5, corpus_id="id", tenant=t,
            use_index=False).collect()))

    idx = sorted(map(tuple, knn.search_collection(
        spark, root, "vt", q, k=5, corpus_id="id", tenant="ta",
        use_index="always", n_probe=2).collect()))
    assert idx == exact("ta")
    # tb has no index: always raises, auto scans
    with pytest.raises(ValueError, match="tenant 'tb'.*absent"):
        knn.search_collection(spark, root, "vt", q, k=5, tenant="tb",
                              use_index="always")
    assert sorted(map(tuple, knn.search_collection(
        spark, root, "vt", q, k=5, corpus_id="id", tenant="tb",
        use_index="auto").collect())) == exact("tb")

    # mutate: move id 3 out of ta, change id 4's vector, add id 99 to ta
    upsert.upsert(spark, root, "vt", spark.createDataFrame(
        [(3, "tb", [0.0, 0.0, 1.0]), (4, "ta", [9.0, 9.0, 9.0]),
         (99, "ta", [1.0, 1.0, 0.5])],
        "id long, tenant string, vec array<double>"))
    out = index.refresh_all_indexes(spark, root, "vt")
    assert out and out[0].get("tenant") == "ta"
    idx2 = sorted(map(tuple, knn.search_collection(
        spark, root, "vt", q, k=5, corpus_id="id", tenant="ta",
        use_index="always", n_probe=2).collect()))
    assert idx2 == exact("ta")
    hit_ids = {t[1] for t in idx2}
    assert 3 not in hit_ids and 99 in hit_ids
    # tenant-scoped delete also absorbs
    upsert.delete_points(spark, root, "vt", [99], tenant="ta")
    index.refresh_vector_index(spark, root, "vt", tenant="ta")
    idx3 = sorted(map(tuple, knn.search_collection(
        spark, root, "vt", q, k=5, corpus_id="id", tenant="ta",
        use_index="always", n_probe=2).collect()))
    assert idx3 == exact("ta")
    assert 99 not in {t[1] for t in idx3}
    # guard: per-tenant index on a non-tenant collection refuses
    upsert.create_collection(spark, root, "plain", df=spark.createDataFrame(
        [(1, [1.0, 0.0])], "id long, vec array<double>"), id_col="id",
        vector_config={"vec": {"size": 2, "distance": "cosine"}})
    with pytest.raises(ValueError, match="no tenant_col"):
        index.build_vector_index(spark, root, "plain", tenant="ta")


def test_tenant_collection_info(spark, tmp_path):
    """VERDICT r6 next #8: collection_info on a multitenant collection
    reports per-tenant point counts and which tenants carry their own
    index artifact (with freshness)."""
    from bob_vector_db_spark.operators import index

    root = str(tmp_path / "s")
    rows = [(i, "a" if i % 3 else "b", [float(i % 7), 1.0, 0.5, float(i % 3)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "id long, tenant string, "
                                     "vec array<double>")
    upsert.create_collection(
        spark, root, "mt2", df=df, id_col="id", n_buckets=4,
        tenant_col="tenant",
        vector_config={"vec": {"size": 4, "distance": "cosine"}})
    index.build_vector_index(spark, root, "mt2", kind="ivf", n_lists=2,
                             iters=2, tenant="a")
    info = upsert.collection_info(spark, root, "mt2")
    assert info["tenant_col"] == "tenant"
    assert info["tenants"] == {"a": 26, "b": 14}
    assert info["points_count"] == 40
    per_tenant = [ix for ix in info["indexes"] if ix["tenant"] == "a"]
    assert len(per_tenant) == 1 and per_tenant[0]["fresh"]
    # a tenant-b mutation stales tenant-a's artifact in the report (the
    # version is collection-global — the conservative contract)
    upsert.delete_points(spark, root, "mt2", [3], tenant="b")
    info2 = upsert.collection_info(spark, root, "mt2")
    assert info2["tenants"] == {"a": 26, "b": 13}


def test_read_rows_for_ids_tenant_scope_prunes_both_levels(spark, tmp_path):
    from bob_vector_db_spark.operators.upsert import read_rows_for_ids

    root = str(tmp_path / "s")
    _mk(spark, root)
    ids = spark.createDataFrame([(1,), (4,), (7,)], "`i` long")
    rows = read_rows_for_ids(spark, root, "mt", ids, tenant="t1")
    assert_partition_filters(rows, "tenant", "id_bucket")
    assert _ids(rows) == [1, 4, 7]  # all three are t1 (i % 3 == 1)
    # an id living under another tenant is invisible to the scoped fetch
    ids2 = spark.createDataFrame([(1,), (2,)], "`i` long")
    assert _ids(read_rows_for_ids(spark, root, "mt", ids2, tenant="t1")) \
        == [1]


def test_tenant_bq_artifact_scoped_and_exact(spark, tmp_path):
    """Round 10: the binary-quantization artifact composes with the
    per-tenant index plumbing (kind-agnostic row_filter + refresh) —
    a tenant-scoped ivf_bq at full probe with a covering rerank equals
    the tenant-pruned exact scan, through churn."""
    root = str(tmp_path / "s")
    rows = [(i, f"t{i % 2}", [float((i * 7 + d * 3) % 11) - 5.0
                              for d in range(6)])
            for i in range(60)]
    df = spark.createDataFrame(rows,
                               "id long, tenant string, vec array<double>")
    upsert.create_collection(
        spark, root, "vt", df=df, id_col="id", n_buckets=4,
        tenant_col="tenant",
        vector_config={"vec": {"size": 6, "distance": "cosine"}})
    index.build_vector_index(spark, root, "vt", "vec", kind="ivf_bq",
                             n_lists=4, iters=3, tenant="t1")
    q = spark.createDataFrame([(0, [1.0, -1.0, 2.0, 0.5, -2.0, 1.5])],
                              "qid long, qvec array<double>")
    key = lambda d: sorted(map(tuple, d.collect()))
    via = knn.search_collection(spark, root, "vt", q, k=5, corpus_id="id",
                                tenant="t1", use_index="always",
                                n_probe=None, rerank_factor=20)
    exact = knn.search_collection(spark, root, "vt", q, k=5,
                                  corpus_id="id", tenant="t1",
                                  use_index=False)
    assert key(via) == key(exact)
    # churn: an id moves OUT of the tenant — the refreshed artifact
    # masks it while the store serves it under its new tenant
    upsert.upsert(spark, root, "vt", spark.createDataFrame(
        [(1, "t0", [9.0] * 6)], "id long, tenant string, vec array<double>"))
    index.refresh_vector_index(spark, root, "vt", "vec", tenant="t1")
    via2 = knn.search_collection(spark, root, "vt", q, k=5,
                                 corpus_id="id", tenant="t1",
                                 use_index="always", n_probe=None,
                                 rerank_factor=20)
    exact2 = knn.search_collection(spark, root, "vt", q, k=5,
                                   corpus_id="id", tenant="t1",
                                   use_index=False)
    assert key(via2) == key(exact2)
    assert via2.filter(F.col("vec_id") == 1).count() == 0
