"""Physical-plan assertions (SURVEY.md §4.2): pushdown, pruning, broadcast,
codegen — the plans we designed for must actually materialize."""

from __future__ import annotations

from pyspark.sql import functions as F

from bob_vector_db_spark.plans.inspect import (
    assert_broadcast,
    assert_codegen,
    assert_partition_filters,
    assert_pushed_filters,
    count_exchanges,
    formatted_plan,
)
from bob_vector_db_spark.sources import load_table


def test_filter_pushdown_to_parquet(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") > 45.0).select("l_orderkey", "l_quantity")
    assert_pushed_filters(q, "GreaterThan(l_quantity,45.0)")


def test_column_pruning_read_schema(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plan = formatted_plan(li.select("l_orderkey", "l_quantity"))
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "l_extendedprice" not in rs[0], rs


def test_small_dim_join_broadcasts(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    assert_broadcast(c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey))


def test_agg_stays_in_codegen(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    assert_codegen(li.groupBy("l_returnflag").agg(F.sum("l_quantity")))


def test_global_topk_is_take_ordered(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plan = formatted_plan(li.orderBy(F.desc("l_extendedprice")).limit(10))
    assert "TakeOrderedAndProject" in plan


def test_knn_corpus_never_shuffles(spark, sf_dir):
    """J5 scale contract: the corpus reaches the local top-k with ZERO
    shuffles — the only Exchange in the whole plan is the small per-query
    candidate merge (partitions x m x k rows) feeding the rank window."""
    from bob_vector_db_spark.operators import knn

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(F.col("vec_id").alias("qid"),
                   F.col("embedding").alias("qvec")).limit(4)
    topk = knn.knn_join_vectorized(q, emb, k=5)
    assert count_exchanges(topk) <= 1, formatted_plan(topk)


def test_filtered_knn_pushes_payload_filter(spark, sf_dir):
    """Filtered vector search: the payload predicate must reach the corpus
    parquet scan — at 100 TB the filter prunes before any vector math."""
    from bob_vector_db_spark.queries import REGISTRY

    q = REGISTRY["knn_filtered_search"].fn(spark, sf_dir)
    assert_pushed_filters(q, "In(label, [1,3,5,7])")


def test_multijoin_broadcasts_dims_and_pushes_region_filter(spark, sf_dir):
    """J9 (Q5 shape): the three small dims broadcast and the selective
    region predicate reaches its parquet scan."""
    from bob_vector_db_spark.queries import REGISTRY

    q = REGISTRY["j9_regional_revenue"].fn(spark, sf_dir)
    plan = formatted_plan(q)
    assert plan.count("BroadcastHashJoin") >= 3, plan[:1500]
    assert_pushed_filters(q, "EqualTo(r_name,ASIA)")


def test_exact_dedup_is_single_shuffle(spark, sf_dir):
    """J8/F4: hash-groupBy dedup = one shuffle on the content hash."""
    from bob_vector_db_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    assert count_exchanges(dedup.exact_dedup_groups(docs)) == 1


def test_upsert_store_prunes_partitions(spark, tmp_path):
    """S6 scale contract: reading two buckets of a bucket-partitioned
    collection shows PartitionFilters on id_bucket — at 100 TB an upsert
    opens only the touched buckets."""
    from bob_vector_db_spark.operators import upsert

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(f"id{i}", f"d{i}") for i in range(64)], "id string, document string")
    upsert.upsert(spark, root, "c", df)
    stored = spark.read.parquet(upsert.collection_path(root, "c"))
    pruned = stored.filter(F.col(upsert.BUCKET_COL).isin([0, 1]))
    assert_partition_filters(pruned, "id_bucket")


def test_bm25_term_filter_precedes_shuffle(spark, sf_dir):
    """The posting stream must be pruned to the query terms BEFORE the
    (id, term) shuffle — the inverted-index-probe property."""
    from bob_vector_db_spark.operators.text_search import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    plan = formatted_plan(bm25_topk(docs, ["vector", "join"], k=10))
    # a Filter mentioning the term literals must exist, and the final top-k
    # must be TakeOrderedAndProject, not a global-sort exchange
    assert "vector" in plan and "TakeOrderedAndProject" in plan, plan


def test_sq_knn_corpus_never_shuffles(spark, sf_dir):
    """Scalar-quantized search keeps exact kNN's shape: queries broadcast,
    the encoded corpus scans without an exchange before the top-k window."""
    from bob_vector_db_spark.operators import quantize

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    df = quantize.sq_knn(q, emb, k=5)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # one exchange for the per-query window; the corpus side has none
    assert count_exchanges(df) <= 1, formatted_plan(df)


def test_pq_adc_scoring_is_jvm_side(spark, sf_dir):
    """ADC scoring must be element_at lookups in the plan (JVM codegen),
    with Python appearing only in the tiny query-side LUT projection."""
    from bob_vector_db_spark.operators import quantize

    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    books = quantize.pq_train(emb, m=8, ksub=16, iters=2)
    enc = quantize.pq_encode(emb, books)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    plan = formatted_plan(quantize.pq_search(q, enc, books, k=5))
    # the nested element_at chain IS the ADC sum, in a plain projection;
    # ArrowEvalPython appears only for the encode/LUT inputs
    assert "element_at(element_at" in plan, plan


def test_delete_by_filter_scan_prunes_buckets(spark, tmp_path):
    """After a filtered delete, reading back one bucket's ids partition-
    prunes to that bucket directory (the hive layout survives the swap)."""
    from bob_vector_db_spark.operators import upsert

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(f"id{i}", i % 3) for i in range(48)], "id string, grp int")
    upsert.create_collection(spark, root, "c", df=df, n_buckets=8)
    upsert.delete_by_filter(spark, root, "c", "grp = 1", count_removed=False)
    readback = spark.read.parquet(upsert.collection_path(root, "c"))
    pruned = readback.filter(F.col(upsert.BUCKET_COL) == 3)
    assert_partition_filters(pruned, "id_bucket")


def test_ivf_probe_is_equijoin_on_list_id(spark, sf_dir):
    """The probe must reach the corpus through an equi-join on list_id
    (hash-partition-prunable at scale), never a cross join against the
    whole corpus."""
    from bob_vector_db_spark.operators import quantize

    emb = load_table(spark, sf_dir, "embeddings")
    cents = quantize.ivf_train(emb, n_lists=8, iters=2)
    assigned = quantize.ivf_assign(emb, cents)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    plan = formatted_plan(quantize.ivf_knn(q, assigned, cents, k=5, n_probe=2))
    assert "list_id" in plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan
