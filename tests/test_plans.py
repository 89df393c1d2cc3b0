"""Physical-plan assertions (SURVEY.md §4.2): pushdown, pruning, broadcast,
codegen — the plans we designed for must actually materialize."""

from __future__ import annotations

from pyspark.sql import functions as F

from bob_vector_db_spark.plans.inspect import (
    assert_broadcast,
    assert_codegen,
    assert_pushed_filters,
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
