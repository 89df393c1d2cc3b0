"""Named query registry — the driver contract (SURVEY.md §2, §5.2).

Every implemented operator gets a named query here: a PySpark DataFrame
builder ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent DuckDB ANSI SQL the driver uses as the correctness oracle.

Determinism rules (FIXTURES.md §3) enforced throughout:
  * money/count sums go through exact DECIMAL accumulation, then one cast to
    DOUBLE — bit-identical across engines regardless of summation order;
  * irrational similarity scores are rounded to 6 decimals in both engines;
  * every integer output is BIGINT in both engines (Spark ints are cast);
  * per-group rankings always carry a unique tie-break key;
  * list outputs are rendered as comma-joined sorted strings (engine-neutral).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import vector
from .functions.hashing import POLY_MOD, poly_hash
from .functions.text import ws_tokens
from .operators import centroid, dedup, knn
from .sources import load_table
from .streaming import windows

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


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn
    return deco


# ---------------------------------------------------------------------------
# Flagship: kNN similarity search (J5 + F7 + W1/O3) — the reference's
# delegated query surface (README.md:13, cosine per qdrant_embedder.py:96-102)
# ---------------------------------------------------------------------------

@register(
    "knn_cosine_topk",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
pairs AS (
  SELECT q.qid, e.vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(e.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(e.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, embeddings e
  WHERE q.qid <> e.vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = knn.knn_join(queries, emb, k=10)
    return out.select("qid", "vec_id", "sim", F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# A1: hash group-by aggregates (TPC-H Q1 shape on lineitem)
# ---------------------------------------------------------------------------

@register(
    "a1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM({DEC.format(x='l_quantity')}) AS DOUBLE) AS sum_qty,
       CAST(SUM({DEC.format(x='l_extendedprice')}) AS DOUBLE) AS sum_base_price,
       CAST(SUM({DEC.format(x='l_extendedprice')} * (CAST(1 AS DECIMAL(18,4)) - {DEC.format(x='l_discount')})) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({DEC.format(x='l_quantity')}) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM({DEC.format(x='l_discount')}) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2003-12-31 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2003-12-31 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
            .cast("double").alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# J1: inner equi join (orders ↔ customer), revenue per customer
# ---------------------------------------------------------------------------

@register(
    "j1_customer_revenue",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       CAST(SUM({DEC.format(x='o.o_totalprice')}) AS DOUBLE) AS total_spent,
       COUNT(*) AS n_orders
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_name
""",
)
def q_j1_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# J2: broadcast hash join chain (customer → nation → region)
# ---------------------------------------------------------------------------

@register(
    "j2_customers_per_region",
    oracle="""
SELECT r.r_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def q_j2_customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# J3: left outer join — customers keep a row even with zero orders
# ---------------------------------------------------------------------------

@register(
    "j3_customer_order_counts",
    oracle="""
SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
""",
)
def q_j3_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# J4: left semi / left anti — the skip-vs-embed set logic behind idempotent
# upsert (qdrant_embedder.py:92 exists-check pattern)
# ---------------------------------------------------------------------------

@register(
    "j4_semi_customers_with_orders",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n
FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
""",
)
def q_j4_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "j4_anti_parts_never_bulk_ordered",
    oracle="""
SELECT p_brand, COUNT(*) AS n
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
GROUP BY p_brand
""",
)
def q_j4_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# W1/O3: per-group top-k (the kNN result shape)
# ---------------------------------------------------------------------------

@register(
    "w1_top3_orders_per_priority",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 3
""",
)
def q_w1_top3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice",
                F.col("rn").cast("long").alias("rn"))
    )


# ---------------------------------------------------------------------------
# O2: global top-k → TakeOrderedAndProject (no full sort)
# ---------------------------------------------------------------------------

@register(
    "o2_top100_lineitems",
    oracle="""
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 100
""",
)
def q_o2_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", F.col("l_linenumber").cast("long").alias("l_linenumber"),
                  "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# X3: deterministic hash embedder — term-frequency form (doc_id, bucket, tf)
# ---------------------------------------------------------------------------

@register(
    "x3_hash_embed_tf",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_WS_TOKENS.format(t='text')}) AS tok FROM documents
)
SELECT doc_id, ({DUCK_POLY_HASH.format(t='tok')}) % 64 AS bucket, COUNT(*) AS tf
FROM toks GROUP BY doc_id, bucket
""",
)
def q_x3_hash_embed_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(ws_tokens(F.col("text"))).alias("tok"))
    return (
        toks.select("doc_id", (poly_hash(F.col("tok"), POLY_MOD) % 64).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


# ---------------------------------------------------------------------------
# F4 / dedup-exact: content-hash duplicate groups
# ---------------------------------------------------------------------------

@register(
    "dedup_exact_groups",
    oracle="""
SELECT md5(text) AS content_hash, COUNT(*) AS n_dups,
       string_agg(doc_id, ',' ORDER BY doc_id) AS ids
FROM documents GROUP BY md5(text)
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list("doc_id")),
                            lambda x: x.cast("string")),
                ",",
            ).alias("ids"),
        )
    )


# ---------------------------------------------------------------------------
# A5: vector centroids (IVF index build), exploded oracle form
# ---------------------------------------------------------------------------

@register(
    "a5_label_centroids",
    oracle="""
SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
       round(CAST(SUM(CAST(val AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6) AS centroid_val
FROM (SELECT label,
             unnest(embedding)::DOUBLE AS val,
             unnest(range(0, len(embedding))) AS pos
      FROM embeddings)
GROUP BY label, pos
""",
)
def q_a5_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        F.col("label").cast("long").alias("label"),
        F.posexplode("embedding").alias("pos", "val"),
    )
    return (
        exploded.groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(
            F.round(
                F.sum(F.col("val").cast("double").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("centroid_val")
        )
    )


# ---------------------------------------------------------------------------
# F1: JSON extraction over the open payload (events.props)
# ---------------------------------------------------------------------------

@register(
    "f1_json_payload_stats",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k
FROM events GROUP BY event_type
""",
)
def q_f1_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            (F.sum(k).cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
    )


# ---------------------------------------------------------------------------
# T3: tumbling event-time window (batch-equivalent of the streaming agg)
# ---------------------------------------------------------------------------

@register(
    "t3_hourly_event_windows",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
""",
)
def q_t3_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return windows.tumbling(
        ev, ts="ts", width="1 hour",
        n_events=F.count(F.lit(1)),
        total_value=F.sum(F.col("value").cast("decimal(18,4)")).cast("double"),
    )


# ---------------------------------------------------------------------------
# W2: lag/lead — inter-event gaps per user (SURVEY.md §2.5)
# ---------------------------------------------------------------------------

@register(
    "w2_event_gaps",
    oracle="""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id, COUNT(*) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
       CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) AS avg_gap_us
FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
""",
)
def q_w2_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = ev.withColumn("gap_us", us - F.lag(us).over(w)).filter(
        F.col("gap_us").isNotNull()
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_us").alias("total_gap_us"),
        (F.sum("gap_us").cast("double") / F.count(F.lit(1))).alias("avg_gap_us"),
    )


# ---------------------------------------------------------------------------
# W3: running aggregate with frame — cumulative spend per customer
# ---------------------------------------------------------------------------

@register(
    "w3_running_customer_spend",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       CAST(SUM({DEC.format(x='o_totalprice')})
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend
FROM orders
""",
)
def q_w3_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w)
        .cast("double").alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# W4: ntile / percent_rank — price quartiles within order priority
# ---------------------------------------------------------------------------

@register(
    "w4_price_quartiles",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
)
def q_w4_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


# ---------------------------------------------------------------------------
# A2: exact + approximate distinct counts
# ---------------------------------------------------------------------------

@register(
    "a2_distinct_parts_suppliers",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
)
def q_a2_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register("a2_approx_distinct_parts", oracle=None)  # HLL sketch — rows-only
def q_a2_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_parts_approx"),
    )


# ---------------------------------------------------------------------------
# A3: collect_list/collect_set — per-user event-type sets (sorted for
# determinism, rendered engine-neutral as comma-joined strings)
# ---------------------------------------------------------------------------

@register(
    "a3_user_event_types",
    oracle="""
SELECT user_id,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
""",
)
def q_a3_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# A4: rollup — multi-granularity totals with subtotal rows
# ---------------------------------------------------------------------------

@register(
    "a4_rollup_pricing",
    oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM({DEC.format(x='l_quantity')}) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
)
def q_a4_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# A6: exact percentiles (continuous interpolation in both engines)
# ---------------------------------------------------------------------------

@register(
    "a6_value_percentiles",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
""",
)
def q_a6_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


# ---------------------------------------------------------------------------
# U1: union-by-name with missing columns (the 4-topic merge, S8/U1)
# ---------------------------------------------------------------------------

@register(
    "u1_union_by_name",
    oracle="""
WITH hi AS (SELECT event_id, user_id, value FROM events WHERE value > 50),
     lo AS (SELECT event_id, user_id FROM events WHERE value <= 50)
SELECT user_id, COUNT(*) AS n, COUNT(value) AS n_with_value
FROM (FROM hi UNION ALL BY NAME FROM lo)
GROUP BY user_id
""",
)
def q_u1_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hi = ev.filter(F.col("value") > 50).select("event_id", "user_id", "value")
    lo = ev.filter(F.col("value") <= 50).select("event_id", "user_id")
    return (
        hi.unionByName(lo, allowMissingColumns=True)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.count("value").alias("n_with_value"))
    )


# ---------------------------------------------------------------------------
# U2/U3: intersect / except — id set logic behind idempotent upsert
# ---------------------------------------------------------------------------

@register(
    "u2_intersect_big_buyers",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 0
""",
)
def q_u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.filter(F.col("o_totalprice") > 150000).select(F.col("o_custkey").alias("custkey"))
        .intersect(c.filter(F.col("c_acctbal") > 0).select(F.col("c_custkey").alias("custkey")))
    )


@register(
    "u3_except_urgent_only_buyers",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
""",
)
def q_u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    low = o.filter(F.col("o_orderpriority") == "5-LOW")
    return (
        urgent.select(F.col("o_custkey").alias("custkey"))
        .subtract(low.select(F.col("o_custkey").alias("custkey")))
    )


# ---------------------------------------------------------------------------
# J6: range (theta) join — events bucketed into value bands
# ---------------------------------------------------------------------------

VALUE_BANDS = [("low", 0.0, 10.0), ("mid", 10.0, 50.0), ("high", 50.0, 1e9)]


@register(
    "j6_value_band_join",
    oracle="""
SELECT band, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
JOIN (VALUES ('low', 0.0, 10.0), ('mid', 10.0, 50.0), ('high', 50.0, 1e9))
     bands(band, lo, hi)
  ON value >= lo AND value < hi
GROUP BY band
""",
)
def q_j6_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.asof import range_join  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(VALUE_BANDS, "band string, lo double, hi double")
    joined = range_join(
        ev, bands, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# J7: as-of join — latest click value at/before each error event per user
# (DuckDB has native ASOF JOIN, the perfect oracle)
# ---------------------------------------------------------------------------

@register(
    "j7_asof_latest_click",
    oracle="""
WITH errors AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
     clicks AS (SELECT user_id, ts, MAX(value) AS click_value
                FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT l.event_id, l.user_id, r.click_value, r.ts AS click_ts
FROM errors l ASOF LEFT JOIN clicks r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)
def q_j7_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.asof import asof_join  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    out = asof_join(errors, clicks, on="user_id", ts="ts", value_cols=["click_value"])
    return out.select(
        "event_id", "user_id",
        F.col("r_click_value").alias("click_value"),
        F.col("right_ts").alias("click_ts"),
    )


# ---------------------------------------------------------------------------
# registry accessors used by __spark_entry__.py
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """entry() smoke query: full pipeline — documents → deterministic hash
    embed (X3) → kNN top-k join against the embeddings fixture (J5/W1)."""
    from .operators.embed import hash_embed  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    doc_vecs = docs.select(
        F.col("doc_id").alias("qid"), hash_embed(F.col("text"), 64).alias("qvec")
    ).filter(F.col("qid") < 8)
    emb = load_table(spark, sf_dir, "embeddings")
    return knn.knn_join(doc_vecs, emb, k=5, exclude_self=False)
