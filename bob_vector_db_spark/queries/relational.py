"""Relational core: TPC-H-ish aggregates, joins, windows, sets,
scalar functions, normalization round-trips (SURVEY A/J/W/O/U/F/S/P/X rows)."""


from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vector
from ..functions.hashing import POLY_MOD, poly_hash
from ..functions.text import ws_tokens
from ..operators import centroid, index, knn, normalize, upsert
from ..operators.localframe import local_frame
from ..sources import load_table
from ..streaming import windows

from ._registry import register
from ._shared import *  # noqa: F403 — shared oracle/fixture helpers


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
    from ..operators.asof import range_join  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events")
    bands = local_frame(spark, VALUE_BANDS,
                        "band string, lo double, hi double")
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
    from ..operators.asof import asof_join  # noqa: PLC0415

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
# F2: base64 encode/decode (the reference's image-payload path,
# qdrant_embedder.py:105-113)
# ---------------------------------------------------------------------------

@register(
    "f2_base64_roundtrip",
    oracle="""
SELECT doc_id,
       to_base64(encode(substr(text, 1, 24))) AS b64_head,
       (decode(from_base64(to_base64(encode(text)))) = text) AS roundtrip_ok
FROM documents
""",
)
def q_f2_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.base64(F.substring("text", 1, 24).cast("binary")).alias("b64_head"),
        (F.unbase64(F.base64(F.col("text").cast("binary"))).cast("string")
         == F.col("text")).alias("roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# F5: timestamp build/extract (the reference's sec.nanosec handling,
# embedder.py:283-287)
# ---------------------------------------------------------------------------

@register(
    "f5_time_features",
    oracle="""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(hour(ts) AS BIGINT) AS hr,
       CAST(isodow(ts) - 1 AS BIGINT) AS weekday,
       COUNT(*) AS n,
       CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_us
FROM events GROUP BY 1, 2, 3
""",
)
def q_f5_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.hour("ts").cast("long").alias("hr"),
            F.weekday("ts").cast("long").alias("weekday"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.unix_micros("ts")).alias("first_us"),
        )
    )


# ---------------------------------------------------------------------------
# F6/F10: string + math scalar gauntlet (per-row IEEE ops — deterministic
# across engines, unlike order-dependent float aggregation)
# ---------------------------------------------------------------------------

@register(
    "f6_f10_scalar_gauntlet",
    oracle=r"""
SELECT p_partkey,
       upper(substr(p_name, 1, 6)) AS name_head,
       lower(trim(p_brand)) AS brand_lc,
       replace(p_type, ' ', '_') AS type_us,
       concat_ws('|', p_brand, p_type) AS brand_type,
       CAST(length(p_name) AS BIGINT) AS name_len,
       CAST(levenshtein(substr(p_name, 1, 8), 'polished') AS BIGINT) AS lev,
       round(sqrt(p_retailprice), 6) AS sqrt_price,
       round(pow(CAST(p_size AS DOUBLE), 2), 6) AS size_sq,
       round(abs(p_retailprice - 1000.0), 6) AS price_dev,
       round(greatest(p_retailprice, CAST(p_size AS DOUBLE) * 100), 6) AS g,
       round(least(p_retailprice, CAST(p_size AS DOUBLE) * 100), 6) AS l
FROM part
""",
)
def q_f6_f10_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    size_d = F.col("p_size").cast("double")
    return p.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 6)).alias("name_head"),
        F.lower(F.trim(F.col("p_brand"))).alias("brand_lc"),
        F.regexp_replace("p_type", " ", "_").alias("type_us"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.levenshtein(F.substring("p_name", 1, 8), F.lit("polished"))
        .cast("long").alias("lev"),
        F.round(F.sqrt("p_retailprice"), 6).alias("sqrt_price"),
        F.round(F.pow(size_d, F.lit(2)), 6).alias("size_sq"),
        F.round(F.abs(F.col("p_retailprice") - 1000.0), 6).alias("price_dev"),
        F.round(F.greatest(F.col("p_retailprice"), size_d * 100), 6).alias("g"),
        F.round(F.least(F.col("p_retailprice"), size_d * 100), 6).alias("l"),
    )


# ---------------------------------------------------------------------------
# F9: map functions over the open payload model (qdrant_embedder.py:119-128)
# ---------------------------------------------------------------------------

@register(
    "f9_map_payload_access",
    oracle="""
SELECT doc_id, lang AS m_lang, source AS m_source,
       CAST(n_chars AS VARCHAR) AS m_chars, 3 AS n_keys
FROM documents
""",
)
def q_f9_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    enriched = F.map_concat(
        base, F.create_map(F.lit("chars"), F.col("n_chars").cast("string"))
    )
    return docs.select(
        "doc_id",
        F.element_at(enriched, "lang").alias("m_lang"),
        F.element_at(enriched, "source").alias("m_source"),
        F.element_at(enriched, "chars").alias("m_chars"),
        F.size(F.map_keys(enriched)).cast("int").alias("n_keys"),
    )


# ---------------------------------------------------------------------------
# F11: conditional / null-handling chains (the 3-branch probe logic,
# embedder.py:243-267)
# ---------------------------------------------------------------------------

@register(
    "f11_conditional_buckets",
    oracle="""
SELECT CASE WHEN value < 10 THEN 'small' WHEN value < 50 THEN 'medium'
            ELSE 'large' END AS bucket,
       coalesce(nullif(event_type, 'error'), 'suppressed') AS etype,
       COUNT(*) AS n
FROM events GROUP BY 1, 2
""",
)
def q_f11_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 10, "small")
        .when(F.col("value") < 50, "medium")
        .otherwise("large")
    )
    etype = F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("suppressed"))
    return (
        ev.groupBy(bucket.alias("bucket"), etype.alias("etype"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# S2 + X5 end-to-end: the 3-branch raw normalization → zip-explode pipeline
# (embedder.py:234-267 + qdrant_embedder.py:130-142) with the oracle
# computing each branch's expected output directly
# ---------------------------------------------------------------------------

@register(
    "s2_normalize_pipeline",
    oracle="""
SELECT CASE WHEN doc_id % 3 = 0 THEN 'col' || CAST(doc_id % 5 AS VARCHAR)
            ELSE 'default' END AS collection,
       CASE WHEN doc_id % 3 = 0 THEN 'id-' || CAST(doc_id AS VARCHAR)
            WHEN doc_id % 3 = 1 THEN sha256('default' || chr(31) || text)
            ELSE sha256('default' || chr(31) || text) END AS id,
       text AS document,
       CASE WHEN doc_id % 3 = 0 THEN json_object('src', source)::VARCHAR
            WHEN doc_id % 3 = 1 THEN json_object('data', text, 'extra', doc_id)::VARCHAR
            ELSE json_object('data', text)::VARCHAR END AS payload_json
FROM documents
""",
)
def q_s2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds a mixed raw-input stream out of ``documents`` — one third
    well-formed embed messages, one third bare JSON dicts, one third plain
    text — and runs the real S2 normalize → X5 zip-explode pipeline on it.
    """
    from ..operators.normalize import normalize_raw, zip_explode  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    branch = F.col("doc_id") % 3
    well_formed = F.to_json(F.struct(
        F.concat(F.lit("col"), (F.col("doc_id") % 5).cast("string")).alias("collection"),
        F.array(F.col("text")).alias("documents"),
        F.array(F.struct(F.col("source").alias("src"))).alias("metadatas"),
        F.array(F.concat(F.lit("id-"), F.col("doc_id").cast("string"))).alias("ids"),
    ))
    bare_dict = F.to_json(F.struct(
        F.col("text").alias("data"), F.col("doc_id").alias("extra")
    ))
    raw = docs.select(
        F.when(branch == 0, well_formed)
        .when(branch == 1, bare_dict)
        .otherwise(F.col("text")).alias("value")
    )
    return zip_explode(normalize_raw(raw, "value", "default")).select(
        "collection", "id", "document", "payload_json"
    )


# ---------------------------------------------------------------------------
# X3 full-vector form: the hash embedder's assembled ARRAY<DOUBLE> output
# ---------------------------------------------------------------------------

@register(
    "x3_hash_embed_vec",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_WS_TOKENS.format(t='text')}) AS tok FROM documents
),
tfs AS (
  SELECT doc_id, ({DUCK_POLY_HASH.format(t='tok')}) % 64 AS bucket, COUNT(*) AS tf
  FROM toks GROUP BY doc_id, bucket
)
SELECT d.doc_id AS doc_id,
       array_to_string(
         list_transform(list(CAST(coalesce(tf, 0) AS BIGINT) ORDER BY r.j),
                        x -> CAST(x AS VARCHAR)), ',') AS vec
FROM (SELECT DISTINCT doc_id FROM documents) d
CROSS JOIN range(64) r(j)
LEFT JOIN tfs ON tfs.doc_id = d.doc_id AND tfs.bucket = r.j
GROUP BY d.doc_id
""",
)
def q_x3_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The vec column is rendered as a comma-joined string: the driver's
    # canonicalizer sorts cell values and cannot hash Python lists.
    from ..operators.embed import hash_embed_df  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    out = hash_embed_df(docs, dim=64, out_col="vec")
    return out.select(
        "doc_id",
        F.concat_ws(
            ",", F.transform(F.col("vec"), lambda x: x.cast("long").cast("string"))
        ).alias("vec"),
    )


# ---------------------------------------------------------------------------
# S1 + P1-P3 + X5: embed-message round trip — construct messages from the
# corpus, serialize to JSON, parse (S1), zip-explode back to records; output
# must equal a direct projection of the source table (reference
# README.md:40-58 message shape, qdrant_embedder.py:130-142 positional zip)
# ---------------------------------------------------------------------------

@register(
    "s1_message_roundtrip",
    oracle="""
SELECT source AS collection, CAST(doc_id AS VARCHAR) AS id,
       text AS document, lang
FROM documents
""",
)
def q_s1_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    grouped = docs.groupBy("source").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "text", "lang"))).alias("recs")
    )
    msgs = grouped.select(
        F.to_json(
            F.struct(
                F.col("source").alias("collection"),
                F.transform("recs", lambda r: r["text"]).alias("documents"),
                F.transform(
                    "recs", lambda r: F.to_json(F.struct(r["lang"].alias("lang")))
                ).alias("metadatas"),
                F.transform("recs", lambda r: r["doc_id"].cast("string")).alias("ids"),
            )
        ).alias("value")
    )
    rec = normalize.zip_explode(normalize.parse_messages(msgs))
    return rec.select(
        "collection",
        "id",
        "document",
        F.get_json_object("payload_json", "$.lang").alias("lang"),
    )


# ---------------------------------------------------------------------------
# S6/T7: upsert-by-id, last write wins — re-delivered ids replace the stored
# point (Qdrant upload_points semantics, qdrant_embedder.py:58-62,130-143)
# ---------------------------------------------------------------------------

@register(
    "s6_upsert_last_write_wins",
    oracle="""
WITH allv AS (
  SELECT doc_id AS id, text AS document, CAST(1 AS BIGINT) AS version
  FROM documents
  UNION ALL
  SELECT doc_id, text || ' [v2]', CAST(2 AS BIGINT) FROM documents
  WHERE doc_id % 3 = 0
)
SELECT id, document, version FROM (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY version DESC) AS rn
  FROM allv) WHERE rn = 1
""",
)
def q_s6_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.select(
        F.col("doc_id").alias("id"), F.col("text").alias("document"),
        F.lit(1).cast("long").alias("version"),
    )
    v2 = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("id"),
        F.concat(F.col("text"), F.lit(" [v2]")).alias("document"),
        F.lit(2).cast("long").alias("version"),
    )
    return upsert.last_write_wins(v1.unionByName(v2), "id", "version")


# ---------------------------------------------------------------------------
# S7: dead-letter routing — malformed messages split off, stream continues
# (per-message try/except at embedder.py:217-225)
# ---------------------------------------------------------------------------

@register(
    "s7_dead_letter_routing",
    oracle="""
SELECT CASE WHEN doc_id % 10 = 0 THEN 'dead_letter' ELSE 'main' END AS route,
       COUNT(*) AS n
FROM documents GROUP BY 1
""",
)
def q_s7_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    value = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(F.lit("not json: "), F.col("text")),  # guaranteed malformed
    ).otherwise(
        F.to_json(
            F.struct(
                F.lit("c").alias("collection"),
                F.array(F.col("text")).alias("documents"),
                F.array(F.lit("{}")).alias("metadatas"),
            )
        )
    )
    probed = docs.select(
        F.from_json(
            value, normalize.RAW_PROBE_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("_p")
    )
    route = F.when(
        F.col("_p._corrupt_record").isNotNull(), F.lit("dead_letter")
    ).otherwise(F.lit("main"))
    return probed.groupBy(route.alias("route")).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# P4: payload-key filter — the filterable half of the delegated query surface
# (README.md:13; payload built at qdrant_embedder.py:119-128)
# ---------------------------------------------------------------------------

@register(
    "p4_payload_filter",
    oracle="""
SELECT doc_id, source, n_chars FROM documents
WHERE lang = 'en' AND n_chars > 100
""",
)
def q_p4_payload_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.withColumn(
        "payload",
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ),
    )
    return (
        with_payload.filter(
            (F.col("payload")["lang"] == "en") & (F.col("n_chars") > 100)
        )
        .select("doc_id", F.col("payload")["source"].alias("source"), "n_chars")
    )


# ---------------------------------------------------------------------------
# P5: conditional payload enrichment — inject image_b64 only when the key is
# absent (qdrant_embedder.py:119-128 enriches only missing keys)
# ---------------------------------------------------------------------------

@register(
    "p5_payload_enrichment",
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 4 = 0 THEN 'image_b64=preset;lang=' || lang
            ELSE 'image_b64=' || base64(encode(substr(text, 1, 8)))
                 || ';lang=' || lang END AS payload_str
FROM documents
""",
)
def q_p5_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payload = F.when(
        F.col("doc_id") % 4 == 0,
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("image_b64"), F.lit("preset")
        ),
    ).otherwise(F.create_map(F.lit("lang"), F.col("lang")))
    enriched = F.when(
        F.map_contains_key(payload, "image_b64"), payload
    ).otherwise(
        F.map_concat(
            payload,
            F.create_map(
                F.lit("image_b64"),
                F.base64(F.substring(F.col("text"), 1, 8).cast("binary")),
            ),
        )
    )
    rendered = F.array_join(
        F.transform(
            F.array_sort(F.map_entries(enriched)),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]),
        ),
        ";",
    )
    return docs.select("doc_id", rendered.alias("payload_str"))


# ---------------------------------------------------------------------------
# F3/F4: deterministic content ids — the oracle-safe replacement for the
# reference's uuid4 default (qdrant_embedder.py:115-117)
# ---------------------------------------------------------------------------

@register(
    "f3_f4_content_ids",
    oracle="""
SELECT doc_id,
       sha256('default' || chr(31) || text) AS sha_id,
       md5(text) AS md5_id
FROM documents
""",
)
def q_f3_content_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from ..functions.hashing import content_id  # noqa: PLC0415

    return docs.select(
        "doc_id",
        content_id(F.lit("default"), F.col("text")).alias("sha_id"),
        F.md5(F.col("text")).alias("md5_id"),
    )


# ---------------------------------------------------------------------------
# F8: array-function gauntlet — size/slice/element_at/transform/aggregate/
# array_sort over the embedding arrays (the list-zip record model,
# qdrant_embedder.py:130-142)
# ---------------------------------------------------------------------------

@register(
    "f8_array_gauntlet",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round(list_aggregate(list_transform(list_slice(embedding, 1, 8),
                                           x -> x::DOUBLE), 'sum'), 6) AS head_sum,
       round(embedding[1]::DOUBLE, 6) AS first_val,
       round(list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 6) AS max_abs,
       round(list_min(list_transform(embedding, x -> x::DOUBLE)), 6) AS min_val
FROM embeddings
""",
)
def q_f8_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(
            F.aggregate(
                F.slice("embedding", 1, 8), F.lit(0.0),
                lambda a, x: a + x.cast("double"),
            ),
            6,
        ).alias("head_sum"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double")))), 6
        ).alias("max_abs"),
        F.round(
            F.array_min(F.transform("embedding", lambda x: x.cast("double"))), 6
        ).alias("min_val"),
    )


# ---------------------------------------------------------------------------
# X4: grouped-map UDAF — per-label centroids via applyInPandas (same oracle
# as the explode-form A5: two physical strategies, one semantic contract)
# ---------------------------------------------------------------------------

@register(
    "x4_centroids_applyinpandas",
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
def q_x4_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return centroid.centroids_grouped_map(emb)


# ---------------------------------------------------------------------------
# X1: pluggable ML text embedder (rows-only — the ML path is off the oracle
# by design; deterministic fake model exercises the lazy-init Iterator UDF)
# ---------------------------------------------------------------------------

@register("x1_text_embed_udf", oracle=None)
def q_x1_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.embed import make_text_embedder_udf  # noqa: PLC0415

    def fake_encode(texts):
        return [
            [float((len(t) + i) % 7) for i in range(8)] for t in texts
        ]

    udf = make_text_embedder_udf(dim=8, _encode_fn=fake_encode)
    docs = load_table(spark, sf_dir, "documents")
    vecs = docs.select("doc_id", udf(F.col("text")).alias("text_vec"))
    # Stringified for the driver's canonicalizer (cannot hash array cells).
    return vecs.select(
        "doc_id",
        F.concat_ws(
            ",", F.transform(F.col("text_vec"), lambda x: F.format_string("%.1f", x))
        ).alias("text_vec"),
    )


# ---------------------------------------------------------------------------
# J9: the multi-join analytical flagship (TPC-H Q5 shape) — 6-table join
# where Catalyst must mix broadcast (region/nation/supplier) with shuffle
# joins (orders/lineitem) and reorder around the selective region filter.
# ---------------------------------------------------------------------------

@register(
    "j9_regional_revenue",
    oracle=f"""
SELECT n.n_name,
       CAST(SUM({DEC.format(x='l.l_extendedprice')}
              * (CAST(1 AS DECIMAL(18,4)) - {DEC.format(x='l.l_discount')})) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o    ON c.c_custkey = o.o_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q_j9_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dec = lambda col: col.cast("decimal(18,4)")  # noqa: E731
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
              n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.sum(dec(F.col("l_extendedprice"))
              * (F.lit(1).cast("decimal(18,4)") - dec(F.col("l_discount"))))
        .cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# J10: correlated scalar subquery (TPC-H Q17 shape) — revenue of small-
# quantity orders for a part brand, where "small" is relative to the part's
# own average.  Catalyst decorrelates the subquery into an aggregate + join;
# the oracle keeps the textbook correlated form.
# ---------------------------------------------------------------------------

@register(
    "j10_small_quantity_revenue",
    oracle=f"""
SELECT CAST(SUM({DEC.format(x='l.l_extendedprice')}) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)
""",
)
def q_j10_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    li.createOrReplaceTempView("_j10_lineitem")
    p.createOrReplaceTempView("_j10_part")
    return spark.sql(f"""
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
                 AS avg_yearly,
               COUNT(*) AS n_items
        FROM _j10_lineitem l JOIN _j10_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (
            SELECT 0.5 * AVG(l2.l_quantity) FROM _j10_lineitem l2
            WHERE l2.l_partkey = l.l_partkey)
    """)


# ---------------------------------------------------------------------------
# Vector-DB API surface beyond search: retrieve-by-ids (Qdrant `retrieve` /
# scroll) and recommend (Qdrant `recommend`: query = mean(positives) -
# mean(negatives), examples excluded from results).
# ---------------------------------------------------------------------------

@register(
    "a7_salted_event_stats",
    oracle="""
SELECT event_type, COUNT(*) AS n,
       round(SUM(CAST(value AS DECIMAL(18,6))), 6)::DOUBLE AS total_value,
       round(MAX(value), 6) AS max_value
FROM events GROUP BY event_type
""",
)
def q_a7_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicitly-salted two-phase aggregation over the (skewed-ish)
    event_type key — at 100 TB a hot key's rows spread over 16 reducers in
    the partial stage instead of one.  Money-style sums go through exact
    micro-units so the two-phase fold matches the oracle's DECIMAL sum."""
    from ..operators.skew import salted_agg  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_u", F.round(F.col("value") * 1_000_000).cast("long"))
    out = salted_agg(ev, "event_type", {
        "n": (F.count(F.lit(1)), F.sum("n")),
        "total_u": (F.sum("value_u"), F.sum("total_u")),
        "max_value": (F.max("value"), F.max("max_value")),
    }, salt_on="event_id")
    return out.select(
        "event_type", F.col("n").cast("long").alias("n"),
        F.round(F.col("total_u") / 1_000_000, 6).alias("total_value"),
        F.round("max_value", 6).alias("max_value"))


@register(
    "hybrid_rrf_search",
    oracle=r"""
WITH toks AS (
  SELECT doc_id AS id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
lens AS (SELECT id, len(toks) AS len FROM toks),
stats AS (SELECT COUNT(*) AS n, AVG(len) AS avgdl FROM lens),
posting AS (
  SELECT id, term, COUNT(*) AS tf
  FROM (SELECT id, unnest(toks) AS term FROM toks)
  WHERE term IN ('vector', 'join', 'stream')
  GROUP BY id, term
),
dfreq AS (SELECT term, COUNT(DISTINCT id) AS df FROM posting GROUP BY term),
bm_scored AS (
  SELECT p.id,
         round(SUM(
           ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (p.tf * 2.2)
           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * lens.len / stats.avgdl))
         ), 6) AS score
  FROM posting p
  JOIN dfreq ON p.term = dfreq.term
  JOIN lens ON lens.id = p.id
  CROSS JOIN stats
  GROUP BY p.id
),
bm AS (
  SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank
  FROM (SELECT * FROM bm_scored ORDER BY score DESC, id LIMIT 20)
),
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
vec_pairs AS (
  SELECT e.vec_id AS id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(e.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(e.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, embeddings e
  WHERE e.vec_id <> 0 AND e.vec_id IN (SELECT doc_id FROM documents)
),
vv AS (
  SELECT id, row_number() OVER (ORDER BY sim DESC, id) AS rank
  FROM (SELECT * FROM vec_pairs ORDER BY sim DESC, id LIMIT 20)
),
fused AS (
  SELECT COALESCE(bm.id, vv.id) AS id,
         round(COALESCE(1.0/(60+bm.rank), 0) + COALESCE(1.0/(60+vv.rank), 0),
               6) AS rrf_score
  FROM bm FULL OUTER JOIN vv ON bm.id = vv.id
)
SELECT id, rrf_score,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, id) AS BIGINT) AS rank
FROM fused ORDER BY rrf_score DESC, id LIMIT 10
""",
)
def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: BM25 lexical top-20 ∪ cosine vector top-20, fused by
    Reciprocal Rank Fusion — the delegated store's hybrid-query surface.
    Each ranker keeps its own scale-safe plan; the fusion joins two k-row
    lists (corpus-size-independent)."""
    from ..operators.text_search import bm25_topk, rrf_fuse  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, ["vector", "join", "stream"], k=20)
    qdf = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    corpus = emb.join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi")
    vec = (knn.knn_join(qdf, corpus, k=20)
           .select(F.col("vec_id").alias("id"), "rank"))
    out = rrf_fuse([lex.select("id", "rank"), vec], k=10)
    return out.select("id", "rrf_score",
                      F.col("rank").cast("long").alias("rank"))
