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

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import vector
from .functions.hashing import POLY_MOD, poly_hash
from .functions.text import ws_tokens
from .operators import centroid, dedup, index, knn, normalize, quantize, upsert
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
        if name in REGISTRY:
            # a silent dict overwrite would shadow an existing green query
            # (it happened: round 6 re-used round 4's api_search_groups
            # name) — refuse at import time instead
            raise ValueError(f"duplicate query registration: {name!r}")
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
# J5 at bench scale: 100-query exact kNN on the vectorized partial-top-k
# physical path (BLAS matmul per partition + local top-k + tiny global merge)
# ---------------------------------------------------------------------------

@register(
    "knn_cosine_topk100",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 100
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
def q_knn_topk100(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = knn.knn_join_vectorized(queries, emb, k=10)
    return out.select("qid", "vec_id", "sim", F.col("rank").cast("long").alias("rank"))


@register("knn_lsh_brp", oracle=None)  # probabilistic recall, rows-only
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-projection LSH buckets (rows-only; knn_cosine_topk is
    the exact twin on the same query set)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = knn.knn_join_lsh(queries, emb, k=10)
    return out.select("qid", "vec_id", "sim", F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# Flagship composite: FILTERED vector search — payload predicate + kNN + the
# matched point's payload in the result.  This is Qdrant's filtered search
# (the query surface README.md:13 delegates, with payload filters built at
# qdrant_embedder.py:119-128); in Spark the payload predicate is pushed into
# the parquet scan, so at 100 TB the filter prunes before any vector math.
# ---------------------------------------------------------------------------

@register(
    "knn_filtered_search",
    oracle="""
WITH corpus AS (
  SELECT vec_id, embedding, label FROM embeddings WHERE label IN (1, 3, 5, 7)
),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 8
),
pairs AS (
  SELECT q.qid, c.vec_id, c.label,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, corpus c
  WHERE q.qid <> c.vec_id
)
SELECT qid, vec_id, CAST(label AS BIGINT) AS label, sim,
       CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM pairs)
WHERE rank <= 5
""",
)
def q_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("label").isin([1, 3, 5, 7]))
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = knn.knn_join(queries, corpus, k=5)
    payload = emb.select("vec_id", F.col("label").cast("long").alias("label"))
    return (
        out.join(F.broadcast(payload), "vec_id")
        .select("qid", "vec_id", "label", "sim",
                F.col("rank").cast("long").alias("rank"))
    )


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
    from .operators.normalize import normalize_raw, zip_explode  # noqa: PLC0415

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
# Dedup family (J8/F4, north star): every strategy with an integer-exact or
# rounded-deterministic DuckDB twin.  Shared oracle CTE: distinct 3-gram
# shingles per doc (DuckDB mirror of operators.dedup.doc_shingles).
# ---------------------------------------------------------------------------

DUCK_SHINGLES = r"""
toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> length(x) > 0) AS tk
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(greatest(len(tk)-2, 0)),
                                 i -> array_to_string(tk[i+1:i+3], ' '))) AS shingle
    FROM toks)
)"""

_POLY_H = DUCK_POLY_HASH.format(t="shingle")


@register(
    "dedup_ngram_jaccard",
    # max_df=50 drops ubiquitous shingles BEFORE the self-join: the fixture's
    # tiny vocabulary makes common 3-grams appear in hundreds of docs, and a
    # shingle with df=d contributes d² candidate pairs — the classic skew
    # blowup this cap exists for (same cap applied in the oracle).
    oracle=f"""
WITH {DUCK_SHINGLES},
keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 50),
sh2 AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh2 GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS n_inter
  FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT ia AS id_a, ib AS id_b,
       round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = ia
JOIN sizes sb ON sb.doc_id = ib
WHERE round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.5
""",
)
def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_df=50)


def _minhash_oracle(num_hashes: int = 16, bands: int = 4) -> str:
    from .functions.hashing import MINHASH_PRIME, minhash_params  # noqa: PLC0415

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
    return f"""
WITH {DUCK_SHINGLES},
hashed AS (SELECT doc_id, ({_POLY_H}) AS h FROM sh),
sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
banded AS (
  {band_rows}
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_bands_matched
FROM banded a
JOIN banded b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


@register("dedup_minhash_lsh", oracle=_minhash_oracle())
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4)


@register("dedup_minhash_ml", oracle=None)  # probabilistic recall, rows-only
def q_dedup_minhash_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs_ml(docs, threshold=0.5)


def _simhash_oracle(bits: int = 64, max_hamming: int = 3) -> str:
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
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             x -> length(x) > 0) AS tk
  FROM documents
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


@register("dedup_simhash", oracle=_simhash_oracle())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = dedup.simhash_pairs(docs, bits=64, max_hamming=3)
    return out.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


@register(
    "dedup_embedding_blocked",
    oracle="""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(
         (SELECT SUM(x*y) FROM (SELECT unnest(a.embedding)::DOUBLE AS x,
                                       unnest(b.embedding)::DOUBLE AS y))
         / ( sqrt((SELECT SUM(x*x) FROM (SELECT unnest(a.embedding)::DOUBLE AS x)))
           * sqrt((SELECT SUM(y*y) FROM (SELECT unnest(b.embedding)::DOUBLE AS y)))),
         6) AS sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(
         (SELECT SUM(x*y) FROM (SELECT unnest(a.embedding)::DOUBLE AS x,
                                       unnest(b.embedding)::DOUBLE AS y))
         / ( sqrt((SELECT SUM(x*x) FROM (SELECT unnest(a.embedding)::DOUBLE AS x)))
           * sqrt((SELECT SUM(y*y) FROM (SELECT unnest(b.embedding)::DOUBLE AS y)))),
         6) >= 0.35
""",
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_neardup_pairs_vectorized(emb, threshold=0.35)


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
    from .operators.embed import hash_embed_df  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    out = hash_embed_df(docs, dim=64, out_col="vec")
    return out.select(
        "doc_id",
        F.concat_ws(
            ",", F.transform(F.col("vec"), lambda x: x.cast("long").cast("string"))
        ).alias("vec"),
    )


# ---------------------------------------------------------------------------
# Text analysis (F6 ext, north star): language-ID, quality scoring,
# token counting, fingerprinting — all JVM-side expressions
# ---------------------------------------------------------------------------

def _langid_oracle() -> str:
    from .functions.text import LANG_MARKERS  # noqa: PLC0415

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


@register("text_langid", oracle=_langid_oracle())
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import LANG_MARKERS, lang_scores  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    scores = lang_scores(toks)
    ranked = F.sort_array(F.array(*[
        F.struct((-scores[lang]).alias("neg"), F.lit(lang).alias("l"))
        for lang in sorted(LANG_MARKERS)
    ]))
    return docs.select(
        "doc_id",
        scores["en"].cast("long").alias("s_en"),
        ranked[0]["l"].alias("pred_lang"),
    )


@register(
    "text_quality_stats",
    oracle=r"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> length(x) > 0) AS tk
  FROM documents
),
m AS (
  SELECT doc_id, text, tk, len(tk) AS n_tok,
         len(list_filter(tk, x -> list_contains(
             ['the','a','of','and','is','to','in'], lower(x)))) AS n_sw,
         length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct
  FROM t
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
       round(CASE WHEN n_tok > 0 THEN n_sw::DOUBLE / n_tok ELSE 0.0 END, 6) AS sw_ratio,
       round(CASE WHEN length(text) > 0
                  THEN n_punct::DOUBLE / length(text) ELSE 0.0 END, 6) AS punct_ratio,
       round(CASE WHEN n_tok > 0
                  THEN list_sum(list_transform(tk, x -> length(x)))::DOUBLE / n_tok
                  ELSE 0.0 END, 6) AS avg_tok_len,
       round((CASE WHEN n_tok >= 10 AND n_tok <= 1000 THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN n_tok > 0 AND n_sw::DOUBLE / n_tok >= 0.05 THEN 0.3 ELSE 0.0 END)
           + (CASE WHEN length(text) > 0 AND n_punct::DOUBLE / length(text) <= 0.2
                   THEN 0.3 ELSE 0.0 END), 6) AS quality
FROM m
""",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions import text as TX  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    return docs.select(
        "doc_id",
        TX.token_count(F.col("text")).cast("long").alias("n_tokens"),
        F.round(TX.stopword_ratio(toks), 6).alias("sw_ratio"),
        F.round(TX.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(TX.avg_token_len(toks), 6).alias("avg_tok_len"),
        F.round(TX.quality_score(F.col("text")), 6).alias("quality"),
    )


_NORM_TEXT = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_FP_HASH = DUCK_POLY_HASH.format(t=_NORM_TEXT)


@register(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
       ({_FP_HASH}) AS fp,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
            AS BIGINT) AS n_bpe_tokens
FROM documents
""",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions import text as TX  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.fingerprint(F.col("text")).alias("fp"),
        F.size(TX.bpe_tokens(F.col("text"))).cast("long").alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# T4: sliding windows (batch-equivalent; every event lands in width/slide
# overlapping windows — the oracle enumerates them with a range join)
# ---------------------------------------------------------------------------

@register(
    "t4_sliding_event_windows",
    oracle="""
SELECT time_bucket(INTERVAL 15 MINUTE, ts) - j * INTERVAL 15 MINUTE AS window_start,
       time_bucket(INTERVAL 15 MINUTE, ts) - j * INTERVAL 15 MINUTE
         + INTERVAL 1 HOUR AS window_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events, range(4) r(j)
GROUP BY 1, 2
""",
)
def q_t4_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return windows.sliding(
        ev, ts="ts", width="1 hour", slide="15 minutes",
        n_events=F.count(F.lit(1)),
        total_value=F.sum(F.col("value").cast("decimal(18,4)")).cast("double"),
    )


# ---------------------------------------------------------------------------
# T5: session windows (batch-equivalent; oracle = lag-gap-cumsum)
# ---------------------------------------------------------------------------

@register(
    "t5_session_windows",
    oracle="""
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, value
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM s GROUP BY user_id, sid
""",
)
def q_t5_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return windows.session(
        ev, ts="ts", key="user_id", gap="30 minutes",
        n_events=F.count(F.lit(1)),
        total_value=F.sum(F.col("value").cast("decimal(18,4)")).cast("double"),
    )


# ---------------------------------------------------------------------------
# T2: dedup (batch form of streaming dropDuplicates, made deterministic:
# keep the FIRST event per key by event time)
# ---------------------------------------------------------------------------

@register(
    "t2_dedup_first_event",
    oracle="""
SELECT user_id, event_type, event_id, ts
FROM (SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events)
WHERE rn = 1
""",
)
def q_t2_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


# ---------------------------------------------------------------------------
# J5 at scale: IVF-blocked approximate kNN (centroid probe → pruned exact)
# ---------------------------------------------------------------------------

_DUCK_COS = """
round(
  (SELECT SUM(x*y) FROM (SELECT unnest({a})::DOUBLE AS x, unnest({b})::DOUBLE AS y))
  / ( sqrt((SELECT SUM(x*x) FROM (SELECT unnest({a})::DOUBLE AS x)))
    * sqrt((SELECT SUM(y*y) FROM (SELECT unnest({b})::DOUBLE AS y)))), 6)"""


@register(
    "knn_ivf_blocked",
    oracle=f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
cent AS (
  SELECT label, list(cv ORDER BY pos) AS cvec FROM (
    SELECT label, pos,
           CAST(SUM(CAST(val AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS cv
    FROM (SELECT label, unnest(embedding)::DOUBLE AS val,
                 unnest(range(len(embedding))) AS pos
          FROM embeddings)
    GROUP BY label, pos) GROUP BY label
),
probes AS (
  SELECT qid, qvec, label FROM (
    SELECT q.qid, q.qvec, c.label,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {_DUCK_COS.format(a='q.qvec', b='c.cvec')} DESC,
                                       c.label) AS rk
    FROM q, cent c) WHERE rk <= 2
),
pairs AS (
  SELECT p.qid, e.vec_id, {_DUCK_COS.format(a='p.qvec', b='e.embedding')} AS sim
  FROM probes p JOIN embeddings e ON e.label = p.label AND e.vec_id <> p.qid
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cent = centroid.centroids(emb, exact=True)
    out = knn.knn_join_blocked(qs, emb, cent, k=10, n_probe=2)
    return out.select("qid", "vec_id", "sim", F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# Multimodal binary columns (S3/X2/X5): the documents' text treated as opaque
# bytes exercises the same mapInPandas plumbing a real image corpus uses
# ---------------------------------------------------------------------------

@register(
    "mm_binary_stats",
    oracle="""
SELECT doc_id AS id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
       sha256(text) AS sha256
FROM documents
""",
)
def q_mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal as MM  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    return MM.binary_stats(MM.text_as_binary(docs))


@register("mm_byte_histogram", oracle=None)  # pandas-UDF feature path, rows-only
def q_mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # features rendered as a comma-joined string (6dp) — the driver's
    # canonicalizer cannot hash array cells even for rows-only checks.
    from .operators import multimodal as MM  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    blobs = MM.text_as_binary(docs)
    hist = blobs.select(
        "doc_id", MM.byte_histogram_udf(16)(F.col("content")).alias("features")
    )
    return hist.select(
        "doc_id",
        F.concat_ws(
            ",", F.transform(F.col("features"), lambda x: F.format_string("%.6f", x))
        ).alias("features"),
    )


@register(
    "mm_audio_features",
    # The FAUD codec is deterministic integer arithmetic, so even the DECODE
    # path is oracle-checkable: DuckDB regenerates the PCM train per doc and
    # recomputes rate/length/energy.
    oracle="""
WITH p AS (
  SELECT doc_id, 64 + doc_id % 64 AS n, doc_id % 256 AS seed FROM documents
),
v AS (
  SELECT doc_id, n,
         list_transform(range(n),
           i -> CASE WHEN (seed + 17*i) % 256 > 127
                     THEN (seed + 17*i) % 256 - 256
                     ELSE (seed + 17*i) % 256 END) AS pcm
  FROM p
)
SELECT doc_id, CAST(16000 AS INTEGER) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       round(n / 16000.0, 6) AS duration_sec,
       round(sqrt(list_aggregate(list_transform(pcm, s -> s*s), 'sum') / n), 6) AS rms
FROM v
""",
)
def q_mm_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: PLC0415

    from .operators import multimodal as MM  # noqa: PLC0415

    # no annotations: postponed-evaluation strings ('pd.Series') can't be
    # resolved by pandas_udf's type-hint inference with a local pd import
    def _gen(doc_ids):
        return doc_ids.map(
            lambda d: MM.fake_audio(64 + int(d) % 64, seed=int(d) % 256))

    gen_faud = F.pandas_udf(_gen, "binary")

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    blobs = docs.withColumn("content", gen_faud(F.col("doc_id")))
    out = MM.decode_audio(blobs, id_col="doc_id")
    return out.select(
        F.col("id").alias("doc_id"), "sample_rate", "n_samples",
        F.round("duration_sec", 6).alias("duration_sec"),
        F.round("rms", 6).alias("rms"),
    )


@register("mm_resize_pipeline", oracle=None)  # pixel-codec path, rows-only
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X5 composition: generate per-doc FIMG blobs, resize to a fixed
    thumbnail, decode the thumbnails — the decode→resize→feature chain a
    real image corpus runs, all through Arrow-batched mapInPandas."""
    from .operators import multimodal as MM  # noqa: PLC0415

    def _gen(doc_ids):
        return doc_ids.map(
            lambda d: MM.fake_image(8 + int(d) % 8, 8, 1, seed=int(d) % 256))

    gen_fimg = F.pandas_udf(_gen, "binary")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    blobs = docs.withColumn("content", gen_fimg(F.col("doc_id")))
    thumbs = MM.resize_images(blobs, 4, 4, id_col="doc_id")
    out = MM.decode_images(thumbs, id_col="id")
    return out.select(
        F.col("id").alias("doc_id"), "width", "height",
        F.round("mean_pixel", 6).alias("mean_pixel"))


@register("mm_binaryfile_source", oracle=None)  # filesystem source, rows-only
def q_mm_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: a real ``spark.read.format("binaryFile")`` media source — writes a
    deterministic set of FIMG blobs to a scratch dir once, reads them back as
    (path, content) files, and decodes through the mapInPandas codec path.
    The reference's equivalent source is the ROS image topic subscription
    (embedder.py:269-303); binaryFile is the batch-Spark spelling, and at
    scale it parallelizes by file with partition pruning on path globs.
    """
    import tempfile  # noqa: PLC0415

    from .operators import multimodal as MM  # noqa: PLC0415

    d = os.path.join(tempfile.gettempdir(), "bvds_fimg_source")
    os.makedirs(d, exist_ok=True)
    for i in range(8):
        p = os.path.join(d, f"img_{i}.fimg")
        if not os.path.exists(p):
            with open(p, "wb") as fh:
                fh.write(MM.fake_image(8 + i, 6 + i, 3, seed=i))
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.fimg")
        .load(d)
        .select(
            F.regexp_extract(F.col("path"), r"img_(\d+)\.fimg", 1)
            .cast("long").alias("media_id"),
            "content",
        )
    )
    decoded = MM.decode_images(blobs)
    return decoded.select(
        "id", "width", "height", "channels",
        F.round(F.col("mean_pixel"), 6).alias("mean_pixel"),
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
    from .functions.hashing import content_id  # noqa: PLC0415

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
    from .operators.embed import make_text_embedder_udf  # noqa: PLC0415

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
# Corpus vocabulary: top n-grams by document frequency — the vocab-building
# aggregation every tokenizer/dedup pipeline starts from (one shuffle on the
# shingle, map-side partials, global top-k via TakeOrderedAndProject).
# ---------------------------------------------------------------------------

@register(
    "text_top_ngrams",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> length(x) > 0) AS tk
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(greatest(len(tk)-1, 0)),
                                 i -> array_to_string(tk[i+1:i+2], ' '))) AS shingle
    FROM toks)
)
SELECT shingle, COUNT(*) AS df
FROM sh GROUP BY shingle
ORDER BY df DESC, shingle
LIMIT 100
""",
)
def q_text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.doc_shingles(docs, n=2)
    return (
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("shingle")).limit(100)
    )


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
    from .operators.skew import salted_agg  # noqa: PLC0415

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
    "api_retrieve_by_ids",
    oracle="""
SELECT vec_id, CAST(label AS BIGINT) AS label,
       CAST(len(embedding) AS BIGINT) AS dim
FROM embeddings WHERE vec_id IN (3, 1, 4, 15, 92)
""",
)
def q_api_retrieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by id list — the GET half of the reference's delegated
    store API (qdrant upload/retrieve round trip).  At scale the IN-list is
    a pushed filter (or a broadcast semi-join for big id sets)."""
    emb = load_table(spark, sf_dir, "embeddings")
    wanted = [3, 1, 4, 15, 92]
    return emb.filter(F.col("vec_id").isin(wanted)).select(
        "vec_id", F.col("label").cast("long").alias("label"),
        F.size("embedding").cast("long").alias("dim"))


@register(
    "api_recommend",
    # qvec = sum(positives)/|P| - sum(negatives)/|N| componentwise; with
    # |P|=2, |N|=1 every component is a single add + divide on both engines,
    # so the query vector (and therefore each similarity) is bit-identical.
    oracle="""
WITH ex AS (
  SELECT vec_id, CASE WHEN vec_id IN (0, 1) THEN 1 ELSE -1 END AS s,
         unnest(embedding)::DOUBLE AS val,
         unnest(range(0, len(embedding))) AS pos
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
qv AS (
  SELECT pos,
         SUM(CASE WHEN s = 1 THEN val END) / 2
       - SUM(CASE WHEN s = -1 THEN val END) AS qval
  FROM ex GROUP BY pos
),
qvec AS (SELECT list(qval ORDER BY pos) AS v FROM qv),
pairs AS (
  SELECT e.vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.v) AS a,
                                         unnest(e.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.v) AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(e.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM embeddings e, qvec q
  WHERE e.vec_id NOT IN (0, 1, 2)
)
SELECT vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (ORDER BY sim DESC, vec_id) AS rank FROM pairs)
WHERE rank <= 10
""",
)
def q_api_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pos_ids, neg_ids = [0, 1], [2]
    ex = emb.filter(F.col("vec_id").isin(pos_ids + neg_ids)).select(
        F.when(F.col("vec_id").isin(pos_ids), 1).otherwise(-1).alias("s"),
        F.posexplode("embedding").alias("pos", "val"),
    )
    qv = ex.groupBy("pos").agg(
        (F.sum(F.when(F.col("s") == 1, F.col("val").cast("double"))) / len(pos_ids)
         - F.sum(F.when(F.col("s") == -1, F.col("val").cast("double"))) / len(neg_ids)
         ).alias("qval")
    )
    qvec = qv.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "qval"))),
            lambda st: st["qval"],
        ).alias("qvec")
    ).select(F.lit(0).alias("qid"), "qvec")
    corpus = emb.filter(~F.col("vec_id").isin(pos_ids + neg_ids))
    out = knn.knn_join(qvec, corpus, k=10, exclude_self=False)
    return out.select("vec_id", "sim", F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# Corpus-clean composite: quality filter (length / alpha-ratio / langid) +
# exact dedup (keep lowest doc_id per content hash) in ONE declarative plan —
# the shape a real pretraining-data job takes; Catalyst pipelines all three
# predicates into the scan and the only shuffle is the dedup group-by.
# ---------------------------------------------------------------------------

@register(
    "pipe_corpus_clean",
    oracle=r"""
WITH t AS (
  SELECT doc_id, source, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> length(x) > 0) AS tk
  FROM documents
),
m AS (
  SELECT doc_id, source, text, len(tk) AS n_tok,
         len(list_filter(tk, x -> list_contains(
             ['the','a','of','and','is','to','in'], lower(x)))) AS n_sw,
         length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct
  FROM t
),
q AS (
  SELECT doc_id, source, text,
         (CASE WHEN n_tok >= 10 AND n_tok <= 1000 THEN 0.4 ELSE 0.0 END)
       + (CASE WHEN n_tok > 0 AND n_sw::DOUBLE / n_tok >= 0.05 THEN 0.3 ELSE 0.0 END)
       + (CASE WHEN length(text) > 0 AND n_punct::DOUBLE / length(text) <= 0.2
               THEN 0.3 ELSE 0.0 END) AS quality
  FROM m
),
kept AS (
  SELECT doc_id, source, md5(text) AS h,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM q WHERE quality >= 0.7
)
SELECT source, COUNT(*) AS n_docs
FROM kept WHERE rn = 1
GROUP BY source
""",
)
def q_pipe_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions import text as TX  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    survivors = docs.filter(TX.quality_score(F.col("text")) >= 0.7)
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy(F.asc("doc_id"))
    deduped = (
        survivors.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return deduped.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))


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


@register(
    "pipe_split_counts",
    oracle=f"""
WITH b AS (SELECT doc_id, ({_DUCK_BUCKET.format(salt='split')}) AS bkt FROM documents)
SELECT CASE WHEN bkt < 8000 THEN 'train'
            WHEN bkt < 9000 THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM b GROUP BY 1
""",
)
def q_pipe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import sampling  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(sampling.assign_split(F.col("doc_id")).alias("split"))
        .groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "pipe_hash_sample",
    oracle=f"""
SELECT doc_id, lang FROM documents
WHERE ({_DUCK_BUCKET.format(salt='sample')}) < 500
""",
)
def q_pipe_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import sampling  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    return sampling.hash_sample(docs, "doc_id", 0.05).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# T1/T7/S7/S8 LIVE: a real Structured Streaming run — readStream over
# JSON-lines message files → normalize → zip-explode → dead-letter split →
# foreachBatch upsert sink — with availableNow so the query drains and stops.
# The stored collection must equal a plain projection of the source table,
# which is exactly the unified batch/stream API promise.
# ---------------------------------------------------------------------------

@register(
    "t1_stream_ingest_roundtrip",
    oracle="""
SELECT 'stream' AS collection, CAST(doc_id AS VARCHAR) AS id, text AS document
FROM documents WHERE doc_id < 200
""",
)
def q_t1_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from .operators.upsert import read_collection  # noqa: PLC0415
    from .streaming import ingest as ING  # noqa: PLC0415

    token = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.path.join(tempfile.gettempdir(), f"bvds_stream_{token}")
    in_dir = os.path.join(base, "in")
    store = os.path.join(base, "store")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(in_dir)

    rows = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200).select("doc_id", "text").collect()
    )
    # two input files → two entries in the file-stream log (S8-adjacent)
    half = len(rows) // 2 or 1
    for fi, chunk in enumerate((rows[:half], rows[half:])):
        if not chunk:
            continue
        with open(os.path.join(in_dir, f"batch{fi}.jsonl"), "w") as fh:
            for r in chunk:
                msg = {"collection": "stream", "documents": [r["text"]],
                       "metadatas": [{}], "ids": [str(r["doc_id"])]}
                fh.write(json.dumps({"value": json.dumps(msg)}) + "\n")

    q = ING.run_ingest_pipeline(spark, in_dir, store, "stream", ckpt,
                                default_collection="stream")
    q.awaitTermination(180)
    return read_collection(spark, store, "stream").select(
        "collection", "id", "document")


# ---------------------------------------------------------------------------
# T6 LIVE: watermarked streaming aggregation — a real readStream over the
# events fixture with withWatermark bounding the window state.  Complete-mode
# memory sink so the emitted result is deterministic on availableNow drain
# (append mode withholds windows still above the final watermark), which
# keeps this oracle-checkable: the result equals the batch tumbling window.
# ---------------------------------------------------------------------------

@register(
    "t6_stream_watermarked_windows",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events
FROM events
GROUP BY 1
""",
)
def q_t6_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events")
    token = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.path.join(tempfile.gettempdir(), f"bvds_wm_{token}")
    src, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    ev.write.parquet(src)

    name = f"t6_wm_{token}".replace(".", "_")
    stream = (
        spark.readStream.schema(ev.schema).parquet(src)
        .transform(lambda df: windows.tumbling(
            df, watermark="10 minutes", n_events=F.count(F.lit(1))))
    )
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.table(name).select(
        "window_start", F.col("n_events").cast("long").alias("n_events"))


# ---------------------------------------------------------------------------
# T-ext LIVE: custom stateful operator — applyInPandasWithState maintains one
# (count, sum) state row per user across micro-batches.  Drained with
# availableNow over the events fixture, the final update per key equals the
# batch group-by — the state-store-vs-batch equivalence the oracle checks.
# ---------------------------------------------------------------------------

@register(
    "t8_stateful_user_stats",
    oracle="""
SELECT user_id, COUNT(*) AS n_events,
       round(SUM(CAST(value AS DECIMAL(18,6))), 6)::DOUBLE AS total_value
FROM events
GROUP BY user_id
""",
)
def q_t8_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from .streaming.stateful import running_user_stats  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events")
    token = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.path.join(tempfile.gettempdir(), f"bvds_state_{token}")
    src, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    # exact money-style accumulation so streaming-fold == oracle SUM: ship
    # value as micro-units (long) and divide once at the end
    ev.withColumn("value", F.round(F.col("value") * 1_000_000).cast("long")) \
        .write.parquet(src)

    schema = spark.read.parquet(src).schema
    name = f"t8_state_{token}".replace(".", "_")
    stream = running_user_stats(spark.readStream.schema(schema).parquet(src))
    # state-store instances (and their per-batch open/commit cost) scale
    # with shuffle partitions; 150 user keys need nowhere near the session
    # default of 32 — size the stateful shuffle to the KEY cardinality.
    # The count is baked into the (fresh) checkpoint, so this only affects
    # this query's stream; restore the session conf either way.
    saved_sp = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        q = (stream.writeStream.format("memory").queryName(name)
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved_sp)
    # the memory sink keeps every batch's update; the final state per user is
    # the row with the largest count (counts strictly increase per batch)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        spark.table(name)
        .withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.round(F.col("total_value") / 1_000_000, 6).alias("total_value"),
        )
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


@register(
    "store_delete_points",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS id, text AS document, lang
FROM documents WHERE doc_id % 7 <> 0
""",
)
def q_store_delete_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-delete by a DISTRIBUTED doomed-id set (Qdrant delete twin of
    upload_points, qdrant_embedder.py:58-62): ids hash to their buckets,
    only those rewrite; oracle checks the persisted readback."""
    base = _tmp_base(sf_dir, "del")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8,
        df=docs.select(F.col("doc_id").cast("string").alias("id"),
                       F.col("text").alias("document"), "lang"))
    # DataFrame-form doomed set: the id list never collects to the driver
    doomed = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").cast("string"))
    upsert.delete_points(spark, base, "docs", doomed, count_removed=False)
    return upsert.read_collection(spark, base, "docs").select(
        "id", "document", "lang")


@register(
    "store_delete_by_filter",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS id, text AS document, lang
FROM documents WHERE lang <> 'de'
""",
)
def q_store_delete_by_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload-filter delete: one pruned scan finds the buckets holding
    matches, survivors rewrite in place; oracle checks the readback."""
    base = _tmp_base(sf_dir, "delf")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8,
        df=docs.select(F.col("doc_id").cast("string").alias("id"),
                       F.col("text").alias("document"), "lang"))
    upsert.delete_by_filter(spark, base, "docs", "lang = 'de'",
                            count_removed=False)
    return upsert.read_collection(spark, base, "docs").select(
        "id", "document", "lang")


@register(
    "store_compaction",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS id, text AS document FROM documents
""",
)
def q_store_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket compaction after micro-batch upserts: rewrite each bucket to
    target file counts with byte-identical readback (oracle-checked)."""
    base = _tmp_base(sf_dir, "compact")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(spark, base, "docs", n_buckets=4)
    # four micro-batch upserts — the file-per-batch-per-bucket growth pattern
    # of streaming/ingest.py's foreachBatch sink
    for i in range(4):
        upsert.upsert(
            spark, base, "docs",
            docs.filter(F.col("doc_id") % 4 == i).select(
                F.col("doc_id").cast("string").alias("id"),
                F.col("text").alias("document")))
    stats = upsert.compact_collection(spark, base, "docs")
    assert stats["files_after"] <= stats["files_before"], stats
    return upsert.read_collection(spark, base, "docs").select("id", "document")


@register(
    "store_update_payload",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS id, text AS document,
       CASE WHEN doc_id % 5 = 0 THEN 'xx' ELSE lang END AS lang,
       CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS flagged
FROM documents
""",
)
def q_store_update_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant set_payload twin: patch only the carried columns of the
    targeted ids; everything else (document text, other payload keys,
    untouched buckets) stays byte-identical."""
    base = _tmp_base(sf_dir, "updpay")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8,
        df=docs.select(F.col("doc_id").cast("string").alias("id"),
                       F.col("text").alias("document"), "lang",
                       F.lit(0).alias("flagged")))
    patch = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").cast("string").alias("id"),
        F.lit("xx").alias("lang"), F.lit(1).alias("flagged"))
    upsert.update_columns(spark, base, "docs", patch)
    return upsert.read_collection(spark, base, "docs").select(
        "id", "document", "lang", "flagged")


@register(
    "store_catalog",
    oracle="""
SELECT * FROM (VALUES ('cat_alpha', CAST(4 AS BIGINT), CAST(1 AS BIGINT)),
                      ('cat_gamma', CAST(8 AS BIGINT), CAST(2 AS BIGINT)))
       AS t(collection, n_buckets, n_vectors)
""",
)
def q_store_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog half of the store API: create / list / drop collections with
    persisted layout + vector-config meta; idempotent re-create must not
    clobber (chroma_embedder.py:30-32 get_or_create model)."""
    base = _tmp_base(sf_dir, "cat")
    upsert.create_collection(spark, base, "cat_alpha", n_buckets=4,
                             vector_config={"text": {"size": 64, "distance": "cosine"}})
    upsert.create_collection(spark, base, "cat_beta")
    upsert.create_collection(spark, base, "cat_gamma", n_buckets=8,
                             vector_config={"text": {"size": 64, "distance": "dot"},
                                            "image": {"size": 64, "distance": "euclid"}})
    # idempotent re-create must NOT clobber the stored layout
    upsert.create_collection(spark, base, "cat_beta", n_buckets=99)
    upsert.drop_collection(base, "cat_beta")
    rows = [(m["collection"], int(m["n_buckets"]), len(m.get("vectors", {})))
            for m in upsert.list_collections(base)]
    return spark.createDataFrame(
        rows, "collection string, n_buckets long, n_vectors long")


# ---------------------------------------------------------------------------
# Metric-aware kNN (round 4): the collection meta sidecar declares each
# vector space's distance (the vectors_config model, qdrant_embedder.py:95-102
# — there always COSINE); search_collection reads the DECLARED metric, so a
# collection created with "dot" or "euclid" is searched correctly without the
# caller restating it.
# ---------------------------------------------------------------------------

@register(
    "knn_dot_metric",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
pairs AS (
  SELECT q.qid, e.vec_id,
         round((SELECT SUM(a*b)
                FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                             unnest(e.embedding)::DOUBLE AS b)), 6) AS sim
  FROM q, embeddings e
  WHERE q.qid <> e.vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank FROM pairs)
WHERE rank <= 10
""",
)
def q_knn_dot_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-aware search: the collection declares distance=dot in its meta
    sidecar (vectors_config model, qdrant_embedder.py:95-102) and
    search_collection honors it without the caller restating."""
    base = _tmp_base(sf_dir, "knndot")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "dot"}})
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = knn.search_collection(spark, base, "vecs", qdf, k=10,
                                corpus_id="id", exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "knn_euclidean_metric",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
pairs AS (
  SELECT q.qid, e.vec_id,
         round(sqrt((SELECT SUM((a-b)*(a-b))
                     FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                  unnest(e.embedding)::DOUBLE AS b))), 6) AS sim
  FROM q, embeddings e
  WHERE q.qid <> e.vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim ASC, vec_id)
             AS rank FROM pairs)
WHERE rank <= 10
""",
)
def q_knn_euclidean_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-aware search, euclidean: declared distance ranks ASCENDING
    (smaller = nearer) through the same search_collection dispatch."""
    base = _tmp_base(sf_dir, "knneuc")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "euclid"}})
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = knn.search_collection(spark, base, "vecs", qdf, k=10,
                                corpus_id="id", exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "knn_manhattan_metric",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
pairs AS (
  SELECT q.qid, e.vec_id,
         round((SELECT SUM(abs(a-b))
                FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                             unnest(e.embedding)::DOUBLE AS b)), 6) AS sim
  FROM q, embeddings e
  WHERE q.qid <> e.vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim ASC, vec_id)
             AS rank FROM pairs)
WHERE rank <= 10
""",
)
def q_knn_manhattan_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-aware search, manhattan (round 10, VERDICT r9 missing #3 —
    Qdrant Distance.MANHATTAN, the fourth declared metric): L1 distance
    ranks ASCENDING through the same declared-space dispatch."""
    base = _tmp_base(sf_dir, "knnman")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "manhattan"}})
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = knn.search_collection(spark, base, "vecs", qdf, k=10,
                                corpus_id="id", exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# T9 LIVE (round 4): multi-topic union under backpressure — a file topic
# (maxFilesPerTrigger=2 over 4 files → ≥2 micro-batches) unioned with a LIVE
# rate source (rowsPerSecond cap = the QoS depth-1000 bound,
# embedder.py:161-174) into one upsert sink.  The rate source is unbounded,
# so the query polls the store readback and stops at the deterministic
# target: 100 file records + rate values 0..99.
# ---------------------------------------------------------------------------

@register(
    "t9_rate_stream_backpressure",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS id, text AS document
FROM documents WHERE doc_id < 100
UNION ALL
SELECT 'r' || CAST(r AS VARCHAR), 'rate event ' || CAST(r AS VARCHAR)
FROM range(100) t(r)
""",
)
def q_t9_rate_backpressure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE multi-topic union under backpressure: file topic
    (maxFilesPerTrigger) ∪ rate topic (rowsPerSecond cap — the QoS
    depth-1000 bound, embedder.py:161-174) into one upsert sink."""
    import json  # noqa: PLC0415
    import time  # noqa: PLC0415

    from .operators.upsert import read_collection  # noqa: PLC0415
    from .streaming import ingest as ING  # noqa: PLC0415

    base = _tmp_base(sf_dir, "t9")
    in_dir = os.path.join(base, "in")
    store = os.path.join(base, "store")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(in_dir)

    rows = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 100).select("doc_id", "text").collect())
    for fi in range(4):
        with open(os.path.join(in_dir, f"part{fi}.jsonl"), "w") as fh:
            for r in rows[fi::4]:
                msg = {"collection": "t9", "documents": [r["text"]],
                       "metadatas": [{}], "ids": [str(r["doc_id"])]}
                fh.write(json.dumps({"value": json.dumps(msg)}) + "\n")

    q = ING.run_multi_topic_pipeline(
        spark, in_dir, store, "t9", ckpt, default_collection="t9",
        max_files_per_trigger=2, rows_per_second=400, rate_limit_value=100)
    target = len(rows) + 100
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            try:
                if read_collection(spark, store, "t9").count() >= target:
                    break
            except Exception:
                pass  # store not created yet / bucket mid-swap
            time.sleep(0.5)
        # graceful drain: a poll can observe count >= target while the final
        # batch's _stage_and_swap is still renaming OTHER buckets — stopping
        # then could strand a bucket in its __old trash.  Wait for the
        # in-flight trigger to finish first; every later trigger is an empty
        # batch (rate values >= limit are filtered), so stopping mid-trigger
        # after this is harmless.
        while time.time() < deadline and q.status.get("isTriggerActive"):
            time.sleep(0.2)
    finally:
        q.stop()
    q.awaitTermination(60)
    return read_collection(spark, store, "t9").select("id", "document")


# ---------------------------------------------------------------------------
# Quantized search (round 4): the Qdrant quantization_config surface —
# scalar int8 (4× memory, same plan shape) and binary sign-bit + exact
# rerank (32× memory on the candidate metric).  Both fully declarative and
# oracle-exact: the quantization arithmetic is integer/deterministic, so
# DuckDB reproduces codes, Hamming candidates, and the reranked top-k
# bit-for-bit (sim rounded to 6 like every kNN twin).
# ---------------------------------------------------------------------------

@register(
    "knn_sq_int8",
    oracle="""
WITH ex AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS val,
         unnest(range(0, len(embedding))) AS pos
  FROM embeddings
),
dims AS (
  SELECT pos, min(val) AS mn,
         CASE WHEN max(val) = min(val) THEN 1.0
              ELSE (max(val) - min(val)) / 255.0 END AS sc
  FROM ex GROUP BY pos
),
deq AS (
  SELECT vec_id, ex.pos, mn + round((val - mn) / sc) * sc AS dval
  FROM ex JOIN dims ON ex.pos = dims.pos
),
qex AS (
  SELECT vec_id AS qid, val AS qval, pos FROM ex WHERE vec_id < 5
),
qn AS (SELECT qid, sqrt(SUM(qval*qval)) AS qn FROM qex GROUP BY qid),
pairs AS (
  SELECT qex.qid, deq.vec_id, SUM(qex.qval * deq.dval) AS dot,
         sqrt(SUM(deq.dval * deq.dval)) AS cn
  FROM qex JOIN deq ON qex.pos = deq.pos
  WHERE qex.qid <> deq.vec_id
  GROUP BY qex.qid, deq.vec_id
),
scored AS (
  SELECT pairs.qid, vec_id, round(dot / (qn.qn * cn), 6) AS sim
  FROM pairs JOIN qn ON pairs.qid = qn.qid
  WHERE qn.qn * cn <> 0
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank FROM scored)
WHERE rank <= 10
""",
)
def q_knn_sq_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-int8 quantized top-k: per-dim min/max learned in one 64-row
    aggregate, search runs on dequantized codes with exact kNN's plan
    shape — DuckDB reproduces the quantization arithmetic exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = quantize.sq_knn(qdf, emb, k=10)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "knn_binary_rerank",
    oracle="""
WITH ex AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS val,
         unnest(range(0, len(embedding))) AS pos
  FROM embeddings
),
packed AS (
  SELECT vec_id,
         SUM(CASE WHEN pos < 32 AND val > 0
                  THEN CAST(1 AS BIGINT) << pos ELSE 0 END) AS w0,
         SUM(CASE WHEN pos >= 32 AND val > 0
                  THEN CAST(1 AS BIGINT) << (pos - 32) ELSE 0 END) AS w1
  FROM ex GROUP BY vec_id
),
q AS (SELECT vec_id AS qid, w0 AS qw0, w1 AS qw1 FROM packed WHERE vec_id < 5),
cand AS (
  SELECT qid, vec_id,
         row_number() OVER (
           PARTITION BY qid
           ORDER BY bit_count(xor(qw0, w0)) + bit_count(xor(qw1, w1)), vec_id
         ) AS crank
  FROM q, packed WHERE qid <> vec_id
),
qex AS (
  SELECT vec_id AS qid, val AS qval, pos FROM ex WHERE vec_id < 5
),
qn AS (SELECT qid, sqrt(SUM(qval*qval)) AS qn FROM qex GROUP BY qid),
rerank AS (
  SELECT c.qid, c.vec_id, SUM(qex.qval * ex.val) AS dot,
         sqrt(SUM(ex.val * ex.val)) AS cn
  FROM cand c
  JOIN ex ON ex.vec_id = c.vec_id
  JOIN qex ON qex.qid = c.qid AND qex.pos = ex.pos
  WHERE c.crank <= 50
  GROUP BY c.qid, c.vec_id
),
scored AS (
  SELECT rerank.qid, vec_id, round(dot / (qn.qn * cn), 6) AS sim
  FROM rerank JOIN qn ON rerank.qid = qn.qid
  WHERE qn.qn * cn <> 0
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank FROM scored)
WHERE rank <= 10
""",
)
def q_knn_binary_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary quantization + rescore: Hamming candidates over packed sign
    bits (float-free pair stream), exact cosine rerank of rerank_factor*k
    candidates — the Qdrant binary-quantization pattern, oracle-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = quantize.binary_knn_rerank(qdf, emb, k=10, dim=64, rerank_factor=5)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# Store API parity (round 4): the read-side client surface the delegated
# stores expose — search_groups (top hits per payload group), count
# (filtered cardinality), scroll (keyset pagination).
# ---------------------------------------------------------------------------

@register(
    "api_search_groups",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT q.qid, e.vec_id, e.label,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(e.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(e.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, embeddings e
  WHERE q.qid <> e.vec_id
),
in_group AS (
  SELECT qid, CAST(label AS BIGINT) AS label, vec_id, sim,
         row_number() OVER (PARTITION BY qid, label
                            ORDER BY sim DESC, vec_id) AS hit_rank
  FROM pairs
),
kept AS (SELECT * FROM in_group WHERE hit_rank <= 2),
grp AS (
  SELECT qid, label, max(sim) AS best_sim FROM kept GROUP BY qid, label
),
top_groups AS (
  SELECT qid, label,
         row_number() OVER (PARTITION BY qid
                            ORDER BY best_sim DESC, label) AS group_rank
  FROM grp
)
SELECT k.qid, k.label, CAST(g.group_rank AS BIGINT) AS group_rank,
       k.vec_id, k.sim, CAST(k.hit_rank AS BIGINT) AS hit_rank
FROM kept k JOIN top_groups g ON k.qid = g.qid AND k.label = g.label
WHERE g.group_rank <= 3
""",
)
def q_api_search_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant search_groups: per query, the top-3 payload groups ranked by
    their best hit, with up to 2 hits per group — dedups near-identical
    points sharing a group key in one declarative plan (two windows, one
    tiny group-level aggregate; the corpus scans once)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"),
        vector.l2_norm(F.col("embedding")).alias("_qn"))
    c = emb.select("vec_id", F.col("label").cast("long").alias("label"),
                   "embedding", vector.l2_norm(F.col("embedding")).alias("_cn"))
    pairs = c.join(F.broadcast(q), how="cross").filter(
        F.col("qid") != F.col("vec_id"))
    denom = F.col("_qn") * F.col("_cn")
    sim = F.round(F.when(denom != 0.0,
                         vector.dot(F.col("qvec"), F.col("embedding")) / denom), 6)
    hits = (pairs.select("qid", "vec_id", "label", sim.alias("sim"))
            .filter(F.col("sim").isNotNull() & ~F.isnan("sim")))
    # rank ONLY inside (qid, label) — no global per-query ranking pass over
    # the full pair stream; the second (per-qid) window sees just the
    # ≤ groups × 2 kept rows
    in_group_w = Window.partitionBy("qid", "label").orderBy(
        F.desc("sim"), F.asc("vec_id"))
    kept = (hits.withColumn("hit_rank", F.row_number().over(in_group_w))
            .filter(F.col("hit_rank") <= 2))
    grp_w = Window.partitionBy("qid").orderBy(F.desc("best_sim"), F.asc("label"))
    top_groups = (kept.groupBy("qid", "label")
                  .agg(F.max("sim").alias("best_sim"))
                  .withColumn("group_rank", F.row_number().over(grp_w))
                  .filter(F.col("group_rank") <= 3)
                  .select("qid", "label", "group_rank"))
    return (kept.join(top_groups, ["qid", "label"])
            .select("qid", "label",
                    F.col("group_rank").cast("long").alias("group_rank"),
                    "vec_id", "sim",
                    F.col("hit_rank").cast("long").alias("hit_rank")))


@register(
    "api_count_filtered",
    oracle="""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_points
FROM documents WHERE length(text) > 200 GROUP BY lang
""",
)
def q_api_count_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count API: filtered cardinality per payload key — a pure
    pushed-filter scan + partial-aggregated count (no row movement beyond
    the 1-row-per-group exchange)."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.filter(F.length("text") > 200)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_points")))


@register("knn_ivf_kmeans", oracle=None)
def q_knn_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsupervised IVF (rows-only: k-means is iterative, off SQL): coarse
    centroids trained on a capped sample, corpus assigned to inverted lists
    by BLAS argmin, search probes only the n_probe nearest lists per query
    via an exploded equi-join on list_id — at scale the corpus is laid out
    by list and the probe reads ~n_probe/n_lists of it.  Recall vs exact is
    pinned in tests/test_quantize.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = quantize.ivf_train(emb, n_lists=16, iters=5)
    assigned = quantize.ivf_assign(emb, cents)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = quantize.ivf_knn(qdf, assigned, cents, k=10, n_probe=4)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register("knn_pq_adc", oracle=None)
def q_knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ADC top-k (rows-only: the k-means codebooks are an
    iterative algorithm outside SQL; recall vs exact kNN is pinned by
    tests/test_quantize.py).  8 subspaces × 64 centroids → each 64-dim
    float vector searches as 8 bytes of codes; distances come from a
    per-query LUT summed by pure JVM expressions."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = quantize.pq_train(emb, m=8, ksub=64, iters=5)
    enc = quantize.pq_encode(emb, books)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = quantize.pq_search(qdf, enc, books, k=10)
    return out.select("qid", "vec_id", "dist",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "knn_named_spaces",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
cos_pairs AS (
  SELECT q.qid, e.vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(e.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(e.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, embeddings e WHERE q.qid <> e.vec_id
),
euc_pairs AS (
  SELECT q.qid, e.vec_id,
         round(sqrt((SELECT SUM((a-b)*(a-b))
                     FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                  unnest(e.embedding)::DOUBLE AS b))), 6) AS sim
  FROM q, embeddings e WHERE q.qid <> e.vec_id
)
SELECT 'text' AS space, qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank FROM cos_pairs) WHERE rank <= 5
UNION ALL
SELECT 'profile' AS space, qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim ASC, vec_id)
             AS rank FROM euc_pairs) WHERE rank <= 5
""",
)
def q_knn_named_spaces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One collection, two NAMED vector spaces with different declared
    metrics (the multi-space vectors_config model, qdrant_embedder.py:95-102
    — e.g. a text space and an image space per point); search dispatches on
    (vector_name → declared distance) without the caller restating either."""
    base = _tmp_base(sf_dir, "named")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "mv", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"),
                      F.col("embedding").alias("text_vec"),
                      F.col("embedding").alias("profile_vec")),
        vector_config={"text_vec": {"size": 64, "distance": "cosine"},
                       "profile_vec": {"size": 64, "distance": "euclid"}})
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    by_text = knn.search_collection(
        spark, base, "mv", qdf, k=5, vector_name="text_vec",
        corpus_id="id", exclude_self=True)
    by_profile = knn.search_collection(
        spark, base, "mv", qdf, k=5, vector_name="profile_vec",
        corpus_id="id", exclude_self=True)
    return (
        by_text.select(F.lit("text").alias("space"), "qid", "vec_id", "sim",
                       F.col("rank").cast("long").alias("rank"))
        .unionByName(
            by_profile.select(F.lit("profile").alias("space"), "qid",
                              "vec_id", "sim",
                              F.col("rank").cast("long").alias("rank")))
    )


@register(
    "text_bm25_search",
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
scored AS (
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
)
SELECT id, score, CAST(row_number() OVER (ORDER BY score DESC, id) AS BIGINT)
       AS rank
FROM scored ORDER BY score DESC, id LIMIT 10
""",
)
def q_text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval twin of the vector search surface: Okapi BM25
    top-10 for a bag-of-terms query, all JVM expressions (see
    operators/text_search.py for the inverted-index-probe plan shape)."""
    from .operators.text_search import bm25_topk  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    out = bm25_topk(docs, ["vector", "join", "stream"], k=10)
    return out.select("id", "score", F.col("rank").cast("long").alias("rank"))


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
    from .operators.text_search import bm25_topk, rrf_fuse  # noqa: PLC0415

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


@register(
    "api_batch_filtered_search",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec,
         CASE vec_id WHEN 0 THEN 1 WHEN 1 THEN 4 ELSE NULL END AS want_label
  FROM embeddings WHERE vec_id < 3
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
    AND (q.want_label IS NULL OR e.label = q.want_label)
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank FROM pairs)
WHERE rank <= 5
""",
)
def q_api_batch_filtered_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch search where EACH request carries its own payload filter
    (query 0 wants label=1, query 1 wants label=4, query 2 is unfiltered)
    — answered in ONE corpus scan: the per-query predicate rides the
    broadcast query row into the pair filter, so N searches cost one pass
    instead of N (the Qdrant search_batch shape)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"),
        F.when(F.col("vec_id") == 0, 1)
         .when(F.col("vec_id") == 1, 4).alias("want_label"),
        vector.l2_norm(F.col("embedding")).alias("_qn"))
    c = emb.select("vec_id", "label", "embedding",
                   vector.l2_norm(F.col("embedding")).alias("_cn"))
    pairs = (c.join(F.broadcast(qdf), how="cross")
             .filter(F.col("qid") != F.col("vec_id"))
             .filter(F.col("want_label").isNull()
                     | (F.col("label") == F.col("want_label"))))
    denom = F.col("_qn") * F.col("_cn")
    sim = F.round(F.when(denom != 0.0,
                         vector.dot(F.col("qvec"), F.col("embedding")) / denom), 6)
    scored = (pairs.select("qid", "vec_id", sim.alias("sim"))
              .filter(F.col("sim").isNotNull() & ~F.isnan("sim")))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("qid", "vec_id", "sim",
                    F.col("rank").cast("long").alias("rank")))


@register(
    "api_scroll_keyset",
    oracle="""
WITH page1 AS (
  SELECT doc_id FROM documents WHERE lang = 'en'
  ORDER BY doc_id LIMIT 20
)
SELECT doc_id, CAST(doc_id AS VARCHAR) AS id, lang
FROM documents
WHERE lang = 'en' AND doc_id > (SELECT max(doc_id) FROM page1)
ORDER BY doc_id LIMIT 20
""",
)
def q_api_scroll_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scroll API, keyset-style: page N+1 is ``id > cursor ORDER BY id
    LIMIT page`` — unlike OFFSET, the skip never rescans at scale (the
    cursor predicate pushes into the parquet scan).  The 1-value cursor
    collect mirrors the cursor a scroll client passes back."""
    docs = load_table(spark, sf_dir, "documents")
    en = docs.filter(F.col("lang") == "en")
    page1 = en.select("doc_id").orderBy("doc_id").limit(20)
    cursor = page1.agg(F.max("doc_id")).collect()[0][0]
    return (en.filter(F.col("doc_id") > cursor)
            .orderBy("doc_id").limit(20)
            .select("doc_id", F.col("doc_id").cast("string").alias("id"),
                    "lang"))


# ---------------------------------------------------------------------------
# RAG-ingest preprocessing (round 4): chunking + normalization — the steps
# that precede every embed/upsert in a real vector-DB pipeline (the
# reference embeds caller-provided documents wholesale; a corpus pipeline
# chunks and scrubs them first).
# ---------------------------------------------------------------------------

@register(
    "pipe_chunk_documents",
    oracle=r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> length(x) > 0) AS tk
  FROM documents
),
sized AS (
  SELECT doc_id, tk,
         1 + CAST(ceil(greatest(len(tk) - 16, 0) / 12.0) AS INT) AS n_chunks
  FROM toks
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(tk, i*12 + 1, i*12 + 16), ' ') AS chunk
FROM sized, unnest(range(0, n_chunks)) AS t(i)
""",
)
def q_pipe_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (chunk 16, overlap 4): one output
    row per chunk per document — what a vector collection ingests as
    points.  Pure sequence/slice expressions + one explode, no Python."""
    from .functions.text import chunk_tokens  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.explode(chunk_tokens(ws_tokens(F.col("text")),
                                   chunk_size=16, overlap=4)).alias("c"))
        .select("doc_id", F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
                F.col("c.chunk").alias("chunk"))
    )


@register(
    "pipe_text_normalize",
    oracle=r"""
SELECT doc_id,
       lower(trim(regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', ' ', 'g'),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           'https?://[^\s]+', '<URL>', 'g'),
         '\s+', ' ', 'g'))) AS norm_text
FROM documents
""",
)
def q_pipe_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus text normalization (control-char strip, e-mail/URL masking,
    whitespace collapse, casefold) — the PII-scrub stage of a pretraining
    pipeline, all JVM regex expressions; masking behavior is pinned on
    synthetic rows in tests/test_text_search.py."""
    from .functions.text import normalize_text  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", normalize_text(F.col("text")).alias("norm_text"))


@register(
    "pipe_rag_end_to_end",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> length(x) > 0) AS tk
  FROM documents
),
sized AS (
  SELECT doc_id, tk,
         1 + CAST(ceil(greatest(len(tk) - 16, 0) / 12.0) AS INT) AS n_chunks
  FROM toks
),
chunks AS (
  SELECT CAST(doc_id AS VARCHAR) || '_' || CAST(i AS VARCHAR) AS id,
         doc_id, i, list_slice(tk, i*12 + 1, i*12 + 16) AS ctk
  FROM sized, unnest(range(0, n_chunks)) AS t(i)
),
ctoks AS (SELECT id, unnest(ctk) AS tok FROM chunks),
tfs AS (
  SELECT id, ({DUCK_POLY_HASH.format(t='tok')}) % 32 AS bucket,
         COUNT(*) AS tf
  FROM ctoks GROUP BY id, bucket
),
norms AS (SELECT id, sqrt(SUM(tf*tf)) AS nrm FROM tfs GROUP BY id),
qids AS (SELECT id FROM chunks WHERE doc_id < 3 AND i = 0),
dots AS (
  SELECT a.id AS qid, b.id AS vec_id, SUM(a.tf * b.tf) AS dot
  FROM tfs a JOIN tfs b ON a.bucket = b.bucket
  WHERE a.id IN (SELECT id FROM qids) AND a.id <> b.id
  GROUP BY a.id, b.id
),
pairs AS (
  SELECT q.id AS qid, c.id AS vec_id,
         round(coalesce(d.dot, 0) / (nq.nrm * nc.nrm), 6) AS sim
  FROM qids q
  CROSS JOIN chunks c
  LEFT JOIN dots d ON d.qid = q.id AND d.vec_id = c.id
  JOIN norms nq ON nq.id = q.id
  JOIN norms nc ON nc.id = c.id
  WHERE q.id <> c.id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank FROM pairs)
WHERE rank <= 5
""",
)
def q_pipe_rag_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's WHOLE lifecycle as one pipeline: chunk documents →
    deterministic hash-embed each chunk → upsert the chunks into a REAL
    bucketed collection (vector config declares cosine) → search the stored
    collection with three query chunks.  Every stage is the scale-path
    implementation (codegen chunking, one-shuffle embedding, bucketed
    store, broadcast-query search); the oracle recomputes it all in sparse
    integer arithmetic."""
    from .functions.text import chunk_tokens  # noqa: PLC0415
    from .operators.embed import hash_embed_df  # noqa: PLC0415

    base = _tmp_base(sf_dir, "rag")
    docs = load_table(spark, sf_dir, "documents")
    chunks = (
        docs.select(
            "doc_id",
            F.explode(chunk_tokens(ws_tokens(F.col("text")),
                                   chunk_size=16, overlap=4)).alias("c"))
        .select(
            F.concat(F.col("doc_id").cast("string"), F.lit("_"),
                     F.col("c.chunk_idx").cast("string")).alias("id"),
            F.col("c.chunk").alias("chunk"),
            F.col("doc_id"), F.col("c.chunk_idx").alias("chunk_idx"))
    )
    embedded = hash_embed_df(chunks, text_col="chunk", id_col="id",
                             dim=32, out_col="embedding")
    upsert.create_collection(
        spark, base, "rag_chunks", n_buckets=8,
        df=embedded.select("id", "embedding"),
        vector_config={"embedding": {"size": 32, "distance": "cosine"}})
    q_ids = [f"{d}_0" for d in range(3)]
    stored = upsert.read_collection(spark, base, "rag_chunks")
    qdf = stored.filter(F.col("id").isin(q_ids)).select(
        F.col("id").alias("qid"), F.col("embedding").alias("qvec"))
    out = knn.search_collection(spark, base, "rag_chunks", qdf, k=5,
                                corpus_id="id", exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# T10 LIVE (round 4): streaming dedup-by-id on a real stream — the live twin
# of t2's batch form.  Duplicates are exact row copies spread across
# micro-batches (maxFilesPerTrigger=1 over 4 files, each half repeated), so
# whichever copy dropDuplicates keeps, the emitted VALUES are deterministic
# and the append-mode drain equals DISTINCT over the fixture.
# ---------------------------------------------------------------------------

@register(
    "t10_stream_dedup_live",
    oracle="""
SELECT event_id, user_id, event_type, value
FROM events WHERE event_id < 200
""",
)
def q_t10_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE streaming dedup-by-id: watermarked dropDuplicates across
    micro-batches, deterministic append drain equals DISTINCT (T2 live)."""
    import json  # noqa: PLC0415

    base = _tmp_base(sf_dir, "t10")
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    rows = (load_table(spark, sf_dir, "events")
            .filter(F.col("event_id") < 200)
            .select("event_id", "user_id", "event_type", "value",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                    .alias("ts_str"))
            .collect())
    halves = [rows[:100], rows[:100], rows[100:], rows[100:]]
    for fi, chunk in enumerate(halves):
        with open(os.path.join(in_dir, f"f{fi}.jsonl"), "w") as fh:
            for r in chunk:
                fh.write(json.dumps(r.asDict()) + "\n")

    schema = ("event_id long, user_id long, event_type string, "
              "value double, ts_str string")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
        .withColumn("ts", F.to_timestamp("ts_str"))
        .transform(lambda df: windows.stream_dedup(
            df, ["event_id"], watermark="1 hour"))
    )
    q = (stream.writeStream.format("memory").queryName("t10_dedup")
         .outputMode("append")
         .option("checkpointLocation", os.path.join(base, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(
        "SELECT event_id, user_id, event_type, value FROM t10_dedup")


# ---------------------------------------------------------------------------
# T11 LIVE (round 4): stream–static join — every micro-batch enriches
# against a broadcast dimension snapshot, the canonical streaming-enrichment
# shape (the payload-join the reference's metadatas perform at ingest,
# qdrant_embedder.py:130-143, done against a dimension table instead).
# ---------------------------------------------------------------------------

@register(
    "t11_stream_static_join",
    oracle="""
SELECT e.event_id, e.user_id, c.c_mktsegment, e.value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_id < 500
""",
)
def q_t11_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _tmp_base(sf_dir, "t11")
    src = os.path.join(base, "src")
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 500)
          .select("event_id", "user_id", "value"))
    ev.write.parquet(src)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .join(F.broadcast(dim), "user_id")
        .select("event_id", "user_id", "c_mktsegment", "value")
    )
    q = (stream.writeStream.format("memory").queryName("t11_enriched")
         .outputMode("append")
         .option("checkpointLocation", os.path.join(base, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(
        "SELECT event_id, user_id, c_mktsegment, value FROM t11_enriched")


# ---------------------------------------------------------------------------
# T12 LIVE (round 5): three physically different sources in ONE pipeline —
# file topic ∪ rate topic ∪ durable-queue topic (directory commit-log with
# explicit offsets, streaming/queue_source.py) — completing the reference's
# four-bounded-subscriptions model (embedder.py:161-174) with a
# replayable-offset source shape.  Each source carries its own intake bound.
# ---------------------------------------------------------------------------

@register(
    "t12_queue_multi_source",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS id, text AS document
FROM documents WHERE doc_id < 50
UNION ALL
SELECT 'r' || CAST(r AS VARCHAR), 'rate event ' || CAST(r AS VARCHAR)
FROM range(50) t(r)
UNION ALL
SELECT 'q' || CAST(r AS VARCHAR), 'queue event ' || CAST(r AS VARCHAR)
FROM range(50) t(r)
""",
)
def q_t12_queue_multi_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE three-source union: file (maxFilesPerTrigger) ∪ rate
    (rowsPerSecond) ∪ durable queue (atomic offset-named segments,
    maxSegmentsPerTrigger) → one normalize/explode/upsert sink.  The
    restart/exactly-once half of the queue contract is pytest-proven
    (tests/test_streaming.py::test_queue_pipeline_restart_exactly_once)."""
    import json  # noqa: PLC0415
    import time  # noqa: PLC0415

    from .operators.upsert import read_collection  # noqa: PLC0415
    from .streaming import ingest as ING  # noqa: PLC0415
    from .streaming import queue_source as QS  # noqa: PLC0415

    base = _tmp_base(sf_dir, "t12")
    in_dir = os.path.join(base, "in")
    log_dir = os.path.join(base, "queue")
    store = os.path.join(base, "store")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(in_dir)

    rows = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 50).select("doc_id", "text").collect())
    for fi in range(2):
        with open(os.path.join(in_dir, f"part{fi}.jsonl"), "w") as fh:
            for r in rows[fi::2]:
                msg = {"collection": "t12", "documents": [r["text"]],
                       "metadatas": [{}], "ids": [str(r["doc_id"])]}
                fh.write(json.dumps({"value": json.dumps(msg)}) + "\n")
    for seg in range(2):
        QS.append_segment(log_dir, [
            {"collection": "t12", "documents": [f"queue event {i}"],
             "metadatas": [{}], "ids": [f"q{i}"]}
            for i in range(seg * 25, (seg + 1) * 25)
        ])

    q = ING.run_multi_topic_pipeline(
        spark, in_dir, store, "t12", ckpt, default_collection="t12",
        max_files_per_trigger=1, rows_per_second=400, rate_limit_value=50,
        queue_dir=log_dir, max_segments_per_trigger=1)
    target = len(rows) + 50 + 50
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            try:
                if read_collection(spark, store, "t12").count() >= target:
                    break
            except Exception:
                pass  # store not created yet / bucket mid-swap
            time.sleep(0.5)
        # graceful drain before stop — same rationale as t9
        while time.time() < deadline and q.status.get("isTriggerActive"):
            time.sleep(0.2)
    finally:
        q.stop()
    q.awaitTermination(60)
    return read_collection(spark, store, "t12").select("id", "document")


# ---------------------------------------------------------------------------
# Persisted vector index (round 5): the index is built ONCE into the
# collection store (the Qdrant model — the reference's collection indexes at
# upsert time, qdrant_embedder.py:95-103) and searches probe the stored,
# list-partitioned artifact through static partition pruning instead of
# retraining per query.  Staleness is version-gated: a mutation bumps the
# collection's data version and auto-dispatch falls back to the exact scan.
# ---------------------------------------------------------------------------

@register(
    "store_indexed_search",
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
def q_store_indexed_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search through the PERSISTED IVF index: build_vector_index lays the
    stored vectors out by inverted list once; the search probes the stored
    artifact (static list_id partition pruning, tests/test_index.py).  With
    n_probe = n_lists the probe covers every list, so the result is exactly
    the exact-scan kNN — which is what the oracle checks; the n_probe <
    n_lists ANN path is store_indexed_probe."""
    base = _tmp_base(sf_dir, "sidx")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf",
                             n_lists=8, iters=4)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = knn.search_collection(
        spark, base, "vecs", qdf, k=10, corpus_id="id", exclude_self=True,
        use_index="always", n_probe=8)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "store_indexed_probe",
    # full probe (n_probe=None → every list) over the 16-list layout: the
    # stored artifact is exercised end-to-end and the answer EQUALS the
    # exact kNN — so the probe path gets a real hash-matched oracle.  The
    # n_probe < n_lists ANN behavior (probabilistic by k-means design)
    # stays pinned by tests/test_index.py's recall + pruning tests.
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
def q_store_indexed_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search_indexed over the stored 16-list IVF artifact at FULL probe
    (n_probe=None probes every list): the partition-pruned probe plan
    runs end-to-end and the result provably equals the exact kNN — the
    oracle hash-checks it.  The accuracy-trading n_probe < n_lists case
    is the same plan with a shorter list_id IN (...) set (pruning +
    recall pinned in tests/test_index.py)."""
    base = _tmp_base(sf_dir, "sidxp")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf",
                             n_lists=16, iters=5)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = index.search_indexed(spark, base, "vecs", qdf, k=10, n_probe=None,
                               exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "text_bm25_indexed",
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
scored AS (
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
)
SELECT id, score, CAST(row_number() OVER (ORDER BY score DESC, id) AS BIGINT)
       AS rank
FROM scored ORDER BY score DESC, id LIMIT 10
""",
)
def q_text_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over the PERSISTED inverted index: build_text_index materializes
    the (term, id, tf, len) posting table bucketed by term hash into the
    collection store once; the query probes only its terms' buckets (static
    partition pruning) with ZERO corpus passes — same oracle as the
    in-memory text_bm25_search, proving stored-index parity."""
    from .operators.text_search import bm25_topk_indexed, build_text_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "bmidx")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.select(F.col("doc_id").alias("id"), "text"))
    build_text_index(spark, base, "docs", text_col="text", n_term_buckets=16)
    out = bm25_topk_indexed(spark, base, "docs",
                            ["vector", "join", "stream"], k=10,
                            text_col="text")
    return out.select("id", "score", F.col("rank").cast("long").alias("rank"))


@register(
    "store_indexed_sq",
    # full probe + corpus-covering rerank: the int8 artifact is searched
    # end-to-end (dequantized ADC inside every list, bucket-pruned exact
    # rescore) and the answer provably equals the exact kNN — hash-matched
    # against the exact-cosine oracle.  The ANN trade (n_probe < n_lists,
    # small rerank) is the same plan with shorter static filters; recall
    # is pinned in tests/test_index.py.
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
def q_store_indexed_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored IVF-SQ (the Qdrant scalar-quantization collection config):
    int8 codes clustered by inverted list — a 4-8× smaller searchable
    artifact than the float copy; search scores the DEQUANTIZED codes
    inside the probed lists (pure codegen) and exact-rescores the
    candidates fetched back through the store's id-bucket filter.  Run
    at FULL probe with a corpus-covering rerank window, the result
    equals the exact kNN — which the oracle hash-checks, proving the
    quantize → store → probe → rescore loop loses nothing."""
    base = _tmp_base(sf_dir, "sidxsq")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_sq",
                             n_lists=16, iters=4)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = index.search_indexed(spark, base, "vecs", qdf, k=10, n_probe=None,
                               rerank_factor=1000, exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "store_indexed_bq",
    # round 10 (VERDICT r9 missing #1): the BINARY-quantization artifact
    # — Qdrant's cheapest advertised memory path (32x compression).  The
    # stored layout is packed sign bits clustered by IVF list; search
    # ranks popcount-of-XOR Hamming inside the probed list_id partitions
    # (integer-only, pure codegen) and exact-rescores the candidates
    # fetched back through the store's id-bucket filter.  Full probe +
    # corpus-covering rerank (1000·k >= both gate corpora) equals the
    # exact kNN — hash-matched, so the pack → store → Hamming → rescore
    # loop provably loses nothing.
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
def q_store_indexed_bq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored IVF-BQ (the Qdrant binary-quantization collection config):
    1 sign bit per dimension packed into 32-bit words, clustered by
    inverted list — a 32x smaller searchable artifact; search ranks
    Hamming (popcount of xor, integer codegen) inside the probed lists
    and exact-rescores candidates fetched back through the store's
    id-bucket filter.  At FULL probe with a corpus-covering rerank the
    result equals the exact kNN, which the oracle hash-checks."""
    base = _tmp_base(sf_dir, "sidxbq")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_bq",
                             n_lists=16, iters=4)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = index.search_indexed(spark, base, "vecs", qdf, k=10, n_probe=None,
                               rerank_factor=1000, exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "store_indexed_pq",
    # full probe + corpus-covering rerank: the 8-byte-code artifact runs
    # its whole ADC + bucket-pruned exact-rescore loop and the answer
    # equals the exact kNN — hash-matched, so every stored index kind
    # (ivf / ivf_sq / ivf_pq) now carries a real oracle.  The ANN trade
    # (narrow probe, small rerank) keeps its recall pins in
    # tests/test_index.py / tests/test_quantize.py.
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
def q_store_indexed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored IVF-PQ: the searchable artifact holds m-byte codes clustered
    by list (32× smaller than the floats); search = probed-list ADC over
    the stored codes + exact cosine rescore of candidates fetched back
    through the store's id-bucket filter.  At full probe with a
    corpus-covering rerank window the result equals the exact kNN — the
    oracle hash-checks the whole encode → store → ADC → rescore loop."""
    base = _tmp_base(sf_dir, "sidxpq")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_pq",
                             n_lists=8, m=8, ksub=32, iters=3)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = index.search_indexed(spark, base, "vecs", qdf, k=10, n_probe=None,
                               rerank_factor=1000, exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "store_index_refresh",
    oracle="""
WITH corpus AS (
  SELECT e.vec_id AS vid, e2.embedding AS emb
  FROM embeddings e JOIN embeddings e2 ON e2.vec_id = e.vec_id + 300
  WHERE e.vec_id < 10
  UNION ALL
  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 20
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings
  WHERE vec_id BETWEEN 50 AND 59
),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
pairs AS (
  SELECT q.qid, c.vid AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.emb)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.emb)::DOUBLE AS b)))),
           6) AS sim
  FROM q, corpus c
  WHERE q.qid <> c.vid
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_index_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance end-to-end: build the stored IVF index,
    then overwrite 10 points, insert 10 new ones and delete 10 — and absorb
    it all with ONE refresh_vector_index call (delta log → assign with the
    STORED centroids → append at generation 1 + masks), no retrain, no
    rewrite.  use_index='always' proves the index is fresh again, and the
    full-probe result must equal the exact scan over the FINAL corpus —
    which is what the oracle recomputes."""
    base = _tmp_base(sf_dir, "sidxr")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf",
                             n_lists=8, iters=4)
    overwrite = (emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 310))
                 .select((F.col("vec_id") - 300).alias("id"), "embedding"))
    fresh_pts = (emb.filter(F.col("vec_id").between(50, 59))
                 .select((F.col("vec_id") + 100000).alias("id"), "embedding"))
    upsert.upsert(spark, base, "vecs", overwrite.unionByName(fresh_pts),
                  id_col="id")
    upsert.delete_points(spark, base, "vecs", list(range(10, 20)))
    index.refresh_vector_index(spark, base, "vecs")
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = knn.search_collection(
        spark, base, "vecs", qdf, k=10, corpus_id="id", exclude_self=True,
        use_index="always", n_probe=8)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "text_bm25_refresh",
    oracle=r"""
WITH corpus AS (
  SELECT d.doc_id AS id, d2.text AS text
  FROM documents d JOIN documents d2 ON d2.doc_id = d.doc_id + 100
  WHERE d.doc_id < 5
  UNION ALL
  SELECT doc_id, text FROM documents
  WHERE doc_id >= 5 AND doc_id NOT BETWEEN 20 AND 29
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id BETWEEN 30 AND 39
),
toks AS (
  SELECT id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> length(x) > 0) AS toks
  FROM corpus
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
scored AS (
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
)
SELECT id, score, CAST(row_number() OVER (ORDER BY score DESC, id) AS BIGINT)
       AS rank
FROM scored ORDER BY score DESC, id LIMIT 10
""",
)
def q_text_bm25_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25 index absorbs mutations incrementally too: overwrite 5 docs,
    add 10, delete 10, then ONE refresh_text_index call appends the changed
    docs' postings at generation 1, masks their old rows, and recomputes
    (n_docs, avgdl) from the masked doc-length table.  The probe stays a
    partition-pruned stored-index read; results must equal BM25 over the
    final corpus (the oracle's recomputation)."""
    from .operators.text_search import bm25_topk_indexed, build_text_index, refresh_text_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "bmidxr")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.select(F.col("doc_id").alias("id"), "text"))
    build_text_index(spark, base, "docs", text_col="text", n_term_buckets=16)
    overwrite = (docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 105))
                 .select((F.col("doc_id") - 100).alias("id"), "text"))
    fresh_docs = (docs.filter(F.col("doc_id").between(30, 39))
                  .select((F.col("doc_id") + 100000).alias("id"), "text"))
    upsert.upsert(spark, base, "docs", overwrite.unionByName(fresh_docs),
                  id_col="id")
    upsert.delete_points(spark, base, "docs", list(range(20, 30)))
    refresh_text_index(spark, base, "docs", text_col="text")
    out = bm25_topk_indexed(spark, base, "docs",
                            ["vector", "join", "stream"], k=10,
                            text_col="text")
    return out.select("id", "score", F.col("rank").cast("long").alias("rank"))


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


@register("sparse_knn_text", oracle=_SPARSE_ORACLE)
def q_sparse_knn_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse top-k over hashed-TF encodings (the deterministic stand-in
    for a SPLADE-style learned sparse encoder): corpus postings prune to
    the queries' active dimensions through ONE broadcast equi-join on the
    dimension id, then a partial-aggregated dot product and a per-query
    rank window — no dense vocab_size vector exists anywhere."""
    from .operators.sparse import postings_from_text, sparse_dot_topk  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    post = postings_from_text(docs, id_col="doc_id", text_col="text",
                              vocab_size=512)
    q = post.filter(F.col("id") < 3)
    out = sparse_dot_topk(q, post, k=10, exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register("api_sparse_search", oracle=_SPARSE_ORACLE)
def q_api_sparse_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse search against a STORED collection in the Qdrant wire format:
    points persist (id, indices array, values array) in the bucketed store,
    the searcher explodes them back to posting form with arrays_zip and
    probes with the same pruned inverted-index plan — proving the
    array-pair storage layout and the posting search layout are loss-free
    mirrors (same oracle as sparse_knn_text)."""
    from .operators.sparse import (  # noqa: PLC0415
        postings_from_arrays,
        postings_from_text,
        sparse_dot_topk,
    )

    base = _tmp_base(sf_dir, "sparse")
    docs = load_table(spark, sf_dir, "documents")
    post = postings_from_text(docs, id_col="doc_id", text_col="text",
                              vocab_size=512)
    pts = (post.groupBy("id")
           .agg(F.array_sort(F.collect_list(F.struct("idx", "val")))
                .alias("z"))
           .select("id",
                   F.col("z.idx").alias("indices"),
                   F.col("z.val").alias("values")))
    upsert.create_collection(
        spark, base, "sparse_pts", df=pts, id_col="id", n_buckets=8,
        vector_config={"text_sparse": {"kind": "sparse", "distance": "dot"}})
    stored = upsert.read_collection(spark, base, "sparse_pts")
    cpost = postings_from_arrays(stored, id_col="id")
    qpost = cpost.filter(F.col("id") < 3)
    out = sparse_dot_topk(qpost, cpost, k=10, exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


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


@register(
    "api_discover",
    oracle=f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id NOT IN (0, 10, 11, 12, 13)
),
ref AS (
  SELECT (SELECT embedding FROM embeddings WHERE vec_id = 0)  AS tgt,
         (SELECT embedding FROM embeddings WHERE vec_id = 10) AS p1,
         (SELECT embedding FROM embeddings WHERE vec_id = 11) AS n1,
         (SELECT embedding FROM embeddings WHERE vec_id = 12) AS p2,
         (SELECT embedding FROM embeddings WHERE vec_id = 13) AS n2
),
scored AS (
  SELECT c.vec_id,
         {_duck_cos('c.embedding', 'r.tgt')} AS sim,
         (CASE WHEN {_duck_cos('c.embedding', 'r.p1')}
                  > {_duck_cos('c.embedding', 'r.n1')} THEN 1 ELSE 0 END
        + CASE WHEN {_duck_cos('c.embedding', 'r.p2')}
                  > {_duck_cos('c.embedding', 'r.n2')} THEN 1 ELSE 0 END)
         AS ctx_wins
  FROM corpus c, ref r
)
SELECT vec_id, CAST(ctx_wins AS BIGINT) AS ctx_wins, sim,
       CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number()
             OVER (ORDER BY ctx_wins DESC, sim DESC, vec_id) AS rank
      FROM scored)
WHERE rank <= 10
""",
)
def q_api_discover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant `discover`: a target vector plus context (positive, negative)
    pairs — points rank FIRST by how many pairs they sit on the positive
    side of (closer to the pair's positive than its negative), THEN by
    similarity to the target.  The 5 reference vectors fold into a 1-row
    broadcast frame, so the corpus is scanned once with per-row JVM
    expressions and never shuffles; cosines are rounded to 6 on both
    engines BEFORE comparison so the win/loss classification is
    engine-stable."""
    from .functions.vector import cosine_similarity  # noqa: PLC0415

    emb = load_table(spark, sf_dir, "embeddings")
    names = {0: "tgt", 10: "p1", 11: "n1", 12: "p2", 13: "n2"}
    ref = emb.filter(F.col("vec_id").isin(list(names))).groupBy().agg(*[
        F.first(F.when(F.col("vec_id") == i, F.col("embedding")),
                ignorenulls=True).alias(n)
        for i, n in names.items()
    ])
    corpus = emb.filter(~F.col("vec_id").isin(list(names)))
    joined = corpus.crossJoin(F.broadcast(ref))

    def cos(ref_col: str):
        return F.round(
            cosine_similarity(F.col("embedding").cast("array<double>"),
                              F.col(ref_col).cast("array<double>")), 6)

    scored = joined.select(
        "vec_id",
        ((cos("p1") > cos("n1")).cast("long")
         + (cos("p2") > cos("n2")).cast("long")).alias("ctx_wins"),
        cos("tgt").alias("sim"))
    w = Window.orderBy(F.desc("ctx_wins"), F.desc("sim"), F.asc("vec_id"))
    return (scored
            .orderBy(F.desc("ctx_wins"), F.desc("sim"), F.asc("vec_id"))
            .limit(10)
            .withColumn("rank", F.row_number().over(w))
            .select("vec_id", "ctx_wins", "sim",
                    F.col("rank").cast("long").alias("rank")))


@register(
    "api_facet",
    oracle="""
SELECT source AS value, COUNT(*) AS count
FROM documents
WHERE n_chars >= 200
GROUP BY source
ORDER BY count DESC, value
""",
)
def q_api_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant `facet`: distinct values of a payload key with their counts,
    under a filter — a pushed-filter scan plus one partial-aggregated
    groupBy, counts descending.  At 100 TB the filter prunes at the parquet
    scan and only |distinct values| rows reach the driver."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.filter(F.col("n_chars") >= 200)
            .groupBy(F.col("source").alias("value"))
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.desc("count"), F.asc("value")))


@register(
    "api_scroll_order_by",
    oracle="""
SELECT event_id, round(value, 6) AS value
FROM events
ORDER BY value, event_id
LIMIT 20 OFFSET 20
""",
)
def q_api_scroll_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant `scroll(order_by=...)`: pagination ordered by a PAYLOAD field
    needs a composite keyset cursor (value, id) — the id tiebreak makes the
    cursor total even when values repeat.  Page 2 filters
    ``(value, id) > cursor`` (pushed to the scan; no OFFSET rescan of page
    1's rows — the oracle's OFFSET is just the expected answer, not the
    plan) and re-sorts only the survivors."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    page1 = ev.orderBy("value", "event_id").limit(20).collect()
    c_val, c_id = page1[-1]["value"], page1[-1]["event_id"]
    page2 = (ev.filter((F.col("value") > c_val)
                       | ((F.col("value") == c_val)
                          & (F.col("event_id") > c_id)))
             .orderBy("value", "event_id").limit(20))
    return page2.select("event_id", F.round("value", 6).alias("value"))


@register(
    "api_scroll_range_indexed",
    # round 9 (VERDICT r8 next #6): keyset-over-index — the order_by
    # scroll's pages open from the RANGE index's value-ordered postings
    # (the start_from/cursor bucket window), never a full sort; the
    # oracle's OFFSET is just the expected answer, not the plan.
    oracle="""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS id, CAST(n_chars AS BIGINT) AS n_chars,
         lang
  FROM documents WHERE n_chars >= 200
),
ordered AS (
  SELECT *, row_number() OVER (ORDER BY n_chars, id) AS rn FROM base
)
SELECT CAST(CASE WHEN rn <= 15 THEN 1 ELSE 2 END AS BIGINT) AS page_no,
       id, n_chars, lang
FROM ordered WHERE rn <= 30
""",
)
def q_api_scroll_range_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered scroll THROUGH the range payload index: with a fresh range
    index on the order_by column, each page's ids come from the
    value-ordered postings (``range_ordered_page`` — the cursor's bucket
    window grows geometrically, typically one bucket), and only those ≤
    limit rows are fetched and sorted.  The fixture asserts the index
    actually answers (no silent scan) and walks two keyset pages."""
    from .operators import query_api  # noqa: PLC0415
    from .operators.payload_index import (  # noqa: PLC0415
        build_payload_index,
        range_ordered_page,
    )

    base = _tmp_base(sf_dir, "scrollrange")
    docs = load_table(spark, sf_dir, "documents")
    pts = docs.select(F.col("doc_id").alias("id"),
                      F.col("n_chars").cast("long").alias("n_chars"),
                      "lang")
    upsert.create_collection(spark, base, "docs", df=pts, id_col="id",
                             n_buckets=8)
    build_payload_index(spark, base, "docs", "n_chars", n_val_buckets=16,
                        index_type="range")
    probe = range_ordered_page(spark, base, "docs", "n_chars", 15,
                               start_from=200, id_type="long")
    assert probe is not None, "the range index must answer the page"
    pages = []
    cursor = None
    for page_no in (1, 2):
        page, cursor = query_api.scroll_points(
            spark, base, "docs", order_by="n_chars", start_from=200,
            cursor=cursor, limit=15, return_cursor=True)
        pages.append(page.withColumn(
            "page_no", F.lit(page_no).cast("long")))
    out = pages[0].unionByName(pages[1])
    return out.select("page_no", F.col("id").cast("long").alias("id"),
                      "n_chars", "lang")


@register(
    "api_scroll_filtered_range_indexed",
    # round 9: the FILTERED ordered scroll through BOTH indexes — the
    # lang filter resolves to candidate ids (keyword index, empty
    # residual) which semi-join inside the n_chars range index's bucket
    # window; filter + order compose with nothing sorted but the page.
    oracle="""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS id, CAST(n_chars AS BIGINT) AS n_chars,
         lang
  FROM documents WHERE lang = 'en' AND n_chars >= 200
),
ordered AS (
  SELECT *, row_number() OVER (ORDER BY n_chars, id) AS rn FROM base
)
SELECT CAST(CASE WHEN rn <= 15 THEN 1 ELSE 2 END AS BIGINT) AS page_no,
       id, n_chars, lang
FROM ordered WHERE rn <= 30
""",
)
def q_api_scroll_filtered_range_indexed(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """Qdrant ``scroll(filter, order_by, start_from)`` with both indexes
    composing: lang candidates from the keyword index semi-join inside
    the range index's value-ordered bucket window — the fixture asserts
    the composed probe answers (no silent scan) and walks two pages."""
    from .operators import query_api  # noqa: PLC0415
    from .operators.filters import filter_match_ids  # noqa: PLC0415
    from .operators.payload_index import (  # noqa: PLC0415
        build_payload_index,
        range_ordered_page,
    )

    base = _tmp_base(sf_dir, "scrollfltrange")
    docs = load_table(spark, sf_dir, "documents")
    pts = docs.select(F.col("doc_id").alias("id"),
                      F.col("n_chars").cast("long").alias("n_chars"),
                      "lang")
    upsert.create_collection(spark, base, "docs", df=pts, id_col="id",
                             n_buckets=8)
    build_payload_index(spark, base, "docs", "lang", n_val_buckets=8)
    build_payload_index(spark, base, "docs", "n_chars", n_val_buckets=16,
                        index_type="range")
    flt = Filter(must=[MatchValue("lang", "en")])
    cand, residual = filter_match_ids(spark, base, "docs", flt)
    assert cand is not None and residual == Filter()
    probe = range_ordered_page(spark, base, "docs", "n_chars", 15,
                               start_from=200, id_type="long",
                               candidate_ids=cand)
    assert probe is not None, "the composed page probe must answer"
    pages = []
    cursor = None
    for page_no in (1, 2):
        page, cursor = query_api.scroll_points(
            spark, base, "docs", flt=flt, order_by="n_chars",
            start_from=200, cursor=cursor, limit=15, return_cursor=True)
        pages.append(page.withColumn(
            "page_no", F.lit(page_no).cast("long")))
    out = pages[0].unionByName(pages[1])
    return out.select("page_no", F.col("id").cast("long").alias("id"),
                      "n_chars", "lang")


@register(
    "api_distance_matrix",
    oracle="""
WITH sample AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8
),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         round(
           (SELECT SUM(x*y) FROM (SELECT unnest(a.embedding)::DOUBLE AS x,
                                         unnest(b.embedding)::DOUBLE AS y))
           / ( sqrt((SELECT SUM(x*x) FROM (SELECT unnest(a.embedding)::DOUBLE AS x)))
             * sqrt((SELECT SUM(y*y) FROM (SELECT unnest(b.embedding)::DOUBLE AS y)))),
           6) AS sim
  FROM sample a, sample b
  WHERE a.vec_id <> b.vec_id
)
SELECT a_id, b_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id)
             AS rank
      FROM pairs)
WHERE rank <= 3
""",
)
def q_api_distance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant `search_matrix`: pairwise similarities over a sampled point
    set, each sample keeping its top-3 neighbours WITHIN the sample.  The
    sample is tiny by construction (that is the API's contract), so the
    pairing is a broadcast self-join of the |sample| rows — the corpus
    itself is touched only by the pushed ``vec_id < 8`` sample filter."""
    emb = load_table(spark, sf_dir, "embeddings")
    sample = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding")
    out = knn.knn_join(
        sample.select(F.col("vec_id").alias("qid"),
                      F.col("embedding").alias("qvec")),
        sample, k=3, exclude_self=True)
    return out.select(F.col("qid").alias("a_id"),
                      F.col("vec_id").alias("b_id"), "sim",
                      F.col("rank").cast("long").alias("rank"))


@register("store_sparse_indexed", oracle=_SPARSE_ORACLE)
def q_store_sparse_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse search over the PERSISTED sparse index: the posting table is
    materialized once into the collection store partitioned by dimension
    hash bucket; the query's active dims arrive as a static ``dim_bucket
    IN (...)`` partition filter plus an ``idx IN (...)`` pushed predicate —
    only the probed posting lists are read, zero corpus passes at query
    time.  Same oracle as the in-memory sparse_knn_text, proving
    stored-index parity."""
    from .operators.sparse import (  # noqa: PLC0415
        build_sparse_index,
        postings_from_text,
        sparse_search_indexed,
    )

    base = _tmp_base(sf_dir, "sparseidx")
    docs = load_table(spark, sf_dir, "documents")
    post = postings_from_text(docs, id_col="doc_id", text_col="text",
                              vocab_size=512)
    pts = (post.groupBy("id")
           .agg(F.array_sort(F.collect_list(F.struct("idx", "val")))
                .alias("z"))
           .select("id",
                   F.col("z.idx").alias("indices"),
                   F.col("z.val").alias("values")))
    upsert.create_collection(
        spark, base, "sp", df=pts, id_col="id", n_buckets=8,
        vector_config={"text_sparse": {"kind": "sparse", "distance": "dot"}})
    build_sparse_index(spark, base, "sp", n_dim_buckets=16)
    qpost = post.filter(F.col("id") < 3)
    out = sparse_search_indexed(spark, base, "sp", qpost, k=10,
                                exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "t13_stream_index_refresh",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_WS_TOKENS.format(t='text')}) AS tok
  FROM documents WHERE doc_id < 100
),
tfs AS (
  SELECT doc_id, ({DUCK_POLY_HASH.format(t='tok')}) % 64 AS bucket,
         COUNT(*) AS tf
  FROM toks GROUP BY doc_id, bucket
),
vecs AS (
  SELECT d.doc_id,
         list(CAST(coalesce(tf, 0) AS DOUBLE) ORDER BY r.j) AS vec
  FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 100) d
  CROSS JOIN range(64) r(j)
  LEFT JOIN tfs ON tfs.doc_id = d.doc_id AND tfs.bucket = r.j
  GROUP BY d.doc_id
),
q AS (SELECT doc_id AS qid, vec AS qvec FROM vecs WHERE doc_id < 3),
pairs AS (
  SELECT q.qid, v.doc_id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec) AS a,
                                         unnest(v.vec) AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec) AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(v.vec) AS b)))),
           6) AS sim
  FROM q, vecs v
  WHERE q.qid <> v.doc_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 5
""",
)
def q_t13_stream_index_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE ingest that keeps the stored ANN index FRESH: seed the
    collection with half the docs and build the IVF index once; stream the
    other half in micro-batches whose foreachBatch does upsert →
    refresh_all_indexes — the Qdrant index-at-upsert loop end-to-end.  The
    final search runs with use_index='always' (raises if ANY batch left the
    index stale) at full probe, so the result must equal the exact kNN over
    ALL 120 hash-embedded docs — which is what the oracle recomputes."""
    import json  # noqa: PLC0415

    from .operators.embed import hash_embed_df  # noqa: PLC0415

    base = _tmp_base(sf_dir, "t13")
    store = os.path.join(base, "store")
    in_dir = os.path.join(base, "in")
    ckpt = os.path.join(base, "ck")
    os.makedirs(in_dir)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    seed = (hash_embed_df(docs.filter(F.col("doc_id") < 60),
                          dim=64, out_col="vec")
            .select(F.col("doc_id").alias("id"), "vec"))
    upsert.create_collection(
        spark, store, "docs", df=seed, id_col="id", n_buckets=8,
        vector_config={"vec": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, store, "docs", kind="ivf",
                             n_lists=8, iters=3)

    rows = docs.filter(F.col("doc_id") >= 60).select("doc_id", "text").collect()
    for fi in range(2):
        with open(os.path.join(in_dir, f"f{fi}.jsonl"), "w") as fh:
            for r in rows[fi::2]:
                fh.write(json.dumps(
                    {"id": r["doc_id"], "text": r["text"]}) + "\n")

    schema = "id long, text string"

    def _merge(batch, _bid):
        if batch.isEmpty():
            return
        emb = (hash_embed_df(batch, text_col="text", id_col="id",
                             dim=64, out_col="vec")
               .select("id", "vec"))
        upsert.upsert(batch.sparkSession, store, "docs", emb, id_col="id")
        index.refresh_all_indexes(batch.sparkSession, store, "docs")

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1).json(in_dir)
         .writeStream.foreachBatch(_merge)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    stored = upsert.read_collection(spark, store, "docs")
    qdf = (stored.filter(F.col("id") < 3)
           .select(F.col("id").alias("qid"), F.col("vec").alias("qvec")))
    out = knn.search_collection(
        spark, store, "docs", qdf, k=5, corpus_id="id", exclude_self=True,
        use_index="always", n_probe=8)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "text_repetition_stats",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> length(x) > 0) AS tk
  FROM documents WHERE doc_id < 200
),
uni AS (
  SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_tok
  FROM (SELECT doc_id, tok, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(tk) AS tok FROM t)
        GROUP BY doc_id, tok)
  GROUP BY doc_id
),
tri AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= 3 THEN
           list_transform(range(0, len(tk) - 2),
                          i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])
         ELSE [] END AS gs
  FROM t
),
tristats AS (
  SELECT doc_id, COUNT(*) AS total3, COUNT(DISTINCT g) AS uniq3
  FROM (SELECT doc_id, unnest(gs) AS g FROM tri)
  GROUP BY doc_id
)
SELECT u.doc_id,
       CAST(u.n_tok AS BIGINT) AS n_tok,
       round(CAST(u.top_c AS DOUBLE) / u.n_tok, 6) AS top_tok_frac,
       round(CASE WHEN coalesce(ts.total3, 0) = 0 THEN 0.0
                  ELSE 1.0 - CAST(ts.uniq3 AS DOUBLE) / ts.total3 END,
             6) AS dup_3gram_frac
FROM uni u LEFT JOIN tristats ts ON ts.doc_id = u.doc_id
""",
)
def q_text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals for pretraining-data filtering (the
    Gopher/MassiveText style): per doc, the most-frequent-token fraction
    and the duplicated-3-gram fraction.  Both are one explode + hash
    aggregate — whole-stage codegen, map-side partials, shuffle keyed on
    (doc, token/gram); the 3-grams build from the token array with a
    sequence transform, no self-join."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = docs.select(
        "doc_id", ws_tokens(F.lower(F.col("text"))).alias("tk"))

    uni = (toks.select("doc_id", F.explode("tk").alias("tok"))
           .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
           .groupBy("doc_id")
           .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_tok")))

    grams = toks.select(
        "doc_id",
        F.when(
            F.size("tk") >= 3,
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - 3),
                lambda i: F.concat_ws(
                    " ", F.element_at(F.col("tk"), i + 1),
                    F.element_at(F.col("tk"), i + 2),
                    F.element_at(F.col("tk"), i + 3)),
            )).otherwise(F.array().cast("array<string>")).alias("gs"))
    tristats = (grams.select("doc_id", F.explode("gs").alias("g"))
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("total3"),
                     F.countDistinct("g").alias("uniq3")))

    out = uni.join(tristats, "doc_id", "left")
    return out.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.round(F.col("top_c").cast("double") / F.col("n_tok"), 6)
        .alias("top_tok_frac"),
        F.round(
            F.when(F.coalesce(F.col("total3"), F.lit(0)) == 0, F.lit(0.0))
            .otherwise(F.lit(1.0) - F.col("uniq3").cast("double")
                       / F.col("total3")), 6).alias("dup_3gram_frac"))


@register(
    "store_payload_search",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
cand AS (
  SELECT vec_id, embedding FROM embeddings WHERE label IN (2, 5)
),
pairs AS (
  SELECT q.qid, c.vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, cand c
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_payload_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered search through a PERSISTED payload index (Qdrant
    create_payload_index): the filter resolves to its id set from the
    value-hash-bucketed inverted index (static val_bucket partition filter),
    those ids fetch through a static id_bucket filter + broadcast semi-join,
    and only the matching points are scored — two pruned probes, zero full
    scans.  Results must equal the exact filtered kNN (the oracle)."""
    from .operators.payload_index import (  # noqa: PLC0415
        build_payload_index,
        filtered_search_indexed,
    )

    base = _tmp_base(sf_dir, "pidx")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding", "label"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_payload_index(spark, base, "vecs", "label", n_val_buckets=16)
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = filtered_search_indexed(spark, base, "vecs", qdf,
                                  column="label", values=[2, 5], k=10)
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "api_match_text",
    oracle=r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> length(x) > 0) AS tk
  FROM documents
)
SELECT doc_id AS id FROM toks
WHERE list_contains(tk, 'vector') AND list_contains(tk, 'stream')
""",
)
def q_api_match_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text filter (Qdrant MatchText) over the STORED inverted index:
    docs containing every token of the phrase, resolved by probing only the
    tokens' term-hash buckets and intersecting posting lists with one
    count-distinct aggregate — zero corpus passes."""
    from .operators.text_search import build_text_index, match_text_ids  # noqa: PLC0415

    base = _tmp_base(sf_dir, "mtext")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.select(F.col("doc_id").alias("id"), "text"))
    build_text_index(spark, base, "docs", text_col="text", n_term_buckets=16)
    return match_text_ids(spark, base, "docs", "vector stream",
                          text_col="text")


@register(
    "store_alias_switch",
    oracle="""
SELECT doc_id AS id, upper(text) AS text FROM documents WHERE doc_id < 150
""",
)
def q_store_alias_switch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aliases (Qdrant update_collection_aliases): readers go
    through the alias, reindexes build a NEW collection under a fresh name
    and atomically swing the pointer — the zero-downtime reindex pattern.
    Here 'prod' starts on the green copy, a transformed blue copy is built
    beside it, the alias repoints, and the read through 'prod' must show
    blue (the oracle recomputes blue's content)."""
    base = _tmp_base(sf_dir, "alias")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    upsert.create_collection(
        spark, base, "green", n_buckets=4, id_col="id",
        df=docs.select(F.col("doc_id").alias("id"), "text"))
    upsert.create_alias(base, "prod", "green")
    upsert.create_collection(
        spark, base, "blue", n_buckets=4, id_col="id",
        df=docs.select(F.col("doc_id").alias("id"),
                       F.upper("text").alias("text")))
    upsert.create_alias(base, "prod", "blue")  # atomic repoint
    return upsert.read_collection(spark, base, "prod").select("id", "text")


@register(
    "pipe_decontaminate",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> length(x) > 0) AS tk
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(greatest(len(tk)-2, 0)),
                                 i -> array_to_string(tk[i+1:i+3], ' '))) AS shingle
    FROM toks)
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20),
hits AS (
  SELECT s.doc_id AS id, COUNT(DISTINCT s.shingle) AS n_hits
  FROM sh s JOIN bench USING (shingle)
  WHERE s.doc_id >= 20
  GROUP BY s.doc_id
)
SELECT id, CAST(n_hits AS BIGINT) AS n_hits FROM hits WHERE n_hits >= 1
""",
)
def q_pipe_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the eval-leakage sweep every pretraining
    pipeline runs): training docs sharing any token 3-gram with the held-out
    benchmark set get flagged with their contaminated-shingle count.  The
    benchmark shingle set broadcasts (eval suites are small by
    construction); the training corpus never shuffles — no train×benchmark
    pair materializes."""
    docs = load_table(spark, sf_dir, "documents")
    out = dedup.cross_corpus_contamination(
        docs.filter(F.col("doc_id") >= 20),
        docs.filter(F.col("doc_id") < 20),
        text_col="text", id_col="doc_id", n=3, min_hits=1)
    return out.select("id", F.col("n_hits").cast("long").alias("n_hits"))


@register(
    "pipe_stratified_sample",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source, lang,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('strat' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT doc_id, source, lang FROM ranked WHERE rn <= 5
""",
)
def q_pipe_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum quota sampling for training-mix construction: EXACTLY 5
    docs per source, picked by a deterministic md5 rank within the group
    (layout-independent, unlike sampleBy's approximate fractions).  One
    shuffle on the stratum key; the rank window sees only a group's rows."""
    from .operators.sampling import stratified_sample  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, "source", "doc_id", 5)
    return out.select("doc_id", "source", "lang")


@register(
    "api_query_fusion",
    # RRF over three independently-ranked branches, each recomputed exactly:
    # dense = cosine over 64-bucket hash embeddings, lexical = BM25, sparse
    # = hashed-TF dot product.  All three tie-break by id; rrf = Σ 1/(60+r).
    oracle=f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 150),
dtoks AS (
  SELECT doc_id, unnest({DUCK_WS_TOKENS.format(t='text')}) AS tok FROM corpus
),
dtfs AS (
  SELECT doc_id, ({DUCK_POLY_HASH.format(t='tok')}) % 64 AS bucket,
         COUNT(*) AS tf
  FROM dtoks GROUP BY doc_id, bucket
),
dvecs AS (
  SELECT d.doc_id, list(CAST(coalesce(tf, 0) AS DOUBLE) ORDER BY r.j) AS vec
  FROM (SELECT DISTINCT doc_id FROM corpus) d
  CROSS JOIN range(64) r(j)
  LEFT JOIN dtfs ON dtfs.doc_id = d.doc_id AND dtfs.bucket = r.j
  GROUP BY d.doc_id
),
qb AS (
  SELECT ({DUCK_POLY_HASH.format(t='t')}) % 64 AS bucket, COUNT(*) AS tf
  FROM (SELECT unnest(['vector', 'join', 'stream']) AS t) GROUP BY bucket
),
qvec AS (
  SELECT list(CAST(coalesce(tf, 0) AS DOUBLE) ORDER BY r.j) AS v
  FROM range(64) r(j) LEFT JOIN qb ON qb.bucket = r.j
),
dense AS (
  SELECT id, rank FROM (
    SELECT s.id, row_number() OVER (ORDER BY s.sim DESC, s.id) AS rank
    FROM (
      SELECT v.doc_id AS id,
             round(
               (SELECT SUM(a*b) FROM (SELECT unnest(q.v) AS a,
                                             unnest(v.vec) AS b))
               / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.v) AS a)))
                 * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(v.vec) AS b)))),
               6) AS sim
      FROM dvecs v, qvec q) s)
  WHERE rank <= 10
),
ltoks AS (
  SELECT doc_id AS id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     x -> length(x) > 0) AS tk
  FROM corpus
),
lens AS (SELECT id, len(tk) AS len FROM ltoks),
stats AS (SELECT COUNT(*) AS n, AVG(len) AS avgdl FROM lens),
posting AS (
  SELECT id, term, COUNT(*) AS tf
  FROM (SELECT id, unnest(tk) AS term FROM ltoks)
  WHERE term IN ('vector', 'join', 'stream')
  GROUP BY id, term
),
dfreq AS (SELECT term, COUNT(DISTINCT id) AS df FROM posting GROUP BY term),
bm25 AS (
  SELECT id, rank FROM (
    SELECT s.id, row_number() OVER (ORDER BY s.score DESC, s.id) AS rank
    FROM (
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
      GROUP BY p.id) s)
  WHERE rank <= 10
),
spost AS (
  SELECT id, ({DUCK_POLY_HASH.format(t='tok')}) % 512 AS idx,
         CAST(COUNT(*) AS DOUBLE) AS val
  FROM (SELECT id, unnest(tk) AS tok FROM ltoks)
  GROUP BY id, idx
),
sq AS (
  SELECT ({DUCK_POLY_HASH.format(t='t')}) % 512 AS idx,
         CAST(COUNT(*) AS DOUBLE) AS qval
  FROM (SELECT unnest(['vector', 'join', 'stream']) AS t) GROUP BY idx
),
sparse AS (
  SELECT id, rank FROM (
    SELECT s.id, row_number() OVER (ORDER BY s.sim DESC, s.id) AS rank
    FROM (SELECT p.id, round(SUM(p.val * sq.qval), 6) AS sim
          FROM spost p JOIN sq ON p.idx = sq.idx GROUP BY p.id) s)
  WHERE rank <= 10
),
fused AS (
  SELECT id, round(SUM(1.0 / (60 + rank)), 6) AS rrf_score
  FROM (SELECT * FROM dense UNION ALL SELECT * FROM bm25
        UNION ALL SELECT * FROM sparse)
  GROUP BY id
)
SELECT id, rrf_score, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (ORDER BY rrf_score DESC, id) AS rank
      FROM fused)
WHERE rank <= 10
""",
)
def q_api_query_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Qdrant Query API's prefetch+fusion shape as a capstone over the
    WHOLE stored-index stack: ONE collection carries the raw text, a dense
    hash-embedding space, and a sparse hashed-TF space; the query runs
    three branches — dense kNN through the stored IVF index (full probe),
    BM25 through the stored posting table, sparse dot through the stored
    dim-bucketed index — and fuses the three top-10 lists with Reciprocal
    Rank Fusion THROUGH the Query API's prefetch planner
    (operators.query_api.fuse_prefetch — the same recursive entry point
    that serves the nested tree in api_query_dbsf).  Every branch reads a
    partition-pruned stored artifact; the fusion joins three k-row lists
    (corpus-size-independent)."""
    from .operators.embed import hash_embed_df  # noqa: PLC0415
    from .operators.query_api import fuse_prefetch  # noqa: PLC0415
    from .operators.sparse import (  # noqa: PLC0415
        build_sparse_index,
        postings_from_text,
        sparse_search_indexed,
    )
    from .operators.text_search import (  # noqa: PLC0415
        bm25_topk_indexed,
        build_text_index,
    )

    base = _tmp_base(sf_dir, "qfuse")
    phrase = "vector join stream"
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    dense = hash_embed_df(docs, dim=64, out_col="vec")
    spost = postings_from_text(docs, id_col="doc_id", text_col="text",
                               vocab_size=512)
    sparse_pts = (spost.groupBy("id")
                  .agg(F.array_sort(F.collect_list(F.struct("idx", "val")))
                       .alias("z"))
                  .select("id", F.col("z.idx").alias("indices"),
                          F.col("z.val").alias("values")))
    pts = (docs.select(F.col("doc_id").alias("id"), "text")
           .join(dense.select(F.col("doc_id").alias("id"), "vec"), "id")
           .join(sparse_pts, "id"))
    upsert.create_collection(
        spark, base, "docs", df=pts, id_col="id", n_buckets=8,
        vector_config={"vec": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "docs", vector_name="vec",
                             kind="ivf", n_lists=8, iters=3)
    build_text_index(spark, base, "docs", text_col="text", n_term_buckets=16)
    build_sparse_index(spark, base, "docs", n_dim_buckets=16)

    qrow = spark.createDataFrame([(0, phrase)], "doc_id long, text string")
    qvec = (hash_embed_df(qrow, dim=64, out_col="vec")
            .select(F.lit(0).alias("qid"), F.col("vec").alias("qvec")))
    dense_branch = (knn.search_collection(
        spark, base, "docs", qvec, k=10, corpus_id="id",
        use_index="always")
        .select(F.col("vec_id").alias("id"), "rank"))
    bm25_branch = bm25_topk_indexed(
        spark, base, "docs", phrase.split(), k=10, text_col="text")
    qpost = postings_from_text(qrow, id_col="doc_id", text_col="text",
                               vocab_size=512)  # qrow's doc_id 0 → id 0
    sparse_branch = (sparse_search_indexed(spark, base, "docs", qpost, k=10)
                     .select(F.col("vec_id").alias("id"), "rank"))
    fused = fuse_prefetch({
        "fusion": "rrf", "k": 10,
        "prefetch": [dense_branch, bm25_branch, sparse_branch],
    })
    return fused.select("id", F.col("score").alias("rrf_score"),
                        F.col("rank").cast("long").alias("rank"))


@register(
    "store_snapshot_restore",
    oracle="""
SELECT doc_id AS id, text FROM documents WHERE doc_id < 200
""",
)
def q_store_snapshot_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant snapshot API twin: snapshot the collection, mutate it hard
    (delete a third, overwrite, insert junk), then restore — the readback
    must be the exact pre-snapshot state (the oracle recomputes it from the
    source table).  Snapshots hardlink the immutable parquet files (O(file
    count), not O(bytes) — the local twin of an object store's server-side
    copy), and the restore is one atomic directory swap."""
    base = _tmp_base(sf_dir, "snap")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.filter(F.col("doc_id") < 200)
        .select(F.col("doc_id").alias("id"), "text"))
    upsert.snapshot_collection(base, "docs", name="before")
    upsert.delete_points(spark, base, "docs", list(range(0, 200, 3)))
    upsert.upsert(spark, base, "docs", spark.createDataFrame(
        [(5, "overwritten"), (9999, "junk row")], "id long, text string"))
    upsert.restore_collection(base, "docs", "before")
    return upsert.read_collection(spark, base, "docs").select("id", "text")


# ---------------------------------------------------------------------------
# Round 6: composable filter DSL (operators/filters.py) + filtered Query API
# (operators/query_api.py).  The DSL compiles ONCE to a SQL boolean in the
# dialect subset Spark and DuckDB share, so each oracle below embeds the
# LITERAL to_sql() output — Spark/oracle symmetry is structural.
# ---------------------------------------------------------------------------

from .operators.filters import (  # noqa: E402
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


@register(
    "api_filter_dsl",
    oracle=f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE {_DSL_FLT.to_sql()}
GROUP BY lang ORDER BY lang
""",
)
def q_api_filter_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Qdrant Filter model as ONE composable object: nested must
    (MatchAny + Range) / should (MatchValue OR MatchText) / must_not,
    compiled to a single pushed predicate — Catalyst folds the leaf
    comparisons into the parquet scan (plan-asserted in
    tests/test_filters.py), and the oracle runs the LITERAL same SQL
    string, so the two engines cannot drift.  Covers the filterable query
    surface of the reference's delegated store (README.md:13 over the
    payloads of qdrant_embedder.py:119-128)."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.filter(_DSL_FLT.to_column())
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars"))
            .orderBy("lang"))


@register(
    "store_filter_dsl_indexed",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
cand AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE label IN (2, 5) AND (vec_id % 3) <= 1
),
pairs AS (
  SELECT q.qid, c.vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, cand c
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_filter_dsl_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same Filter object routed through the PAYLOAD INDEX: the
    indexable must leaf (MatchAny on the indexed ``label``) resolves to a
    pruned posting probe, the candidates fetch via the static id-bucket
    filter, and only the residual (Range on the unindexed ``parity``)
    evaluates on the fetched rows — the Qdrant selective-filter plan,
    dispatched by operators.filters.filter_match_ids.  Results equal the
    exact filtered kNN (the oracle)."""
    from .operators import query_api  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "fdsl")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding", "label",
                      (F.col("vec_id") % 3).alias("parity")),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_payload_index(spark, base, "vecs", "label", n_val_buckets=16)
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    flt = Filter(must=[MatchAny("label", [2, 5]), Range("parity", lte=1)])
    out = query_api.search_points(spark, base, "vecs", qdf, flt=flt, k=10,
                                  use_payload_index="always")
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


_GEO_FLT = Filter(must=[GeoRadius("lat", "lon", 10.0, 20.0, 1_500_000.0)])


@register(
    "api_geo_search",
    oracle=f"""
WITH pts AS (
  SELECT o_orderkey,
         (o_orderkey % 17000) / 100.0 - 85.0 AS lat,
         ((o_orderkey * 13 + o_custkey) % 36000) / 100.0 - 180.0 AS lon,
         o_orderpriority
  FROM orders
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key
FROM pts
WHERE {_GEO_FLT.to_sql()}
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def q_api_geo_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo payload filter (Qdrant GeoRadius): haversine distance in pure
    shared-dialect SQL behind a PUSHED bounding-box pre-filter (the
    driver-side radius→degrees cut; plan-asserted in tests/test_filters.py)
    — only box survivors pay the trig.  Coordinates derive
    deterministically from order keys so both engines compute the same
    points; the oracle embeds the literal compiled filter."""
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        "o_orderkey",
        ((F.col("o_orderkey") % 17000) / 100.0 - 85.0).alias("lat"),
        (((F.col("o_orderkey") * 13 + F.col("o_custkey")) % 36000) / 100.0
         - 180.0).alias("lon"),
        "o_orderpriority")
    return (pts.filter(_GEO_FLT.to_column())
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).cast("long").alias("n_points"),
                 F.min("o_orderkey").cast("long").alias("min_key"))
            .orderBy("o_orderpriority"))


@register(
    "api_query_dbsf",
    # Nested Query-API fusion: outer DBSF over [dense leaf, inner RRF over
    # (dense, bm25)].  DBSF normalizes each list's scores over
    # [mean − 3σ, mean + 3σ] (σ = population stddev) and sums; σ = 0
    # degenerates to 0.5.  Every branch score is rounded to 6 before the
    # stats, so both engines aggregate identical decimals.
    oracle=f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 150),
dtoks AS (
  SELECT doc_id, unnest({DUCK_WS_TOKENS.format(t='text')}) AS tok FROM corpus
),
dtfs AS (
  SELECT doc_id, ({DUCK_POLY_HASH.format(t='tok')}) % 64 AS bucket,
         COUNT(*) AS tf
  FROM dtoks GROUP BY doc_id, bucket
),
dvecs AS (
  SELECT d.doc_id, list(CAST(coalesce(tf, 0) AS DOUBLE) ORDER BY r.j) AS vec
  FROM (SELECT DISTINCT doc_id FROM corpus) d
  CROSS JOIN range(64) r(j)
  LEFT JOIN dtfs ON dtfs.doc_id = d.doc_id AND dtfs.bucket = r.j
  GROUP BY d.doc_id
),
qb AS (
  SELECT ({DUCK_POLY_HASH.format(t='t')}) % 64 AS bucket, COUNT(*) AS tf
  FROM (SELECT unnest(['vector', 'join', 'stream']) AS t) GROUP BY bucket
),
qvec AS (
  SELECT list(CAST(coalesce(tf, 0) AS DOUBLE) ORDER BY r.j) AS v
  FROM range(64) r(j) LEFT JOIN qb ON qb.bucket = r.j
),
dense AS (
  SELECT id, sim AS score, rank FROM (
    SELECT s.id, s.sim, row_number() OVER (ORDER BY s.sim DESC, s.id) AS rank
    FROM (
      SELECT v.doc_id AS id,
             round(
               (SELECT SUM(a*b) FROM (SELECT unnest(q.v) AS a,
                                             unnest(v.vec) AS b))
               / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.v) AS a)))
                 * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(v.vec) AS b)))),
               6) AS sim
      FROM dvecs v, qvec q) s)
  WHERE rank <= 10
),
ltoks AS (
  SELECT doc_id AS id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     x -> length(x) > 0) AS tk
  FROM corpus
),
lens AS (SELECT id, len(tk) AS len FROM ltoks),
stats AS (SELECT COUNT(*) AS n, AVG(len) AS avgdl FROM lens),
posting AS (
  SELECT id, term, COUNT(*) AS tf
  FROM (SELECT id, unnest(tk) AS term FROM ltoks)
  WHERE term IN ('vector', 'join', 'stream')
  GROUP BY id, term
),
dfreq AS (SELECT term, COUNT(DISTINCT id) AS df FROM posting GROUP BY term),
bm25 AS (
  SELECT id, score, rank FROM (
    SELECT s.id, s.score,
           row_number() OVER (ORDER BY s.score DESC, s.id) AS rank
    FROM (
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
      GROUP BY p.id) s)
  WHERE rank <= 10
),
rrf AS (
  SELECT id, rrf_score AS score, rank FROM (
    SELECT id, rrf_score,
           row_number() OVER (ORDER BY rrf_score DESC, id) AS rank
    FROM (SELECT id, round(SUM(1.0 / (60 + rank)), 6) AS rrf_score
          FROM (SELECT id, rank FROM dense
                UNION ALL SELECT id, rank FROM bm25)
          GROUP BY id))
  WHERE rank <= 10
),
dn AS (
  SELECT id, CASE WHEN sd > 0 THEN (score - (mu - 3*sd)) / (6*sd)
              ELSE 0.5 END AS c
  FROM (SELECT id, score, AVG(score) OVER () AS mu,
               STDDEV_POP(score) OVER () AS sd FROM dense)
),
rn AS (
  SELECT id, CASE WHEN sd > 0 THEN (score - (mu - 3*sd)) / (6*sd)
              ELSE 0.5 END AS c
  FROM (SELECT id, score, AVG(score) OVER () AS mu,
               STDDEV_POP(score) OVER () AS sd FROM rrf)
),
fused AS (
  SELECT COALESCE(dn.id, rn.id) AS id,
         round(COALESCE(dn.c, 0) + COALESCE(rn.c, 0), 6) AS dbsf_score
  FROM dn FULL OUTER JOIN rn ON dn.id = rn.id
)
SELECT id, dbsf_score, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (ORDER BY dbsf_score DESC, id) AS rank
      FROM fused)
WHERE rank <= 10
""",
)
def q_api_query_dbsf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Query API's SECOND fusion mode (DBSF) in a NESTED prefetch tree
    — the recursive ``query_points(prefetch=[...], query=FusionQuery(...))``
    shape the Qdrant store behind the reference accepts (README.md:13):
    the inner node RRF-fuses a dense branch with a BM25 branch, and the
    outer node DBSF-fuses the dense branch with that inner fusion's
    output.  Both fusers and the recursive planner
    (operators.query_api.fuse_prefetch) join only k-row lists — nothing
    scales with the corpus."""
    from .operators.embed import hash_embed_df  # noqa: PLC0415
    from .operators.query_api import fuse_prefetch  # noqa: PLC0415
    from .operators.text_search import bm25_topk  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    qrow = spark.createDataFrame([(0, "vector join stream")],
                                 "doc_id long, text string")
    qvec = (hash_embed_df(qrow, dim=64, out_col="vec")
            .select(F.lit(0).alias("qid"), F.col("vec").alias("qvec")))
    dense = (knn.knn_join(
        qvec, hash_embed_df(docs, dim=64, out_col="vec")
        .select(F.col("doc_id").alias("id"), "vec"),
        k=10, corpus_id="id", corpus_vec="vec", exclude_self=False)
        .select(F.col("vec_id").alias("id"), F.col("sim").alias("score"),
                "rank"))
    lex = bm25_topk(docs, ["vector", "join", "stream"], k=10)
    fused = fuse_prefetch({
        "fusion": "dbsf", "k": 10,
        "prefetch": [dense, {"fusion": "rrf", "prefetch": [dense, lex]}],
    })
    return fused.select("id", F.col("score").alias("dbsf_score"),
                        F.col("rank").cast("long").alias("rank"))


@register(
    "store_update_vectors",
    # corpus = vec_id < 200, with ids < 20 re-pointed at the embedding of
    # vec_id + 300 (the update_vectors patch); exact cosine top-10 for three
    # query vectors drawn from rows 400-402 (outside the collection).
    oracle="""
WITH corpus AS (
  SELECT e.vec_id AS id,
         CASE WHEN e.vec_id < 20
              THEN (SELECT p.embedding FROM embeddings p
                    WHERE p.vec_id = e.vec_id + 300)
              ELSE e.embedding END AS embedding
  FROM embeddings e WHERE e.vec_id < 200
),
q AS (
  SELECT vec_id - 400 AS qid, embedding AS qvec FROM embeddings
  WHERE vec_id >= 400 AND vec_id < 403
),
pairs AS (
  SELECT q.qid, c.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, corpus c
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_update_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``update_vectors`` twin: patch 20 points' vectors in place
    (payloads untouched), refresh_all_indexes absorbs the patch through the
    delta log — O(|patch|), re-assigning each patched id to its NEW IVF
    list — and the search through the stored index (full probe) returns
    exactly the post-patch kNN the oracle recomputes from the source
    table."""
    base = _tmp_base(sf_dir, "updvec")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 200)
        .select(F.col("vec_id").alias("id"), "embedding", "label"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf",
                             n_lists=8, iters=3)
    patch = (emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 320))
             .select((F.col("vec_id") - 300).alias("id"), "embedding"))
    upsert.update_vectors(spark, base, "vecs", patch)
    index.refresh_all_indexes(spark, base, "vecs")
    qdf = (emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 403))
           .select((F.col("vec_id") - 400).alias("qid"),
                   F.col("embedding").alias("qvec")))
    out = knn.search_collection(
        spark, base, "vecs", qdf, k=10, corpus_id="id", exclude_self=False,
        use_index="always", n_probe=8)
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_tenant_search",
    # tenant = 't' || (label % 3); the scoped search sees ONLY tenant t1's
    # points — the oracle recomputes that tenant's exact cosine top-10.
    oracle="""
WITH corpus AS (
  SELECT vec_id AS id, embedding FROM embeddings WHERE (label % 3) = 1
),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings
  WHERE vec_id >= 490 AND vec_id < 493
),
pairs AS (
  SELECT q.qid, c.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, corpus c
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_tenant_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multitenant search (Qdrant shard-key / group_id pattern): the
    collection partitions ``tenant=<v>/id_bucket=<n>`` — one level ABOVE
    the id bucket — so the tenant-scoped search prunes to tenant t1's
    subtree (a static partition filter on the outermost level,
    plan-asserted in tests/test_tenant.py) and never lists another
    tenant's data.  At 100 TB a tenant's slice is the prunable unit: the
    scoped exact scan reads |tenant| rows, not |collection|."""
    base = _tmp_base(sf_dir, "mtsearch")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        F.concat(F.lit("t"), (F.col("label") % 3).cast("string"))
        .alias("tenant"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        tenant_col="tenant",
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    qdf = (emb.filter((F.col("vec_id") >= 490) & (F.col("vec_id") < 493))
           .select(F.col("vec_id").alias("qid"),
                   F.col("embedding").alias("qvec")))
    out = knn.search_collection(spark, base, "vecs", qdf, k=10,
                                corpus_id="id", exclude_self=False,
                                tenant="t1")
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


from .operators.filters import DatetimeRange  # noqa: E402

_DT_FLT = Filter(
    must=[DatetimeRange("ts", gte="2024-01-10 00:00:00",
                        lt="2024-01-20 00:00:00")],
    must_not=[MatchValue("event_type", "view")],
)


@register(
    "api_datetime_range",
    oracle=f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(event_id) AS BIGINT) AS min_event
FROM events
WHERE {_DT_FLT.to_sql()}
GROUP BY event_type ORDER BY event_type
""",
)
def q_api_datetime_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal payload filter (Qdrant DatetimeRange): a ten-day window
    over the events stream, excluding one event type NULL-safely — the
    bounds render as TIMESTAMP literals both engines parse identically
    (session zone pinned UTC), and the comparisons push into the parquet
    scan like any other Range leaf."""
    events = load_table(spark, sf_dir, "events")
    return (events.filter(_DT_FLT.to_column())
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.min("event_id").cast("long").alias("min_event"))
            .orderBy("event_type"))


_VC_FLT = Filter(
    must=[MatchExcept("lang", ["fr"])],
    should=[IsEmpty("tags"), ValuesCount("tags", gte=2, lte=3)],
)


@register(
    "api_values_count",
    # tags: NULL when doc_id%7=0, else the first doc_id%4 tokens (so empty
    # when doc_id%4=0) — exercising IsEmpty (null-or-empty), ValuesCount
    # bounds, and the NULL-safe MatchExcept in one compiled filter string.
    oracle=f"""
WITH pts AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN NULL
              ELSE list_slice({DUCK_WS_TOKENS.format(t='lower(text)')},
                              1, CAST(doc_id % 4 AS INT)) END AS tags,
         lang
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pts
WHERE {_VC_FLT.to_sql()}
GROUP BY lang ORDER BY lang
""",
)
def q_api_values_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-payload filter leaves (Qdrant IsEmptyCondition +
    ValuesCount): match points whose ``tags`` list is missing/empty OR has
    2-3 values, excluding one language NULL-safely.  Both leaves compile
    to the one array-cardinality expression the two engines share
    (``json_array_length(to_json(k))``), so the oracle runs the literal
    same filter string over the same derived table."""
    docs = load_table(spark, sf_dir, "documents")
    pts = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None))
        .otherwise(F.slice(ws_tokens(F.lower(F.col("text"))), F.lit(1),
                           (F.col("doc_id") % 4).cast("int")))
        .alias("tags"),
        "lang")
    return (pts.filter(_VC_FLT.to_column())
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
            .orderBy("lang"))


@register(
    "api_search_groups_stored",
    # grouped kNN over a STORED collection: per query the best 4
    # label-groups, each with its top-3 hits; groups rank by their best hit
    # (ties by label), hits by score (ties by id).
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 2
),
pairs AS (
  SELECT q.qid, e.vec_id, e.label AS "group",
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(e.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(e.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, embeddings e
),
tin AS (
  SELECT *, row_number() OVER (PARTITION BY qid, "group"
                               ORDER BY sim DESC, vec_id) AS rank_in_group
  FROM pairs
),
cut AS (SELECT * FROM tin WHERE rank_in_group <= 3),
wb AS (
  SELECT *, MAX(sim) OVER (PARTITION BY qid, "group") AS best FROM cut
)
SELECT qid, "group", CAST(group_rank AS BIGINT) AS group_rank, vec_id, sim,
       CAST(rank_in_group AS BIGINT) AS rank_in_group
FROM (SELECT *, dense_rank() OVER (PARTITION BY qid
                                   ORDER BY best DESC, "group") AS group_rank
      FROM wb)
WHERE group_rank <= 4
""",
)
def q_api_search_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped kNN (Qdrant search_groups / query_groups): result
    diversification — per query, the best 4 groups by label with their own
    top-3 hits each, instead of one dominant label filling the top-k.  One
    broadcast-query corpus scan plus two windows; nothing after the scan
    scales with the corpus (see operators.query_api.search_groups)."""
    from .operators.query_api import search_groups  # noqa: PLC0415

    base = _tmp_base(sf_dir, "sgroups")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding", "label"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    qdf = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = search_groups(spark, base, "vecs", qdf, group_by="label",
                        k_groups=4, group_size=3)
    return out.select("qid", "group",
                      F.col("group_rank").cast("long").alias("group_rank"),
                      F.col("vec_id").cast("long").alias("vec_id"), "sim",
                      F.col("rank_in_group").cast("long")
                      .alias("rank_in_group"))


@register(
    "api_group_lookup",
    # the api_search_groups shape + with_lookup: each group row joins the
    # record behind its group id from a second collection.
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 2
),
pairs AS (
  SELECT q.qid, e.vec_id, e.label AS "group",
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(e.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(e.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, embeddings e
),
tin AS (
  SELECT *, row_number() OVER (PARTITION BY qid, "group"
                               ORDER BY sim DESC, vec_id) AS rank_in_group
  FROM pairs
),
cut AS (SELECT * FROM tin WHERE rank_in_group <= 2),
wb AS (
  SELECT *, MAX(sim) OVER (PARTITION BY qid, "group") AS best FROM cut
),
grp AS (
  SELECT qid, "group", CAST(group_rank AS BIGINT) AS group_rank, vec_id, sim,
         CAST(rank_in_group AS BIGINT) AS rank_in_group
  FROM (SELECT *, dense_rank() OVER (PARTITION BY qid
                                     ORDER BY best DESC, "group") AS group_rank
        FROM wb)
  WHERE group_rank <= 3
),
cats AS (
  SELECT DISTINCT label AS id, 'L' || CAST(label AS VARCHAR) AS name,
         label * 1.5 AS weight
  FROM embeddings
)
SELECT g.qid, g."group", g.group_rank, g.vec_id, g.sim, g.rank_in_group,
       c.name AS lookup_name, c.weight AS lookup_weight
FROM grp g LEFT JOIN cats c ON g."group" = c.id
""",
)
def q_api_group_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped search with lookup (Qdrant search_groups ``with_lookup``):
    the chunks-grouped-by-parent-document RAG pattern — after grouping,
    each group id fetches its record from a SECOND collection through the
    store's static id-bucket filter (O(|groups|), never a lookup-side
    scan) and joins broadcast."""
    from .operators.query_api import search_groups, with_group_lookup  # noqa: PLC0415

    base = _tmp_base(sf_dir, "glookup")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.select(F.col("vec_id").alias("id"), "embedding", "label"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    cats = (emb.select("label").distinct()
            .select(F.col("label").alias("id"),
                    F.concat(F.lit("L"), F.col("label").cast("string"))
                    .alias("name"),
                    (F.col("label") * 1.5).alias("weight")))
    upsert.create_collection(spark, base, "cats", df=cats, id_col="id",
                             n_buckets=4)
    qdf = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = search_groups(spark, base, "vecs", qdf, group_by="label",
                        k_groups=3, group_size=2)
    out = with_group_lookup(spark, base, "cats", out)
    return out.select("qid", "group",
                      F.col("group_rank").cast("long").alias("group_rank"),
                      F.col("vec_id").cast("long").alias("vec_id"), "sim",
                      F.col("rank_in_group").cast("long")
                      .alias("rank_in_group"),
                      "lookup_name", "lookup_weight")


@register(
    "api_query_by_id",
    oracle="""
WITH qv AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 7),
corpus AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id < 300 AND vec_id <> 7),
pairs AS (
  SELECT '7' AS qid, c.vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM qv q, corpus c
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (ORDER BY sim DESC, vec_id) AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_api_query_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query by stored point (the unified Qdrant ``query_points`` with a
    point id): the id's vector fetches through the store's static
    id-bucket filter (one pruned read, one row collected) and becomes the
    query; the point itself is excluded from its own results — Qdrant's
    lookup semantics."""
    from .operators.query_api import query_points  # noqa: PLC0415

    base = _tmp_base(sf_dir, "qbyid")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 300)
        .select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    out = query_points(spark, base, "vecs", query=7, k=10)
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_batch_update",
    # the batch: upsert (5 overwrites + 10 new rows) -> delete ids 5-9 ->
    # set_payload flagged=1 on multiples of 20 -> delete_by_filter lang='fr';
    # the oracle composes the same four steps over the source table.
    oracle="""
WITH kept AS (
  SELECT CAST(doc_id AS VARCHAR) AS id,
         CASE WHEN doc_id < 5 THEN 'rewritten ' || CAST(doc_id AS VARCHAR)
              ELSE text END AS document,
         CASE WHEN doc_id < 5 THEN 'en' ELSE lang END AS lang,
         doc_id AS key
  FROM documents
  WHERE doc_id < 300 AND doc_id NOT BETWEEN 5 AND 9
),
newrows AS (
  SELECT CAST(300 + i AS VARCHAR) AS id,
         'new doc ' || CAST(i AS VARCHAR) AS document, 'xx' AS lang,
         300 + i AS key
  FROM range(10) t(i)
),
unioned AS (SELECT * FROM kept UNION ALL SELECT * FROM newrows)
SELECT id, document, lang,
       CAST(CASE WHEN key % 20 = 0 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM unioned WHERE lang <> 'fr'
""",
)
def q_store_batch_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``batch_update_points``: four mutations applied IN ORDER in
    one call — upsert (overwrites + inserts), delete-by-id, set_payload,
    delete-by-filter — each publishing its own delta and version, later
    ops seeing earlier ops' effects.  The readback equals the oracle's
    composition of the same four steps."""
    base = _tmp_base(sf_dir, "batchup")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.filter(F.col("doc_id") < 300)
        .select(F.col("doc_id").cast("string").alias("id"),
                F.col("text").alias("document"), "lang",
                F.lit(0).alias("flagged")))
    up = spark.createDataFrame(
        [(str(i), f"rewritten {i}", "en", 0) for i in range(5)]
        + [(str(300 + i), f"new doc {i}", "xx", 0) for i in range(10)],
        "id string, document string, lang string, flagged int")
    patch = spark.createDataFrame(
        [(str(k), 1) for k in range(0, 310, 20)], "id string, flagged int")
    versions = upsert.batch_update_points(spark, base, "docs", [
        ("upsert", up),
        ("delete", [str(i) for i in range(5, 10)]),
        ("set_payload", patch),
        ("delete_by_filter", "lang = 'fr'"),
    ])
    assert versions == [1, 2, 3, 4], versions
    info = upsert.collection_info(spark, base, "docs")
    assert info["version"] == 4 and info["points_count"] > 0, info
    return (upsert.read_collection(spark, base, "docs")
            .select("id", "document", "lang",
                    F.col("flagged").cast("long").alias("flagged")))


from .operators.filters import MatchPhrase, MatchTextPrefix  # noqa: E402

_PHRASE_FLT = Filter(must=[MatchPhrase("text", "data table"),
                           Range("n_chars", gte=100)])


@register(
    "api_match_phrase",
    oracle=f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc
FROM documents
WHERE {_PHRASE_FLT.to_sql()}
GROUP BY lang ORDER BY lang
""",
)
def q_api_match_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-token phrase filter (Qdrant MatchPhrase): docs containing
    the exact phrase "data table" (tokens in order and adjacent — unlike
    MatchText's any-order containment), composed with a Range leaf; the
    oracle runs the literal compiled filter string."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.filter(_PHRASE_FLT.to_column())
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.min("doc_id").cast("long").alias("min_doc"))
            .orderBy("lang"))


_SAMPLE_FLT = Filter(must_not=[MatchValue("lang", "fr")])


@register(
    "api_sample",
    oracle=f"""
SELECT id, lang FROM (
  SELECT CAST(doc_id AS VARCHAR) AS id, lang FROM documents
  WHERE doc_id < 400
)
WHERE {_SAMPLE_FLT.to_sql()}
ORDER BY md5('s6|' || id), id LIMIT 25
""",
)
def q_api_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible random sampling (Qdrant ``query(sample=random)``): a
    deterministic seeded draw — order by md5(seed || id), layout- and
    partition-invariant, composed with a DSL filter; one pushed-filter
    scan plus TakeOrderedAndProject, no full sort.  Redraw = new seed."""
    from .operators.query_api import sample_points  # noqa: PLC0415

    base = _tmp_base(sf_dir, "sample")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.filter(F.col("doc_id") < 400)
        .select(F.col("doc_id").cast("string").alias("id"), "lang"))
    out = sample_points(spark, base, "docs", n=25, seed="s6",
                        flt=_SAMPLE_FLT)
    return out.select("id", "lang")


@register(
    "store_tenant_indexed",
    # tenant t1's OWN trained index, full probe -> exactly tenant t1's kNN
    oracle="""
WITH corpus AS (
  SELECT vec_id AS id, embedding FROM embeddings WHERE (label % 3) = 1
),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings
  WHERE vec_id >= 480 AND vec_id < 483
),
pairs AS (
  SELECT q.qid, c.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, corpus c
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_tenant_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tenant index (the scale path for a BIG tenant): tenant t1 gets
    its OWN trained IVF artifact over its partition subtree; the scoped
    search dispatches to it (use_index='always') and at full probe equals
    exactly that tenant's kNN — which is what the oracle recomputes.
    Other tenants' data never enters the artifact, and refresh keeps it
    scoped (tests/test_tenant.py)."""
    base = _tmp_base(sf_dir, "mtidx")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        F.concat(F.lit("t"), (F.col("label") % 3).cast("string"))
        .alias("tenant"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        tenant_col="tenant",
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf", n_lists=4,
                             iters=4, tenant="t1")
    qdf = (emb.filter((F.col("vec_id") >= 480) & (F.col("vec_id") < 483))
           .select(F.col("vec_id").alias("qid"),
                   F.col("embedding").alias("qvec")))
    out = knn.search_collection(spark, base, "vecs", qdf, k=10,
                                corpus_id="id", exclude_self=False,
                                tenant="t1", use_index="always", n_probe=4)
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


from .operators.filters import MatchContains  # noqa: E402

_SP_FLT = Filter(must=[MatchContains("tags", "l1")])


@register(
    "api_search_params",
    # tags = ['p'||(id%2), 'l'||(label%3)]; filter = array membership;
    # k=5 with offset=3 keeps exact ranks 4..8 renumbered 1..5, then the
    # score threshold trims the tail.
    oracle=f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding,
         ['p' || CAST(vec_id % 2 AS VARCHAR),
          'l' || CAST(label % 3 AS VARCHAR)] AS tags
  FROM embeddings
),
flt AS (SELECT * FROM corpus WHERE {_SP_FLT.to_sql()}),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT q.qid, f.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(f.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(f.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, flt f
)
SELECT qid, vec_id, sim, CAST(rank - 3 AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank > 3 AND rank <= 8 AND sim >= 0.05
""",
)
def q_api_search_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant search params in one query: an ARRAY-membership filter leaf
    (MatchContains — MatchValue over an array payload), paged search via
    ``offset`` (skip 3, ranks renumber from 1), and a ``score_threshold``
    floor trimming the tail — all post-rank cuts the oracle mirrors
    exactly."""
    from .operators.query_api import search_points  # noqa: PLC0415

    base = _tmp_base(sf_dir, "sparams")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        F.array(F.concat(F.lit("p"), (F.col("vec_id") % 2).cast("string")),
                F.concat(F.lit("l"), (F.col("label") % 3).cast("string")))
        .alias("tags"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = search_points(spark, base, "vecs", qdf, flt=_SP_FLT, k=5,
                        offset=3, score_threshold=0.05)
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "pipe_dataset_build",
    # the full training-mix build: exact dedup (min doc_id per identical
    # text) -> benchmark decontamination (3-gram overlap with docs < 20)
    # -> quality gate (n_chars in [150, 600], >= 25 tokens) -> stratified
    # quota sample (10 per lang by deterministic md5 rank).
    oracle=r"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> length(x) > 0) AS tk
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(greatest(len(tk)-2, 0)),
                                 i -> array_to_string(tk[i+1:i+3], ' '))) AS shingle
    FROM toks)
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20),
contaminated AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN bench USING (shingle)
  WHERE s.doc_id >= 20
),
dd AS (
  SELECT * FROM (
    SELECT d.*, row_number() OVER (PARTITION BY md5(text)
                                   ORDER BY doc_id) AS rn
    FROM documents d)
  WHERE rn = 1
),
clean AS (
  SELECT dd.doc_id, dd.lang, len(t.tk) AS n_tokens
  FROM dd JOIN toks t USING (doc_id)
  WHERE dd.doc_id >= 20
    AND dd.doc_id NOT IN (SELECT doc_id FROM contaminated)
    AND dd.n_chars BETWEEN 150 AND 600
    AND len(t.tk) >= 25
),
mixed AS (
  SELECT doc_id, lang, n_tokens,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5('mix' || CAST(doc_id AS VARCHAR)),
                                     doc_id) AS rn
  FROM clean
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
FROM mixed WHERE rn <= 10
""",
)
def q_pipe_dataset_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-mix build every pretraining pipeline runs,
    composed from this repo's operators in one plan: exact dedup (keep
    the lowest id per identical text), benchmark DECONTAMINATION (drop
    any doc sharing a token 3-gram with the held-out set — the broadcast
    shingle probe, no train×bench pair materializes), a QUALITY gate
    (length + token-count floors), and a STRATIFIED quota sample (exactly
    10 docs per language by deterministic md5 rank).  Every stage is a
    shuffle-minimal shape that survives 100×: one window on the content
    hash, one broadcast join, pushed filters, one rank window per
    stratum."""
    from .operators.sampling import stratified_sample  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dd = (docs.withColumn("_rn", F.row_number().over(w))
          .filter(F.col("_rn") == 1).drop("_rn"))
    flagged = dedup.cross_corpus_contamination(
        docs.filter(F.col("doc_id") >= 20), docs.filter(F.col("doc_id") < 20),
        text_col="text", id_col="doc_id", n=3, min_hits=1
    ).select(F.col("id").alias("doc_id"))
    clean = (dd.filter(F.col("doc_id") >= 20)
             .join(flagged, "doc_id", "left_anti")
             .withColumn("n_tokens", F.size(ws_tokens(F.col("text"))))
             .filter((F.col("n_chars") >= 150) & (F.col("n_chars") <= 600)
                     & (F.col("n_tokens") >= 25)))
    out = stratified_sample(clean, "lang", "doc_id", 10, salt="mix")
    return out.select("doc_id", "lang",
                      F.col("n_tokens").cast("long").alias("n_tokens"))


@register(
    "api_recommend_best_score",
    # best_score strategy: score = best positive sim unless the best
    # NEGATIVE beats it, then -(best negative)^2 (Qdrant RecoQuery);
    # examples excluded.
    oracle="""
WITH ex AS (
  SELECT vec_id, embedding,
         CASE WHEN vec_id IN (0, 1) THEN 1 ELSE -1 END AS s
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
corpus AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id < 300 AND vec_id NOT IN (0, 1, 2)),
sims AS (
  SELECT c.vec_id, e.s,
         (SELECT SUM(a*b) FROM (SELECT unnest(e.embedding)::DOUBLE AS a,
                                       unnest(c.embedding)::DOUBLE AS b))
         / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(e.embedding)::DOUBLE AS a)))
           * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))) AS sim
  FROM corpus c, ex e
),
agg AS (
  SELECT vec_id,
         MAX(CASE WHEN s = 1 THEN sim END) AS bp,
         MAX(CASE WHEN s = -1 THEN sim END) AS bn
  FROM sims GROUP BY vec_id
)
SELECT vec_id, score, CAST(rank AS BIGINT) AS rank
FROM (SELECT vec_id,
             round(CASE WHEN bp > bn THEN bp ELSE -(bn*bn) END, 6) AS score,
             row_number() OVER (
               ORDER BY round(CASE WHEN bp > bn THEN bp ELSE -(bn*bn) END, 6)
                        DESC, vec_id) AS rank
      FROM agg)
WHERE rank <= 10
""",
)
def q_api_recommend_best_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant recommend with the BEST_SCORE strategy over a stored
    collection: positive/negative point IDS fetch their stored vectors
    (id-bucket pruned), then each candidate scores its best positive
    similarity — unless its best NEGATIVE beats it, in which case the
    score is -(best negative)^2 (the RecoQuery formula: non-positive even
    when both best sims are negative), sinking negative look-alikes.
    The examples broadcast; the corpus scans once (the exact-kNN
    shape)."""
    from .operators.query_api import recommend_points  # noqa: PLC0415

    base = _tmp_base(sf_dir, "recbest")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 300)
        .select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    out = recommend_points(spark, base, "vecs", positive=[0, 1],
                           negative=[2], strategy="best_score", k=10)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      "score", F.col("rank").cast("long").alias("rank"))


@register(
    "api_recommend_sum_scores",
    # sum_scores strategy: score = sum(sim to positives) - sum(sim to
    # negatives); per-pair sims round to 6 BEFORE the sum on both engines
    # (the discover convention) so the 3-term double fold is order-stable.
    oracle=f"""
WITH ex AS (
  SELECT vec_id, embedding,
         CASE WHEN vec_id IN (0, 1) THEN 1 ELSE -1 END AS s
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
corpus AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id < 300 AND vec_id NOT IN (0, 1, 2)),
sims AS (
  SELECT c.vec_id, e.s, {_duck_cos('c.embedding', 'e.embedding')} AS sim
  FROM corpus c, ex e
),
agg AS (
  SELECT vec_id, round(SUM(sim * s), 6) AS score FROM sims GROUP BY vec_id
)
SELECT vec_id, score, CAST(rank AS BIGINT) AS rank
FROM (SELECT vec_id, score,
             row_number() OVER (ORDER BY score DESC, vec_id) AS rank
      FROM agg)
WHERE rank <= 10
""",
)
def q_api_recommend_sum_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant recommend with the SUM_SCORES strategy (the third RecoQuery
    strategy): each candidate scores the SUM of its similarities to every
    positive example minus the sum to every negative — all examples pull,
    not just the best pair.  Same physical shape as best_score: the
    examples broadcast, the corpus scans once, one partial-aggregated
    groupBy folds the pair terms."""
    from .operators.query_api import recommend_points  # noqa: PLC0415

    base = _tmp_base(sf_dir, "recsum")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 300)
        .select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    out = recommend_points(spark, base, "vecs", positive=[0, 1],
                           negative=[2], strategy="sum_scores", k=10)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      "score", F.col("rank").cast("long").alias("rank"))


@register(
    "api_recommend_groups",
    # recommend_groups with best_score: per-point RecoQuery score keeps
    # the label through the fold, then the search_groups two-window cut:
    # top-3 per label, labels ranked by their best point, top-5 labels.
    oracle="""
WITH ex AS (
  SELECT vec_id, embedding,
         CASE WHEN vec_id IN (0, 1) THEN 1 ELSE -1 END AS s
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
corpus AS (SELECT vec_id, embedding, label FROM embeddings
           WHERE vec_id < 300 AND vec_id NOT IN (0, 1, 2)
             AND label IS NOT NULL),
sims AS (
  SELECT c.vec_id, c.label, e.s,
         (SELECT SUM(a*b) FROM (SELECT unnest(e.embedding)::DOUBLE AS a,
                                       unnest(c.embedding)::DOUBLE AS b))
         / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(e.embedding)::DOUBLE AS a)))
           * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))) AS sim
  FROM corpus c, ex e
),
agg AS (
  SELECT vec_id, label,
         round(CASE WHEN bn IS NULL OR bp > bn THEN bp
                    ELSE -(bn*bn) END, 6) AS score
  FROM (SELECT vec_id, label,
               MAX(CASE WHEN s = 1 THEN sim END) AS bp,
               MAX(CASE WHEN s = -1 THEN sim END) AS bn
        FROM sims GROUP BY vec_id, label)
),
cut AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY label
                                 ORDER BY score DESC, vec_id)
              AS rank_in_group
    FROM agg)
  WHERE rank_in_group <= 3
),
ranked AS (
  SELECT *, dense_rank() OVER (ORDER BY best DESC, label) AS group_rank
  FROM (SELECT *, MAX(score) OVER (PARTITION BY label) AS best FROM cut)
)
SELECT CAST(label AS BIGINT) AS "group",
       CAST(group_rank AS BIGINT) AS group_rank,
       vec_id, score, CAST(rank_in_group AS BIGINT) AS rank_in_group
FROM ranked WHERE group_rank <= 5
""",
)
def q_api_recommend_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``recommend_groups`` (best_score strategy): recommend-by-
    example scoring with the grouped result shape — the 5 best labels,
    each carrying its top 3 recommendations, groups ranked by their best
    point's score.  The broadcast example-pairs scan keeps the group
    column through the fold; nothing after the scan scales with the
    corpus — only with |labels|·group_size."""
    from .operators.query_api import recommend_groups  # noqa: PLC0415

    base = _tmp_base(sf_dir, "recgrp")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 300)
        .select(F.col("vec_id").alias("id"), "embedding", "label"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    out = recommend_groups(spark, base, "vecs", positive=[0, 1],
                           negative=[2], strategy="best_score",
                           group_by="label", k_groups=5, group_size=3)
    return out.select(F.col("group").cast("long").alias("group"),
                      F.col("group_rank").cast("long").alias("group_rank"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "score",
                      F.col("rank_in_group").cast("long")
                      .alias("rank_in_group"))


@register(
    "api_recommend_groups_avg",
    # recommend_groups with average_vector: the synthetic query (mean of
    # positives - mean of negatives, folded in the same index order as
    # the driver-side python loop) runs through the search_groups scan.
    oracle="""
WITH refs AS (
  SELECT (SELECT embedding FROM embeddings WHERE vec_id = 0) AS p1,
         (SELECT embedding FROM embeddings WHERE vec_id = 1) AS p2,
         (SELECT embedding FROM embeddings WHERE vec_id = 2) AS n1
),
qv AS (
  SELECT list_transform(range(1, len(p1) + 1),
           i -> p1[i]::DOUBLE / 2 + p2[i]::DOUBLE / 2 - n1[i]::DOUBLE) AS q
  FROM refs
),
corpus AS (SELECT vec_id, embedding, label FROM embeddings
           WHERE vec_id < 300 AND vec_id NOT IN (0, 1, 2)
             AND label IS NOT NULL),
sims AS (
  SELECT c.vec_id, c.label,
         round((SELECT SUM(a*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                                             unnest(q.q) AS b))
         / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(c.embedding)::DOUBLE AS a)))
           * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(q.q) AS b)))), 6) AS sim
  FROM corpus c, qv q
),
cut AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY label
                                 ORDER BY sim DESC, vec_id)
              AS rank_in_group
    FROM sims)
  WHERE rank_in_group <= 2
),
ranked AS (
  SELECT *, dense_rank() OVER (ORDER BY best DESC, label) AS group_rank
  FROM (SELECT *, MAX(sim) OVER (PARTITION BY label) AS best FROM cut)
)
SELECT CAST(label AS BIGINT) AS "group",
       CAST(group_rank AS BIGINT) AS group_rank,
       vec_id, sim AS score, CAST(rank_in_group AS BIGINT) AS rank_in_group
FROM ranked WHERE group_rank <= 4
""",
)
def q_api_recommend_groups_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``recommend_groups`` (average_vector strategy): the mean-of-
    examples query vector builds driver-side (O(|examples|) fetched rows)
    and the grouped ranking is literally the shared ``search_groups``
    code — one broadcast-query corpus scan, two windows, example ids
    excluded before grouping."""
    from .operators.query_api import recommend_groups  # noqa: PLC0415

    base = _tmp_base(sf_dir, "recgrpavg")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 300)
        .select(F.col("vec_id").alias("id"), "embedding", "label"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    out = recommend_groups(spark, base, "vecs", positive=[0, 1],
                           negative=[2], strategy="average_vector",
                           group_by="label", k_groups=4, group_size=2)
    return out.select(F.col("group").cast("long").alias("group"),
                      F.col("group_rank").cast("long").alias("group_rank"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "score",
                      F.col("rank_in_group").cast("long")
                      .alias("rank_in_group"))


@register(
    "store_discover",
    # discover over a STORED collection through the universal query API's
    # {'discover': ...} node: target + context ids fetch their stored
    # vectors (id-bucket pruned) and are excluded from the results.
    oracle=f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id < 300 AND vec_id NOT IN (0, 10, 11, 12, 13)
),
ref AS (
  SELECT (SELECT embedding FROM embeddings WHERE vec_id = 0)  AS tgt,
         (SELECT embedding FROM embeddings WHERE vec_id = 10) AS p1,
         (SELECT embedding FROM embeddings WHERE vec_id = 11) AS n1,
         (SELECT embedding FROM embeddings WHERE vec_id = 12) AS p2,
         (SELECT embedding FROM embeddings WHERE vec_id = 13) AS n2
),
scored AS (
  SELECT c.vec_id,
         {_duck_cos('c.embedding', 'r.tgt')} AS sim,
         (CASE WHEN {_duck_cos('c.embedding', 'r.p1')}
                  > {_duck_cos('c.embedding', 'r.n1')} THEN 1 ELSE 0 END
        + CASE WHEN {_duck_cos('c.embedding', 'r.p2')}
                  > {_duck_cos('c.embedding', 'r.n2')} THEN 1 ELSE 0 END)
         AS ctx_wins
  FROM corpus c, ref r
)
SELECT vec_id, CAST(ctx_wins AS BIGINT) AS ctx_wins, sim,
       CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number()
             OVER (ORDER BY ctx_wins DESC, sim DESC, vec_id) AS rank
      FROM scored)
WHERE rank <= 10
""",
)
def q_store_discover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``discover`` through the STORE and the universal
    ``query_points`` API: ``query={'discover': {'target': 0, 'context':
    [(10, 11), (12, 13)]}}`` — the target and context POINT IDS resolve
    to their stored vectors via the id-bucket fetch, fold into ONE
    broadcast row, and the collection scans once with per-row JVM
    expressions (|pairs|+1 cosines per point, no shuffle).  Example ids
    never appear as hits."""
    from .operators.query_api import query_points  # noqa: PLC0415

    base = _tmp_base(sf_dir, "discstore")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 300)
        .select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    out = query_points(
        spark, base, "vecs",
        query={"discover": {"target": 0,
                            "context": [(10, 11), (12, 13)]}}, k=10)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      F.col("ctx_wins").cast("long").alias("ctx_wins"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_context",
    # context-only search over a STORED collection through the
    # {'context': ...} query node: score = sum of min(0, cos(c,p)-cos(c,n))
    # per pair; pair ids excluded from the results.
    oracle="""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id < 300 AND vec_id NOT IN (10, 11, 12, 13)
),
refs AS (
  SELECT
    (SELECT embedding FROM embeddings WHERE vec_id = 10) AS p1,
    (SELECT embedding FROM embeddings WHERE vec_id = 11) AS n1,
    (SELECT embedding FROM embeddings WHERE vec_id = 12) AS p2,
    (SELECT embedding FROM embeddings WHERE vec_id = 13) AS n2
),
cosines AS (
  SELECT c.vec_id,
    round((SELECT SUM(a*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                                        unnest(r.p1)::DOUBLE AS b))
      / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(c.embedding)::DOUBLE AS a)))
        * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(r.p1)::DOUBLE AS b)))), 6) AS cp1,
    round((SELECT SUM(a*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                                        unnest(r.n1)::DOUBLE AS b))
      / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(c.embedding)::DOUBLE AS a)))
        * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(r.n1)::DOUBLE AS b)))), 6) AS cn1,
    round((SELECT SUM(a*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                                        unnest(r.p2)::DOUBLE AS b))
      / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(c.embedding)::DOUBLE AS a)))
        * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(r.p2)::DOUBLE AS b)))), 6) AS cp2,
    round((SELECT SUM(a*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                                        unnest(r.n2)::DOUBLE AS b))
      / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(c.embedding)::DOUBLE AS a)))
        * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(r.n2)::DOUBLE AS b)))), 6) AS cn2
  FROM corpus c, refs r
)
SELECT vec_id, ctx_score, CAST(rank AS BIGINT) AS rank
FROM (SELECT vec_id,
             round(least(0, cp1 - cn1) + least(0, cp2 - cn2), 6)
               AS ctx_score,
             row_number() OVER (
               ORDER BY round(least(0, cp1 - cn1) + least(0, cp2 - cn2), 6)
                        DESC, vec_id) AS rank
      FROM cosines)
WHERE rank <= 10
""",
)
def q_store_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant CONTEXT search through the STORE and the universal
    ``query_points`` API: ``query={'context': [(10, 11), (12, 13)]}`` —
    pair ids resolve to stored vectors, one broadcast row, one corpus
    scan; each pair contributes ``min(0, cos(c,p) − cos(c,n))`` and the
    top-k are the points deepest inside the context zone (0 = fully
    inside).  Pair ids never appear as hits."""
    from .operators.query_api import query_points  # noqa: PLC0415

    base = _tmp_base(sf_dir, "ctxstore")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 300)
        .select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    out = query_points(
        spark, base, "vecs",
        query={"context": [(10, 11), (12, 13)]}, k=10)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      "ctx_score", F.col("rank").cast("long").alias("rank"))


@register(
    "t14_stream_tenant_ingest",
    # final state: all 100 docs hash-embedded; corpus = tenant 'en' only;
    # exact cosine top-5 for query docs 0-2.
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({DUCK_WS_TOKENS.format(t='text')}) AS tok
  FROM documents WHERE doc_id < 100
),
tfs AS (
  SELECT doc_id, ({DUCK_POLY_HASH.format(t='tok')}) % 64 AS bucket,
         COUNT(*) AS tf
  FROM toks GROUP BY doc_id, bucket
),
vecs AS (
  SELECT d.doc_id, d.lang,
         list(CAST(coalesce(tf, 0) AS DOUBLE) ORDER BY r.j) AS vec
  FROM (SELECT doc_id, lang FROM documents WHERE doc_id < 100) d
  CROSS JOIN range(64) r(j)
  LEFT JOIN tfs ON tfs.doc_id = d.doc_id AND tfs.bucket = r.j
  GROUP BY d.doc_id, d.lang
),
q AS (SELECT doc_id AS qid, vec AS qvec FROM vecs WHERE doc_id < 3),
corpus AS (SELECT doc_id, vec FROM vecs WHERE lang = 'en'),
pairs AS (
  SELECT q.qid, v.doc_id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec) AS a,
                                         unnest(v.vec) AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec) AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(v.vec) AS b)))),
           6) AS sim
  FROM q, corpus v
  WHERE q.qid <> v.doc_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 5
""",
)
def q_t14_stream_tenant_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full round-6 stack LIVE: streaming micro-batches upsert into a
    MULTITENANT collection (tenant = language, one partition level above
    the id bucket) while a PER-TENANT index on tenant 'en' stays fresh —
    each foreachBatch runs upsert → refresh_all_indexes, whose row_filter
    keeps the artifact scoped to 'en' as mixed-tenant batches land.  The
    final tenant-scoped search dispatches to the tenant's own index
    (use_index='always' raises if any batch left it stale) at full probe,
    so it must equal the exact kNN over tenant 'en' — which the oracle
    recomputes."""
    import json  # noqa: PLC0415

    from .operators.embed import hash_embed_df  # noqa: PLC0415

    base = _tmp_base(sf_dir, "t14")
    store = os.path.join(base, "store")
    in_dir = os.path.join(base, "in")
    ckpt = os.path.join(base, "ck")
    os.makedirs(in_dir)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    seed = (hash_embed_df(docs.filter(F.col("doc_id") < 60),
                          dim=64, out_col="vec")
            .join(docs.select("doc_id", "lang"), "doc_id")
            .select(F.col("doc_id").alias("id"), "vec",
                    F.col("lang").alias("tenant")))
    upsert.create_collection(
        spark, store, "docs", df=seed, id_col="id", n_buckets=8,
        tenant_col="tenant",
        vector_config={"vec": {"size": 64, "distance": "cosine"}})
    index.build_vector_index(spark, store, "docs", kind="ivf",
                             n_lists=4, iters=3, tenant="en")

    rows = (docs.filter(F.col("doc_id") >= 60)
            .select("doc_id", "text", "lang").collect())
    for fi in range(2):
        with open(os.path.join(in_dir, f"f{fi}.jsonl"), "w") as fh:
            for r in rows[fi::2]:
                fh.write(json.dumps(
                    {"id": r["doc_id"], "text": r["text"],
                     "tenant": r["lang"]}) + "\n")

    schema = "id long, text string, tenant string"

    def _merge(batch, _bid):
        if batch.isEmpty():
            return
        emb = (hash_embed_df(batch, text_col="text", id_col="id",
                             dim=64, out_col="vec")
               .join(batch.select("id", "tenant"), "id")
               .select("id", "vec", "tenant"))
        upsert.upsert(batch.sparkSession, store, "docs", emb, id_col="id")
        index.refresh_all_indexes(batch.sparkSession, store, "docs")

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1).json(in_dir)
         .writeStream.foreachBatch(_merge)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    stored = upsert.read_collection(spark, store, "docs")
    qdf = (stored.filter(F.col("id") < 3)
           .select(F.col("id").alias("qid"), F.col("vec").alias("qvec")))
    out = knn.search_collection(
        spark, store, "docs", qdf, k=5, corpus_id="id", exclude_self=True,
        tenant="en", use_index="always", n_probe=4)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register("knn_mmr_rerank", oracle=None)
def q_knn_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified search (Carbonell & Goldstein 1998 — the RAG
    diversity pass): a pool-sized filtered kNN feeds a greedy maximal-
    marginal-relevance pick so near-duplicate hits don't crowd the top-k.
    Rows-only by design: the greedy recursion has no closed SQL form; its
    determinism and agreement with a pure-python reference are pinned in
    tests/test_knn.py.  Only pool-sized per-query frames enter the greedy
    pass — the corpus pays one ordinary search."""
    from .operators.query_api import search_points_mmr  # noqa: PLC0415

    base = _tmp_base(sf_dir, "mmr")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 300)
        .select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = search_points_mmr(spark, base, "vecs", qdf, k=10, pool=40,
                            lambda_=0.6)
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", "mmr_score",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "knn_mmr_k2",
    # round 10 (VERDICT r9 nit #2): at k=2 the MMR greedy IS closed-form
    # — pick1 = argmax sim (tie: min id), pick2 = argmax over the rest
    # of λ·sim − (1−λ)·cos(c, pick1) — so the applyInPandas greedy gets
    # a real SQL oracle and the rows-only set shrinks to pure-ML paths.
    # The pool is the plain top-20 cosine search (self included, sims
    # rounded 6), exactly search_points_mmr's candidate contract.
    oracle="""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
scored AS (
  SELECT q.qid, c.vec_id, c.embedding,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, corpus c
),
pool AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                              ORDER BY sim DESC, vec_id) AS rnk
                 FROM scored WHERE sim IS NOT NULL)
  WHERE rnk <= 20
),
p1 AS (SELECT qid, vec_id, sim, embedding FROM pool WHERE rnk = 1),
rest AS (
  -- greatest(0, cos): mmr_rerank zero-initializes max_div and only
  -- raises it, so a candidate NEGATIVELY correlated with pick1 pays no
  -- penalty (pinned in test_mmr_negative_cosine_clamps_at_zero) — the
  -- closed form must clamp identically
  SELECT p.qid, p.vec_id, p.sim,
         0.6 * p.sim - 0.4 * greatest(0.0,
           (SELECT SUM(a*b) FROM (SELECT unnest(p.embedding)::DOUBLE AS a,
                                         unnest(s.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(p.embedding)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(s.embedding)::DOUBLE AS b)))))
         AS m2
  FROM pool p JOIN p1 s ON p.qid = s.qid AND p.vec_id <> s.vec_id
),
p2 AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                              ORDER BY m2 DESC, vec_id) AS rnk2
                 FROM rest)
  WHERE rnk2 = 1
)
SELECT qid, vec_id, sim, round(0.6 * sim, 6) AS mmr_score,
       CAST(1 AS BIGINT) AS rank
FROM p1
UNION ALL
SELECT qid, vec_id, sim, round(m2, 6) AS mmr_score,
       CAST(2 AS BIGINT) AS rank
FROM p2
""",
)
def q_knn_mmr_k2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR at k=2 — the closed-form slice of the greedy: the first pick
    is the plain top hit, the second maximizes λ·sim − (1−λ)·cos(c,
    pick1) over the rest of the pool; the same applyInPandas greedy that
    serves knn_mmr_rerank runs here, hash-checked against the SQL
    closed form (its recursion for k>2 stays pytest-pinned)."""
    from .operators.query_api import search_points_mmr  # noqa: PLC0415

    base = _tmp_base(sf_dir, "mmr2")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 300)
        .select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = search_points_mmr(spark, base, "vecs", qdf, k=2, pool=20,
                            lambda_=0.6)
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", "mmr_score",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "api_context_search",
    # context-only: score = sum over pairs of min(0, cos(c,p) - cos(c,n));
    # 0 = fully "inside" the context, negatives rank below; ties by id.
    oracle="""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id NOT IN (10, 11, 12, 13)
),
refs AS (
  SELECT
    (SELECT embedding FROM embeddings WHERE vec_id = 10) AS p1,
    (SELECT embedding FROM embeddings WHERE vec_id = 11) AS n1,
    (SELECT embedding FROM embeddings WHERE vec_id = 12) AS p2,
    (SELECT embedding FROM embeddings WHERE vec_id = 13) AS n2
),
cosines AS (
  SELECT c.vec_id,
    round((SELECT SUM(a*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                                        unnest(r.p1)::DOUBLE AS b))
      / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(c.embedding)::DOUBLE AS a)))
        * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(r.p1)::DOUBLE AS b)))), 6) AS cp1,
    round((SELECT SUM(a*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                                        unnest(r.n1)::DOUBLE AS b))
      / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(c.embedding)::DOUBLE AS a)))
        * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(r.n1)::DOUBLE AS b)))), 6) AS cn1,
    round((SELECT SUM(a*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                                        unnest(r.p2)::DOUBLE AS b))
      / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(c.embedding)::DOUBLE AS a)))
        * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(r.p2)::DOUBLE AS b)))), 6) AS cp2,
    round((SELECT SUM(a*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                                        unnest(r.n2)::DOUBLE AS b))
      / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(c.embedding)::DOUBLE AS a)))
        * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(r.n2)::DOUBLE AS b)))), 6) AS cn2
  FROM corpus c, refs r
)
SELECT vec_id, ctx_score, CAST(rank AS BIGINT) AS rank
FROM (SELECT vec_id,
             round(least(0, cp1 - cn1) + least(0, cp2 - cn2), 6)
               AS ctx_score,
             row_number() OVER (
               ORDER BY round(least(0, cp1 - cn1) + least(0, cp2 - cn2), 6)
                        DESC, vec_id) AS rank
      FROM cosines)
WHERE rank <= 10
""",
)
def q_api_context_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant CONTEXT search (discover's target-less sibling): rank by how
    deep inside the context a point sits — each (positive, negative) pair
    contributes ``min(0, cos(c,p) − cos(c,n))``, so a point on the
    positive side of every pair scores 0 (best) and violations subtract.
    The 4 reference vectors fold into one broadcast row; the corpus scans
    once with per-row JVM expressions — cosines round to 6 on both
    engines BEFORE the pair differences, keeping the classification
    engine-stable."""
    from .functions.vector import cosine_similarity  # noqa: PLC0415

    emb = load_table(spark, sf_dir, "embeddings")
    names = {10: "p1", 11: "n1", 12: "p2", 13: "n2"}
    ref = emb.filter(F.col("vec_id").isin(list(names))).groupBy().agg(*[
        F.first(F.when(F.col("vec_id") == i, F.col("embedding")),
                ignorenulls=True).alias(n)
        for i, n in names.items()
    ])
    corpus = emb.filter(~F.col("vec_id").isin(list(names)))
    joined = corpus.crossJoin(F.broadcast(ref))

    def cos(ref_col: str):
        return F.round(
            cosine_similarity(F.col("embedding").cast("array<double>"),
                              F.col(ref_col).cast("array<double>")), 6)

    score = F.round(
        F.least(F.lit(0.0), cos("p1") - cos("n1"))
        + F.least(F.lit(0.0), cos("p2") - cos("n2")), 6)
    scored = joined.select("vec_id", score.alias("ctx_score"))
    w = Window.orderBy(F.desc("ctx_score"), F.asc("vec_id"))
    return (scored.orderBy(F.desc("ctx_score"), F.asc("vec_id")).limit(10)
            .withColumn("rank", F.row_number().over(w))
            .select("vec_id", "ctx_score",
                    F.col("rank").cast("long").alias("rank")))


_ARR_FLT = Filter(must=[MatchContains("tags", "l1"),
                        Range("parity", lte=1)])


@register(
    "store_array_payload_search",
    # tags indexed per ELEMENT; MatchContains routes through the array
    # payload index, the Range on the unindexed parity stays residual.
    oracle=f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding,
         ['p' || CAST(vec_id % 2 AS VARCHAR),
          'l' || CAST(label % 3 AS VARCHAR)] AS tags,
         vec_id % 3 AS parity
  FROM embeddings
),
flt AS (SELECT * FROM corpus WHERE {_ARR_FLT.to_sql()}),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT q.qid, f.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(f.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(f.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, flt f
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_array_payload_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload index over an ARRAY column (the Qdrant keyword-index-on-
    array model): the index stores one posting per ELEMENT, so a
    MatchContains leaf resolves to a pruned element probe —
    use_payload_index='always' proves the routing — while the Range on
    the unindexed column evaluates residually on the fetched candidates.
    Results equal the exact filtered kNN (the oracle)."""
    from .operators import query_api  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "arrpay")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        F.array(F.concat(F.lit("p"), (F.col("vec_id") % 2).cast("string")),
                F.concat(F.lit("l"), (F.col("label") % 3).cast("string")))
        .alias("tags"),
        (F.col("vec_id") % 3).alias("parity"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_payload_index(spark, base, "vecs", "tags", n_val_buckets=16)
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = query_api.search_points(spark, base, "vecs", qdf, flt=_ARR_FLT,
                                  k=10, use_payload_index="always")
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "pipe_token_shards",
    # shard = floor(tokens_before / 20000) in doc_id order; the oracle's
    # single global cumsum equals the distributed two-phase prefix sum.
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                              x -> length(x) > 0)) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(FLOOR((cum - n_tokens) / 20000.0) AS BIGINT) AS shard
FROM c
""",
)
def q_pipe_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sharding (the uniform-shard packing step before
    tokenizer/loader handoff): each doc's shard is floor(tokens-before-it
    / budget) in id order — computed as a DISTRIBUTED prefix sum
    (contiguous deterministic id ranges cumsum locally; only the
    range-total offsets touch the driver), not the single-task global
    window the naive ``SUM() OVER (ORDER BY id)`` collapses into.  The
    oracle's global cumsum must agree exactly."""
    from .operators.sampling import pack_token_shards  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(ws_tokens(F.col("text"))).cast("long").alias("n_tokens"))
    out = pack_token_shards(t, "doc_id", "n_tokens", budget=20_000,
                            n_ranges=32)
    return out.select("doc_id", "n_tokens", "shard")


# ---------------------------------------------------------------------------
# round 7: filtered search composed WITH the ANN artifact, nested payload
# keys + NestedCondition, GeoPolygon, multivector max-sim — the remaining
# delegated-surface tail (VERDICT r6 "What's missing" #1-4).
# ---------------------------------------------------------------------------

from .operators.filters import GeoPolygon, NestedCondition  # noqa: E402

_FIS_FLT = Filter(must=[MatchAny("grp", ["g0", "g1"]),
                        Range("parity", lte=1)])


@register(
    "store_filtered_indexed_search",
    # the composed plan at full probe is oracle-able: payload-index ids
    # (grp indexed; parity residual on the bucket-pruned fetch) semi-join
    # INSIDE the probed list partitions of the stored IVF artifact, and
    # with every list probed the answer equals the exact filtered kNN.
    oracle=f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding,
         'g' || CAST(label % 4 AS VARCHAR) AS grp,
         vec_id % 3 AS parity
  FROM embeddings
),
flt AS (SELECT * FROM corpus WHERE {_FIS_FLT.to_sql()}),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT q.qid, f.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(f.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(f.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, flt f
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_filtered_indexed_search(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Filtered search COMPOSED with the persisted ANN index — the
    Qdrant filtered-HNSW twin for this store (filters evaluated inside
    the index walk; here: inside the probed partitions).  The filter
    resolves through the payload index (``grp`` posting probe; the
    unindexed ``parity`` range evaluates residually on the id-bucket-
    pruned fetch), and the surviving ids semi-join INSIDE the probed
    ``list_id`` partitions of the stored IVF artifact — payload pruning
    AND list pruning in ONE plan (plan-asserted in tests/test_index.py).
    At full probe the composition is exact, which the oracle
    hash-checks."""
    from .operators import query_api  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "fidx")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        F.concat(F.lit("g"), (F.col("label") % 4).cast("string")).alias("grp"),
        (F.col("vec_id") % 3).alias("parity"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_payload_index(spark, base, "vecs", "grp", n_val_buckets=16)
    index.build_vector_index(spark, base, "vecs", kind="ivf",
                             n_lists=8, iters=4)
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = query_api.search_points(spark, base, "vecs", qdf, flt=_FIS_FLT,
                                  k=10, use_index="always", n_probe=None,
                                  use_payload_index="always")
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_bq_filtered_indexed",
    # round 10: the composed filtered search THROUGH the binary-
    # quantization artifact — payload-index candidate ids semi-join
    # inside the probed list partitions of the packed-sign-bit layout,
    # the Hamming coarse stage ranks only the survivors, and the exact
    # rescore recovers the metric; at full probe with a covering rerank
    # the composition equals the exact filtered kNN (hash-checked).
    oracle=f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding,
         'g' || CAST(label % 4 AS VARCHAR) AS grp,
         vec_id % 3 AS parity
  FROM embeddings
),
flt AS (SELECT * FROM corpus WHERE {_FIS_FLT.to_sql()}),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT q.qid, f.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(f.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(f.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, flt f
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_bq_filtered_indexed(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Filtered search composed with the BINARY-quantization artifact
    (round 10): the filter's candidates semi-join INSIDE the probed
    list partitions of the packed sign-word layout, Hamming ranks only
    the survivors (integer codegen over 32x-compressed codes), and the
    bucket-pruned exact rescore recovers cosine — payload pruning, list
    pruning and the 32x artifact compression in ONE plan.  Full probe +
    covering rerank == the exact filtered kNN."""
    from .operators import query_api  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "bqfidx")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        F.concat(F.lit("g"), (F.col("label") % 4).cast("string")).alias("grp"),
        (F.col("vec_id") % 3).alias("parity"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_payload_index(spark, base, "vecs", "grp", n_val_buckets=16)
    index.build_vector_index(spark, base, "vecs", kind="ivf_bq",
                             n_lists=8, iters=4)
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = query_api.search_points(spark, base, "vecs", qdf, flt=_FIS_FLT,
                                  k=10, use_index="always", n_probe=None,
                                  use_payload_index="always",
                                  rerank_factor=1000)
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


_NESTED_FLT = Filter(
    must=[MatchValue("meta.lang", "en"),
          Range("meta.n_chars", gte=150),
          NestedCondition("props", Filter(
              must=[MatchValue("kind", "src"), Range("num", gte=2)]))])


@register(
    "api_filter_nested",
    # dotted struct paths + Qdrant NestedCondition (SAME-element
    # semantics over an array of structs); the oracle embeds the literal
    # compiled filter — struct dot access and filter(l, _e -> ...) are
    # the dialect subset both engines share.
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         {{'lang': lang, 'n_chars': n_chars}} AS meta,
         [{{'kind': 'src', 'num': doc_id % 5}},
          {{'kind': 'len', 'num': n_chars % 7}}] AS props
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(SUM(meta.n_chars) AS BIGINT) AS total_chars
FROM t WHERE {_NESTED_FLT.to_sql()}
""",
)
def q_api_filter_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested payload keys (Qdrant's ``key.subkey`` addressing over the
    reference's nested-JSON payloads, qdrant_embedder.py:119-128) plus
    NestedCondition: the dotted path compiles to struct field access and
    the nested filter to a shared higher-order ``filter(arr, _e -> ...)``
    — ONE element must satisfy kind='src' AND num>=2 TOGETHER (a flat
    array_contains conjunction would also accept cross-element matches).
    The oracle runs the literal compiled string over the same derived
    structs."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang",
        F.struct(F.col("lang"), F.col("n_chars")).alias("meta"),
        F.array(
            F.struct(F.lit("src").alias("kind"),
                     (F.col("doc_id") % 5).alias("num")),
            F.struct(F.lit("len").alias("kind"),
                     (F.col("n_chars") % 7).alias("num"))).alias("props"))
    return (t.filter(_NESTED_FLT.to_column())
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.min("doc_id").cast("long").alias("min_doc"),
                 F.sum(F.col("meta.n_chars")).cast("long")
                 .alias("total_chars")))


_POLY_FLT = Filter(must=[GeoPolygon(
    "lat", "lon",
    exterior=[(0.0, -30.0), (35.0, -10.0), (45.0, 25.0),
              (10.0, 45.0), (-15.0, 10.0)],
    interiors=[[(5.0, -5.0), (20.0, -5.0), (20.0, 15.0), (5.0, 15.0)]])])


@register(
    "api_geo_polygon",
    oracle=f"""
WITH pts AS (
  SELECT o_orderkey,
         (o_orderkey % 17000) / 100.0 - 85.0 AS lat,
         ((o_orderkey * 13 + o_custkey) % 36000) / 100.0 - 180.0 AS lon,
         o_orderpriority
  FROM orders
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key
FROM pts
WHERE {_POLY_FLT.to_sql()}
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def q_api_geo_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo polygon filter (Qdrant GeoPolygon, the third geo leaf next to
    GeoBoundingBox/GeoRadius): a 5-vertex exterior ring with a
    rectangular hole, compiled to a PUSHED bounding-box pre-filter plus
    a constant-slope ray-cast parity test — pure shared-dialect
    arithmetic, no division by column expressions.  Same deterministic
    point derivation as api_geo_search; the oracle embeds the literal
    compiled filter."""
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        "o_orderkey",
        ((F.col("o_orderkey") % 17000) / 100.0 - 85.0).alias("lat"),
        (((F.col("o_orderkey") * 13 + F.col("o_custkey")) % 36000) / 100.0
         - 180.0).alias("lon"),
        "o_orderpriority")
    return (pts.filter(_POLY_FLT.to_column())
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).cast("long").alias("n_points"),
                 F.min("o_orderkey").cast("long").alias("min_key"))
            .orderBy("o_orderpriority"))


@register(
    "knn_multivector_maxsim",
    # ColBERT late interaction: per (query, point), each of the query's 4
    # token vectors takes its best match over the point's 4 vectors, the
    # maxima sum.  Tokens derive by slicing the 64-d fixture embedding
    # into 4 × 16-d, so both engines score identical multivectors.
    oracle="""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3),
qtok AS (
  SELECT vec_id AS qid, 1 AS ti, embedding[1:16] AS qv FROM q
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM q
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM q
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM q
),
ptok AS (
  SELECT vec_id, 1 AS pj, embedding[1:16] AS pv FROM embeddings
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM embeddings
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM embeddings
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM embeddings
),
best AS (
  SELECT qt.qid, pt.vec_id, qt.ti,
         MAX((SELECT SUM(a*b)
              FROM (SELECT unnest(qt.qv)::DOUBLE AS a,
                           unnest(pt.pv)::DOUBLE AS b))) AS m
  FROM qtok qt, ptok pt
  WHERE qt.qid <> pt.vec_id
  GROUP BY qt.qid, pt.vec_id, qt.ti
),
scored AS (
  SELECT qid, vec_id, round(SUM(m), 6) AS sim
  FROM best GROUP BY qid, vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM scored)
WHERE rank <= 10
""",
)
def q_knn_multivector_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivector spaces with MaxSim scoring (the modern Qdrant
    multivector collection config; ColBERT late interaction): every
    point carries a LIST of vectors, and score = Σ over query tokens of
    the best match among the point's vectors — computed entirely in
    nested higher-order array expressions (JVM codegen, broadcast
    queries, no corpus shuffle: the exact-kNN plan shape with a
    two-level fold)."""
    emb = load_table(spark, sf_dir, "embeddings")

    def mv(df):
        return df.select(
            F.col("vec_id"),
            F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                      for i in range(4)]).alias("vectors"))

    q = mv(emb.filter(F.col("vec_id") < 3)).withColumnRenamed(
        "vec_id", "qid").withColumnRenamed("vectors", "qvecs")
    out = knn.knn_join_maxsim(q, mv(emb), k=10, metric="dot",
                              exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "store_multivector_search",
    # identical scoring contract to knn_multivector_maxsim, but through
    # the STORED collection: the space is DECLARED multivector in the
    # collection meta and search_collection dispatches to max-sim off
    # that declaration — the Qdrant multivector collection config.
    oracle="""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3),
qtok AS (
  SELECT vec_id AS qid, 1 AS ti, embedding[1:16] AS qv FROM q
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM q
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM q
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM q
),
ptok AS (
  SELECT vec_id, 1 AS pj, embedding[1:16] AS pv FROM embeddings
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM embeddings
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM embeddings
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM embeddings
),
best AS (
  SELECT qt.qid, pt.vec_id, qt.ti,
         MAX((SELECT SUM(a*b)
              FROM (SELECT unnest(qt.qv)::DOUBLE AS a,
                           unnest(pt.pv)::DOUBLE AS b))) AS m
  FROM qtok qt, ptok pt
  WHERE qt.qid <> pt.vec_id
  GROUP BY qt.qid, pt.vec_id, qt.ti
),
scored AS (
  SELECT qid, vec_id, round(SUM(m), 6) AS sim
  FROM best GROUP BY qid, vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM scored)
WHERE rank <= 10
""",
)
def q_store_multivector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A MULTIVECTOR space declared in the collection config (the Qdrant
    ``vectors_config={"colbert": VectorParams(..., multivector_config=
    MultiVectorConfig(comparator=MAX_SIM))}`` model): points store a
    LIST of 16-d vectors, and ``search_collection`` dispatches to
    max-sim late interaction off the declaration — the caller never
    names the comparator.  update_vectors validates per-token dims on
    such spaces (tests/test_store_lifecycle.py)."""
    base = _tmp_base(sf_dir, "mvstore")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"colbert": {"size": 16, "distance": "dot",
                                   "multivector": "max_sim"}})
    q = pts.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("colbert").alias("qvecs"))
    out = knn.search_collection(spark, base, "vecs", q, k=10,
                                corpus_id="id", query_vec="qvecs",
                                exclude_self=True)
    return out.select(F.col("qid").cast("long").alias("qid"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_delete_vectors",
    # final state after the three removal ops (run through the batch
    # sequencer): ids 5-9 lose the vector, 10-14 lose the grp payload,
    # 20-21 clear every payload; everything else intact.
    oracle="""
SELECT vec_id AS id,
       (vec_id < 5 OR vec_id > 9) AS has_vec,
       CASE WHEN vec_id BETWEEN 10 AND 14 OR vec_id IN (20, 21)
            THEN NULL ELSE CAST(label AS BIGINT) END AS grp
FROM embeddings WHERE vec_id < 30
ORDER BY id
""",
)
def q_store_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant's point-mutation removal ops — ``delete_vectors`` (null a
    named space; the point survives and drops out of kNN),
    ``delete_payload`` (null payload keys; vectors survive) and
    ``clear_payload`` — applied IN ORDER through ``batch_update_points``
    (the Qdrant batch op kinds).  Each is a bucket-pruned typed-NULL
    patch through the same update_columns path as set_payload, feeding
    the delta log so index refreshes mask the removed entries."""
    base = _tmp_base(sf_dir, "delvec")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 30).select(
            F.col("vec_id").alias("id"), "embedding",
            F.col("label").cast("long").alias("grp")),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    upsert.batch_update_points(spark, base, "vecs", [
        ("delete_vectors", (list(range(5, 10)), ["embedding"])),
        ("delete_payload", (list(range(10, 15)), ["grp"])),
        ("clear_payload", [20, 21]),
    ])
    return (upsert.read_collection(spark, base, "vecs")
            .select(F.col("id").cast("long").alias("id"),
                    F.col("embedding").isNotNull().alias("has_vec"),
                    F.col("grp"))
            .orderBy("id"))


_WP_FLT = Filter(must=[Range("n", gte=40)])


@register(
    "api_search_with_payload",
    # filtered kNN with the hits' payload attached (Qdrant with_payload):
    # the payload fetch is id-bucket pruned, never a second scan.
    oracle=f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding,
         'g' || CAST(label % 3 AS VARCHAR) AS grp,
         vec_id % 97 AS n
  FROM embeddings WHERE vec_id < 300
),
flt AS (SELECT * FROM corpus WHERE {_WP_FLT.to_sql()}),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT q.qid, f.id AS vec_id, f.grp, f.n,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(f.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(f.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, flt f
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank, grp, n
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 8
""",
)
def q_api_search_with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``with_payload``: the filtered search returns each hit WITH
    its payload columns — attached by a second id-bucket-pruned fetch of
    exactly the k·|queries| hit ids (``attach_payload``), never a second
    collection scan; the oracle joins the same payload in SQL."""
    from .operators import query_api  # noqa: PLC0415

    base = _tmp_base(sf_dir, "wpay")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.filter(F.col("vec_id") < 300).select(
        F.col("vec_id").alias("id"), "embedding",
        F.concat(F.lit("g"), (F.col("label") % 3).cast("string"))
        .alias("grp"),
        (F.col("vec_id") % 97).alias("n"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = query_api.search_points(spark, base, "vecs", qdf, flt=_WP_FLT,
                                  k=8, with_payload=["grp", "n"])
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"),
                      "grp", F.col("n").cast("long").alias("n"))


_SPF_FLT = Filter(must=[MatchValue("parity", 1)])


@register(
    "api_sparse_filtered",
    # filtered SPARSE search: the payload-index candidate ids semi-join
    # the probed posting lists of the persisted sparse index — payload
    # pruning AND dimension pruning in one plan (the sparse twin of
    # store_filtered_indexed_search); the oracle restricts the corpus by
    # the LITERAL compiled filter over the same derived parity.
    oracle=f"""
WITH toks AS (
  SELECT doc_id AS id, unnest({DUCK_WS_TOKENS.format(t='lower(text)')}) AS tok
  FROM documents
),
post AS (
  SELECT id, ({DUCK_POLY_HASH.format(t='tok')}) % 512 AS idx,
         CAST(COUNT(*) AS DOUBLE) AS val
  FROM toks GROUP BY id, idx
),
flt AS (
  SELECT id FROM (SELECT DISTINCT id, id % 3 AS parity FROM post)
  WHERE {_SPF_FLT.to_sql()}
),
q AS (SELECT id AS qid, idx, val AS qval FROM post WHERE id < 3),
pairs AS (
  SELECT q.qid, p.id AS vec_id, round(SUM(p.val * q.qval), 6) AS sim
  FROM post p JOIN q ON p.idx = q.idx
  WHERE q.qid <> p.id AND p.id IN (SELECT id FROM flt)
  GROUP BY q.qid, p.id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_api_sparse_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED sparse search (Qdrant query_filter on a sparse space):
    the filter resolves through the payload index (parity is indexed) and
    the candidate ids semi-join INSIDE the probed posting lists of the
    persisted sparse index — payload AND dimension pruning in one plan,
    the sparse twin of the dense composed search."""
    from .operators.query_api import search_sparse_points  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415
    from .operators.sparse import (  # noqa: PLC0415
        build_sparse_index,
        postings_from_text,
    )

    base = _tmp_base(sf_dir, "sparseflt")
    docs = load_table(spark, sf_dir, "documents")
    post = postings_from_text(docs, id_col="doc_id", text_col="text",
                              vocab_size=512)
    pts = (post.groupBy("id")
           .agg(F.array_sort(F.collect_list(F.struct("idx", "val")))
                .alias("z"))
           .select("id",
                   F.col("z.idx").alias("indices"),
                   F.col("z.val").alias("values"),
                   (F.col("id") % 3).alias("parity")))
    upsert.create_collection(
        spark, base, "sp", df=pts, id_col="id", n_buckets=8,
        vector_config={"text_sparse": {"kind": "sparse", "distance": "dot"}})
    build_payload_index(spark, base, "sp", "parity", n_val_buckets=8)
    build_sparse_index(spark, base, "sp", n_dim_buckets=16)
    qpost = post.filter(F.col("id") < 3)
    out = search_sparse_points(spark, base, "sp", qpost, flt=_SPF_FLT,
                               k=10, use_payload_index="always",
                               exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


_TXT_FLT = Filter(must=[MatchAny("lang", ["en", "de"])])


@register(
    "api_text_filtered",
    # filtered BM25 over the stored posting index: the payload-index
    # candidate ids semi-join the probed term buckets while IDF/avgdl
    # stay CORPUS-GLOBAL (a filter narrows candidates, not term rarity);
    # the oracle embeds the literal compiled filter and restricts only
    # the scored docs, never dfreq/stats.
    oracle=rf"""
WITH toks AS (
  SELECT doc_id AS id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
lens AS (SELECT id, len(toks) AS len FROM toks),
stats AS (SELECT COUNT(*) AS n, AVG(len) AS avgdl FROM lens),
flt AS (SELECT doc_id AS id FROM documents WHERE {_TXT_FLT.to_sql()}),
posting AS (
  SELECT id, term, COUNT(*) AS tf
  FROM (SELECT id, unnest(toks) AS term FROM toks)
  WHERE term IN ('vector', 'join', 'stream')
  GROUP BY id, term
),
dfreq AS (SELECT term, COUNT(DISTINCT id) AS df FROM posting GROUP BY term),
scored AS (
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
  WHERE p.id IN (SELECT id FROM flt)
  GROUP BY p.id
)
SELECT id, score, CAST(row_number() OVER (ORDER BY score DESC, id) AS BIGINT)
       AS rank
FROM scored ORDER BY score DESC, id LIMIT 10
""",
)
def q_api_text_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED full-text search: BM25 over the persisted term-bucketed
    posting index with a payload filter — the lang candidates resolve
    through the payload index and semi-join the probed term buckets
    (term pruning AND payload pruning in one plan), while IDF and avgdl
    stay corpus-global, the standard filtered-BM25 semantics."""
    from .operators.payload_index import build_payload_index  # noqa: PLC0415
    from .operators.query_api import search_text_points  # noqa: PLC0415
    from .operators.text_search import build_text_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "txtflt")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.select(F.col("doc_id").alias("id"), "text", "lang"))
    build_payload_index(spark, base, "docs", "lang", n_val_buckets=8)
    build_text_index(spark, base, "docs", text_col="text",
                     n_term_buckets=16)
    out = search_text_points(spark, base, "docs",
                             ["vector", "join", "stream"], flt=_TXT_FLT,
                             k=10, text_col="text",
                             use_payload_index="always")
    return out.select("id", "score", F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# round 8: typed RANGE payload index (Range/DatetimeRange leaves resolve to
# candidate ids and compose with the ANN artifact), multivector ANN artifact,
# with_vectors, nested element index, cursor-returning scroll — the VERDICT
# r7 "Next round" list.
# ---------------------------------------------------------------------------

_RI_FLT = Filter(must=[Range("score", gte=12.0, lt=61.0)])


@register(
    "api_range_indexed",
    # a Range-ONLY filter resolved through the typed range payload index
    # (use_payload_index='always' — round 7 would have raised here): the
    # bounds become a contiguous val_bucket partition window + exact typed
    # comparisons, the candidate ids fetch bucket-pruned, and the kNN
    # scores only them.  The oracle applies the LITERAL compiled filter.
    oracle=f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding,
         CAST((vec_id * 7) % 100 AS DOUBLE) / 1.0 AS score
  FROM embeddings
),
flt AS (SELECT * FROM corpus WHERE {_RI_FLT.to_sql()}),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT q.qid, f.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(f.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(f.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, flt f
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_api_range_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered search whose ONLY must leaf is a ``Range`` — the Qdrant
    float/integer payload index model (VERDICT r7 missing #1): the
    value-ordered range index turns the bounds into a pruned posting
    probe, so a range predicate (timestamps, lengths, scores — the most
    common filter in a real pipeline) gets the same candidate path an
    equality leaf does instead of a full scan."""
    from .operators import query_api  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "rangeidx")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        ((F.col("vec_id") * 7) % 100).cast("double").alias("score"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_payload_index(spark, base, "vecs", "score", n_val_buckets=16,
                        index_type="range")
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = query_api.search_points(spark, base, "vecs", qdf, flt=_RI_FLT,
                                  k=10, use_payload_index="always")
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


_DTI_FLT = Filter(must=[DatetimeRange("ts", gte="2024-02-01 00:00:00",
                                      lt="2024-03-15 00:00:00")])


@register(
    "api_datetime_range_indexed",
    # DatetimeRange through the range index (timestamps bucket by their
    # epoch image), driving a faceted aggregate: candidates resolve from
    # the index, the facet groups only the fetched rows.
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         TIMESTAMP '2024-01-01 00:00:00'
           + (doc_id % 90) * INTERVAL '1 day' AS ts
  FROM documents
)
SELECT lang AS value, CAST(COUNT(*) AS BIGINT) AS count
FROM t WHERE {_DTI_FLT.to_sql()}
GROUP BY lang ORDER BY count DESC, value LIMIT 10
""",
)
def q_api_datetime_range_indexed(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Facet under a DatetimeRange-only filter resolved through the RANGE
    payload index — Qdrant's datetime payload index type: the timestamp
    bounds cast to the same epoch image the build bucketed by, the probe
    reads only the spanned value buckets, and the facet aggregates just
    the fetched candidates."""
    from .operators import query_api  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "dtidx")
    docs = load_table(spark, sf_dir, "documents")
    pts = docs.select(
        F.col("doc_id").alias("id"), "lang",
        F.timestamp_add(
            "DAY", (F.col("doc_id") % 90).cast("int"),
            F.lit("2024-01-01 00:00:00").cast("timestamp")).alias("ts"))
    upsert.create_collection(spark, base, "docs", df=pts, id_col="id",
                             n_buckets=8)
    build_payload_index(spark, base, "docs", "ts", n_val_buckets=16,
                        index_type="range")
    return query_api.facet_values(
        spark, base, "docs", "lang", flt=_DTI_FLT, limit=10,
        use_payload_index="always") \
        .select("value", F.col("count").cast("long").alias("count"))


_RIX_FLT = Filter(must=[Range("score", gte=20.0, lt=80.0)])


@register(
    "store_range_indexed_search",
    # the composed filtered-indexed search with a RANGE driving leaf:
    # range-index candidate ids semi-join INSIDE the probed list
    # partitions of the IVF artifact; at full probe the answer equals the
    # exact filtered kNN (hash-checked).
    oracle=f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding,
         CAST(vec_id % 100 AS DOUBLE) AS score
  FROM embeddings
),
flt AS (SELECT * FROM corpus WHERE {_RIX_FLT.to_sql()}),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT q.qid, f.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(f.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(f.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, flt f
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_range_indexed_search(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """``store_filtered_indexed_search`` with a Range (not equality)
    DRIVING leaf: round 7's composed search declined Range-only filters
    entirely (``filter_match_ids`` returned None); the typed range index
    gives them the same two-prunings-one-plan path."""
    from .operators import query_api  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "ridx")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        (F.col("vec_id") % 100).cast("double").alias("score"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_payload_index(spark, base, "vecs", "score", n_val_buckets=16,
                        index_type="range")
    index.build_vector_index(spark, base, "vecs", kind="ivf",
                             n_lists=8, iters=4)
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = query_api.search_points(spark, base, "vecs", qdf, flt=_RIX_FLT,
                                  k=10, use_index="always", n_probe=None,
                                  use_payload_index="always")
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_multivector_indexed",
    # the ivf_mv artifact at full probe + covering rerank: coarse IVF over
    # mean-pooled tokens generates candidates, exact max-sim rescores —
    # with every list probed and the rerank covering the corpus the answer
    # equals the exact late-interaction scan (hash-checked).
    oracle="""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3),
qtok AS (
  SELECT vec_id AS qid, 1 AS ti, embedding[1:16] AS qv FROM q
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM q
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM q
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM q
),
ptok AS (
  SELECT vec_id, 1 AS pj, embedding[1:16] AS pv FROM embeddings
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM embeddings
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM embeddings
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM embeddings
),
best AS (
  SELECT qt.qid, pt.vec_id, qt.ti,
         MAX((SELECT SUM(a*b)
              FROM (SELECT unnest(qt.qv)::DOUBLE AS a,
                           unnest(pt.pv)::DOUBLE AS b))) AS m
  FROM qtok qt, ptok pt
  WHERE qt.qid <> pt.vec_id
  GROUP BY qt.qid, pt.vec_id, qt.ti
),
scored AS (
  SELECT qid, vec_id, round(SUM(m), 6) AS sim
  FROM best GROUP BY qid, vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM scored)
WHERE rank <= 10
""",
)
def q_store_multivector_indexed(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The MULTIVECTOR ANN artifact (VERDICT r7 missing #2 — Qdrant
    builds HNSW over multivectors; round 7's max-sim was always a full
    scan): ``build_vector_index(kind='ivf_mv')`` clusters the MEAN-POOLED
    token vectors into IVF lists, a search probes lists by the pooled
    query (static ``list_id`` pruning), ranks candidates on the stored
    pooled vectors, and max-sim-rescores ``rerank_factor*k`` of them
    through the bucket-pruned collection fetch — the same
    artifact/refresh/mask scaffold as every other kind.  rerank 1000·k
    covers both gate corpora, so full probe is EXACT here."""
    base = _tmp_base(sf_dir, "mvidx")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"colbert": {"size": 16, "distance": "dot",
                                   "multivector": "max_sim"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_mv",
                             n_lists=8, iters=4)
    q = pts.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("colbert").alias("qvecs"))
    out = index.search_indexed(spark, base, "vecs", q, k=10, n_probe=None,
                               query_vec="qvecs", rerank_factor=1000,
                               exclude_self=True)
    return out.select(F.col("qid").cast("long").alias("qid"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_mv_indexed_sq",
    # round 9 (VERDICT r8 missing #3): the QUANTIZED multivector artifact
    # — ivf_mv_sq stores int8 scalar-quantized POOLED codes (4-8x smaller
    # than the pooled floats; the memory path a 100 TB ColBERT corpus
    # needs).  The coarse stage scores the DEQUANTIZED codes, the max-sim
    # rescore stays exact on the collection's token lists — so full probe
    # + covering rerank equals the exact late-interaction scan even
    # though the artifact never held a float: quantization error can
    # only reorder CANDIDATES, and a covering rerank keeps them all.
    oracle="""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3),
qtok AS (
  SELECT vec_id AS qid, 1 AS ti, embedding[1:16] AS qv FROM q
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM q
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM q
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM q
),
ptok AS (
  SELECT vec_id, 1 AS pj, embedding[1:16] AS pv FROM embeddings
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM embeddings
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM embeddings
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM embeddings
),
best AS (
  SELECT qt.qid, pt.vec_id, qt.ti,
         MAX((SELECT SUM(a*b)
              FROM (SELECT unnest(qt.qv)::DOUBLE AS a,
                           unnest(pt.pv)::DOUBLE AS b))) AS m
  FROM qtok qt, ptok pt
  WHERE qt.qid <> pt.vec_id
  GROUP BY qt.qid, pt.vec_id, qt.ti
),
scored AS (
  SELECT qid, vec_id, round(SUM(m), 6) AS sim
  FROM best GROUP BY qid, vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM scored)
WHERE rank <= 10
""",
)
def q_store_mv_indexed_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized multivector ANN: ``kind='ivf_mv_sq'`` clusters the
    mean-pooled tokens AND scalar-quantizes them to int8 codes; a search
    probes lists by the pooled query, ranks candidates on dequantized
    codes (pure codegen) and max-sim-rescores through the bucket-pruned
    fetch — same artifact/refresh/mask scaffold, 4-8x less artifact IO.
    rerank 1000·k covers both gate corpora, so full probe is EXACT."""
    base = _tmp_base(sf_dir, "mvsq")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"colbert": {"size": 16, "distance": "dot",
                                   "multivector": "max_sim"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_mv_sq",
                             n_lists=8, iters=4)
    q = pts.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("colbert").alias("qvecs"))
    out = index.search_indexed(spark, base, "vecs", q, k=10, n_probe=None,
                               query_vec="qvecs", rerank_factor=1000,
                               exclude_self=True)
    return out.select(F.col("qid").cast("long").alias("qid"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_mv_indexed_bq",
    # round 10: the BINARY multivector artifact — ivf_mv_bq packs the
    # POOLED tokens' sign bits (32x smaller than the pooled floats, the
    # cheapest mv artifact); the coarse stage ranks Hamming over the
    # packed pooled query, the max-sim rescore stays exact on the
    # collection's token lists — full probe + covering rerank equals the
    # exact late-interaction scan (sign error can only reorder
    # CANDIDATES, and a covering rerank keeps them all).
    oracle="""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3),
qtok AS (
  SELECT vec_id AS qid, 1 AS ti, embedding[1:16] AS qv FROM q
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM q
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM q
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM q
),
ptok AS (
  SELECT vec_id, 1 AS pj, embedding[1:16] AS pv FROM embeddings
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM embeddings
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM embeddings
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM embeddings
),
best AS (
  SELECT qt.qid, pt.vec_id, qt.ti,
         MAX((SELECT SUM(a*b)
              FROM (SELECT unnest(qt.qv)::DOUBLE AS a,
                           unnest(pt.pv)::DOUBLE AS b))) AS m
  FROM qtok qt, ptok pt
  WHERE qt.qid <> pt.vec_id
  GROUP BY qt.qid, pt.vec_id, qt.ti
),
scored AS (
  SELECT qid, vec_id, round(SUM(m), 6) AS sim
  FROM best GROUP BY qid, vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM scored)
WHERE rank <= 10
""",
)
def q_store_mv_indexed_bq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary multivector ANN: ``kind='ivf_mv_bq'`` clusters the
    mean-pooled tokens and packs their SIGN BITS (32x smaller artifact);
    a search probes lists by the pooled query, ranks candidates by
    packed-word Hamming (integer codegen) and max-sim-rescores through
    the bucket-pruned fetch — same artifact/refresh/mask scaffold.
    rerank 1000·k covers both gate corpora, so full probe is EXACT."""
    base = _tmp_base(sf_dir, "mvbq")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"colbert": {"size": 16, "distance": "dot",
                                   "multivector": "max_sim"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_mv_bq",
                             n_lists=8, iters=4)
    q = pts.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("colbert").alias("qvecs"))
    out = index.search_indexed(spark, base, "vecs", q, k=10, n_probe=None,
                               query_vec="qvecs", rerank_factor=1000,
                               exclude_self=True)
    return out.select(F.col("qid").cast("long").alias("qid"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_mv_indexed_pq",
    # round 9: the PQ multivector artifact — pooled PQ codes (m bytes a
    # point, the smallest mv artifact), ADC coarse stage, exact max-sim
    # rescore; full probe + covering rerank == the exact scan (the
    # covering rerank keeps every ADC candidate, so code error cannot
    # drop a true neighbor).
    oracle="""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3),
qtok AS (
  SELECT vec_id AS qid, 1 AS ti, embedding[1:16] AS qv FROM q
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM q
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM q
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM q
),
ptok AS (
  SELECT vec_id, 1 AS pj, embedding[1:16] AS pv FROM embeddings
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM embeddings
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM embeddings
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM embeddings
),
best AS (
  SELECT qt.qid, pt.vec_id, qt.ti,
         MAX((SELECT SUM(a*b)
              FROM (SELECT unnest(qt.qv)::DOUBLE AS a,
                           unnest(pt.pv)::DOUBLE AS b))) AS m
  FROM qtok qt, ptok pt
  WHERE qt.qid <> pt.vec_id
  GROUP BY qt.qid, pt.vec_id, qt.ti
),
scored AS (
  SELECT qid, vec_id, round(SUM(m), 6) AS sim
  FROM best GROUP BY qid, vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM scored)
WHERE rank <= 10
""",
)
def q_store_mv_indexed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-coded multivector ANN: ``kind='ivf_mv_pq'`` clusters the
    mean-pooled tokens and product-quantizes them (codebooks persisted
    like the dense ivf_pq); a search probes lists by the pooled query,
    ranks candidates by ADC over the codes and max-sim-rescores through
    the bucket-pruned fetch.  rerank 1000*k covers both gate corpora, so
    full probe is EXACT."""
    base = _tmp_base(sf_dir, "mvpq")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"colbert": {"size": 16, "distance": "dot",
                                   "multivector": "max_sim"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_mv_pq",
                             n_lists=8, m=8, ksub=16, iters=4)
    q = pts.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("colbert").alias("qvecs"))
    out = index.search_indexed(spark, base, "vecs", q, k=10, n_probe=None,
                               query_vec="qvecs", rerank_factor=1000,
                               exclude_self=True)
    return out.select(F.col("qid").cast("long").alias("qid"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_tenant_mv_indexed",
    # round 9 (VERDICT r8 missing #3, tenant half): tenant t1's OWN
    # multivector artifact over its partition subtree — the scoped search
    # dispatches to it and at full probe + covering rerank equals exactly
    # that tenant's late-interaction kNN.
    oracle="""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings WHERE (label % 3) = 1
),
q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3),
qtok AS (
  SELECT vec_id AS qid, 1 AS ti, embedding[1:16] AS qv FROM q
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM q
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM q
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM q
),
ptok AS (
  SELECT vec_id, 1 AS pj, embedding[1:16] AS pv FROM corpus
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM corpus
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM corpus
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM corpus
),
best AS (
  SELECT qt.qid, pt.vec_id, qt.ti,
         MAX((SELECT SUM(a*b)
              FROM (SELECT unnest(qt.qv)::DOUBLE AS a,
                           unnest(pt.pv)::DOUBLE AS b))) AS m
  FROM qtok qt, ptok pt
  GROUP BY qt.qid, pt.vec_id, qt.ti
),
scored AS (
  SELECT qid, vec_id, round(SUM(m), 6) AS sim
  FROM best GROUP BY qid, vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM scored)
WHERE rank <= 10
""",
)
def q_store_tenant_mv_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tenant MULTIVECTOR index: tenant t1's ColBERT corpus gets its
    own pooled-IVF artifact (build_vector_index(kind='ivf_mv',
    tenant='t1')); search_collection(tenant='t1', use_index='always')
    dispatches to it, the rescore fetch prunes the tenant subtree, and
    other tenants' token lists never enter the artifact."""
    base = _tmp_base(sf_dir, "mvtenant")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"),
        F.concat(F.lit("t"), (F.col("label") % 3).cast("string"))
        .alias("tenant"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        tenant_col="tenant",
        vector_config={"colbert": {"size": 16, "distance": "dot",
                                   "multivector": "max_sim"}})
    index.build_vector_index(spark, base, "vecs", kind="ivf_mv",
                             n_lists=4, iters=4, tenant="t1")
    q = pts.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("colbert").alias("qvecs"))
    out = knn.search_collection(spark, base, "vecs", q, k=10,
                                corpus_id="id", query_vec="qvecs",
                                exclude_self=False, tenant="t1",
                                use_index="always", n_probe=None,
                                rerank_factor=1000)
    return out.select(F.col("qid").cast("long").alias("qid"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "store_mv_filtered_indexed",
    # the LAST cell of the composition matrix: a payload filter composed
    # with the MULTIVECTOR artifact — candidate ids semi-join inside the
    # probed pooled lists, max-sim rescores only survivors; full probe +
    # covering rerank == the exact filtered late-interaction scan.
    oracle="""
WITH corpus AS (
  SELECT vec_id, embedding,
         'g' || CAST(vec_id % 4 AS VARCHAR) AS grp
  FROM embeddings
),
flt AS (SELECT * FROM corpus WHERE grp IN ('g0', 'g1')),
q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3),
qtok AS (
  SELECT vec_id AS qid, 1 AS ti, embedding[1:16] AS qv FROM q
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM q
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM q
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM q
),
ptok AS (
  SELECT vec_id, 1 AS pj, embedding[1:16] AS pv FROM flt
  UNION ALL SELECT vec_id, 2, embedding[17:32] FROM flt
  UNION ALL SELECT vec_id, 3, embedding[33:48] FROM flt
  UNION ALL SELECT vec_id, 4, embedding[49:64] FROM flt
),
best AS (
  SELECT qt.qid, pt.vec_id, qt.ti,
         MAX((SELECT SUM(a*b)
              FROM (SELECT unnest(qt.qv)::DOUBLE AS a,
                           unnest(pt.pv)::DOUBLE AS b))) AS m
  FROM qtok qt, ptok pt
  GROUP BY qt.qid, pt.vec_id, qt.ti
),
scored AS (
  SELECT qid, vec_id, round(SUM(m), 6) AS sim
  FROM best GROUP BY qid, vec_id
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM scored)
WHERE rank <= 10
""",
)
def q_store_mv_filtered_indexed(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Filtered MULTIVECTOR search composed with the ivf_mv artifact —
    the Qdrant filtered-HNSW-over-multivectors twin, closing the
    composition matrix (dense/sparse/BM25/multivector × filtered, all
    index-composed): the payload index resolves the grp filter to
    candidate ids, they semi-join INSIDE the probed pooled lists, and
    the exact max-sim rescore fetches only surviving candidates
    bucket-pruned.  Full probe + rerank 1000·k ⇒ exact vs the filtered
    late-interaction scan (both prunings plan-asserted in
    tests/test_index.py::test_ivf_mv_filtered_search_composes)."""
    from .operators import query_api  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "mvfidx")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.slice(F.col("embedding"), 1 + 16 * i, 16)
                  for i in range(4)]).alias("colbert"),
        F.concat(F.lit("g"), (F.col("vec_id") % 4).cast("string"))
        .alias("grp"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"colbert": {"size": 16, "distance": "dot",
                                   "multivector": "max_sim"}})
    build_payload_index(spark, base, "vecs", "grp", n_val_buckets=16)
    index.build_vector_index(spark, base, "vecs", kind="ivf_mv",
                             n_lists=8, iters=4)
    q = pts.filter(F.col("id") < 3).select(
        F.col("id").alias("qid"), F.col("colbert").alias("qvecs"))
    out = query_api.search_points(
        spark, base, "vecs", q,
        flt=Filter(must=[MatchAny("grp", ["g0", "g1"])]),
        k=10, query_vec="qvecs", use_index="always", n_probe=None,
        rerank_factor=1000, use_payload_index="always")
    return out.select(F.col("qid").cast("long").alias("qid"),
                      F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "api_search_with_vectors",
    # Qdrant with_vectors: the hits come back with the STORED vector data
    # of both declared spaces — the dense column and the sparse space's
    # (indices, values) pair — fetched id-bucket-pruned; the oracle
    # re-derives the same data per hit and renders engine-neutral scalars.
    oracle="""
WITH corpus AS (
  SELECT vec_id AS id, embedding,
         [vec_id % 7, 7 + vec_id % 5] AS indices,
         [1.0 + vec_id % 3, 2.0] AS vals
  FROM embeddings WHERE vec_id < 400
),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT q.qid, c.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS sim,
         round(sqrt((SELECT SUM(b*b)
                     FROM (SELECT unnest(c.embedding)::DOUBLE AS b))), 6)
           AS emb_norm,
         array_to_string(c.indices, ',') AS idx_str,
         round(list_aggregate(list_transform(c.vals, x -> x::DOUBLE),
                              'sum'), 6) AS val_sum
  FROM q, corpus c
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank,
       emb_norm, idx_str, val_sum
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 8
""",
)
def q_api_search_with_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``with_vectors`` (VERDICT r7 missing #3): search returns
    each hit with its STORED vector data attached — with_vectors=True
    covers every declared space, so the dense column comes back next to
    the sparse space's physical (indices, values) pair, all through one
    id-bucket-pruned fetch (``attach_vectors``), never a second scan.
    The attached arrays render to engine-neutral scalars for the hash
    compare (norm / joined indices / value sum)."""
    from .operators import query_api  # noqa: PLC0415

    base = _tmp_base(sf_dir, "wvec")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.filter(F.col("vec_id") < 400).select(
        F.col("vec_id").alias("id"), "embedding",
        F.array((F.col("vec_id") % 7).cast("int"),
                (F.lit(7) + F.col("vec_id") % 5).cast("int"))
        .alias("indices"),
        F.array(F.lit(1.0) + (F.col("vec_id") % 3).cast("double"),
                F.lit(2.0)).alias("values"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"embedding": {"size": 64, "distance": "cosine"},
                       "text_sparse": {"kind": "sparse",
                                       "distance": "dot"}})
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = query_api.search_points(spark, base, "vecs", qdf, k=8,
                                  vector_name="embedding",
                                  with_vectors=True)
    return out.select(
        "qid", F.col("vec_id").cast("long").alias("vec_id"), "sim",
        F.col("rank").cast("long").alias("rank"),
        F.round(vector.l2_norm(F.col("embedding")), 6).alias("emb_norm"),
        F.array_join(F.col("indices").cast("array<string>"), ",")
        .alias("idx_str"),
        F.round(F.aggregate(F.col("values"), F.lit(0.0),
                            lambda a, x: a + x.cast("double")), 6)
        .alias("val_sum"))


@register(
    "api_scroll_pages",
    # three cursor-returned pages hands-free: each next_page_offset is the
    # last row's key; page 3 of the keyset walk equals rows 31-45 of the
    # total order (the oracle's OFFSET is the expected answer, not the
    # plan — the scan prunes at the cursor).
    oracle="""
SELECT doc_id AS id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
WHERE lang IN ('en', 'de')
ORDER BY doc_id LIMIT 15 OFFSET 30
""",
)
def q_api_scroll_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Qdrant scroll loop done with the (points, next_page_offset)
    convention: ``return_cursor=True`` hands back the cursor to pass
    straight into the next call, ``with_payload`` shapes the page — walk
    two pages, return the third.  Each page's cursor inequality pushes
    into the scan, so no page rescans its predecessors."""
    from .operators import query_api  # noqa: PLC0415

    base = _tmp_base(sf_dir, "scrollpg")
    docs = load_table(spark, sf_dir, "documents")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.select(F.col("doc_id").alias("id"), "lang", "n_chars"))
    flt = Filter(must=[MatchAny("lang", ["en", "de"])])
    cursor = None
    for _ in range(2):  # pages 1 and 2 walk; their rows are discarded
        _page, cursor = query_api.scroll_points(
            spark, base, "docs", flt=flt, limit=15, cursor=cursor,
            with_payload=["lang", "n_chars"], return_cursor=True)
    page3 = query_api.scroll_points(
        spark, base, "docs", flt=flt, limit=15, cursor=cursor,
        with_payload=["lang", "n_chars"])
    return page3.select(F.col("id").cast("long").alias("id"), "lang",
                        F.col("n_chars").cast("long").alias("n_chars"))


_NIX_FLT = Filter(must=[NestedCondition("props", Filter(
    must=[MatchValue("kind", "src"), MatchAny("num", [1, 3])]))])


@register(
    "store_nested_filter_indexed",
    # a NestedCondition-ONLY filter resolved from the ELEMENT-LEVEL index
    # (VERDICT r7 missing #4 — round 7 left it residual, pushed-scan
    # only): per-leaf (id, elem_idx) posting sets intersect on the SAME
    # elem_idx, candidates fetch bucket-pruned, kNN scores only them.
    # The oracle applies the LITERAL compiled same-element filter.
    oracle=f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding,
         [{{'kind': 'src', 'num': vec_id % 5}},
          {{'kind': 'len', 'num': vec_id % 7}}] AS props
  FROM embeddings
),
flt AS (SELECT * FROM corpus WHERE {_NIX_FLT.to_sql()}),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT q.qid, f.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(f.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(f.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, flt f
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_store_nested_filter_indexed(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """NestedCondition through the ELEMENT-LEVEL payload index (the
    Qdrant nested index): postings keyed ``(id, elem_idx, field, val)``,
    the inner equality leaves' sets intersect on the SAME elem_idx —
    same-element semantics FROM THE INDEX, no collection scan for
    candidate generation (plan-asserted in tests/test_payload_index.py).
    kind='src' AND num∈{{1,3}} must hold on one element: the 'len'
    element's num values must not leak through."""
    from .operators import query_api  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "nestidx")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"), "embedding",
        F.array(
            F.struct(F.lit("src").alias("kind"),
                     (F.col("vec_id") % 5).alias("num")),
            F.struct(F.lit("len").alias("kind"),
                     (F.col("vec_id") % 7).alias("num"))).alias("props"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_payload_index(spark, base, "vecs", "props", n_val_buckets=16,
                        index_type="nested", fields=["kind", "num"])
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = query_api.search_points(spark, base, "vecs", qdf, flt=_NIX_FLT,
                                  k=10, use_payload_index="always")
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


_MTI_FLT = Filter(must=[MatchText("text", "data table")])


@register(
    "api_match_text_indexed",
    # the Qdrant FULL-TEXT payload index: MatchText resolves to candidate
    # ids from token postings (per-token id sets intersected, only the
    # query tokens' hash buckets read) — round 7's MatchText was always
    # residual; the facet aggregates just the fetched candidates.  The
    # oracle applies the LITERAL compiled predicate.
    oracle=f"""
SELECT lang AS value, CAST(COUNT(*) AS BIGINT) AS count
FROM documents WHERE {_MTI_FLT.to_sql()}
GROUP BY lang ORDER BY count DESC, value LIMIT 10
""",
)
def q_api_match_text_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faceted aggregate under a MatchText-ONLY filter resolved through
    the FULL-TEXT payload index (Qdrant TextIndexParams, word tokenizer
    + lowercase): token postings bucket by token hash, the probe reads
    only the query tokens' buckets, per-token id sets intersect to the
    candidate frame, and the facet groups only the bucket-pruned
    fetch."""
    from .operators import query_api  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "textidx")
    docs = load_table(spark, sf_dir, "documents")
    pts = docs.select(F.col("doc_id").alias("id"), "text", "lang")
    upsert.create_collection(spark, base, "docs", df=pts, id_col="id",
                             n_buckets=8)
    build_payload_index(spark, base, "docs", "text", n_val_buckets=32,
                        index_type="text")
    return query_api.facet_values(
        spark, base, "docs", "lang", flt=_MTI_FLT, limit=10,
        use_payload_index="always") \
        .select("value", F.col("count").cast("long").alias("count"))


_MPI_FLT = Filter(must=[MatchPhrase("text", "data table")])


@register(
    "api_match_phrase_indexed",
    # round 9 (VERDICT r8 missing #1): MatchPhrase resolves through the
    # text index's POSITIONAL postings (phrase_matching=True) — shifted-
    # position intersection over only the phrase tokens' buckets, leaf
    # dropped (positions make the answer exact, no collection scan for
    # the candidate set).  The oracle applies the LITERAL compiled
    # predicate.
    oracle=f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc
FROM documents WHERE {_MPI_FLT.to_sql()}
GROUP BY lang ORDER BY lang
""",
)
def q_api_match_phrase_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-token phrase filter resolved ENTIRELY from the text
    payload index built with positional postings (Qdrant's
    phrase-matching text index): token *i*'s postings project
    ``(id, pos - i)`` and a phrase hit is one (id, base) present in all
    of them — index-routed and EXACT, where round 8's phrase-only
    filter full-scanned."""
    from .operators.filters import filter_match_ids  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "phraseidx")
    docs = load_table(spark, sf_dir, "documents")
    pts = docs.select(F.col("doc_id").alias("id"), "text", "lang")
    upsert.create_collection(spark, base, "docs", df=pts, id_col="id",
                             n_buckets=8)
    build_payload_index(spark, base, "docs", "text", n_val_buckets=32,
                        index_type="text", phrase_matching=True)
    cand, residual = filter_match_ids(spark, base, "docs", _MPI_FLT)
    assert cand is not None and not residual.must, \
        "positional postings must answer the phrase exactly"
    rows = upsert.read_rows_for_ids(spark, base, "docs", cand)
    return (rows.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.min("id").cast("long").alias("min_doc"))
            .orderBy("lang"))


_TPX_FLT = Filter(must=[MatchTextPrefix("text", "dat tabl")])


@register(
    "api_text_prefix_indexed",
    # round 9 (VERDICT r8 missing #2): the PREFIX tokenizer — every
    # prefix of each token posts (the search-as-you-type index), so a
    # MatchTextPrefix leaf resolves exactly by probing the query tokens
    # verbatim.  The oracle applies the LITERAL compiled predicate
    # (instr anchored at a leading space only — token start, any
    # continuation).
    oracle=f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc
FROM documents WHERE {_TPX_FLT.to_sql()}
GROUP BY lang ORDER BY lang
""",
)
def q_api_text_prefix_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix search-as-you-type through a prefix-tokenized text index
    (Qdrant TextIndexParams tokenizer=prefix): 'dat tabl' matches every
    document with tokens starting 'dat' and 'tabl'; the probe reads only
    the two query prefixes' hash buckets and the leaf drops (exact)."""
    from .operators.filters import filter_match_ids  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "prefixidx")
    docs = load_table(spark, sf_dir, "documents")
    pts = docs.select(F.col("doc_id").alias("id"), "text", "lang")
    upsert.create_collection(spark, base, "docs", df=pts, id_col="id",
                             n_buckets=8)
    build_payload_index(spark, base, "docs", "text", n_val_buckets=32,
                        index_type="text", tokenizer="prefix")
    cand, residual = filter_match_ids(spark, base, "docs", _TPX_FLT)
    assert cand is not None and not residual.must, \
        "prefix postings must answer the prefix leaf exactly"
    rows = upsert.read_rows_for_ids(spark, base, "docs", cand)
    return (rows.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.min("id").cast("long").alias("min_doc"))
            .orderBy("lang"))


_MTW_FLT = Filter(must=[MatchText("text", "data table", tokenizer="word")])


@register(
    "api_match_text_word",
    # round 9: the WORD tokenizer (ASCII punctuation also delimits, the
    # Qdrant word-tokenizer twin) — 'table.' and 'data,' now match; the
    # leaf routes only through a word-tokenized index and its compiled
    # scan twin pushes one translate+instr chain both engines evaluate
    # identically.
    oracle=f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc
FROM documents WHERE {_MTW_FLT.to_sql()}
GROUP BY lang ORDER BY lang
""",
)
def q_api_match_text_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MatchText under the WORD tokenizer, resolved through a
    word-tokenized text index: build and probe both delimit on ASCII
    punctuation (``functions.text.WORD_DELIMS``), so 'data table'
    matches punctuation-adjacent occurrences the whitespace form
    misses — and indexed answers equal the translate-normalized scan."""
    from .operators.filters import filter_match_ids  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "wordidx")
    docs = load_table(spark, sf_dir, "documents")
    pts = docs.select(F.col("doc_id").alias("id"), "text", "lang")
    upsert.create_collection(spark, base, "docs", df=pts, id_col="id",
                             n_buckets=8)
    build_payload_index(spark, base, "docs", "text", n_val_buckets=32,
                        index_type="text", tokenizer="word")
    cand, residual = filter_match_ids(spark, base, "docs", _MTW_FLT)
    assert cand is not None and not residual.must, \
        "the word leaf must route through the word-tokenized index"
    rows = upsert.read_rows_for_ids(spark, base, "docs", cand)
    return (rows.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.min("id").cast("long").alias("min_doc"))
            .orderBy("lang"))


_TSW_FLT = Filter(must=[MatchPhrase("text", "the data table",
                                    stopwords="english")])


@register(
    "api_text_stopword_indexed",
    # round 10 (VERDICT r9 missing #2): TextIndexParams STOPWORDS — the
    # listed tokens drop from the query AND (position-compressed) from
    # the document stream before adjacency, so 'the data table' phrase-
    # matches 'data a table' too; the positional index posts the same
    # compressed ordinals.  The oracle applies the LITERAL compiled
    # predicate: doc-side whole-token removal is a space-doubling
    # replace chain both engines evaluate identically.
    oracle=f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc
FROM documents WHERE {_TSW_FLT.to_sql()}
GROUP BY lang ORDER BY lang
""",
)
def q_api_text_stopword_indexed(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Stopworded phrase search through a stopworded positional text
    index: 'the'/'a'/... vanish from both the phrase and the documents
    before adjacency (Qdrant's stopworded phrase semantics), and the
    routed answer equals the compiled scan exactly."""
    from .operators.filters import filter_match_ids  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "stopidx")
    docs = load_table(spark, sf_dir, "documents")
    pts = docs.select(F.col("doc_id").alias("id"), "text", "lang")
    upsert.create_collection(spark, base, "docs", df=pts, id_col="id",
                             n_buckets=8)
    build_payload_index(spark, base, "docs", "text", n_val_buckets=32,
                        index_type="text", phrase_matching=True,
                        stopwords="english")
    cand, residual = filter_match_ids(spark, base, "docs", _TSW_FLT)
    assert cand is not None and not residual.must, \
        "the stopworded phrase must route through the stopworded index"
    rows = upsert.read_rows_for_ids(spark, base, "docs", cand)
    return (rows.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.min("id").cast("long").alias("min_doc"))
            .orderBy("lang"))


_TST_FLT = Filter(must=[MatchText("text", "queries tables columns",
                                  stemmer="english")])


@register(
    "api_text_stemmed_indexed",
    # round 10 (VERDICT r9 missing #2): TextIndexParams STEMMER — the
    # Harman S-stemmer maps every token on BOTH sides ('queries' →
    # 'query', 'tables' → 'table', 'columns' → 'column'), so the plural
    # query matches singular documents; the index posts stems and the
    # compiled scan applies the SAME replace chain (suffix rules at
    # token ends, chr(2)-marker protected) in both engines — a full
    # shared-dialect stemmer oracle.
    oracle=f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc
FROM documents WHERE {_TST_FLT.to_sql()}
GROUP BY lang ORDER BY lang
""",
)
def q_api_text_stemmed_indexed(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Stemmed full-text search through a stemmed text index: the query
    'queries tables columns' matches documents containing query/table/
    column — the S-stemmer normalizes plurals at build, probe AND scan,
    and the routed answer equals the compiled scan exactly."""
    from .operators.filters import filter_match_ids  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "stemidx")
    docs = load_table(spark, sf_dir, "documents")
    pts = docs.select(F.col("doc_id").alias("id"), "text", "lang")
    upsert.create_collection(spark, base, "docs", df=pts, id_col="id",
                             n_buckets=8)
    build_payload_index(spark, base, "docs", "text", n_val_buckets=32,
                        index_type="text", stemmer="english")
    cand, residual = filter_match_ids(spark, base, "docs", _TST_FLT)
    assert cand is not None and not residual.must, \
        "the stemmed leaf must route through the stemmed index"
    rows = upsert.read_rows_for_ids(spark, base, "docs", cand)
    return (rows.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.min("id").cast("long").alias("min_doc"))
            .orderBy("lang"))


_GIX_FLT = Filter(must=[GeoRadius("lat", "lon", 45.0, 10.0, 300_000.0)])


@register(
    "api_geo_indexed",
    # the Qdrant GEO payload index: the radius's bbox covers a set of
    # quantized lat/lon grid cells, only those cells' hash buckets are
    # read for the candidate SUPERSET, and the exact haversine leaf
    # stays residual on the bucket-pruned fetch — count == the pushed
    # scan exactly.  The oracle applies the LITERAL compiled filter.
    oracle=f"""
WITH pts AS (
  SELECT vec_id AS id,
         (vec_id % 100) / 10.0 + 40.0 AS lat,
         ((vec_id * 13) % 200) / 10.0 AS lon,
         vec_id % 4 AS label
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(MIN(id) AS BIGINT) AS min_id
FROM pts WHERE {_GIX_FLT.to_sql()}
GROUP BY label ORDER BY label
""",
)
def q_api_geo_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoRadius resolved through the GEO payload index (Qdrant's geo
    index type): build quantizes each point's (lat, lon) into a grid
    cell posting; the probe enumerates the radius-bbox's covering cells
    driver-side and reads ONLY their hash buckets — a conservative
    candidate superset — then the exact haversine residual runs on the
    id-bucket-pruned fetch.  use_payload_index='always' proves the
    routing (round 7's geo filters always scanned)."""
    from .operators.filters import filter_match_ids  # noqa: PLC0415
    from .operators.payload_index import build_payload_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "geoidx")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        ((F.col("vec_id") % 100) / 10.0 + 40.0).alias("lat"),
        (((F.col("vec_id") * 13) % 200) / 10.0).alias("lon"),
        (F.col("vec_id") % 4).alias("label"))
    upsert.create_collection(spark, base, "geo", df=pts, id_col="id",
                             n_buckets=8)
    build_payload_index(spark, base, "geo", "lat", index_type="geo",
                        lon_column="lon", cell_deg=1.0, n_val_buckets=16)
    cand, residual = filter_match_ids(spark, base, "geo", _GIX_FLT)
    assert cand is not None  # the routing IS the point of this query
    rows = upsert.read_rows_for_ids(spark, base, "geo", cand)
    return (rows.filter(residual.to_column())
            .groupBy("label")
            .agg(F.count(F.lit(1)).cast("long").alias("n_points"),
                 F.min("id").cast("long").alias("min_id"))
            .orderBy("label")
            .select(F.col("label").cast("long").alias("label"),
                    "n_points", "min_id"))


@register(
    "api_retrieve",
    # Qdrant retrieve: points by id, one bucket-pruned fetch, id-ordered,
    # payload on / vectors off by default; ghost ids return no row
    oracle="""
SELECT doc_id AS id, lang, n_chars
FROM documents
WHERE doc_id IN (2, 5, 8, 13, 21, 34, 55, 1000000)
ORDER BY id
""",
)
def q_api_retrieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant ``retrieve``: fetch points by id — the read every RAG
    serving layer does after search — through ONE static
    ``id_bucket IN (...)`` pruned pass of the store (O(|ids|), never a
    collection scan; plan-asserted in tests), shaped by the return
    flags; a ghost id (1000000) fetches nothing."""
    from .operators import query_api  # noqa: PLC0415

    base = _tmp_base(sf_dir, "retrieve")
    docs = load_table(spark, sf_dir, "documents")
    pts = docs.select(F.col("doc_id").alias("id"), "lang", "n_chars")
    upsert.create_collection(spark, base, "docs", df=pts, id_col="id",
                             n_buckets=8)
    out = query_api.retrieve_points(
        spark, base, "docs", [2, 5, 8, 13, 21, 34, 55, 1_000_000])
    return out.select(F.col("id").cast("long").alias("id"), "lang",
                      F.col("n_chars").cast("long").alias("n_chars"))


_HASID_IDS = tuple(range(0, 200, 3)) + (1_000_000,)  # ghost id: fetches nothing


@register(
    "api_hasid_hasvector",
    # HasIdCondition + HasVectorCondition: the literal ids ARE the
    # candidate frame (no index, no scan for candidate generation) and
    # the has-vector residual drops the points whose space was nulled by
    # delete_vectors; the oracle simulates the nulling with a CASE.
    oracle=f"""
WITH corpus AS (
  SELECT vec_id AS id,
         CASE WHEN vec_id % 11 = 0 THEN NULL ELSE embedding END AS embedding
  FROM embeddings
),
flt AS (
  SELECT * FROM corpus
  WHERE id IN ({', '.join(str(i) for i in _HASID_IDS)})
    AND embedding IS NOT NULL
),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT q.qid, f.id AS vec_id,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(f.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(f.embedding)::DOUBLE AS b)))),
           6) AS sim
  FROM q, flt f
)
SELECT qid, vec_id, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
             AS rank
      FROM pairs)
WHERE rank <= 10
""",
)
def q_api_hasid_hasvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant HasIdCondition + HasVectorCondition in one filter: the
    HasId leaf's LITERAL ids resolve directly to the candidate frame —
    no payload index, no collection scan for candidate generation; the
    bucket-pruned fetch reads only their id buckets — and the HasVector
    residual keeps only points still CARRYING the space after
    ``delete_vectors`` nulled every 11th one.  The ghost-id ledger: ids
    past the corpus size simply fetch nothing."""
    from .operators import query_api  # noqa: PLC0415
    from .operators.filters import HasId, HasVector  # noqa: PLC0415

    base = _tmp_base(sf_dir, "hasid")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(F.col("vec_id").alias("id"), "embedding")
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    doomed = [r["id"] for r in
              pts.filter(F.col("id") % 11 == 0).select("id").collect()]
    upsert.delete_vectors(spark, base, "vecs", doomed, ["embedding"])
    flt = Filter(must=[HasId(_HASID_IDS), HasVector("embedding")])
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = query_api.search_points(spark, base, "vecs", qdf, flt=flt, k=10,
                                  use_payload_index="always")
    return out.select("qid", F.col("vec_id").cast("long").alias("vec_id"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "api_sparse_idf",
    # the declared-modifier sparse search: query weights scale by
    # ln(1 + (N - n_t + 0.5)/(n_t + 0.5)) with N the carrier count and
    # n_t the per-dim document frequency — BOTH corpus-global (the
    # oracle computes them over the full posting set)
    oracle=f"""
WITH toks AS (
  SELECT doc_id AS id, unnest({DUCK_WS_TOKENS.format(t='lower(text)')}) AS tok
  FROM documents
),
post AS (
  SELECT id, ({DUCK_POLY_HASH.format(t='tok')}) % 512 AS idx,
         CAST(COUNT(*) AS DOUBLE) AS val
  FROM toks GROUP BY id, idx
),
stats AS (SELECT CAST(COUNT(DISTINCT id) AS DOUBLE) AS n FROM post),
dfreq AS (
  SELECT idx, CAST(COUNT(DISTINCT id) AS DOUBLE) AS df FROM post GROUP BY idx
),
q AS (
  SELECT p.id AS qid, p.idx,
         p.val * ln(1.0 + ((SELECT n FROM stats) - d.df + 0.5)
                          / (d.df + 0.5)) AS qval
  FROM post p JOIN dfreq d ON p.idx = d.idx
  WHERE p.id < 3
),
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
""",
)
def q_api_sparse_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse search under the DECLARED IDF modifier — the Qdrant
    ``SparseVectorParams(modifier=Modifier.IDF)`` config
    (qdrant_embedder.py delegates exactly this to the server): the
    space's config carries ``modifier='idf'``, ``search_sparse_points``
    honors it automatically ('auto'), query values scale by the BM25
    idf term over N persisted in the index meta (maintained through
    refresh via the masked docids sidecar) and per-dim frequencies
    aggregated over the PROBED posting lists only — corpus-global
    stats, bucket-pruned reads."""
    from .operators import query_api  # noqa: PLC0415
    from .operators.sparse import (  # noqa: PLC0415
        build_sparse_index,
        postings_from_text,
    )

    base = _tmp_base(sf_dir, "sparseidf")
    docs = load_table(spark, sf_dir, "documents")
    post = postings_from_text(docs, id_col="doc_id", text_col="text",
                              vocab_size=512)
    pts = (post.groupBy("id")
           .agg(F.array_sort(F.collect_list(F.struct("idx", "val")))
                .alias("z"))
           .select("id",
                   F.col("z.idx").alias("indices"),
                   F.col("z.val").alias("values")))
    upsert.create_collection(
        spark, base, "sparse_pts", df=pts, id_col="id", n_buckets=8,
        vector_config={"text_sparse": {"kind": "sparse",
                                       "modifier": "idf"}})
    build_sparse_index(spark, base, "sparse_pts", n_dim_buckets=16)
    qpost = post.filter(F.col("id") < 3)
    out = query_api.search_sparse_points(spark, base, "sparse_pts",
                                         qpost, k=10, exclude_self=True)
    return out.select("qid", "vec_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


from .operators.filters import MatchValue as _FMatchValue  # noqa: E402
from .operators.formula import compile_formula  # noqa: E402

_FB_FORMULA = {"sum": ["$score",
                       {"mult": [0.25, _FMatchValue("grp", "g1")]},
                       {"mult": [0.01, "n"]}]}
_FB_DUCK, _ = compile_formula(_FB_FORMULA, 1, dialect="duckdb")


@register(
    "api_formula_boost",
    # Formula rescoring (Qdrant FormulaQuery): candidates = the dense
    # prefetch's top-40, final score = $score + 0.25·[grp='g1'] + 0.01·n.
    # The oracle interpolates the SAME compiled formula text (duckdb
    # dialect differs only in the epoch primitive, unused here) over the
    # prefetch scores aliased _score_0 — compiler parity by construction.
    oracle=f"""
WITH corpus AS (
  SELECT vec_id AS id, embedding,
         'g' || CAST(label % 3 AS VARCHAR) AS grp,
         vec_id % 97 AS n
  FROM embeddings WHERE vec_id < 300
),
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
pairs AS (
  SELECT c.id, c.grp, c.n,
         round(
           (SELECT SUM(a*b) FROM (SELECT unnest(q.qvec)::DOUBLE AS a,
                                         unnest(c.embedding)::DOUBLE AS b))
           / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.qvec)::DOUBLE AS a)))
             * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(c.embedding)::DOUBLE AS b)))),
           6) AS _score_0
  FROM q, corpus c
),
pre AS (
  SELECT * FROM (SELECT p.*, row_number()
                   OVER (ORDER BY _score_0 DESC, id) AS prank
                 FROM pairs p)
  WHERE prank <= 40
),
scored AS (SELECT id, round({_FB_DUCK}, 6) AS score FROM pre)
SELECT CAST(id AS BIGINT) AS id, score, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number()
        OVER (ORDER BY score DESC, CAST(id AS VARCHAR)) AS rank
      FROM scored)
WHERE rank <= 10
""",
)
def q_api_formula_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score boosting (Qdrant ``query_points(prefetch=...,
    query=FormulaQuery(...))``): the dense prefetch's top-40 rescored by
    ``$score + 0.25·[grp='g1'] + 0.01·n`` — the formula compiles to ONE
    shared-dialect SQL scalar (operators/formula.py) evaluated JVM-side
    over the prefetch scores joined with the hits' bucket-pruned payload
    fetch; no UDFs, no second collection scan."""
    from .operators import query_api  # noqa: PLC0415

    base = _tmp_base(sf_dir, "fboost")
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.filter(F.col("vec_id") < 300).select(
        F.col("vec_id").alias("id"), "embedding",
        F.concat(F.lit("g"), (F.col("label") % 3).cast("string"))
        .alias("grp"),
        (F.col("vec_id") % 97).alias("n"))
    upsert.create_collection(
        spark, base, "vecs", df=pts, id_col="id", n_buckets=8,
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    qdf = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    pre = query_api.search_points(spark, base, "vecs", qdf, k=40)
    branch = pre.select(F.col("vec_id").alias("id"),
                        F.col("sim").alias("score"))
    out = query_api.query_points(spark, base, "vecs",
                                 query={"formula": _FB_FORMULA},
                                 prefetch=[branch], k=10)
    return out.select(F.col("id").cast("long").alias("id"), "score",
                      F.col("rank").cast("long").alias("rank"))


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


@register(
    "api_formula_decay",
    # Decay-kernel boosting (Qdrant gauss_decay/exp_decay + geo_distance
    # + datetime_key): revenue-ranked prefetch rescored by freshness
    # around 08:00 and haversine proximity to (10, 20).  Both engines
    # evaluate the SAME compiled kernel text except the epoch primitive
    # (unix_timestamp vs floor(epoch)) — exercised here on purpose.
    oracle=f"""
WITH pts AS (
  SELECT o_orderkey AS id,
         (o_orderkey % 17000) / 100.0 - 85.0 AS lat,
         ((o_orderkey * 13 + o_custkey) % 36000) / 100.0 - 180.0 AS lon,
         to_timestamp(1704067200 + (o_orderkey % 1440) * 60) AS ts,
         o_totalprice
  FROM orders WHERE o_orderkey < 3000
),
pre AS (
  SELECT * FROM (SELECT p.*, round(o_totalprice / 100000, 6) AS _score_0,
                        row_number() OVER (ORDER BY o_totalprice DESC,
                                           id) AS prank
                 FROM pts p)
  WHERE prank <= 60
),
scored AS (SELECT id, round({_FD_DUCK}, 6) AS score FROM pre)
SELECT CAST(id AS BIGINT) AS id, score, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number()
        OVER (ORDER BY score DESC, CAST(id AS VARCHAR)) AS rank
      FROM scored)
WHERE rank <= 12
""",
)
def q_api_formula_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decay-kernel rescoring (Qdrant FormulaQuery's gauss_decay /
    exp_decay / geo_distance / datetime_key): a revenue-ranked prefetch
    over a payload-only collection (no vector spaces — Qdrant allows it;
    prefetches need not be vector searches) rescored by a time-of-day
    gaussian around 08:00 (λ folded driver-side from scale/midpoint) and
    an exponential haversine-proximity kernel — all whole-stage-codegen
    arithmetic on the prefetch's 60 rows plus one bucket-pruned payload
    fetch."""
    from .operators import query_api  # noqa: PLC0415

    base = _tmp_base(sf_dir, "fdecay")
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.filter(F.col("o_orderkey") < 3000).select(
        F.col("o_orderkey").alias("id"),
        ((F.col("o_orderkey") % 17000) / 100.0 - 85.0).alias("lat"),
        (((F.col("o_orderkey") * 13 + F.col("o_custkey")) % 36000) / 100.0
         - 180.0).alias("lon"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("o_orderkey") % 1440) * 60)
        .alias("ts"),
        F.col("o_totalprice"))
    upsert.create_collection(spark, base, "geo_pts", df=pts, id_col="id",
                             n_buckets=8)
    branch = (pts.orderBy(F.col("o_totalprice").desc(), "id").limit(60)
              .select(F.col("id"),
                      F.round(F.col("o_totalprice") / 100000, 6)
                      .alias("score")))
    out = query_api.query_points(spark, base, "geo_pts",
                                 query={"formula": _FD_FORMULA},
                                 prefetch=[branch], k=12)
    return out.select(F.col("id").cast("long").alias("id"), "score",
                      F.col("rank").cast("long").alias("rank"))


@register(
    "api_recommend_euclid",
    # best_score recommend on a DECLARED-EUCLID collection (round 11,
    # VERDICT r10 #2): per-pair "sims" are NEGATED euclid distances
    # (Qdrant's internal score order for distance metrics), the RecoQuery
    # formula applies verbatim, scores are <= 0 and rank DESCENDING.
    oracle="""
WITH ex AS (
  SELECT vec_id, embedding,
         CASE WHEN vec_id IN (0, 1) THEN 1 ELSE -1 END AS s
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
corpus AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id < 300 AND vec_id NOT IN (0, 1, 2)),
sims AS (
  SELECT c.vec_id, e.s,
         -sqrt((SELECT SUM((a-b)*(a-b))
                FROM (SELECT unnest(e.embedding)::DOUBLE AS a,
                             unnest(c.embedding)::DOUBLE AS b))) AS sim
  FROM corpus c, ex e
),
agg AS (
  SELECT vec_id,
         MAX(CASE WHEN s = 1 THEN sim END) AS bp,
         MAX(CASE WHEN s = -1 THEN sim END) AS bn
  FROM sims GROUP BY vec_id
),
sc AS (
  SELECT vec_id,
         round(CASE WHEN bn IS NULL OR bp > bn THEN bp
                    ELSE -(bn*bn) END, 6) AS score
  FROM agg
)
SELECT vec_id, score, CAST(rank AS BIGINT) AS rank
FROM (SELECT vec_id, score,
             row_number() OVER (ORDER BY score DESC, vec_id) AS rank
      FROM sc)
WHERE rank <= 10
""",
)
def q_api_recommend_euclid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-complete recommend (round 11, VERDICT r10 #2): best_score
    on a collection DECLARED euclid.  Qdrant defines RecoQuery on every
    ``Distance`` by comparing scores in internal order — negated
    distances for euclid/manhattan — so 'best positive' means the
    CLOSEST positive example, and a candidate whose closest example is
    a negative sinks to −(best negative)².  Same zero-shuffle broadcast
    projection as the cosine path; only the per-pair sim expression
    changes (−l2_distance)."""
    from .operators.query_api import recommend_points  # noqa: PLC0415

    base = _tmp_base(sf_dir, "receuc")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 300)
        .select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "euclid"}})
    out = recommend_points(spark, base, "vecs", positive=[0, 1],
                           negative=[2], strategy="best_score", k=10)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      "score", F.col("rank").cast("long").alias("rank"))


@register(
    "api_discover_manhattan",
    # discover over a DECLARED-MANHATTAN collection (round 11): pair
    # wins and target sim compare NEGATED L1 distances, rounded to 6
    # BEFORE comparison (the discover convention) on both engines.
    oracle="""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id < 300 AND vec_id NOT IN (0, 10, 11, 12, 13)
),
ref AS (
  SELECT (SELECT embedding FROM embeddings WHERE vec_id = 0)  AS tgt,
         (SELECT embedding FROM embeddings WHERE vec_id = 10) AS p1,
         (SELECT embedding FROM embeddings WHERE vec_id = 11) AS n1,
         (SELECT embedding FROM embeddings WHERE vec_id = 12) AS p2,
         (SELECT embedding FROM embeddings WHERE vec_id = 13) AS n2
),
scored AS (
  SELECT c.vec_id,
         round(-(SELECT SUM(abs(a-b))
                 FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                              unnest(r.tgt)::DOUBLE AS b)), 6) AS sim,
         (CASE WHEN round(-(SELECT SUM(abs(a-b))
                 FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                              unnest(r.p1)::DOUBLE AS b)), 6)
             > round(-(SELECT SUM(abs(a-b))
                 FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                              unnest(r.n1)::DOUBLE AS b)), 6)
           THEN 1 ELSE 0 END
        + CASE WHEN round(-(SELECT SUM(abs(a-b))
                 FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                              unnest(r.p2)::DOUBLE AS b)), 6)
             > round(-(SELECT SUM(abs(a-b))
                 FROM (SELECT unnest(c.embedding)::DOUBLE AS a,
                              unnest(r.n2)::DOUBLE AS b)), 6)
           THEN 1 ELSE 0 END) AS ctx_wins
  FROM corpus c, ref r
)
SELECT vec_id, CAST(ctx_wins AS BIGINT) AS ctx_wins, sim,
       CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (
        ORDER BY ctx_wins DESC, sim DESC, vec_id) AS rank FROM scored)
WHERE rank <= 10
""",
)
def q_api_discover_manhattan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-complete discover (round 11): a manhattan collection serves
    discover_points by comparing negated L1 distances — a point 'wins' a
    context pair when it is CLOSER to the positive, and the target sim is
    the negated target distance (≤ 0, ranked descending).  Same single
    broadcast-row corpus scan as the cosine path."""
    from .operators.query_api import discover_points  # noqa: PLC0415

    base = _tmp_base(sf_dir, "discman")
    emb = load_table(spark, sf_dir, "embeddings")
    upsert.create_collection(
        spark, base, "vecs", n_buckets=8, id_col="id",
        df=emb.filter(F.col("vec_id") < 300)
        .select(F.col("vec_id").alias("id"), "embedding"),
        vector_config={"embedding": {"size": 64, "distance": "manhattan"}})
    out = discover_points(spark, base, "vecs", target=0,
                          context=[(10, 11), (12, 13)], k=10)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      F.col("ctx_wins").cast("long").alias("ctx_wins"),
                      "sim", F.col("rank").cast("long").alias("rank"))


@register(
    "api_query_nested_prefetch",
    # prefetch-embedded TYPED query nodes (round 11, VERDICT r10 #1): the
    # full Qdrant query_points(prefetch=[Prefetch(query=RecommendQuery),
    # Prefetch(query=<bm25>)], query=FusionQuery(rrf)) tree as ONE
    # serializable payload — a recommend node (average_vector: synthetic
    # qvec = mean(pos) − mean(neg), examples excluded) fused with a
    # stored-BM25 text node by RRF.
    oracle=r"""
WITH ex AS (
  SELECT vec_id, CASE WHEN vec_id IN (0, 1) THEN 1 ELSE -1 END AS s,
         unnest(embedding)::DOUBLE AS val,
         unnest(range(0, len(embedding))) AS pos
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
qv AS (
  SELECT pos,
         SUM(CASE WHEN s = 1 THEN val END) / 2
       - SUM(CASE WHEN s = -1 THEN val END) AS qval
  FROM ex GROUP BY pos
),
qvec AS (SELECT list(qval ORDER BY pos) AS v FROM qv),
reco AS (
  SELECT id, rank FROM (
    SELECT s.id, row_number() OVER (ORDER BY s.sim DESC, s.id) AS rank
    FROM (
      SELECT e.vec_id AS id,
             round(
               (SELECT SUM(a*b) FROM (SELECT unnest(q.v) AS a,
                                             unnest(e.embedding)::DOUBLE AS b))
               / ( sqrt((SELECT SUM(a*a) FROM (SELECT unnest(q.v) AS a)))
                 * sqrt((SELECT SUM(b*b) FROM (SELECT unnest(e.embedding)::DOUBLE AS b)))),
               6) AS sim
      FROM embeddings e, qvec q
      WHERE e.vec_id NOT IN (0, 1, 2)) s)
  WHERE rank <= 20
),
ltoks AS (
  SELECT doc_id AS id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> length(x) > 0) AS tk
  FROM documents
),
lens AS (SELECT id, len(tk) AS len FROM ltoks),
stats AS (SELECT COUNT(*) AS n, AVG(len) AS avgdl FROM lens),
posting AS (
  SELECT id, term, COUNT(*) AS tf
  FROM (SELECT id, unnest(tk) AS term FROM ltoks)
  WHERE term IN ('vector', 'join', 'stream')
  GROUP BY id, term
),
dfreq AS (SELECT term, COUNT(DISTINCT id) AS df FROM posting GROUP BY term),
bm25 AS (
  SELECT id, rank FROM (
    SELECT s.id, row_number() OVER (ORDER BY s.score DESC, s.id) AS rank
    FROM (
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
      GROUP BY p.id) s)
  WHERE rank <= 20
),
fused AS (
  SELECT id, round(SUM(1.0 / (60 + rank)), 6) AS score
  FROM (SELECT * FROM reco UNION ALL SELECT * FROM bm25)
  GROUP BY id
)
SELECT id, score, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (ORDER BY score DESC, id) AS rank
      FROM fused)
WHERE rank <= 10
""",
)
def q_api_query_nested_prefetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefetch-embedded typed query nodes (round 11, VERDICT r10 #1): ONE
    collection carries text + a dense space; the query is a fully
    SERIALIZABLE payload — ``prefetch=[{'recommend': ...}, {'text': ...}]``
    with RRF fusion — no caller-built DataFrames anywhere.  The recommend
    leaf resolves its example ids through the store's id-bucket fetch and
    runs the synthetic-vector search; the text leaf probes only its
    terms' buckets of the persisted BM25 posting table; the fusion joins
    2·20 rows.  Nothing but the two branch scans touches the corpus."""
    from .operators.query_api import query_points  # noqa: PLC0415
    from .operators.text_search import build_text_index  # noqa: PLC0415

    base = _tmp_base(sf_dir, "nestpf")
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), "embedding")
    upsert.create_collection(
        spark, base, "docs", n_buckets=8, id_col="id",
        df=docs.join(emb, "id"),
        vector_config={"embedding": {"size": 64, "distance": "cosine"}})
    build_text_index(spark, base, "docs", text_col="text",
                     n_term_buckets=16)
    out = query_points(
        spark, base, "docs",
        prefetch=[
            {"recommend": {"positive": [0, 1], "negative": [2]},
             "limit": 20},
            {"text": {"column": "text",
                      "terms": ["vector", "join", "stream"]},
             "limit": 20},
        ],
        fusion="rrf", k=10)
    return out.select(F.col("id").cast("long").alias("id"), "score",
                      F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# registry ordering — the driver adjudicates at most 50 queries per round and
# walks the registry in insertion order, so names that have never received a
# driver CORRECTNESS row register first, then names whose last green row is
# oldest (r02, not sampled in r03).  Unlike round 3's silent `if n in
# REGISTRY` filter, _reordered() now FAILS LOUDLY on a priority name that
# doesn't exist (VERDICT r3 §"What's wrong" #3).
# ---------------------------------------------------------------------------

_PRIORITY = [
    # new this round (round 11) — never driver-adjudicated
    "api_query_nested_prefetch", "api_recommend_euclid",
    "api_discover_manhattan",
    # new in round 10
    "store_indexed_bq", "store_mv_indexed_bq", "knn_manhattan_metric",
    "api_text_stopword_indexed", "api_text_stemmed_indexed", "knn_mmr_k2",
    "store_bq_filtered_indexed", "api_recommend_sum_scores",
    "api_recommend_groups", "api_recommend_groups_avg",
    "store_discover", "store_context",
    # new in round 9
    "api_match_phrase_indexed", "api_text_prefix_indexed",
    "api_match_text_word", "store_mv_indexed_sq", "store_tenant_mv_indexed",
    "store_mv_indexed_pq",
    "api_scroll_range_indexed", "api_scroll_filtered_range_indexed",
    # new in round 8
    "api_formula_boost", "api_formula_decay",
    "api_range_indexed", "api_datetime_range_indexed",
    "store_range_indexed_search", "store_multivector_indexed",
    "api_search_with_vectors", "api_scroll_pages",
    "store_nested_filter_indexed", "api_sparse_idf",
    "store_mv_filtered_indexed", "api_hasid_hasvector", "api_retrieve",
    "api_match_text_indexed", "api_geo_indexed",
    # new in round 7 — last adjudicated one round ago
    "store_filtered_indexed_search", "api_filter_nested",
    "api_geo_polygon", "knn_multivector_maxsim",
    "store_multivector_search", "store_delete_vectors",
    "api_search_with_payload", "api_sparse_filtered",
    "api_text_filtered", "store_indexed_sq",
    "store_indexed_probe", "api_recommend_best_score", "api_match_phrase",
    "store_indexed_pq", "knn_mmr_rerank", "api_search_groups",
    "api_search_groups_stored",
    # new in round 6
    "api_filter_dsl", "store_filter_dsl_indexed", "api_geo_search",
    "api_query_dbsf", "store_update_vectors", "store_tenant_search",
    "api_values_count", "api_datetime_range",
    "api_group_lookup", "api_query_by_id", "store_batch_update",
    "api_sample",
    "store_tenant_indexed", "api_search_params", "pipe_dataset_build",
    "t14_stream_tenant_ingest",
    "api_context_search",
    "store_array_payload_search", "pipe_token_shards",
    # new in round 5
    "store_indexed_search", "store_index_refresh", "text_bm25_indexed",
    "text_bm25_refresh", "t12_queue_multi_source", "sparse_knn_text",
    "api_sparse_search", "api_discover", "api_facet", "api_scroll_order_by",
    "api_distance_matrix", "store_snapshot_restore", "store_sparse_indexed",
    "t13_stream_index_refresh", "text_repetition_stats",
    "store_payload_search", "store_alias_switch", "api_match_text",
    "pipe_decontaminate", "pipe_stratified_sample", "api_query_fusion",
    # last green in r03, not sampled by the driver in r04 — oldest evidence
    "knn_cosine_topk100", "knn_lsh_brp", "knn_filtered_search",
    "a1_pricing_summary", "j1_customer_revenue", "j2_customers_per_region",
    "j3_customer_order_counts", "j4_semi_customers_with_orders",
    "j4_anti_parts_never_bulk_ordered", "w1_top3_orders_per_priority",
    "o2_top100_lineitems", "x3_hash_embed_tf", "dedup_exact_groups",
    "a5_label_centroids", "f1_json_payload_stats", "t3_hourly_event_windows",
    "w2_event_gaps", "w3_running_customer_spend", "w4_price_quartiles",
    "a2_distinct_parts_suppliers", "a2_approx_distinct_parts",
    "a3_user_event_types", "a4_rollup_pricing", "a6_value_percentiles",
    "mm_byte_histogram", "mm_audio_features", "mm_resize_pipeline",
    "mm_binaryfile_source", "s1_message_roundtrip",
    "s6_upsert_last_write_wins", "s7_dead_letter_routing",
    "p4_payload_filter", "p5_payload_enrichment", "f3_f4_content_ids",
    "f8_array_gauntlet", "x4_centroids_applyinpandas", "x1_text_embed_udf",
    "j9_regional_revenue", "j10_small_quantity_revenue", "text_top_ngrams",
    "a7_salted_event_stats", "api_retrieve_by_ids", "api_recommend",
    "pipe_corpus_clean", "pipe_split_counts", "pipe_hash_sample",
    "t1_stream_ingest_roundtrip", "t6_stream_watermarked_windows",
    "t8_stateful_user_stats",
]


def _reordered() -> dict[str, QuerySpec]:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise KeyError(
            f"_PRIORITY names missing from REGISTRY (promised but not "
            f"implemented): {missing}")
    head = {n: REGISTRY[n] for n in _PRIORITY}
    tail = {n: s for n, s in REGISTRY.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _reordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _reordered().items() if spec.oracle}


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """entry() smoke query: full pipeline — documents → deterministic hash
    embed (X3) → kNN top-k join against the embeddings fixture (J5/W1)."""
    from .operators.embed import hash_embed  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    doc_vecs = docs.select(
        F.col("doc_id").alias("qid"), hash_embed(F.col("text"), 64).alias("qvec")
    ).filter(F.col("qid") < 8)
    emb = load_table(spark, sf_dir, "embeddings")
    return knn.knn_join_vectorized(doc_vecs, emb, k=5, exclude_self=False)
