"""kNN similarity join — the reference's delegated query surface
(SURVEY.md §2.3 J5; reference README.md:13 "Query the DB and return the
results"; cosine metric from qdrant_embedder.py:96-102).

Scale design (SURVEY.md §4.3): queries are SMALL, the corpus is 100 TB —
so always ``broadcast()`` the query side, never shuffle the corpus.  The
broadcast-nested-loop produces (query × corpus-partition) locally; the
per-query top-k is a window over only the surviving rows.  For very large
query sets use :func:`knn_join_blocked` (IVF-style centroid pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "qid",
    query_vec: str = "qvec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
    round_to: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Returns (qid, vec_id, sim, rank) with deterministic tie-breaking on
    corpus id.  The query side is broadcast; the corpus is scanned once with
    no shuffle before the final per-query top-k window.
    """
    q = queries.select(F.col(query_id).alias("qid"), F.col(query_vec).alias("qvec"))
    pairs = corpus.join(F.broadcast(q), how="cross")
    if exclude_self:
        pairs = pairs.filter(F.col("qid") != F.col(corpus_id))
    sim = vector.cosine_similarity(F.col("qvec"), F.col(corpus_vec))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = pairs.select("qid", F.col(corpus_id).alias("vec_id"), sim.alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_join_blocked(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    query_id: str = "qid",
    query_vec: str = "qvec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    corpus_label: str = "label",
    centroid_label: str = "label",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """IVF-style approximate kNN: probe only the ``n_probe`` partitions whose
    centroid is nearest each query, then exact top-k inside them.

    ``centroids`` comes from :mod:`.centroid` (one row per label).  At 100 TB
    the corpus is stored partitioned by label, so the probe filter becomes
    partition pruning — each query touches n_probe/n_partitions of the data.
    """
    q = queries.select(F.col(query_id).alias("qid"), F.col(query_vec).alias("qvec"))
    cent = centroids.select(
        F.col(centroid_label).alias("_label"), F.col(centroid_vec).alias("_cvec")
    )
    probe_w = Window.partitionBy("qid").orderBy(
        F.desc("csim"), F.asc("_label")
    )
    probes = (
        q.join(F.broadcast(cent), how="cross")
        # rounded so probe ranking is reproducible against the SQL oracle
        .withColumn("csim", F.round(
            vector.cosine_similarity(F.col("qvec"), F.col("_cvec")), 6))
        .withColumn("crank", F.row_number().over(probe_w))
        .filter(F.col("crank") <= n_probe)
        .select("qid", "qvec", F.col("_label").alias("probe_label"))
    )
    pairs = corpus.join(
        F.broadcast(probes), F.col(corpus_label) == F.col("probe_label")
    ).filter(F.col("qid") != F.col(corpus_id))
    scored = pairs.select(
        "qid",
        F.col(corpus_id).alias("vec_id"),
        F.round(vector.cosine_similarity(F.col("qvec"), F.col(corpus_vec)), 6).alias("sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
