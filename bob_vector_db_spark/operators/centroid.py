"""Vector centroids / IVF index build (SURVEY.md §2.4 A5; north star
"batch index build").

The explode form — posexplode(embedding) → groupBy(label, pos).avg →
re-collect ordered by pos — is pure built-in SQL: Spark plans it as a single
hash aggregate after one shuffle on (label, pos), map-side partials included.
That is the centroid table an IVF index needs (see knn.knn_join_blocked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def centroids_exploded(df: DataFrame, label_col: str = "label",
                       vec_col: str = "embedding",
                       round_to: int | None = 6,
                       exact: bool = False) -> DataFrame:
    """(label, pos, centroid_val): mean of each vector component per label.

    ``exact=True`` accumulates in DECIMAL(20,10) so the mean is bit-identical
    regardless of aggregation order — required when the centroid feeds an
    oracle-checked downstream comparison (e.g. IVF probe ranking).
    """
    if exact:
        val = (F.sum(F.col("val").cast("double").cast("decimal(20,10)"))
               .cast("double") / F.count(F.lit(1)))
    else:
        val = F.avg(F.col("val").cast("double"))
    if round_to is not None:
        val = F.round(val, round_to)
    return (
        df.select(F.col(label_col).alias("label"),
                  F.posexplode(F.col(vec_col)).alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(val.alias("centroid_val"))
    )


def centroids_grouped_map(df: DataFrame, label_col: str = "label",
                          vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          n_salts: int = 8,
                          round_to: int = 6,
                          q_decimals: int = 10) -> DataFrame:
    """X4 grouped-map centroid (label, pos, centroid_val) — scale-safe form.

    A naive ``groupBy(label).applyInPandas`` has parallelism = n_labels and
    must fit a whole label's vectors in one executor.  This is the two-stage
    shape Spark uses for its own aggregates: partial sums per
    (label, salt-of-id) — parallelism = n_labels × n_salts, memory bounded by
    the salt fan-out — then a per-label combine over n_salts tiny partial
    rows.

    Bit-identical across any physical layout / salt fan-out, for real: each
    value is quantized to ``q_decimals`` decimals and accumulated as a SCALED
    INT64 (the same arithmetic as the oracle's ``DECIMAL(20,10)`` sum), and
    integer addition is exact and associative — no float partial-sum drift.
    The exactness envelope |Σ round(v, q)·10^q| < 2^63 is CHECKED from the
    carried per-partial bounds and overflow raises a loud ValueError telling
    the caller to lower ``q_decimals`` (each decimal of quantization costs
    10× of headroom; q=10 holds ~9e8 unit-magnitude rows per label).
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    scale = float(10 ** q_decimals)

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        q = np.round(V, q_decimals)
        # |sum| ≤ Σ|q|·scale per component — check BEFORE the int sum wraps
        bound = float(np.abs(q).sum(axis=0).max()) * scale
        if bound >= 9.2e18:
            raise ValueError(
                f"centroid partial sum may exceed int64 (bound {bound:.3g}); "
                f"lower q_decimals (now {q_decimals})")
        s = np.round(q * scale).astype(np.int64).sum(axis=0)
        return pd.DataFrame({
            "label": [int(pdf["label"].iloc[0])],
            "psum": [s.tolist()],
            "n": [len(pdf)],
            "bound": [bound],
        })

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        total_bound = float(pdf["bound"].sum())
        if total_bound >= 9.2e18:
            raise ValueError(
                f"centroid combine sum may exceed int64 (bound "
                f"{total_bound:.3g}); lower q_decimals")
        S = np.stack(pdf["psum"].to_numpy()).astype(np.int64).sum(axis=0)
        mean = S / scale / int(pdf["n"].sum())
        return pd.DataFrame({
            "label": np.repeat(int(pdf["label"].iloc[0]), len(S)),
            "pos": np.arange(len(S), dtype="int64"),
            "centroid_val": np.round(mean, round_to),
        })

    salted = df.select(
        F.col(label_col).cast("long").alias("label"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)).alias("_salt"),
        F.col(vec_col),
    )
    partials = salted.groupBy("label", "_salt").applyInPandas(
        partial, "label long, psum array<long>, n long, bound double")
    return partials.groupBy("label").applyInPandas(
        combine, "label long, pos long, centroid_val double")


def centroids(df: DataFrame, label_col: str = "label",
              vec_col: str = "embedding", exact: bool = False) -> DataFrame:
    """(label, centroid ARRAY<DOUBLE>, n): the IVF centroid table.

    collect re-assembly is ordered by pos via array_sort on (pos, val)
    structs, so the result is deterministic regardless of shuffle order.
    """
    exploded = centroids_exploded(df, label_col, vec_col, round_to=None, exact=exact)
    counts = df.groupBy(F.col(label_col).alias("label")).agg(F.count("*").alias("n"))
    assembled = (
        exploded.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "centroid_val"))),
                lambda s: s["centroid_val"],
            ).alias("centroid")
        )
    )
    return assembled.join(F.broadcast(counts), "label")
