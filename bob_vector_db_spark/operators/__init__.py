from . import (
    asof,
    centroid,
    dedup,
    embed,
    knn,
    multimodal,
    normalize,
    sampling,
    skew,
    topk,
    upsert,
)

__all__ = ["asof", "centroid", "dedup", "embed", "knn", "multimodal",
           "normalize", "sampling", "skew", "topk", "upsert"]
