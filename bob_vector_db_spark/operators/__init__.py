from . import (
    asof,
    centroid,
    dedup,
    embed,
    knn,
    multimodal,
    normalize,
    topk,
    upsert,
)

__all__ = ["asof", "centroid", "dedup", "embed", "knn", "multimodal",
           "normalize", "topk", "upsert"]
