from . import asof, centroid, dedup, embed, knn, normalize, topk, upsert

__all__ = ["asof", "centroid", "dedup", "embed", "knn", "normalize", "topk", "upsert"]
