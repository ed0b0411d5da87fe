from . import asof, dedup, knn, rrf, search, topk

__all__ = ["asof", "dedup", "knn", "rrf", "search", "topk"]
