from . import dedup, matching, similarity_search, topk

__all__ = ["dedup", "matching", "similarity_search", "topk"]
