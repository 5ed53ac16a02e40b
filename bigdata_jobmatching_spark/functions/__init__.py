from . import ids, salary, similarity, text

__all__ = ["ids", "salary", "similarity", "text"]
