from .catalog import REGISTRY, QuerySpec, register

__all__ = ["REGISTRY", "QuerySpec", "register"]
