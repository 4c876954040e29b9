from .registry import REGISTRY, Query, all_queries, register

__all__ = ["REGISTRY", "Query", "all_queries", "register"]
