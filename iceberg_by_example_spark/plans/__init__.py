from .registry import QUERY_REGISTRY, QuerySpec, register, all_queries, all_oracles  # noqa: F401
