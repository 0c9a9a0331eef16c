from .registry import REGISTRY, QuerySpec, oracle_sql_map, query_map  # noqa: F401
from . import extensions  # noqa: F401  (populates REGISTRY)
