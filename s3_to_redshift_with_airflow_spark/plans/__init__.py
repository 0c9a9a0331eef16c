from .registry import REGISTRY, QuerySpec, oracle_sql_map, query_map  # noqa: F401
from . import classify  # noqa: F401  (populates REGISTRY)
from . import clustering  # noqa: F401  (populates REGISTRY)
from . import extensions  # noqa: F401  (populates REGISTRY)
from . import hybrid  # noqa: F401  (populates REGISTRY; needs clustering+extensions first)
from . import scale_ops  # noqa: F401  (populates REGISTRY)
from . import tpch  # noqa: F401  (populates REGISTRY)
from . import training  # noqa: F401  (populates REGISTRY)
