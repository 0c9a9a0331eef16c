from .relational import (  # noqa: F401
    dedup_full,
    dedup_subset_deterministic,
    default_fill_missing,
    drop_null_keys,
    mode_per_group,
    topk_per_group,
    upsert_dataframe,
)
from .kpi import enrich_streams, genre_kpis, hourly_kpis  # noqa: F401
