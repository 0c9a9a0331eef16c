from .readers import (  # noqa: F401
    read_csv,
    read_parquet,
    read_recent_csv,
    read_streams_multi,
    table_path,
    load_tables,
)
from .writers import write_csv_single, write_json_report, write_parquet  # noqa: F401
