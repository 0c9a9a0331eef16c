from .music_etl import (  # noqa: F401
    extract_metadata,
    extract_streams,
    run_pipeline,
)
